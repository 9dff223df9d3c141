package graft.operators

import graft.SparkSpec

/** Real WAV decode tier (r15 verdict #5): javax.sound round-trip,
  * exact PCM accounting, decoded-duration chunk plan, error-row
  * degradation. */
class MultimodalWavSpec extends SparkSpec {
  import spark.implicits._

  test("withWavPayloads emits a real RIFF/WAVE container and decodeWav " +
      "recovers every generated fact from the bytes alone") {
    val docs = Seq((7L, "hello world")).toDF("doc_id", "text")
    val a = Multimodal.withWavPayloads(docs).collect().head
    // RIFF....WAVE magic — a real container, not the PCM standing in
    assert(new String(a.payload.take(4), "US-ASCII") === "RIFF")
    assert(new String(a.payload.slice(8, 12), "US-ASCII") === "WAVE")

    val d = Multimodal.decodeWav(spark.createDataset(Seq(a)))
      .collect().head
    assert(d.format === "wave")
    assert(d.sample_rate === a.sample_rate)
    assert((d.channels, d.bits) === ((1, 16)))
    assert(d.n_samples === a.n_samples.toLong)
    // exact integer sample sum from the generation rule
    val expected = (0 until a.n_samples)
      .map(i => ((i * 37L + 7L * 11L) % 65536L) - 32768L).sum
    assert(d.sample_sum === expected)
    // chunk plan from the DECODED length: window 256 / hop 200
    val n = a.n_samples
    assert(d.n_chunks ===
      ((math.max(n - 256, 0) + 199) / 200 + 1).toLong)
  }

  test("chunk formula hand cases: short clip = 1 chunk, exact-multiple " +
      "tail, one-past boundary") {
    def mk(n: Int): Multimodal.DecodedWav = {
      val pcm = new Array[Byte](n * 2) // silence — sum 0·n is fine here
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      Multimodal.decodeWav(spark.createDataset(Seq(
        Multimodal.WavAsset(1L, 8000, n, bos.toByteArray)))).collect().head
    }
    assert(mk(100).n_chunks === 1L) // shorter than one window
    assert(mk(256).n_chunks === 1L) // exactly one window
    assert(mk(456).n_chunks === 2L) // tail 200 = exactly one hop
    assert(mk(457).n_chunks === 3L) // one past → ceil kicks in
  }

  test("undecodable and truncated payloads degrade to error rows, " +
      "never a failed partition") {
    val junk = Multimodal.WavAsset(99L, 8000, 10, Array[Byte](1, 2, 3, 4))
    val good = Multimodal.withWavPayloads(
      Seq((1L, "x")).toDF("doc_id", "text")).collect().head
    // valid RIFF magic, torn body: header sniff may pass but the frame
    // read comes up short/odd — must degrade, not throw
    val torn = Multimodal.WavAsset(98L, good.sample_rate, good.n_samples,
      good.payload.take(45))
    val out = Multimodal.decodeWav(
        spark.createDataset(Seq(junk, torn, good)))
      .collect().map(d => d.doc_id -> d).toMap
    assert(out(99L) ===
      Multimodal.DecodedWav(99L, "error", -1, -1, -1, -1L, -1L, -1L))
    assert(out(98L).format === "error")
    assert(out(1L).format === "wave") // the good row is unaffected
  }
}
