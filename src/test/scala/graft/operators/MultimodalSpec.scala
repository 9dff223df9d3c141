package graft.operators

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("decodeImages: real ImageIO round-trip recovers dimensions and every pixel; corrupt bytes degrade") {
    // a handcrafted 5x3 asset with the deterministic fill: expected
    // pixel sum computed by hand from the grayAt rule
    // (x*31 + y*17 + d*7) % 256 with d = 0
    val docs = Seq((0L, "seed")).toDF("doc_id", "text")
    val assets = Multimodal.withPngPayloads(docs).collect()
    assert(assets.length === 1)
    val a = assets.head
    // payload is a REAL png (magic bytes), not the text standing in
    assert(a.payload.take(4).map(_ & 0xff).toSeq === Seq(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt))

    val decoded = Multimodal.decodeImages(
      spark.createDataset(Seq(a))).collect().head
    assert(decoded.format === "png")
    assert((decoded.width, decoded.height) === ((a.width, a.height)))
    val expectedSum = (0 until a.height).flatMap(y => (0 until a.width)
      .map(x => (x * 31L + y * 17L) % 256L)).sum
    assert(decoded.px_sum === expectedSum)
    assert(decoded.mean_bp ===
      expectedSum * 10000L / (a.width.toLong * a.height * 255L))

    // corrupt payload: one error row, never a failed partition
    val bad = Multimodal.PngAsset(99L, 4, 4, Array[Byte](1, 2, 3, 4))
    val badOut = Multimodal.decodeImages(
      spark.createDataset(Seq(bad))).collect().head
    assert(badOut === Multimodal.DecodedImage(99L, "error", -1, -1, -1L, -1L))

    // a TRUNCATED png (valid magic, torn body) must also degrade, not
    // throw — the reader sniffs fine but read(0) fails mid-stream
    val torn = Multimodal.PngAsset(98L, 4, 4, a.payload.take(30))
    val tornOut = Multimodal.decodeImages(
      spark.createDataset(Seq(torn))).collect().head
    assert(tornOut === Multimodal.DecodedImage(98L, "error", -1, -1, -1L, -1L))
  }
}
