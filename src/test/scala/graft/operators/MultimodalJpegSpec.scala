package graft.operators

import graft.SparkSpec

/** The JPEG tier's fidelity contract: a lossy codec can't be pixel-sum
  * hash-pinned (the PNG oracle's check), so the round-trip error is
  * BOUNDED here instead — the row-78 approx-percentile precedent
  * applied to a codec. The bound is calibrated against the measured
  * error of the JDK encoder at quality 0.95 on the [[Multimodal.grayAt]]
  * sawtooth fill (a worst-case high-frequency pattern for an 8×8 DCT
  * codec), with ~2x headroom so a JDK codec revision doesn't flake the
  * gate while a genuinely broken round-trip still fails loudly. */
class MultimodalJpegSpec extends SparkSpec {
  import spark.implicits._

  test("jpeg round-trip: formats and dimensions exact, pixel error bounded") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val assets = Multimodal.withJpegPayloads(docs).collect()
    assert(assets.length === docs.count())
    var worstMean = 0.0
    var worstPx = 0
    assets.foreach { a =>
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(a.payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        assert(readers.hasNext, s"doc ${a.doc_id}: payload not decodable")
        val r = readers.next()
        try {
          r.setInput(iis)
          assert(r.getFormatName.toLowerCase === "jpeg")
          val img = r.read(0)
          assert(img.getWidth === a.width && img.getHeight === a.height,
            s"doc ${a.doc_id}: dimensions must survive the round-trip")
          val raster = img.getRaster
          var sumAbs = 0L
          var y = 0
          while (y < a.height) {
            var x = 0
            while (x < a.width) {
              val want = ((x * 31L + y * 17L + a.doc_id * 7L) % 256L).toInt
              val got = raster.getSample(x, y, 0)
              val d = math.abs(got - want)
              sumAbs += d
              if (d > worstPx) worstPx = d
              x += 1
            }
            y += 1
          }
          val mean = sumAbs.toDouble / (a.width * a.height)
          if (mean > worstMean) worstMean = mean
        } finally r.dispose()
      } finally iis.close()
    }
    info(f"worst per-image mean abs pixel error: $worstMean%.2f, " +
      s"worst single-pixel error: $worstPx")
    // measured at quality 0.95 on this fill (sf0.001, 500 images):
    // worst per-image mean 1.57, worst single pixel 8 — the %256
    // sawtooth is piecewise-linear, which an 8x8 DCT reconstructs
    // closely; bounds carry ~2.5-3x headroom
    assert(worstMean <= 4.0,
      f"mean per-pixel reconstruction error $worstMean%.2f exceeds the band")
    assert(worstPx <= 24,
      s"single-pixel reconstruction error $worstPx exceeds the band")
  }

  test("multimodal_decode_jpeg query: exact fields only, all rows jpeg") {
    val out = Multimodal.multimodalDecodeJpegQuery(spark, "/root/testdata/sf0.001")
      .select("format").as[String].collect()
    assert(out.nonEmpty && out.forall(_ === "jpeg"))
  }
}
