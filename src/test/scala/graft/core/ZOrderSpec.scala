package graft.core

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Z-order layout: bit-exactness of the key, and the actual payoff —
  * fewer rows READ under a conjunctive box filter than a layout
  * sorted by a single column. */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zorderKey matches a reference Morton interleave on random points") {
    val rnd = new scala.util.Random(7)
    val pts = Seq.fill(500)((rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong))
    def morton(x: Long, y: Long, bits: Int): Long =
      (0 until bits).foldLeft(0L) { (acc, i) =>
        acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }
    val got = pts.toDF("x", "y")
      .select($"x", $"y", Layout.zorderKey(Seq($"x", $"y"), 10).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) => assert(z === morton(x, y, 10)) }
    // adjacent grid cells differ in low bits only: key locality
    assert(morton(3, 3, 10) < 16)
  }

  test("3-dim interleave stays within bit budget and round-trips") {
    val df = Seq((5L, 6L, 7L)).toDF("a", "b", "c")
    val z = df.select(
      Layout.zorderKey(Seq($"a", $"b", $"c"), 3).as("z"))
      .as[Long].head()
    // a=101, b=110, c=111 interleaved (bit i of dim d at i*3+d):
    // i0: a1 b0 c1 → 101; i1: a0 b1 c1 → 110_; i2: a1 b1 c1 → 111
    assert(z === Integer.parseInt("111110101", 2))
    intercept[IllegalArgumentException] {
      Layout.zorderKey(Seq($"a", $"b"), 32) // 64 bits > budget
    }
  }


  test("z-ordered layout reads fewer rows than x-sorted for a y-only filter") {
    val n = 100000
    val rnd = new scala.util.Random(11)
    val data = Seq.fill(n)((rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong))
      .toDF("x", "y")
    val tmp = Files.createTempDirectory("graft_zorder").toString
    val zDir = s"$tmp/zorder"
    val xDir = s"$tmp/xsorted"
    Layout.writeZOrdered(data, zDir, Seq(col("x"), col("y")), bits = 10,
      files = 16)
    // the single-column baseline: same file count, sorted by x only
    data.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(xDir)

    val filter = col("y") >= 200 && col("y") < 220
    val zRead = rowsRead(spark.read.parquet(zDir).filter(filter))
    val xRead = rowsRead(spark.read.parquet(xDir).filter(filter))
    // x-sorted: every file's y min/max spans the full range → no
    // pruning, all n rows read. z-ordered: y's high bits are pinned by
    // the predicate, so only the files whose z-range intersects
    // y∈[200,220) are read. The margin is structural (≈4 of 16 files),
    // not a lucky distribution.
    assert(xRead === n.toLong, s"x-sorted baseline expected to read all rows, read $xRead")
    assert(zRead * 2 < xRead, s"z-order read $zRead rows, x-sorted read $xRead")
    // both layouts agree on the answer
    assert(spark.read.parquet(zDir).filter(filter).count() ===
      spark.read.parquet(xDir).filter(filter).count())
  }
}
