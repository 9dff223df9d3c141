package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical-layout tools for the two shuffle problems a 100 TB join
  * hits: repeated shuffles of the same fact table (→ bucketing) and
  * hot keys that overwhelm one reducer (→ salting).
  */
object Layout {

  /** Write `df` as a bucketed (and optionally sorted) managed table.
    * Two tables bucketed by their join key into the same bucket count
    * sort-merge-join with NO exchange on either side — the shuffle is
    * paid once at layout time and amortized over every subsequent
    * join (the classic fact-table co-location strategy; at 100 TB this
    * is the difference between re-shuffling terabytes per query and
    * none). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    numBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite").bucketBy(numBuckets, bucketCol)
    val ws = if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w
    ws.format("parquet").saveAsTable(table)
  }

  /** Range join (point-in-interval) WITHOUT an equi-key, executed as
    * an equi-join on fixed-width bins: each interval replicates to the
    * bins it spans, each point lands in exactly one bin, and only
    * co-binned rows ever meet — Spark's native plan for this predicate
    * is a nested-loop cross product, which is a non-starter at scale.
    * `binWidth` trades replication (intervals spanning many bins)
    * against bin population; pick it near the median interval span.
    * Values must be non-negative (epoch seconds, offsets). */
  def binnedRangeJoin(points: DataFrame, pointCol: String,
                      intervals: DataFrame, startCol: String, endCol: String,
                      binWidth: Long): DataFrame = {
    require(binWidth > 0)
    val p = points.withColumn("__graft_bin",
      floor(col(pointCol) / binWidth).cast("long"))
    val i = intervals.withColumn("__graft_bin",
      explode(sequence(
        floor(col(startCol) / binWidth).cast("long"),
        floor(col(endCol) / binWidth).cast("long"))))
    p.join(i, p("__graft_bin") === i("__graft_bin") &&
        col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__graft_bin")
  }

  /** Z-order (Morton) key: interleaves the low `bits` bits of each
    * dimension column — bit i of dimension d lands at position
    * i*N + d — so rows close in EVERY dimension get close keys.
    *
    * Why a layout op: parquet row-group pruning works off per-column
    * min/max. Sorting 100 TB by ONE column makes that column's ranges
    * tight and every other column's ranges full-width — a filter on
    * the second column prunes nothing. Sorting by the Z-key makes each
    * row group a small hyper-rectangle in ALL interleaved dimensions,
    * so a conjunctive box filter (user X in a time range; a lat/lon
    * tile) skips the vast majority of row groups on every dimension at
    * once. This is the same layout trick Delta/Iceberg expose as
    * `OPTIMIZE ZORDER BY`, expressed as a pure column expression —
    * plain shifts/masks, whole-stage codegen, replicable in ANSI SQL
    * (the DuckDB oracle runs the identical bit formula).
    *
    * Inputs must be non-negative and < 2^bits (caller buckets/clamps
    * first — deterministic bucketing keeps the oracle exact);
    * bits * dims must fit a long. */
  def zorderKey(dims: Seq[Column], bits: Int): Column = {
    val n = dims.size
    require(n >= 2, "zorderKey needs at least 2 dimension columns")
    require(bits > 0 && bits * n <= 63, s"bits * dims must be <= 63, got ${bits * n}")
    val terms = for { i <- 0 until bits; d <- 0 until n } yield
      shiftleft(shiftright(dims(d).cast("long"), i).bitwiseAND(lit(1L)), i * n + d)
    terms.reduce(_ bitwiseOR _)
  }

  /** Rewrite `df` Z-ordered on `dims`: range-partition + sort by the
    * interleaved key, one file per range (each file's row groups are
    * then tight boxes in every dimension). `files` ≈ cluster write
    * parallelism at scale; the shuffle is paid once at layout time,
    * like writeBucketed. */
  def writeZOrdered(df: DataFrame, path: String, dims: Seq[Column],
                    bits: Int, files: Int): Unit = {
    require(files > 0)
    val keyed = df.withColumn("__graft_zkey", zorderKey(dims, bits))
    keyed.repartitionByRange(files, col("__graft_zkey"))
      .sortWithinPartitions("__graft_zkey")
      .drop("__graft_zkey")
      .write.mode("overwrite").parquet(path)
  }

  /** Parquet BLOOM-FILTER layout for point-lookup keys — the layout
    * family's missing member next to bucketing / partition pruning /
    * z-order (r14 verdict #4): min/max row-group stats prune RANGE
    * predicates, but a high-cardinality key written in arrival order
    * gives every row group a near-full-domain range — a point probe
    * (`key = x`: dedup-index lookups, doc_id fetches, shingle probes)
    * prunes nothing. A per-row-group bloom filter answers "definitely
    * not in this row group" for exactly that shape, so the reader
    * skips all but the few row groups that can contain the key.
    *
    * The dictionary is deliberately disabled on the key column: at
    * production cardinality the dictionary page overflows and parquet
    * falls back to plain encoding anyway, and with a dictionary
    * present the reader can already skip via dictionary filtering —
    * disabling it makes the proof honest (BloomLayoutSpec measures
    * rows/bytes read with vs without the filter on an identical
    * shuffled layout) and the layout representative of the 100 TB
    * case. `ndv` sizes the filter (bits ≈ -n·ln(fpp)/ln(2)²); pass
    * the expected per-row-group distinct count. */
  def writeBloomFiltered(df: DataFrame, path: String, keyCol: String,
                         files: Int, ndv: Long = 100000L,
                         fpp: Double = 0.01): Unit = {
    require(files > 0 && ndv > 0 && fpp > 0 && fpp < 1)
    df.repartition(files)
      .write.mode("overwrite")
      .option(s"parquet.bloom.filter.enabled#$keyCol", "true")
      .option(s"parquet.bloom.filter.expected.ndv#$keyCol", ndv.toString)
      .option(s"parquet.bloom.filter.fpp#$keyCol", fpp.toString)
      .option(s"parquet.enable.dictionary#$keyCol", "false")
      .parquet(path)
  }

  /** Salted equi-join for skewed keys (the manual fallback when AQE's
    * skew-join can't help, e.g. for aggregations-after-join or on
    * engines without AQE).
    *
    * The skewed LEFT side gets a deterministic salt in [0, salts) from
    * `saltBy` — pass a column expression that VARIES WITHIN the hot key
    * (e.g. hash of the row's other columns); the RIGHT side is
    * replicated `salts` times so every (key, salt) combination still
    * meets. The hot key's rows now spread over `salts` reducers at the
    * cost of an O(salts) blow-up of the right side — use for
    * fact⋈dim joins where the dim side is small enough to replicate
    * but too big (or too slow) to broadcast. */
  def saltedJoin(left: DataFrame, right: DataFrame,
                 leftKey: String, rightKey: String,
                 salts: Int, saltBy: Column): DataFrame = {
    require(salts > 0)
    // coalesce: a NULL saltBy row must still join (salt 0), not
    // silently vanish because NULL === salt never matches
    val l = left.withColumn("__graft_salt",
      coalesce(pmod(saltBy, lit(salts)), lit(0)))
    val r = right.withColumn("__graft_salt",
      explode(array((0 until salts).map(lit): _*)))
    l.join(r, l(leftKey) === r(rightKey) && l("__graft_salt") === r("__graft_salt"))
      .drop("__graft_salt")
  }
}
