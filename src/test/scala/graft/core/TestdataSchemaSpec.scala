package graft.core

import org.apache.spark.sql.types._

import graft.SparkSpec

/** Testdata contract canary. The driver regenerates /root/testdata
  * between rounds and has already changed physical types once
  * (events.ts: TIMESTAMP(NANOS) → timestamp[us]/TIMESTAMP_NTZ, round 9).
  * The engine must fail loudly HERE — one spec, one message naming the
  * drifted column — not as 29 scattered analysis errors in the oracle
  * run. Asserts, per table: exact column names in order, the dtype
  * contract every operator relies on, and a 1-row action (schema alone
  * wouldn't catch corrupt row groups). */
class TestdataSchemaSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Dtype contract. Date-ish columns accept any of the physical types
    * the generator has plausibly shipped (TIMESTAMP, TIMESTAMP_NTZ,
    * DATE) because every consumer compares them to literals — but a
    * silent switch to e.g. STRING or epoch LONG must fail here. */
  private val dateLike: Set[DataType] =
    Set(TimestampType, TimestampNTZType, DateType)

  private def integral(dt: DataType): Boolean =
    dt == IntegerType || dt == LongType

  test("every table loads, has the contracted columns, and yields a row") {
    // (table, loader-applied frame, per-column predicate)
    val contracts: Seq[(String, org.apache.spark.sql.DataFrame, Seq[(String, DataType => Boolean, String)])] = Seq(
      ("region", Tables.region(spark, dir), Seq(
        ("r_regionkey", integral _, "integral"),
        ("r_name", (dt: DataType) => dt == StringType, "string"))),
      ("nation", Tables.nation(spark, dir), Seq(
        ("n_nationkey", integral _, "integral"),
        ("n_name", (dt: DataType) => dt == StringType, "string"),
        ("n_regionkey", integral _, "integral"))),
      ("customer", Tables.customer(spark, dir), Seq(
        ("c_custkey", integral _, "integral"),
        ("c_name", (dt: DataType) => dt == StringType, "string"),
        ("c_nationkey", integral _, "integral"),
        ("c_acctbal", (dt: DataType) => dt == DoubleType, "double"),
        ("c_mktsegment", (dt: DataType) => dt == StringType, "string"))),
      ("supplier", Tables.supplier(spark, dir), Seq(
        ("s_suppkey", integral _, "integral"),
        ("s_name", (dt: DataType) => dt == StringType, "string"),
        ("s_nationkey", integral _, "integral"),
        ("s_acctbal", (dt: DataType) => dt == DoubleType, "double"))),
      ("part", Tables.part(spark, dir), Seq(
        ("p_partkey", integral _, "integral"),
        ("p_name", (dt: DataType) => dt == StringType, "string"),
        ("p_brand", (dt: DataType) => dt == StringType, "string"),
        ("p_type", (dt: DataType) => dt == StringType, "string"),
        ("p_size", integral _, "integral"),
        ("p_retailprice", (dt: DataType) => dt == DoubleType, "double"))),
      ("orders", Tables.orders(spark, dir), Seq(
        ("o_orderkey", integral _, "integral"),
        ("o_custkey", integral _, "integral"),
        ("o_orderstatus", (dt: DataType) => dt == StringType, "string"),
        ("o_totalprice", (dt: DataType) => dt == DoubleType, "double"),
        ("o_orderdate", dateLike.contains _, "timestamp/ntz/date"),
        ("o_orderpriority", (dt: DataType) => dt == StringType, "string"))),
      ("lineitem", Tables.lineitem(spark, dir), Seq(
        ("l_orderkey", integral _, "integral"),
        ("l_partkey", integral _, "integral"),
        ("l_suppkey", integral _, "integral"),
        ("l_linenumber", integral _, "integral"),
        ("l_quantity", (dt: DataType) => dt == DoubleType, "double"),
        ("l_extendedprice", (dt: DataType) => dt == DoubleType, "double"),
        ("l_discount", (dt: DataType) => dt == DoubleType, "double"),
        ("l_tax", (dt: DataType) => dt == DoubleType, "double"),
        ("l_returnflag", (dt: DataType) => dt == StringType, "string"),
        ("l_linestatus", (dt: DataType) => dt == StringType, "string"),
        ("l_shipdate", dateLike.contains _, "timestamp/ntz/date"))),
      // events goes through normalizeEventsTs: whatever the physical
      // type, downstream code is owed exactly TimestampType
      ("events", Tables.events(spark, dir), Seq(
        ("event_id", integral _, "integral"),
        ("ts", (dt: DataType) => dt == TimestampType, "timestamp (normalized)"),
        ("user_id", integral _, "integral"),
        ("event_type", (dt: DataType) => dt == StringType, "string"),
        ("value", (dt: DataType) => dt == DoubleType, "double"),
        ("props", (dt: DataType) => dt == StringType, "string"))),
      ("documents", Tables.documents(spark, dir), Seq(
        ("doc_id", integral _, "integral"),
        ("text", (dt: DataType) => dt == StringType, "string"),
        ("lang", (dt: DataType) => dt == StringType, "string"),
        ("source", (dt: DataType) => dt == StringType, "string"),
        ("n_chars", integral _, "integral"))),
      ("embeddings", Tables.embeddings(spark, dir), Seq(
        ("vec_id", integral _, "integral"),
        ("embedding", (dt: DataType) => dt == ArrayType(FloatType) ||
          dt == ArrayType(FloatType, containsNull = false), "array<float>"),
        ("label", integral _, "integral"))))

    assert(contracts.map(_._1) === Tables.names,
      "spec must cover exactly the tables Tables.names declares")

    for ((name, df, cols) <- contracts) {
      assert(df.schema.fieldNames.toSeq === cols.map(_._1),
        s"TESTDATA DRIFT in $name: columns ${df.schema.fieldNames.mkString(",")}")
      for ((colName, ok, expect) <- cols) {
        val actual = df.schema(colName).dataType
        assert(ok(actual),
          s"TESTDATA DRIFT in $name.$colName: loaded as $actual, engine expects $expect")
      }
      assert(df.head(1).nonEmpty, s"TESTDATA DRIFT: $name is empty at sf0.001")
    }
  }

  test("normalized events timestamps land in a sane epoch range") {
    // dtype alone cannot catch a UNIT drift: if a future generation
    // ships ts as epoch-MICROS in a LONG column, the nanos branch of
    // normalizeEventsTs would divide by 1000 once too often and emit
    // 1970-era timestamps with a perfectly valid TimestampType schema.
    // Magnitude is the only observable — pin the year range.
    import org.apache.spark.sql.functions._
    val yrs = Tables.events(spark, dir)
      .agg(min(year(col("ts"))).as("lo"), max(year(col("ts"))).as("hi"))
      .head()
    val (lo, hi) = (yrs.getInt(0), yrs.getInt(1))
    assert(lo >= 2000 && hi <= 2100,
      s"TESTDATA DRIFT in events.ts: normalized years [$lo, $hi] are outside " +
        "[2000, 2100] — the raw column's epoch UNIT likely changed " +
        "(nanos vs micros vs millis); fix Tables.normalizeEventsTs")
  }
}
