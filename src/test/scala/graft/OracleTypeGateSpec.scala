package graft

import org.apache.spark.sql.types._

/** Oracle/Spark TYPE parity gate — the enforcement layer for the
  * r11/r12 standing red's failure class.
  *
  * `score_percentile_norm` was value-exact at two SFs for two rounds
  * yet hash-red on the driver board: DuckDB widened `sum(c) OVER` to
  * HUGEINT, pandas/Arrow rendered the column float64 (`6250.0`), and
  * the driver's typed hash compared that against Spark's BIGINT
  * `6250`. Nothing in `sbt test` or the local value-compare could see
  * it. This spec makes the class impossible to reintroduce:
  *
  *  - `dev/oracle_types.py` records every oracle SQL's DESCRIBE types
  *    (plus an md5 of the SQL string) into oracle_types.txt;
  *  - here each recorded md5 is checked against the LIVE
  *    `SparkEntry.oracleSql` string, so an edited oracle without a
  *    regenerated types file fails loudly instead of going stale;
  *  - each query's live Spark schema is then compared column-by-column
  *    against the recorded DuckDB type: an integer on one side vs a
  *    float/HUGEINT on the other is exactly the driver-hash-red shape
  *    and fails here, in CI, with the query and column named.
  *
  * int32-vs-int64 width differences (30 of them as of r12's sweep) are
  * driver-tolerated and deliberately allowed.
  */
class OracleTypeGateSpec extends SparkSpec {

  private def md5(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** DuckDB types the driver's pandas bridge renders as float64 (or
    * that pandas cannot hold as int64). DECIMAL stays exact in both
    * engines and hashes as itself, so it is NOT in this set. */
  private def duckFloatLike(t: String): Boolean =
    t == "DOUBLE" || t == "FLOAT" || t == "REAL" || t == "HUGEINT"

  private def duckIntLike(t: String): Boolean =
    Set("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
        "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT")(t)

  private def sparkIntegral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  private def sparkFloat(dt: DataType): Boolean = dt match {
    case FloatType | DoubleType => true
    case _ => false
  }

  private case class Recorded(sqlMd5: String, cols: Seq[(String, String)])

  private lazy val recorded: Map[String, Recorded] = {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/oracle_types.txt"))
    try src.getLines().filter(_.nonEmpty).map { l =>
      val parts = l.split("\t")
      val cols = parts.drop(2).toSeq.map { kv =>
        val i = kv.indexOf('=')
        kv.substring(0, i) -> kv.substring(i + 1)
      }
      parts(0) -> Recorded(parts(1), cols)
    }.toMap finally src.close()
  }

  test("every oracle SQL has a recorded, current DuckDB type row") {
    val missing = SparkEntry.oracleSql.keySet -- recorded.keySet
    assert(missing.isEmpty,
      s"no recorded types for ${missing.toSeq.sorted.mkString(", ")} — run " +
        "dev/oracle_types.py (see its header for the two-command recipe)")
    val stale = SparkEntry.oracleSql.filter { case (name, sql) =>
      recorded(name).sqlMd5 != md5(sql)
    }.keySet
    assert(stale.isEmpty,
      s"oracle SQL changed without regenerating types for " +
        s"${stale.toSeq.sorted.mkString(", ")} — run dev/oracle_types.py")
  }

  test("no oracle column is int-vs-float divergent from its Spark column") {
    val dir = "/root/testdata/sf0.001"
    val violations = SparkEntry.oracleSql.keys.toSeq.sorted.flatMap { name =>
      val sparkCols = SparkEntry.queries(name)(spark, dir)
        .schema.fields.map(f => f.name -> f.dataType).toMap
      recorded(name).cols.flatMap { case (col, duckT) =>
        sparkCols.get(col) match {
          case None =>
            Some(s"$name.$col: oracle emits it, Spark schema lacks it")
          case Some(sparkT) if duckFloatLike(duckT) && sparkIntegral(sparkT) =>
            Some(s"$name.$col: oracle $duckT vs Spark $sparkT — the driver " +
              "hash sees float-vs-int (CAST the oracle expression)")
          case Some(sparkT) if duckIntLike(duckT) && sparkFloat(sparkT) =>
            Some(s"$name.$col: oracle $duckT vs Spark $sparkT — the driver " +
              "hash sees int-vs-float (cast the Spark column or the oracle)")
          case _ => None
        }
      }
    }
    assert(violations.isEmpty, violations.mkString("\n"))
  }

  test("type gate self-check: the HUGEINT shape is actually caught") {
    // the exact r11/r12 shape: DuckDB HUGEINT against a Spark BIGINT
    assert(duckFloatLike("HUGEINT") && sparkIntegral(LongType))
    // and the benign width case stays allowed
    assert(duckIntLike("INTEGER") && sparkIntegral(LongType) &&
      !duckFloatLike("INTEGER"))
  }
}
