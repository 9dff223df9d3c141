package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Referential-integrity audit over the star schema — the data-quality
  * gate a warehouse runs before trusting a load: for every
  * child→parent key relationship, how many child rows exist, how many
  * carry a NULL key, and how many non-null keys point at NO parent row
  * (orphans). A zero report certifies the load; a non-zero one names
  * the broken edge.
  *
  * Scale shape: each relation is one left-ANTI equi-join (orphans) +
  * one map-side count — no row wider than the key ever shuffles
  * because the child projects to its key column before the join; small
  * parents (nation, region, supplier at most scales) broadcast, the
  * big edges (lineitem→orders) are shuffled hash joins AQE handles.
  * The report is |relations| rows.
  *
  * Reference semantics: lightbitbird/spark-streaming-kafka-example has
  * no audit operator; this extends the relational family (SURVEY §2
  * rows 15-20) with the operational check every pipeline needs.
  */
object IntegrityAudit {

  /** One audited edge: child rows project to the FK, NULLs counted
    * apart (a null FK is not an orphan — it is a different defect),
    * orphans = non-null keys with no matching parent key. */
  def auditEdge(name: String, child: DataFrame, childKey: String,
                parent: DataFrame, parentKey: String): DataFrame = {
    val keys = child.select(col(childKey).as("k"))
    val nonNull = keys.filter(col("k").isNotNull)
    val orphans = nonNull.join(
      parent.select(col(parentKey).as("pk")), col("k") === col("pk"),
      "left_anti")
    keys.agg(count(lit(1)).as("n_rows"),
        sum(when(col("k").isNull, 1L).otherwise(0L)).as("n_null"))
      .crossJoin(orphans.agg(count(lit(1)).as("n_orphans")))
      .select(lit(name).as("relation"), col("n_rows"), col("n_null"),
        col("n_orphans"))
  }

  /** The full star-schema audit: every FK edge in TESTDATA.md's
    * schema, one row each. */
  def fkIntegrity(spark: SparkSession, dir: String): DataFrame = {
    val customer = Tables.customer(spark, dir)
    val orders = Tables.orders(spark, dir)
    val lineitem = Tables.lineitem(spark, dir)
    val supplier = Tables.supplier(spark, dir)
    val part = Tables.part(spark, dir)
    val nation = Tables.nation(spark, dir)
    val region = Tables.region(spark, dir)
    Seq(
      auditEdge("customer.nation", customer, "c_nationkey", nation, "n_nationkey"),
      auditEdge("lineitem.orders", lineitem, "l_orderkey", orders, "o_orderkey"),
      auditEdge("lineitem.part", lineitem, "l_partkey", part, "p_partkey"),
      auditEdge("lineitem.supplier", lineitem, "l_suppkey", supplier, "s_suppkey"),
      auditEdge("nation.region", nation, "n_regionkey", region, "r_regionkey"),
      auditEdge("orders.customer", orders, "o_custkey", customer, "c_custkey"),
      auditEdge("supplier.nation", supplier, "s_nationkey", nation, "n_nationkey"))
      .reduce(_ unionByName _)
  }

  def fkIntegrityQuery(spark: SparkSession, dir: String): DataFrame =
    fkIntegrity(spark, dir).orderBy(col("relation"))

  private def edgeSql(name: String, child: String, ck: String,
                      parent: String, pk: String): String =
    s"""SELECT '$name' AS relation,
       | (SELECT CAST(count(*) AS BIGINT) FROM $child) AS n_rows,
       | (SELECT CAST(count(*) FILTER (WHERE $ck IS NULL) AS BIGINT)
       |   FROM $child) AS n_null,
       | (SELECT CAST(count(*) AS BIGINT) FROM $child c
       |   WHERE c.$ck IS NOT NULL
       |     AND NOT EXISTS (SELECT 1 FROM $parent p WHERE p.$pk = c.$ck))
       |   AS n_orphans""".stripMargin

  val oracles: Map[String, String] = Map(
    "fk_integrity" -> (Seq(
      edgeSql("customer.nation", "customer", "c_nationkey", "nation", "n_nationkey"),
      edgeSql("lineitem.orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
      edgeSql("lineitem.part", "lineitem", "l_partkey", "part", "p_partkey"),
      edgeSql("lineitem.supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
      edgeSql("nation.region", "nation", "n_regionkey", "region", "r_regionkey"),
      edgeSql("orders.customer", "orders", "o_custkey", "customer", "c_custkey"),
      edgeSql("supplier.nation", "supplier", "s_nationkey", "nation", "n_nationkey"))
      .mkString("\nUNION ALL\n") + "\nORDER BY relation"))
}
