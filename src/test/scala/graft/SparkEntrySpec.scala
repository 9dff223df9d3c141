package graft

/** Mirrors the driver's smoke check: entry() must return rows, and
  * every declared oracle key must have a matching query. */
class SparkEntrySpec extends SparkSpec {

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("queries and oracles cover each other exactly") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    // set EQUALITY: a query without an oracle would ship unverified
    assert(os === qs,
      s"oracles without queries: ${os -- qs}; queries without oracles: ${qs -- os}")
    assert(qs.forall(_.matches("[a-z0-9_]+")))
  }
}
