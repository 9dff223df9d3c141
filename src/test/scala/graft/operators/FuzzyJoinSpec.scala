package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** Semantic pins for the r7d analytics additions: the funnel's strict
  * ordering rules on a crafted event log, and the fuzzy join's
  * blocking/threshold invariants. */
class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(min * 60000L)

  test("funnel counts only strictly-ordered view→click→purchase users") {
    val events = Seq(
      // u1: full funnel in order
      (1L, "view", ts(1)), (1L, "click", ts(2)), (1L, "purchase", ts(3)),
      // u2: clicked BEFORE viewing — click must not count
      (2L, "click", ts(1)), (2L, "view", ts(2)), (2L, "purchase", ts(3)),
      // u3: view+click ordered, purchase before click — no purchase
      (3L, "purchase", ts(1)), (3L, "view", ts(2)), (3L, "click", ts(3)),
      // u4: only noise events
      (4L, "error", ts(1)),
      // u5: view then click, second click earlier than view (min-trap:
      // the FIRST click after view is ts(4), not the pre-view ts(0))
      (5L, "click", ts(0)), (5L, "view", ts(2)), (5L, "click", ts(4)),
      (5L, "purchase", ts(5))
    ).toDF("user_id", "event_type", "ts")
    val r = Windows.funnelConversion(events).as[(Long, Long, Long, Long)].head()
    // users=5; viewed: u1,u2,u3,u5; clicked-after-view: u1,u3,u5;
    // purchased-in-order: u1,u5
    assert(r === ((5L, 4L, 3L, 2L)))
  }

  test("u2's purchase after a pre-view click does not leak through") {
    // regression guard for the subtle case: u2 purchases AFTER its
    // (invalid, pre-view) click — the purchase must still not count
    // because the click anchor itself is null
    val events = Seq(
      (2L, "click", ts(1)), (2L, "view", ts(2)), (2L, "purchase", ts(3)))
      .toDF("user_id", "event_type", "ts")
    val r = Windows.funnelConversion(events).as[(Long, Long, Long, Long)].head()
    assert(r === ((1L, 1L, 0L, 0L)))
  }

  test("fuzzy pairs respect the tau threshold and blocking key") {
    val df = Seq(
      "cold anvil", "old anvil", // dist 1, same block
      "old gear",                // different block — never compared
      "bold anvil",              // dist 1 from cold/old anvil
      "anvil cold"               // block 'cold': alone in its block
    ).toDF("name")
    val got = FuzzyJoin.fuzzyNamePairs(df, "name", tau = 1)
      .select("name_a", "name_b").as[(String, String)].collect().toSet
    assert(got === Set(
      ("bold anvil", "cold anvil"), ("bold anvil", "old anvil"),
      ("cold anvil", "old anvil")))
  }

  test("identical names are not pairs; distance is symmetric-canonical") {
    val df = Seq("old anvil", "old anvil", "cold anvil").toDF("name")
    val rows = FuzzyJoin.fuzzyNamePairs(df, "name", tau = 2).collect()
    assert(rows.length === 1)
    val r = rows.head
    // canonical order name_a < name_b, duplicate rows counted in n_a/n_b
    assert(r.getString(0) === "cold anvil" && r.getString(1) === "old anvil")
    assert(r.getLong(3) === 1L && r.getLong(4) === 2L)
  }
}
