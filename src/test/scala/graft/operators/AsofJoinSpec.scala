package graft.operators

import graft.SparkSpec

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  test("asof: latest state at or before each event; null when none precedes") {
    val events = Seq(
      (1L, 10L, 100L), // before any update → null
      (2L, 10L, 205L), // after u@200 → "b"
      (3L, 10L, 300L), // exactly at u@300 → "c" (ASOF >= semantics)
      (4L, 99L, 500L)  // key with no updates at all → null
    ).toDF("event_id", "key", "ets")
    val updates = Seq(
      (10L, 200L, "b"),
      (10L, 300L, "c")
    ).toDF("ukey", "uts", "state")

    val out = AsofJoin.asof(events, "key", "ets", updates, "ukey", "uts")
      .select("event_id", "state").as[(Long, Option[String])]
      .collect().toMap
    assert(out === Map(
      1L -> None, 2L -> Some("b"), 3L -> Some("c"), 4L -> None))
  }

  test("asof: payload columns come from ONE matched row, never mixed") {
    // the second update has a null in one payload column; a per-column
    // carry would resurrect the older row's value for that column
    val events = Seq((1L, 7L, 400L)).toDF("event_id", "key", "ets")
    val updates = Seq(
      (7L, 100L, Some("old_a"), Some("old_b")),
      (7L, 200L, Some("new_a"), None: Option[String])
    ).toDF("ukey", "uts", "col_a", "col_b")

    val out = AsofJoin.asof(events, "key", "ets", updates, "ukey", "uts")
      .select("col_a", "col_b").as[(Option[String], Option[String])]
      .collect().head
    assert(out === ((Some("new_a"), None)),
      "col_b must be the matched row's NULL, not the older row's value")
  }

  test("asof: every internal column name is reserved, including __carried") {
    val updates = Seq((7L, 100L, "a")).toDF("ukey", "uts", "state")
    for (bad <- Seq("__key", "__ts", "__side", "__payload", "__carried")) {
      val events = Seq((1L, 7L, 400L, "x")).toDF("event_id", "key", "ets", bad)
      val e = intercept[IllegalArgumentException] {
        AsofJoin.asof(events, "key", "ets", updates, "ukey", "uts")
      }
      assert(e.getMessage.contains("reserved"), s"$bad must be rejected")
    }
  }
}
