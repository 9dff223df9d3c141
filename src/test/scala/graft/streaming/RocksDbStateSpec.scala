package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** Stateful streaming must run on the RocksDB state store (the
  * at-scale provider) with identical semantics to the default. */
class RocksDbStateSpec extends SparkSpec {
  import spark.implicits._

  test("flatMapGroupsWithState accumulates state on RocksDB provider") {
    implicit val sqlCtx = spark.sqlContext
    val before = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    StreamingConfs.applyRocksDb(spark)
    try {
      val ms = MemoryStream[String]
      val q = Sinks.memory(
        StatefulWordCount.runningCounts(ms.toDS()).toDF(), "rocks_sink", "update")
        .start()
      try {
        ms.addData("a", "b", "a")
        q.processAllAvailable()
        ms.addData("a")
        q.processAllAvailable()
        val counts = spark.table("rocks_sink").as[(String, Long)].collect()
          .groupBy(_._1).map { case (w, r) => w -> r.map(_._2).max }
        assert(counts === Map("a" -> 3L, "b" -> 1L))
        // the query really ran on RocksDB, not the default provider
        assert(q.lastProgress.stateOperators.head.customMetrics
          .keySet.toString.contains("rocksdb"))
      } finally q.stop()

      // state TTL: an idle key is EVICTED and restarts at zero — the
      // eviction story flatMapGroupsWithState lacks
      val msT = MemoryStream[String]
      val qT = Sinks.memory(
        StatefulWordCount.runningCountsTwsTtl(
          msT.toDS(), java.time.Duration.ofMillis(1500)).toDF(),
        "ttl_sink", "update").start()
      try {
        // ProcessingTime mode runs continuous timer-evaluation batches,
        // so processAllAvailable never settles — poll the sink instead
        def awaitRow(row: (String, Long), tag: String): Unit = {
          val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
          while (!spark.table("ttl_sink").as[(String, Long)].collect()
              .contains(row)) {
            assert(System.nanoTime() < deadline, s"timeout waiting for $tag")
            assert(qT.exception.isEmpty, s"query died: ${qT.exception}")
            Thread.sleep(100)
          }
        }
        msT.addData("k", "k")
        awaitRow(("k", 2L), "pre-TTL total")
        Thread.sleep(2500) // > TTL: "k" state must expire
        msT.addData("k")
        // count RESTARTS at 1 after eviction (without TTL it would be 3)
        awaitRow(("k", 1L), "post-TTL restart")
        val rows = spark.table("ttl_sink").as[(String, Long)].collect().toSeq
        assert(!rows.contains(("k", 3L)), s"state survived TTL: $rows")
      } finally qT.stop()

      // event-time timers: sessions close when the watermark passes
      // last-event-time + gap; stale timers are ignored
      import graft.streaming.Sessionize.Event
      val msS = MemoryStream[Event]
      val sessions = Sessionize.closedSessions(
        msS.toDS().withWatermark("ts", "0 seconds"), gapMs = 5000)
      val qS = Sinks.memory(sessions.toDF(), "sess_sink", "append").start()
      try {
        def ev(w: String, sec: Long) = Event(w, new java.sql.Timestamp(sec * 1000))
        msS.addData(ev("a", 1), ev("a", 2), ev("b", 3))
        qS.processAllAvailable()       // watermark -> 3s; nothing closes
        // b@20 is 17s past b@3 — an EVENT-time gap, so the old session
        // must close inline with count 1 even though the watermark (3s)
        // never reached its 8s timer
        msS.addData(ev("b", 20))
        qS.processAllAvailable()       // watermark -> 20s: a's 7s timer fires
        val afterA = spark.table("sess_sink")
          .as[(String, Long)].collect().toSet
        // b's 8s timer also fired here (wm 20s) but is STALE against
        // the new session — honoring it would double-close b
        assert(afterA === Set(("a", 2L), ("b", 1L)),
          s"a closes by timer, b's first session closes by gap, got $afterA")
        msS.addData(ev("b", 22))       // within gap: extends, timer 25s -> 27s
        qS.processAllAvailable()
        msS.addData(ev("zz", 60))      // watermark -> 60s: 25s stale, 27s real
        qS.processAllAvailable()
        val afterB = spark.table("sess_sink").as[(String, Long)].collect().toSet
        // the second b session (20s, 22s) closes ONCE with both events
        assert(afterB === Set(("a", 2L), ("b", 1L), ("b", 2L)), s"got $afterB")
      } finally qS.stop()

      // the transformWithState successor API must give the same answer
      val ms2 = MemoryStream[String]
      val q2 = Sinks.memory(
        StatefulWordCount.runningCountsTws(ms2.toDS()).toDF(), "tws_sink", "update")
        .start()
      try {
        ms2.addData("x", "y", "x")
        q2.processAllAvailable()
        ms2.addData("x")
        q2.processAllAvailable()
        val counts2 = spark.table("tws_sink").as[(String, Long)].collect()
          .groupBy(_._1).map { case (w, r) => w -> r.map(_._2).max }
        assert(counts2 === Map("x" -> 3L, "y" -> 1L))
      } finally q2.stop()
    } finally {
      before match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
      StreamingConfs.rocksDbStateStore(1024).keys
        .filterNot(_ == "spark.sql.streaming.stateStore.providerClass")
        .foreach(spark.conf.unset)
    }
  }
}
