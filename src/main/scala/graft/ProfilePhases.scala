package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Dev measurement tool (optimization guide §1: measure first).
  *
  * For each named query, splits the wall into the three places time can
  * hide at bench scale:
  *   - build : the `queries(name)(spark, dir)` call itself — iterative
  *             operators run localCheckpoint jobs eagerly HERE, so this
  *             is where loop overhead shows up;
  *   - plan  : forcing `queryExecution.executedPlan` — Catalyst
  *             analysis/optimization/physical planning (driver-side,
  *             single-threaded; large plans pay seconds here);
  *   - exec  : the noop-sink materialization (same timed action as
  *             Bench).
  * Alongside, a SparkListener tallies jobs, stages, tasks and summed
  * executor task time per phase, so scheduling overhead (many jobs ×
  * small tasks) is distinguishable from genuine compute.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *          sbt "runMain graft.ProfilePhases q1 q2 ..."   (default: all)
  * Output: one JSON line per query to stdout (grep ^{"query").
  */
object ProfilePhases {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    // A/B experiments: SPARK_GRAFT_EXTRA_CONF="k=v;k2=v2" overlays any
    // SQL conf so a hypothesis can be tested without a code edit.
    val spark = sys.env.get("SPARK_GRAFT_EXTRA_CONF")
      .map(_.split(';').filter(_.contains("=")).foldLeft(b0) { (b, kv) =>
        val Array(k, v) = kv.split("=", 2); b.config(k, v)
      }).getOrElse(b0)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // per-phase counters, reset between phases
    object L extends SparkListener {
      var jobs = 0; var stages = 0; var tasks = 0
      var taskTimeMs = 0L; var gcMs = 0L
      def reset(): Unit = { jobs = 0; stages = 0; tasks = 0; taskTimeMs = 0; gcMs = 0 }
      def snap(): (Int, Int, Int, Long, Long) = (jobs, stages, tasks, taskTimeMs, gcMs)
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = stages += 1
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks += 1
        val m = t.taskMetrics
        if (m != null) { taskTimeMs += m.executorRunTime; gcMs += m.jvmGCTime }
      }
    }
    spark.sparkContext.addSparkListener(L)
    def barrier(): Unit = { // let straggling listener events drain
      Thread.sleep(150)
    }

    val all = SparkEntry.queries.keys.toSeq.sorted
    val names = if (args.nonEmpty) all.filter(args.contains) else all
    // warmup: JIT + codegen cache
    try SparkEntry.queries("q1_pricing_summary")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    finally spark.catalog.clearCache()

    names.foreach { n =>
      try {
        barrier(); L.reset()
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(n)(spark, sfDir)
        val tBuild = (System.nanoTime() - t0) / 1e9
        barrier(); val b = L.snap(); L.reset()
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // force analysis+optimize+planning
        val tPlan = (System.nanoTime() - t1) / 1e9
        val t2 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val tExec = (System.nanoTime() - t2) / 1e9
        barrier(); val e = L.snap()
        println(f"""{"query":"$n","build":$tBuild%.3f,"plan":$tPlan%.3f,"exec":$tExec%.3f,"build_jobs":${b._1},"build_tasktime_ms":${b._4},"exec_jobs":${e._1},"exec_stages":${e._2},"exec_tasks":${e._3},"exec_tasktime_ms":${e._4},"exec_gc_ms":${e._5}}""")
      } catch {
        case ex: Throwable =>
          println(s"""{"query":"$n","error":"${ex.getMessage.take(120).replace('"', '\'')}"}""")
      } finally spark.catalog.clearCache()
    }
    spark.stop()
  }
}
