package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline queries (SURVEY.md §6) on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query and
  * total wall seconds.
  *
  * Reporting contract: `queries` carries the min of the two measured
  * runs (the steady-state number a cluster would see — this host has
  * noisy CPU neighbors); `runs` carries BOTH raw times so a noise
  * artifact is diagnosable from the JSON alone; `errors` carries any
  * per-query failure message verbatim — a failing query reports -1,
  * never a plausible-looking wall time.
  */
object Bench {

  /** Headline set: one per operator family, the ones that dominate
    * cost at scale.
    */
  val headline: Seq[String] = Seq(
    "q_agg_pricing", "q_hierarchy_rollup", "q_merge_indicator",
    "q_window_topk", "q_sessionize", "q_events_window",
    "dd_exact_hash", "dd_minhash_lsh", "dd_components",
    "ann_brute_topk", "txt_quality", "curate_pipeline",
    // r4 additions: the two iterative heavyweights (Lloyd rounds /
    // PR rounds — driver-chained jobs, the hardest local[32] shape)
    "dd_semantic", "q_pagerank",
    // r8: the uncapped pair kernel whose sf1 degenerate-corpus fix
    // (duplicate collapse + pinned kernel width) this entry tracks
    "q_fuzzy_join2")

  /** One `/proc/stat` aggregate-cpu sample: (total, idle, steal)
    * jiffies. Deltas between two samples give the host's CPU mix over
    * the interval — `steal` is time the hypervisor ran OTHER tenants
    * while this VM wanted the CPU, the signature of the noisy-
    * neighbor artifacts that polluted the r3 and r5 bench records.
    */
  private def cpuSample(): (Long, Long, Long) =
    try {
      val src = scala.io.Source.fromFile("/proc/stat")
      try {
        val f = src.getLines().next().trim.split("\\s+").drop(1).map(_.toLong)
        // user nice system idle iowait irq softirq steal — STOP there:
        // guest/guest_nice are already counted inside user/nice, so
        // summing them too would double-count guest time and deflate
        // the reported steal/idle percentages
        (f.take(8).sum, f(3), if (f.length > 7) f(7) else 0L)
      } finally src.close()
    } catch { case _: Throwable => (0L, 0L, 0L) }

  /** Percent of interval jiffies that were steal / idle. */
  private def cpuDelta(
      before: (Long, Long, Long), after: (Long, Long, Long)): (Double, Double) = {
    val total = (after._1 - before._1).toDouble
    if (total <= 0) (0.0, 0.0)
    else (100.0 * (after._3 - before._3) / total, 100.0 * (after._2 - before._2) / total)
  }

  /** One measured run: wall seconds + the noise triad recorded with it. */
  private case class RunStat(
      secs: Double, steal: Double, otherCores: Double, load: Double)

  /** CPU time this JVM has consumed (all threads), nanoseconds. */
  private def processCpuNanos(): Long =
    try
      java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
        case os: com.sun.management.OperatingSystemMXBean => os.getProcessCpuTime
        case _ => 0L
      }
    catch { case _: Throwable => 0L }

  /** 1-minute load average from /proc/loadavg. */
  private def loadAvg(): Double =
    try {
      val src = scala.io.Source.fromFile("/proc/loadavg")
      try src.getLines().next().trim.split("\\s+")(0).toDouble
      finally src.close()
    } catch { case _: Throwable => -1.0 }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // optional subset filter (comma-separated) — the scale sweeps run
    // only the expensive tail at big SFs instead of the whole set
    val selected = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(headline)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm-up: execute each headline query once at the smallest SF so
    // Janino codegen compilation + JIT of the operator kernels is not
    // attributed to the measured steady-state runs (same plan shapes,
    // negligible data).
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory)
      selected.foreach { name =>
        try SparkEntry.queries(name)(spark, warmDir).count()
        catch { case _: Throwable => () }
      }
    // Noise triad per measured run. The r7 lesson: /proc/stat steal
    // only sees HYPERVISOR preemption — a co-tenant process inside
    // the same container (a still-warm sbt/test JVM) burns CPU as
    // ordinary user time and is invisible to the steal stamp. So each
    // run also records:
    //  - other_cores: host busy cores NOT attributable to this JVM
    //    (host non-idle jiffies minus this process's CPU time over
    //    the same wall interval) — the direct signature of a
    //    same-container neighbor;
    //  - load: /proc/loadavg 1-min at run end (>> ncpus = contention).
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val statsPerRun =
      scala.collection.mutable.LinkedHashMap.empty[String, Vector[RunStat]]
    val ncpus = Runtime.getRuntime.availableProcessors()
    def measure(name: String): Option[RunStat] = {
      val c0 = cpuSample()
      val p0 = processCpuNanos()
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        val (st, idle) = cpuDelta(c0, cpuSample())
        val selfCores =
          if (wall > 0) (processCpuNanos() - p0) / 1e9 / wall else 0.0
        val busyCores = (100.0 - idle - st) / 100.0 * ncpus
        Some(RunStat(wall, st, math.max(0.0, busyCores - selfCores), loadAvg()))
      } catch {
        case e: Throwable =>
          errors.getOrElseUpdate(name, {
            val m = Option(e.getMessage).getOrElse(e.getClass.getName)
            m.linesIterator.take(1).mkString.take(300)
          })
          None
      }
    }
    // Until-quiet protocol (r7: a polluted recording cost a judge
    // re-adjudication): 2 runs minimum; while the two FASTEST runs of
    // a query disagree by >1.5x and attempts remain, run again. A
    // transient neighbor cannot pollute the recorded min (the repeat
    // lands a clean run); a genuine regression stays slow through
    // every attempt and is reported as such. Queries still >1.5x
    // apart after all attempts land in host.noisy — the JSON
    // self-identifies instead of needing a judge re-run.
    val QuietRatio = 1.5
    val maxRuns =
      sys.env.get("SPARK_GRAFT_ATTEMPTS").map(_.toInt).getOrElse(4).max(2)
    // SPARK_GRAFT_MIN_ATTEMPTS (default 2): floor on runs per query
    // even when the two fastest already agree. Iterative 32-core
    // queries (pageRank at sf10) keep JIT-tiering through run 3 —
    // a 2-run record can sit 2x above the steady state the metric is
    // defined to report, so scale sweeps set 3.
    val minRuns = sys.env.get("SPARK_GRAFT_MIN_ATTEMPTS")
      .map(_.toInt).getOrElse(2).max(2).min(maxRuns)
    def quiet(ts: Seq[Double]): Boolean = {
      val best = ts.sorted.take(2)
      best.size == 2 && best(1) <= best(0) * QuietRatio
    }
    val benchStart = cpuSample()
    val results = selected.map { name =>
      var stats = Vector.empty[Option[RunStat]]
      def go(): Unit = stats :+= measure(name)
      go()
      if (!stats.contains(None)) go()
      while (!stats.contains(None) && stats.size < maxRuns &&
          (stats.size < minRuns || !quiet(stats.flatten.map(_.secs))))
        go()
      statsPerRun(name) = stats.flatten
      name -> stats.map(_.fold(-1.0)(_.secs))
    }
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    val best = results.map { case (k, ts) =>
      k -> (if (ts.contains(-1.0)) -1.0 else ts.min)
    }
    val qs = best.map { case (k, v) => jstr(k) + ":" + v }.mkString("{", ",", "}")
    val runs = results
      .map { case (k, ts) => jstr(k) + ":" + ts.mkString("[", ",", "]") }
      .mkString("{", ",", "}")
    val errs = errors.map { case (k, v) => jstr(k) + ":" + jstr(v) }
      .mkString("{", ",", "}")
    val total = best.map(_._2).filter(_ >= 0).sum
    // Host-noise stamp: whole-bench steal/idle pct, plus per-run
    // steal / other_cores / loadavg, plus the queries whose runs
    // never converged within QuietRatio ("noisy") — the JSON
    // self-identifies every known pollution mode (hypervisor steal
    // OR same-container neighbor) without a judge re-run.
    val (benchSteal, benchIdle) = cpuDelta(benchStart, cpuSample())
    def r2(d: Double): Double = math.round(d * 100) / 100.0
    def perRun(f: RunStat => Double): String = statsPerRun
      .map { case (k, ss) => jstr(k) + ":" + ss.map(s => r2(f(s))).mkString("[", ",", "]") }
      .mkString("{", ",", "}")
    val noisy = statsPerRun.collect {
      case (k, ss) if ss.size >= 2 && !quiet(ss.map(_.secs)) => jstr(k)
    }.mkString("[", ",", "]")
    val host =
      s"""{"steal_pct":${r2(benchSteal)},"idle_pct":${r2(benchIdle)},"ncpus":$ncpus,"quiet_ratio":$QuietRatio,"steal_per_run":${perRun(_.steal)},"other_cores_per_run":${perRun(_.otherCores)},"load_per_run":${perRun(_.load)},"noisy":$noisy}"""
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"runs":$runs,"errors":$errs,"host":$host,"sf":"$sfDir"}"""
    // r8 lesson: the driver's stdout capture truncated BENCH_r08.json
    // mid-`runs`, leaving the committed record incomplete. Write the
    // full line to a file FIRST so no capture layer between this JVM
    // and the artifact can cut it; stdout stays the driver contract.
    // BENCH.json is the per-round sf0.1 record the driver/judge read —
    // a dev run at another SF must not clobber it (r10 advice: an
    // sf0.001 smoke run got committed as the round artifact). Any
    // non-sf0.1 run lands in BENCH_dev.json (gitignored) unless
    // SPARK_GRAFT_BENCH_OUT says otherwise.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      if (sfDir.replaceAll("/+$", "").endsWith("sf0.1")) "BENCH.json"
      else "BENCH_dev.json")
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(outPath),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable =>
      System.err.println(s"bench: could not write $outPath: ${e.getMessage}") }
    println(line)
    spark.stop()
  }
}
