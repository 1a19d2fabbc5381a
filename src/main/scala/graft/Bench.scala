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
    "q_fuzzy_join2",
    // r12 (r11 verdict item 4): the two corpus-statistics-sensitive
    // r11 ops — exact prefix-filtered cosine join (candidate volume
    // rides the df distribution) and the component-keyed
    // leakage-safe split (closure cost rides the duplication factor)
    "txt_cosine_pairs", "ds_split_leakage_safe")

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

  /** One measured run: wall seconds + the noise triad recorded with
    * it. `selfLoad` is THIS JVM's estimated contribution to the 1-min
    * loadavg at run end — an EMA of its own cores with the kernel's
    * decay constant (see the tick in main) — so the load gate can
    * subtract it: loadavg lags a minute behind, which means a short
    * query's reading is dominated by the bench's own PAST compute,
    * and subtracting the instantaneous self-cores (first attempt)
    * still flagged every light query that ran in the heavy queries'
    * load shadow.
    */
  private[graft] case class RunStat(
      secs: Double, steal: Double, otherCores: Double, load: Double,
      selfLoad: Double)

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
      // r17 (measured): the default fallback threshold of 128 keys
      // silently demotes EVERY ObjectHashAggregate task (the FirstAny
      // collapse, every collect_list bucket agg) to sort-based
      // aggregation — numTasksFallBacked == numTasks in the SQL
      // metrics — re-introducing exactly the full sort the object
      // hash agg was chosen to avoid.
      //
      // Sizing rule (r18, the budget derivation r17 owed): the
      // threshold bounds live BUFFER ENTRIES, whose fixed overhead is
      // ~128 B/entry (key row + map slot + buffer object) beyond the
      // buffered values — so threshold ≈ perTaskAggOverheadBudget /
      // 128 B. 65536 entries ≈ 8 MiB/task, negligible against any
      // sane task budget; the buffered VALUES are bounded by the
      // task's input-split bytes REGARDLESS of this knob (every input
      // row lands in exactly one buffer), so a skewed giant bucket is
      // governed by split sizing, not by this threshold — either
      // value. Both directions spec-pinned in ObjAggFallbackSpec at
      // this exact value. Env-overridable so the driver's lower-core
      // runs can pin it if needed; library consumers building their
      // own session must set it too (see README — the 128-key Spark
      // default demotes every collapse).
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        sys.env.getOrElse("SPARK_GRAFT_OBJ_AGG_KEYS", "65536"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Self-load EMA: this JVM's estimated contribution to the 1-min
    // loadavg, maintained with the kernel's own decay law
    // (a = exp(-dt/60) per dt-second tick over the JVM's measured
    // cores). Ticked continuously from JVM start — through session
    // init and warm-up too, because loadavg remembers the past
    // minute and a short query measured right after the heavy warmup
    // reads mostly the bench's OWN shadow. The gate subtracts this
    // from the raw loadavg: what remains is load the host carries
    // that this process did not generate.
    //
    // SEEDED with the loadavg at JVM start: whatever the host was
    // doing BEFORE the bench (the sbt compile that launched it, a
    // just-finished test JVM) is baseline, not co-runner evidence —
    // the seed decays at exactly the kernel's rate, so a finished
    // pre-bench process cancels out of the excess, while a LIVE
    // co-runner keeps regenerating load above the decaying baseline
    // and still stands out. (A co-runner already active at bench
    // start is grandfathered — but that is the documented whole-bench
    // blind spot: it slows every query equally and round-over-round
    // comparison catches it.)
    var selfLoad = math.max(0.0, loadAvg())
    var slCpu = processCpuNanos()
    var slT = System.nanoTime()
    def tickSelfLoad(): Double = {
      val now = System.nanoTime()
      val cpu = processCpuNanos()
      val dt = (now - slT) / 1e9
      if (dt > 0) {
        val cores = math.max(0.0, (cpu - slCpu) / 1e9 / dt)
        val a = math.exp(-dt / 60.0)
        selfLoad = selfLoad * a + cores * (1 - a)
        slT = now
        slCpu = cpu
      }
      selfLoad
    }
    // Warm-up: execute each headline query once at the smallest SF so
    // Janino codegen compilation + JIT of the operator kernels is not
    // attributed to the measured steady-state runs (same plan shapes,
    // negligible data).
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory)
      selected.foreach { name =>
        try SparkEntry.queries(name)(spark, warmDir).count()
        catch { case _: Throwable => () }
        tickSelfLoad()
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
        Some(RunStat(wall, st, math.max(0.0, busyCores - selfCores),
          loadAvg(), tickSelfLoad()))
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
    val maxRuns =
      sys.env.get("SPARK_GRAFT_ATTEMPTS").map(_.toInt).getOrElse(4).max(2)
    // SPARK_GRAFT_MIN_ATTEMPTS (default 2): floor on runs per query
    // even when the two fastest already agree. Iterative 32-core
    // queries (pageRank at sf10) keep JIT-tiering through run 3 —
    // a 2-run record can sit 2x above the steady state the metric is
    // defined to report, so scale sweeps set 3; the sf10 sweep sets
    // 4 (with ATTEMPTS=5): r12 measured pageRank still descending at
    // run 3 (78/46/34 s, quiet ratio satisfied!) where run 4 reaches
    // the 24-25 s steady state the r11 record also needed 4 runs to
    // find.
    val minRuns = sys.env.get("SPARK_GRAFT_MIN_ATTEMPTS")
      .map(_.toInt).getOrElse(2).max(2).min(maxRuns)
    import BenchNoise.quiet
    val benchStart = cpuSample()
    val rawTimes =
      scala.collection.mutable.LinkedHashMap.empty[String, Vector[Double]]
    selected.foreach { name =>
      var stats = Vector.empty[Option[RunStat]]
      def go(): Unit = stats :+= measure(name)
      go()
      if (!stats.contains(None)) go()
      while (!stats.contains(None) && stats.size < maxRuns &&
          (stats.size < minRuns || !quiet(stats.flatten.map(_.secs))))
        go()
      statsPerRun(name) = stats.flatten
      rawTimes(name) = stats.map(_.fold(-1.0)(_.secs))
    }
    // Cross-query load gate (r11 verdict item 1): until-quiet compares
    // a query only against ITSELF, so a co-runner persisting through
    // both of a query's runs slows them EQUALLY and passes as quiet —
    // the r11 q_fuzzy_join2 14 s recording (its min-run loadavg sat at
    // 7.66 vs ~4.2 for every other query in the same bench, and
    // other_cores ≈ 0 because the contention was I/O/memory-bandwidth,
    // invisible to both existing stamps). The record's own loads make
    // this self-identifying: a query whose min-run EXCESS load
    // (loadavg minus this JVM's own cores — raw load would flag a
    // CPU-heavy query as its own co-runner, measured at sf0.001)
    // exceeds the gate (see BenchNoise.loadSuspects) earns up to 2
    // extra attempts (by then a transient co-runner is gone and the
    // clean min replaces the polluted one); one that still exceeds
    // the gate lands in host.noisy.
    val extraBudget = 2
    def perQuery: Seq[(String, Seq[RunStat])] =
      statsPerRun.toSeq.map { case (k, v) => (k, v: Seq[RunStat]) }
    for (name <- selected if errors.get(name).isEmpty) {
      var extra = 0
      while (extra < extraBudget &&
          BenchNoise.loadSuspects(perQuery).contains(name)) {
        measure(name) match {
          case Some(s) =>
            statsPerRun(name) = statsPerRun(name) :+ s
            rawTimes(name) = rawTimes(name) :+ s.secs
          case None => extra = extraBudget // errored: stop retrying
        }
        extra += 1
      }
    }
    val loadNoisy = BenchNoise.loadSuspects(perQuery)
    val loadMedian = BenchNoise.median(
      perQuery.filter(_._2.nonEmpty).map(p => BenchNoise.minRunExcess(p._2))
        .filter(_ >= 0))
    val results = rawTimes.toSeq
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
    // noisy = self-disagreement (quiet ratio) ∪ cross-query load gate
    val noisy = (statsPerRun.collect {
      case (k, ss) if ss.size >= 2 && !quiet(ss.map(_.secs)) => k
    }.toSet ++ loadNoisy).toSeq.sorted.map(jstr).mkString("[", ",", "]")
    // JVM build + kernel + nominal CPU clock ride every record: the
    // r13->r14 lesson — an unexplained uniform ~13% sf0.1 drift could
    // not be adjudicated because no prior record carried the host
    // software versions. Now a future drift can be split into "same
    // host software, real regression" vs "the platform moved".
    val jvm = s"${sys.props.getOrElse("java.version", "?")} " +
      sys.props.getOrElse("java.vm.version", "?")
    val kernel =
      try {
        val src = scala.io.Source.fromFile("/proc/sys/kernel/osrelease")
        try src.getLines().next().trim finally src.close()
      } catch { case _: Throwable => "?" }
    val mhz =
      try {
        val src = scala.io.Source.fromFile("/proc/cpuinfo")
        try src.getLines().collectFirst {
          case l if l.startsWith("cpu MHz") =>
            l.split(":")(1).trim.toDouble.round.toString
        }.getOrElse("?") finally src.close()
      } catch { case _: Throwable => "?" }
    // memory-throughput stamp (r16, r15 verdict item 7): cpu_mhz
    // adjudicated the r12→r14 clock drift, but q_pagerank's 23↔35 s
    // swing tracks the host's MEMORY bandwidth, which no clock stamp
    // captures — the one 32-core bandwidth-bound iterative query in
    // the set moves with it while compute-bound queries stay put. A
    // fixed 256 MiB single-thread read sweep (~100 ms, best of 3 so
    // a scheduler hiccup cannot understate it) gives GB/s; future
    // pagerank wobbles split into "memory platform moved" (stamp
    // moved too) vs "plan regressed" (stamp flat).
    val memGbps = {
      val n = 32 << 20 // 32M longs = 256 MiB
      val a = new Array[Long](n)
      var i = 0
      while (i < n) { a(i) = i.toLong; i += 1 }
      var sink = 0L
      var best = Double.MaxValue
      var r = 0
      while (r < 3) {
        val t0 = System.nanoTime()
        var s = 0L
        var j = 0
        while (j < n) { s += a(j); j += 1 }
        val dt = (System.nanoTime() - t0) / 1e9
        sink ^= s
        if (dt < best) best = dt
        r += 1
      }
      // the xor-sink keeps the sweep from being dead-code-eliminated
      if (sink == 42L) System.err.print("")
      r2(n.toLong * 8L / best / 1e9)
    }
    val host =
      s"""{"steal_pct":${r2(benchSteal)},"idle_pct":${r2(benchIdle)},"ncpus":$ncpus,"jvm":"$jvm","kernel":"$kernel","cpu_mhz":"$mhz","mem_gbps":$memGbps,"quiet_ratio":${BenchNoise.QuietRatio},"min_excess":${BenchNoise.MinExcess},"headroom_frac":${BenchNoise.HeadroomFrac},"excess_median":${r2(loadMedian)},"steal_per_run":${perRun(_.steal)},"other_cores_per_run":${perRun(_.otherCores)},"load_per_run":${perRun(_.load)},"self_load_per_run":${perRun(_.selfLoad)},"noisy":$noisy}"""
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

/** The bench's noise-detection triad, factored out of the main so the
  * flag logic is unit-testable on synthetic RunStats (r11 verdict
  * item 1). Two independent detectors:
  *
  *  - [[quiet]]: a query's two FASTEST runs must agree within
  *    [[QuietRatio]] — catches transient neighbors that pollute one
  *    run but not the repeat;
  *  - [[loadSuspects]]: the min-run (= reported-run) EXCESS load —
  *    1-min loadavg minus this JVM's own cores over that run — must
  *    stand above the bench-wide median excess by no more than
  *    `max(MinExcess, HeadroomFrac × its own selfLoad)`. This catches the mode `quiet` cannot: a co-runner
  *    persisting through ALL of one query's runs slows them equally
  *    (self-comparison passes) while the load it adds stands out
  *    against the other queries' runs; loadavg counts D-state
  *    processes, so I/O-bound co-runners (the r11 pollution,
  *    invisible to steal and other_cores) register. Self-subtraction
  *    matters: raw loadavg counts the bench's OWN compute, so a
  *    CPU-heavy query (q_fuzzy_join2 at any SF) flags itself against
  *    a median set by light queries — measured on a clean sf0.001
  *    run before the subtraction was added. The absolute MinExcess
  *    floor keeps a near-zero median (idle host, loadavg lag) from
  *    turning harmless decimals into flags. Known limitation,
  *    documented: a co-runner spanning the ENTIRE bench raises the
  *    median itself and is invisible here — but then every query is
  *    equally slow and round-over-round comparison (not this stamp)
  *    catches it.
  */
private[graft] object BenchNoise {
  val QuietRatio = 1.5
  /** Excess-over-median margin below this never flags (loadavg
    * noise floor). */
  val MinExcess = 1.0
  /** Oversubscription headroom: loadavg counts RUNNABLE threads, and
    * a local[32] burst keeps more threads runnable than the CPU-time-
    * derived self-load can attribute (task + shuffle + GC threads
    * queue behind 32 cores) — measured ~1.1-1.7 spurious excess on a
    * verified-idle host whenever selfLoad sat at 4-7. The inflation
    * scales with the JVM's own activity, so the floor does too:
    * a query is only a suspect when its excess also clears
    * `HeadroomFrac x` its own run's selfLoad.
    */
  val HeadroomFrac = 0.5

  def quiet(ts: Seq[Double]): Boolean = {
    val best = ts.sorted.take(2)
    best.size == 2 && best(1) <= best(0) * QuietRatio
  }

  def median(xs: Seq[Double]): Double =
    if (xs.isEmpty) 0.0
    else {
      val s = xs.sorted
      val n = s.size
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }

  /** Excess load of one run: loadavg minus this JVM's cores, floored
    * at 0; -1 (unreadable /proc/loadavg) propagates as -1.
    */
  def excess(s: Bench.RunStat): Double =
    if (s.load < 0) -1.0 else math.max(0.0, s.load - s.selfLoad)

  /** The excess recorded with the FASTEST run — the run whose time
    * the metric reports, so the one whose pollution matters.
    */
  def minRunExcess(ss: Seq[Bench.RunStat]): Double =
    excess(ss.minBy(_.secs))

  /** Queries whose reported run's excess load stands ABOVE the
    * bench-wide median excess by more than
    * `max(MinExcess, HeadroomFrac × that run's selfLoad)`.
    *
    * The MARGIN-over-median form (not a ratio) is what survives
    * every measured host condition: the bench's own oversubscription
    * raises the whole excess distribution together (sf10 median
    * excess ≈ 2.6 with selfLoad ≈ 10-16 — a ratio gate flags its own
    * tail), while a co-runner polluting SOME queries lifts exactly
    * those queries' excess above the unpolluted median (the r11
    * q_fuzzy_join2 record: excess 6.9 over a 0.2 median). Unreadable
    * loads are excluded from both the median and the gate.
    */
  def loadSuspects(perQuery: Seq[(String, Seq[Bench.RunStat])]): Set[String] = {
    val withLoad = perQuery
      .filter(_._2.nonEmpty)
      .map { case (k, ss) =>
        val m = ss.minBy(_.secs)
        (k, excess(m), m.selfLoad)
      }
      .filter(_._2 >= 0)
    val med = median(withLoad.map(_._2))
    withLoad.collect {
      case (k, l, self)
          if l - med > math.max(MinExcess, HeadroomFrac * self) =>
        k
    }.toSet
  }
}
