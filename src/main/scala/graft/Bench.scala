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
    "dd_semantic", "q_pagerank")

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
    // Two measured runs per query: the first still pays any codegen/
    // JIT the small-SF warm-up didn't reach (AQE re-plans at real
    // data sizes). Both times are reported; `queries` takes the min.
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val stealPerRun = scala.collection.mutable.LinkedHashMap.empty[String, Seq[Double]]
    val benchStart = cpuSample()
    val results = selected.map { name =>
      val times = (1 to 2).map { _ =>
        val c0 = cpuSample()
        val t0 = System.nanoTime()
        try {
          SparkEntry.queries(name)(spark, sfDir).count()
          val secs = (System.nanoTime() - t0) / 1e9
          val (st, _) = cpuDelta(c0, cpuSample())
          stealPerRun(name) =
            stealPerRun.getOrElse(name, Seq.empty) :+ math.round(st * 100) / 100.0
          secs
        } catch {
          case e: Throwable =>
            errors.getOrElseUpdate(name, {
              val m = Option(e.getMessage).getOrElse(e.getClass.getName)
              m.linesIterator.take(1).mkString.take(300)
            })
            -1.0
        }
      }
      name -> times
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
    // Host-noise stamp: whole-bench /proc/stat steal + idle pct and
    // per-query-run steal pct. A run with steal_pct in the double
    // digits is hypervisor contention, not a code regression — the
    // JSON now self-identifies, ending per-round noise adjudication.
    val (benchSteal, benchIdle) = cpuDelta(benchStart, cpuSample())
    val stealJson = stealPerRun
      .map { case (k, ss) => jstr(k) + ":" + ss.mkString("[", ",", "]") }
      .mkString("{", ",", "}")
    val host =
      s"""{"steal_pct":${math.round(benchSteal * 100) / 100.0},"idle_pct":${math.round(benchIdle * 100) / 100.0},"steal_per_run":$stealJson}"""
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"runs":$runs,"errors":$errs,"host":$host,"sf":"$sfDir"}""")
    spark.stop()
  }
}
