package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench noise triad on synthetic RunStats — incl. the exact r11
  * pollution shape the cross-query load gate exists for: a co-runner
  * persisting through BOTH of one query's runs passes the quiet
  * (self-comparison) check while the load it adds stands out against
  * the bench-wide excess-load median.
  */
class BenchNoiseSpec extends AnyFunSuite {
  private def rs(secs: Double, load: Double, selfLoad: Double = 4.0) =
    Bench.RunStat(secs, steal = 0.1, otherCores = 0.0, load = load,
      selfLoad = selfLoad)

  test("quiet: two fastest runs within 1.5x pass, beyond fail") {
    assert(BenchNoise.quiet(Seq(1.0, 1.4)))
    assert(BenchNoise.quiet(Seq(5.0, 1.0, 1.4))) // min two of three
    assert(!BenchNoise.quiet(Seq(1.0, 1.6)))
    assert(!BenchNoise.quiet(Seq(1.0))) // a single run is never quiet
  }

  test("median: odd, even, empty") {
    assert(BenchNoise.median(Seq(3.0, 1.0, 2.0)) == 2.0)
    assert(BenchNoise.median(Seq(4.0, 1.0, 2.0, 3.0)) == 2.5)
    assert(BenchNoise.median(Nil) == 0.0)
  }

  test("the r11 q_fuzzy_join2 triad: persistent co-runner flagged by load, not by quiet") {
    // 14 queries at ~4.2 load with ~4 self cores (excess ~0.2);
    // fuzzy's two runs BOTH polluted (15.29/14.03 s at loads
    // 7.66/10.95, self ~4 — the co-runner was I/O-bound, so it shows
    // in loadavg but not in cores) — quiet passes (14.03 <= 1.5 x
    // 15.29 trivially), the load gate must flag it
    val clean = (1 to 14).map(i =>
      s"q$i" -> Seq(rs(3.0, 4.2), rs(3.1, 4.3)))
    val fuzzy = "q_fuzzy_join2" -> Seq(rs(15.29, 7.66), rs(14.03, 10.95))
    val per = clean :+ fuzzy
    assert(BenchNoise.quiet(fuzzy._2.map(_.secs)),
      "the protocol hole: self-comparison passes")
    assert(BenchNoise.loadSuspects(per) == Set("q_fuzzy_join2"))
  }

  test("a clean re-run replacing the min clears the suspect") {
    val clean = (1 to 14).map(i =>
      s"q$i" -> Seq(rs(3.0, 4.2), rs(3.1, 4.3)))
    // extra attempt landed a clean 4.03 s run at normal load: the
    // MIN run is now the clean one, so the gate reads ITS excess
    val fuzzy = "q_fuzzy_join2" ->
      Seq(rs(15.29, 7.66), rs(14.03, 10.95), rs(4.03, 4.4))
    assert(BenchNoise.loadSuspects(clean :+ fuzzy).isEmpty)
  }

  test("a query's own compute never flags it (self-load subtraction)") {
    // the sf0.001 measurement that shaped the gate: light queries at
    // ~2 load / ~2 self; the heavy tail query drives loadavg to 8
    // with a self-load EMA of 10 — excess 0, not a co-runner
    val per = (1 to 14).map(i =>
      s"q$i" -> Seq(rs(0.3, 2.2, selfLoad = 2.0))) :+
      ("q_fuzzy_join2" -> Seq(rs(3.3, 8.0, selfLoad = 10.0)))
    assert(BenchNoise.loadSuspects(per).isEmpty)
  }

  test("whole-bench co-runner raises the median and flags nothing (documented blind spot)") {
    val per = (1 to 15).map(i => s"q$i" -> Seq(rs(6.0, 9.0), rs(6.1, 9.1)))
    assert(BenchNoise.loadSuspects(per).isEmpty)
  }

  test("near-zero median: MinExcess + oversubscription headroom keep decimals from flagging") {
    // idle host, one query with excess 0.8 — above 1.5 x median
    // (0.1) but under both floors
    val per = (1 to 9).map(i => s"q$i" -> Seq(rs(1.0, 4.1))) :+
      ("tail" -> Seq(rs(1.0, 4.8)))
    assert(BenchNoise.loadSuspects(per).isEmpty)
    // excess 2.2 clears MinExcess, the 0.5 x selfLoad(4) = 2.0
    // headroom AND the ratio -> flagged
    val per2 = (1 to 9).map(i => s"q$i" -> Seq(rs(1.0, 4.1))) :+
      ("tail" -> Seq(rs(1.0, 6.3)))
    assert(BenchNoise.loadSuspects(per2) == Set("tail"))
  }

  test("oversubscription headroom: excess proportional to own self-load never flags") {
    // the sf1 measurement that sized HeadroomFrac: a verified-idle
    // host, 32-thread bursts keeping ~1.1-1.7 more threads runnable
    // than CPU time attributes — excess 1.6 at selfLoad 4.5 is the
    // JVM's own queue, not a co-runner
    val per = (1 to 14).map(i => s"q$i" -> Seq(rs(0.5, 5.0, selfLoad = 4.5))) :+
      ("victim" -> Seq(rs(0.4, 6.1, selfLoad = 4.5)))
    assert(BenchNoise.loadSuspects(per).isEmpty)
  }

  test("unreadable loads (-1) and empty stat lists are excluded") {
    val per = Seq(
      "a" -> Seq(rs(1.0, -1.0)),
      "b" -> Seq(rs(1.0, -1.0)),
      "c" -> Seq.empty[Bench.RunStat])
    assert(BenchNoise.loadSuspects(per).isEmpty)
  }

  test("minRunExcess reads the fastest run's excess, not the smallest excess") {
    val ss = Seq(rs(5.0, 6.0), rs(3.0, 12.0), rs(4.0, 5.0))
    assert(BenchNoise.minRunExcess(ss) == 8.0) // fastest run: 12 - 4
  }
}
