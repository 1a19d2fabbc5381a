package graft

import org.apache.spark.sql.functions._
import graft.ops.Mining
import graft.llm.TextAnalysis

class MiningSpec extends SparkSpec {
  import spark.implicits._

  test("pairCooccurrence counts pair/item supports, confidence and lift") {
    // baskets: 1:{a,b,c} 2:{a,b} 3:{a} — pair (a,b) support 2, the
    // rest support 1; a basket row repeated must not double-count
    val df = Seq(
      (1L, "a"), (1L, "b"), (1L, "c"), (1L, "b"),
      (2L, "a"), (2L, "b"),
      (3L, "a")).toDF("basket", "item")
    val out = Mining.pairCooccurrence(df, col("basket"), col("item"),
        minPairs = 2)
      .as[(String, String, Long, Long, Long, Long, Double, Double)]
      .collect()
    assert(out.toSeq == Seq(("a", "b", 2L, 3L, 2L, 3L, 2.0 / 3.0, 1.0)))
  }

  test("pairCooccurrence minPairs=1 emits every co-occurring pair, item_a < item_b") {
    val df = Seq((1L, "c"), (1L, "a"), (1L, "b"), (2L, "b"), (2L, "a"))
      .toDF("basket", "item")
    val out = Mining.pairCooccurrence(df, col("basket"), col("item"),
        minPairs = 1)
      .select(col("item_a"), col("item_b"), col("pair_n"))
      .as[(String, String, Long)].collect().toSet
    assert(out == Set(("a", "b", 2L), ("a", "c", 1L), ("b", "c", 1L)))
    // single-item baskets contribute no pairs but do count in totals
    val one = Seq((1L, "a"), (2L, "b")).toDF("basket", "item")
    assert(Mining.pairCooccurrence(one, col("basket"), col("item"), 1).isEmpty)
  }

  test("eventPatterns: non-overlapping scan-deterministic matches, gaps, ties") {
    // user 1: v c p | v e v p  -> matches "vcp" (gap 1) and "vp" (gap 0)
    //   — the v at ts 4 fails (a later v intervenes), the inner v at
    //   ts 6 starts its own match: the scan restarts AFTER a failed
    //   start, not after its whole window
    // user 2: p v c c  -> 0 matches, max_gap -1
    // user 3: same ts everywhere — event_id is the tiebreak: order
    //   (10,'v'), (11,'c'), (12,'p') matches once
    val df = Seq(
      (1L, 1L, 1L, "v"), (1L, 2L, 2L, "c"), (1L, 3L, 3L, "p"),
      (1L, 4L, 4L, "v"), (1L, 5L, 5L, "e"), (1L, 6L, 6L, "v"),
      (1L, 7L, 7L, "p"),
      (2L, 1L, 1L, "p"), (2L, 2L, 2L, "v"), (2L, 3L, 3L, "c"),
      (2L, 4L, 4L, "c"),
      (3L, 5L, 12L, "p"), (3L, 5L, 10L, "v"), (3L, 5L, 11L, "c"))
      .toDF("user", "ts", "eid", "sym")
    val out = Mining.eventPatterns(df, col("user"), col("ts"), col("eid"),
        col("sym"), "v[^vp]*p")
      .as[(Long, Long, Long, Long)].collect()
      .map { case (k, n, m, g) => k -> ((n, m, g)) }.toMap
    assert(out(1L) == ((7L, 2L, 1L)))
    assert(out(2L) == ((4L, 0L, -1L)))
    assert(out(3L) == ((3L, 1L, 1L)))
  }

  test("timedSteps equals a driver reference scan on random streams (r12 item 4)") {
    // reference: per key in (ts, eid) order, each event's step-i
    // completion is computed from the PRE-event last completions
    // (strictly-before), then all of the event's completions commit —
    // the exact chained-window semantics, replayed imperatively
    def ref(
        rows: Seq[(Long, Long, Long, String)],
        steps: Seq[String], budgets: Seq[Long]): Set[(Long, Long, Long, Long, Long)] = {
      val k = steps.size
      rows.groupBy(_._1).flatMap { case (key, rs) =>
        val lastC = Array.fill[Option[(Long, Long, Long)]](k + 1)(None)
        val out = Seq.newBuilder[(Long, Long, Long, Long, Long)]
        rs.sortBy(r => (r._2, r._3)).foreach { case (_, ts, eid, sym) =>
          val comps = (1 to k).flatMap { i =>
            if (sym != steps(i - 1)) None
            else if (i == 1) Some(i -> ((ts, ts, eid)))
            else lastC(i - 1).collect {
              case (pt, pt0, pid0) if ts - pt <= budgets(i - 2) =>
                i -> ((ts, pt0, pid0))
            }
          }
          comps.find(_._1 == k).foreach { case (_, (t, t0, id0)) =>
            out += ((key, eid, id0, ts - t0, ts - lastC(k - 1).get._1))
          }
          comps.foreach { case (i, c) => lastC(i) = Some(c) }
        }
        out.result()
      }.toSet
    }
    val rnd = new scala.util.Random(31)
    val syms = "vcpo"
    for ((steps, budgets) <- Seq(
        (Seq("v", "c", "p"), Seq(40L, 70L)),
        (Seq("v", "v", "p"), Seq(50L, 50L)),  // duplicate step symbols
        (Seq("o", "c", "c", "p"), Seq(30L, 30L, 30L)))) {
      val rows = (1 to 600).map { i =>
        (rnd.nextInt(7).toLong, rnd.nextInt(80).toLong * 5L, i.toLong,
          syms(rnd.nextInt(4)).toString)
      }
      val got = Mining.timedSteps(rows.toDF("k", "ts", "eid", "sym"),
          col("k"), col("ts"), col("eid"), col("sym"), steps, budgets)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      val want = ref(rows, steps, budgets)
      assert(got == want, s"steps $steps: ${got.size} vs ${want.size}")
      assert(want.nonEmpty, s"steps $steps: degenerate trial, no matches")
    }
  }

  test("timedSteps: last-touch sharing, budget bites per transition") {
    // v@0, c@10, p@20, p@60: both purchases complete on the SAME
    // view->click prefix (last-touch — completions share chains)
    val df = Seq(
      (1L, 0L, 1L, "v"), (1L, 10L, 2L, "c"), (1L, 20L, 3L, "p"),
      (1L, 60L, 4L, "p"),
      // step-1 budget bites: click 100 ticks after the view
      (2L, 0L, 1L, "v"), (2L, 100L, 2L, "c"), (2L, 110L, 3L, "p"),
      // step-2 budget bites: purchase 100 ticks after the click
      (3L, 0L, 1L, "v"), (3L, 10L, 2L, "c"), (3L, 110L, 3L, "p"))
      .toDF("k", "ts", "eid", "sym")
    val got = Mining.timedSteps(df, col("k"), col("ts"), col("eid"),
        col("sym"), Seq("v", "c", "p"), Seq(50L, 50L))
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 3L, 1L, 20L, 10L),
      (1L, 4L, 1L, 60L, 50L)))
    // a later click OUTSIDE the view budget does not re-open the
    // chain, and the purchase's gap measures from the last VALID
    // step-2 completion (c@10, 100 ticks back) — still no completion
    val redo = Seq(
      (3L, 0L, 1L, "v"), (3L, 10L, 2L, "c"), (3L, 80L, 4L, "c"),
      (3L, 110L, 3L, "p"))
      .toDF("k", "ts", "eid", "sym")
    assert(Mining.timedSteps(redo, col("k"), col("ts"), col("eid"),
      col("sym"), Seq("v", "c", "p"), Seq(50L, 50L)).isEmpty)
    // parameter contract
    val e = intercept[IllegalArgumentException] {
      Mining.timedSteps(df, col("k"), col("ts"), col("eid"),
        col("sym"), Seq("v"), Seq.empty)
    }
    assert(e.getMessage.contains("steps"))
  }

  test("classSteps equals a driver reference with per-transition blockers; empty classes == timedSteps") {
    // reference: the timedSteps scan plus per-transition blocker
    // tracking — a completion survives iff no blocker index lies
    // strictly after its predecessor completion's index (the event's
    // own symbol never blocks itself: blockers commit after)
    def ref(
        rows: Seq[(Long, Long, Long, String)], steps: Seq[String],
        classes: Seq[Seq[String]], budgets: Seq[Long])
        : Set[(Long, Long, Long, Long, Long)] = {
      val k = steps.size
      rows.groupBy(_._1).flatMap { case (key, rs) =>
        // lastC(i) = (ts, idx, t0, id0) of step i's latest completion
        val lastC = Array.fill[Option[(Long, Long, Long, Long)]](k + 1)(None)
        val lastB = Array.fill[Option[Long]](k - 1)(None)
        val out = Seq.newBuilder[(Long, Long, Long, Long, Long)]
        rs.sortBy(r => (r._2, r._3)).zipWithIndex.foreach {
          case ((_, ts, eid, sym), i0) =>
            val idx = i0 + 1L
            val comps = (1 to k).flatMap { i =>
              if (sym != steps(i - 1)) None
              else if (i == 1) Some(i -> ((ts, idx, ts, eid)))
              else lastC(i - 1).collect {
                case (pt, pidx, pt0, pid0)
                    if ts - pt <= budgets(i - 2) &&
                      lastB(i - 2).forall(_ <= pidx) =>
                  i -> ((ts, idx, pt0, pid0))
              }
            }
            comps.find(_._1 == k).foreach { case (_, (t, _, t0, id0)) =>
              out += ((key, eid, id0, ts - t0, ts - lastC(k - 1).get._1))
            }
            comps.foreach { case (i, c) => lastC(i) = Some(c) }
            classes.zipWithIndex.foreach { case (cls, j) =>
              if (cls.contains(sym)) lastB(j) = Some(idx)
            }
        }
        out.result()
      }.toSet
    }
    val rnd = new scala.util.Random(47)
    val syms = "vcpsx"
    for ((steps, classes, budgets) <- Seq(
        (Seq("v", "c", "p"), Seq(Seq("s"), Seq("s", "v")), Seq(40L, 70L)),
        (Seq("v", "c", "p"), Seq(Seq.empty[String], Seq.empty[String]),
          Seq(40L, 70L)), // degenerate: == timedSteps
        (Seq("v", "v", "p"), Seq(Seq("x"), Seq("c")), Seq(50L, 50L)),
        (Seq("x", "c", "c", "p"),
          Seq(Seq("v"), Seq("s", "x"), Seq("v", "s")),
          Seq(30L, 30L, 30L)))) {
      val rows = (1 to 700).map { i =>
        (rnd.nextInt(7).toLong, rnd.nextInt(90).toLong * 5L, i.toLong,
          syms(rnd.nextInt(5)).toString)
      }
      val got = Mining.classSteps(rows.toDF("k", "ts", "eid", "sym"),
          col("k"), col("ts"), col("eid"), col("sym"),
          steps, classes, budgets)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      val want = ref(rows, steps, classes, budgets)
      assert(got == want, s"steps $steps classes $classes: " +
        s"${got.size} vs ${want.size}")
      assert(want.nonEmpty, s"steps $steps: degenerate trial, no matches")
      if (classes.forall(_.isEmpty)) {
        val ts = Mining.timedSteps(rows.toDF("k", "ts", "eid", "sym"),
            col("k"), col("ts"), col("eid"), col("sym"), steps, budgets)
          .as[(Long, Long, Long, Long, Long)].collect().toSet
        assert(got == ts, "empty classes must degenerate to timedSteps")
      }
    }
  }

  test("classSteps: blockers kill strictly-between only; one Exchange; contract errors") {
    // key 1: clean v->c->p; key 2: signup BETWEEN v and c kills it;
    // key 3: signup BEFORE the view is harmless; key 4: a fresh view
    // between c and p kills transition 2 (class 2 = {s, v}) — but a
    // signup between v and c only blocks transition 1
    val df = Seq(
      (1L, 0L, 1L, "v"), (1L, 10L, 2L, "c"), (1L, 20L, 3L, "p"),
      (2L, 0L, 1L, "v"), (2L, 5L, 2L, "s"), (2L, 10L, 3L, "c"),
      (2L, 20L, 4L, "p"),
      (3L, 0L, 1L, "s"), (3L, 5L, 2L, "v"), (3L, 10L, 3L, "c"),
      (3L, 20L, 4L, "p"),
      (4L, 0L, 1L, "v"), (4L, 10L, 2L, "c"), (4L, 15L, 3L, "v"),
      (4L, 20L, 4L, "p"))
      .toDF("k", "ts", "eid", "sym")
    val got = Mining.classSteps(df, col("k"), col("ts"), col("eid"),
        col("sym"), Seq("v", "c", "p"),
        Seq(Seq("s"), Seq("s", "v")), Seq(50L, 50L))
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 3L, 1L, 20L, 10L),
      (3L, 4L, 2L, 15L, 10L)))
    // the fresh view at key 4 blocks the OLD chain but starts a new
    // one: a later click+purchase completes from it
    val resumed = df.union(Seq(
      (4L, 25L, 5L, "c"), (4L, 30L, 6L, "p")).toDF("k", "ts", "eid", "sym"))
    val got2 = Mining.classSteps(resumed, col("k"), col("ts"), col("eid"),
        col("sym"), Seq("v", "c", "p"),
        Seq(Seq("s"), Seq("s", "v")), Seq(50L, 50L))
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got2.contains((4L, 6L, 3L, 15L, 5L)))
    // PLAN PIN: one key shuffle — every completion and blocker window
    // shares the (key, ts, tb) partition/sort; no per-key collect
    val q = Mining.classSteps(df, col("k"), col("ts"), col("eid"),
      col("sym"), Seq("v", "c", "p"),
      Seq(Seq("s"), Seq("s", "v")), Seq(50L, 50L))
    val plan = q.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
    assert(!plan.contains("collect_list") && !plan.contains("CollectList"))
    // contract errors name the offending parameter
    assert(intercept[IllegalArgumentException] {
      Mining.classSteps(df, col("k"), col("ts"), col("eid"),
        col("sym"), Seq("v", "c", "p"), Seq(Seq("s")), Seq(50L, 50L))
    }.getMessage.contains("gap classes"))
    assert(intercept[IllegalArgumentException] {
      Mining.classSteps(df, col("k"), col("ts"), col("eid"),
        col("sym"), Seq("v", "c", "p"),
        Seq(Seq("s"), Seq("s", "v")), Seq(50L))
    }.getMessage.contains("budgets"))
  }

  test("timedMatches: window rule == collect+regex == streaming automaton; time bound bites") {
    val rnd = new scala.util.Random(77)
    val syms = "vcpse"
    val rows = (1 to 500).map { i =>
      (rnd.nextInt(9).toLong, rnd.nextInt(60).toLong * 10L, i.toLong,
        syms(rnd.nextInt(5)).toString)
    }
    val df = rows.toDF("k", "ts", "eid", "sym")
    // unbounded time budget: the pure-window matches must agree with
    // the regex operator per key on count and max gap
    val win = Mining.timedMatches(df, col("k"), col("ts"), col("eid"),
        col("sym"), "v", "p", Long.MaxValue)
      .as[(Long, Long, Long, Long, Long)].collect()
    val perKey = win.groupBy(_._1).view
      .mapValues(ms => (ms.length.toLong, ms.map(_._3).max)).toMap
    val rx = Mining.eventPatterns(df, col("k"), col("ts"), col("eid"),
        col("sym"), "v[^vp]*p")
      .as[(Long, Long, Long, Long)].collect()
    rx.foreach { case (k, _, nm, mg) =>
      val (wn, wg) = perKey.getOrElse(k, (0L, -1L))
      assert(wn == nm, s"key $k window $wn vs regex $nm matches")
      if (nm > 0) assert(wg == mg, s"key $k window $wg vs regex $mg gap")
    }
    // ... and with the streaming automaton's per-match rows
    import graft.streaming.EventStreams
    implicit val sqlCtx = spark.sqlContext
    val typed = rows.map { case (k, ts, id, s) =>
      EventStreams.Event(id, ts, k, s match {
        case "v" => "view"; case "p" => "purchase"; case x => x
      }, 0.0)
    }
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[EventStreams.Event]
    mem.addData(typed: _*)
    val q = EventStreams.patternMatches(mem.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("tmout").start()
    q.processAllAvailable(); q.stop()
    val st = spark.table("tmout").as[EventStreams.PatternOut]
      .collect().map(r => (r.user_id, r.end_event_id, r.gap)).toSet
    assert(st == win.map(m => (m._1, m._2, m._3)).toSet,
      "streaming automaton and window rule disagree")
    // the time budget excludes slow conversions: v at 0, p at 100
    // ticks with budget 50 — armed but too late
    val slow = Seq((1L, 0L, 1L, "v"), (1L, 100L, 2L, "p")).toDF("k", "ts", "eid", "sym")
    assert(Mining.timedMatches(slow, col("k"), col("ts"), col("eid"),
      col("sym"), "v", "p", 50L).isEmpty)
    assert(Mining.timedMatches(slow, col("k"), col("ts"), col("eid"),
      col("sym"), "v", "p", 100L).count() == 1)
    // ... and the streaming automaton honors the same budget (the
    // fire still DISARMS — a later p cannot pair with the stale v)
    val mem2 = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[EventStreams.Event]
    mem2.addData(
      EventStreams.Event(1, 0L, 1L, "view", 0.0),
      EventStreams.Event(2, 100L, 1L, "purchase", 0.0),
      EventStreams.Event(3, 200L, 1L, "purchase", 0.0))
    val q2 = EventStreams.patternMatches(mem2.toDS(), maxGapUs = 50L)
      .writeStream.outputMode("append").format("memory")
      .queryName("tmout2").start()
    q2.processAllAvailable(); q2.stop()
    assert(spark.table("tmout2").isEmpty)
  }

  // --- pattern -> window compiler (r13 judge item 5) ---

  test("compilePattern parses the uniform-gap-class grammar and rejects the rest") {
    assert(Mining.compilePattern("v[^vp]*p") == ((Seq("v", "p"), Seq())))
    assert(Mining.compilePattern("a[^asfr]*s[^asfr]*f") ==
      ((Seq("a", "s", "f"), Seq("r"))))
    assert(Mining.compilePattern("a[^rafsb]*f[^rafsb]*s[^rafsb]*b") ==
      ((Seq("a", "f", "s", "b"), Seq("r"))))
    for (bad <- Seq(
        "v",                 // one atom
        "ab",                // missing gap class
        "v[^vp]*v",          // duplicate atoms
        "a[^ab]*b[^bc]*c",   // non-uniform classes
        "a[^x]*b",           // class missing the atoms (no end-pinning)
        "a[^ab*b",           // unterminated class
        "a[^ab]b"))          // missing '*'
      withClue(bad) {
        intercept[IllegalArgumentException](Mining.compilePattern(bad))
      }
  }

  test("compiledMatches == the non-overlapping regex scan on random streams (untimed)") {
    val rnd = new scala.util.Random(53)
    for ((pattern, alphabet) <- Seq(
        ("v[^vp]*p", "vcpo"),             // the q_event_pattern member
        ("a[^asfr]*s[^asfr]*f", "asfrxy"),// arm/step/fire + reset
        ("a[^abcdr]*b[^abcdr]*c[^abcdr]*d", "abcdrx"))) {
      val (steps, resets) = Mining.compilePattern(pattern)
      val rows = (1 to 700).map { i =>
        (rnd.nextInt(8).toLong, rnd.nextInt(90).toLong * 3L, i.toLong,
          alphabet(rnd.nextInt(alphabet.length)).toString)
      }
      val got = Mining.compiledMatches(rows.toDF("k", "ts", "eid", "sym"),
          col("k"), col("ts"), col("eid"), col("sym"), steps, resets)
        .as[(Long, Long, Long, Long)].collect().toSet
      // reference: per-key symbol string in (ts, eid) order, JDK
      // non-overlapping scan; anchors recovered from match offsets
      val want = rows.groupBy(_._1).flatMap { case (key, rs) =>
        val ordered = rs.sortBy(r => (r._2, r._3))
        val str = ordered.map(_._4).mkString
        pattern.r.findAllMatchIn(str).map { m =>
          val (_, ts0, id0, _) = ordered(m.start)
          val (_, ts1, id1, _) = ordered(m.end - 1)
          (key, id1, id0, ts1 - ts0)
        }
      }.toSet
      assert(got == want, s"$pattern: ${got.size} vs ${want.size}")
      assert(want.nonEmpty, s"$pattern: degenerate trial")
    }
  }

  test("compiledMatches with budgets == a driver replay of the lag rule; == timedMatches for arm/fire") {
    val rnd = new scala.util.Random(71)
    def ref(rows: Seq[(Long, Long, Long, String)], steps: Seq[String],
        resets: Seq[String], budgets: Seq[Long]): Set[(Long, Long, Long, Long)] = {
      val k = steps.size
      val sig = (steps ++ resets).toSet
      rows.filter(r => sig(r._4)).groupBy(_._1).flatMap { case (key, rs) =>
        val out = Seq.newBuilder[(Long, Long, Long, Long)]
        // completions of the PREVIOUS significant event, by level
        var prev = Array.fill[Option[(Long, Long, Long)]](k + 1)(None)
        rs.sortBy(r => (r._2, r._3)).foreach { case (_, ts, eid, sym) =>
          val cur = Array.fill[Option[(Long, Long, Long)]](k + 1)(None)
          val i = steps.indexOf(sym) + 1
          if (i == 1) cur(1) = Some((ts, ts, eid))
          else if (i >= 2) prev(i - 1).foreach { case (pt, pt0, pid0) =>
            if (ts - pt <= budgets(i - 2)) cur(i) = Some((ts, pt0, pid0))
          }
          cur(k).foreach { case (_, t0, id0) => out += ((key, eid, id0, ts - t0)) }
          prev = cur
        }
        out.result()
      }.toSet
    }
    val (steps, resets) = (Seq("a", "s", "f"), Seq("r"))
    val budgets = Seq(6L, 9L)
    val rows = (1 to 800).map { i =>
      (rnd.nextInt(8).toLong, rnd.nextInt(100).toLong * 3L, i.toLong,
        "asfrxy" (rnd.nextInt(6)).toString)
    }
    val got = Mining.compiledMatches(rows.toDF("k", "ts", "eid", "sym"),
        col("k"), col("ts"), col("eid"), col("sym"), steps, resets, budgets)
      .as[(Long, Long, Long, Long)].collect().toSet
    val want = ref(rows, steps, resets, budgets)
    assert(got == want && want.nonEmpty)
    // budget actually bites: the untimed run finds strictly more
    val untimed = Mining.compiledMatches(rows.toDF("k", "ts", "eid", "sym"),
        col("k"), col("ts"), col("eid"), col("sym"), steps, resets)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(untimed.size > got.size)
    // the 2-atom budgeted member degenerates to timedMatches
    val rows2 = (1 to 500).map { i =>
      (rnd.nextInt(6).toLong, rnd.nextInt(60).toLong * 5L, i.toLong,
        "vpo" (rnd.nextInt(3)).toString)
    }
    val viaCompiler = Mining.compiledMatches(rows2.toDF("k", "ts", "eid", "sym"),
        col("k"), col("ts"), col("eid"), col("sym"),
        Seq("v", "p"), Seq(), Seq(55L))
      .as[(Long, Long, Long, Long)].collect().toSet
    val viaTimed = Mining.timedMatches(rows2.toDF("k", "ts", "eid", "sym"),
        col("k"), col("ts"), col("eid"), col("sym"), "v", "p", 55L)
      .select(col("key"), col("end_id"), col("start_id"), col("gap_ticks"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(viaCompiler == viaTimed && viaTimed.nonEmpty)
  }

  test("compiledMatches: consuming semantics, resets kill chains; one Exchange, no collect") {
    // a s f | a r s f | a s s f — match, reset-killed, stray-step-killed
    val df = Seq(
      (1L, 1L, 1L, "a"), (1L, 2L, 2L, "x"), (1L, 3L, 3L, "s"), (1L, 4L, 4L, "f"),
      (2L, 1L, 5L, "a"), (2L, 2L, 6L, "r"), (2L, 3L, 7L, "s"), (2L, 4L, 8L, "f"),
      (3L, 1L, 9L, "a"), (3L, 2L, 10L, "s"), (3L, 3L, 11L, "s"), (3L, 4L, 12L, "f"))
      .toDF("k", "ts", "eid", "sym")
    val out = Mining.patternMatches(df, col("k"), col("ts"), col("eid"),
      col("sym"), "a[^asfr]*s[^asfr]*f")
    val got = out.as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 4L, 1L, 3L)))
    // plan: exactly one shuffle (the key window), no per-key collect
    val plan = out.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
    assert(!plan.contains("collect_list") && !plan.contains("CollectList"))
  }

  test("jaccardPairs is exact-recall: equals brute force, finds what banding may miss") {
    // docs built from word 1-grams so set arithmetic is hand-checkable
    def doc(words: String*): String = words.mkString(" ")
    val docs = Seq(
      // A and B: |A|=4, |B|=4, shared 2 -> J = 2/6 = 1/3 exactly (edge)
      (1L, doc("a", "b", "c", "d")),
      (2L, doc("c", "d", "e", "f")),
      // C and D: shared 1 of 4+4 -> J = 1/7 < 1/3
      (3L, doc("g", "h", "i", "j")),
      (4L, doc("j", "k", "l", "m")),
      // E duplicates A exactly -> within-class pair at jaccard 1.0,
      // and E pairs with B at the same 1/3
      (5L, doc("a", "b", "c", "d"))).toDF("doc_id", "text")
    val out = TextAnalysis.jaccardPairs(docs, col("doc_id"), col("text"),
        n = 1, simNum = 1, simDen = 3)
      .as[(Long, Long, Double)].collect().toSet
    assert(out == Set(
      (1L, 2L, 1.0 / 3.0), (2L, 5L, 1.0 / 3.0), (1L, 5L, 1.0)))
  }

  test("collocations scores adjacent bigrams by the phrase formula") {
    // "a b a b": (a,b) twice, (b,a) once; "b c": (b,c) once;
    // T = 6 tokens, n_a = 2, n_b = 3, n_c = 1; empty/one-token docs
    // contribute no pairs and (for the empty one) no tokens
    val docs = Seq((1L, "a b a b"), (2L, "b c"), (3L, ""), (4L, "x"))
      .toDF("doc_id", "text")
    val all = TextAnalysis.collocations(docs, col("text"),
        minCount = 1, discount = 0)
      .as[(String, String, Long, Long, Long, Long, Double)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    // T counts the x too: 6 + 1 = 7
    assert(all(("a", "b")) == (("a", "b", 2L, 2L, 3L, 7L, 2L * 7L / (2.0 * 3.0))))
    assert(all(("b", "a")) == (("b", "a", 1L, 3L, 2L, 7L, 1L * 7L / (3.0 * 2.0))))
    assert(all(("b", "c")) == (("b", "c", 1L, 3L, 1L, 7L, 1L * 7L / (3.0 * 1.0))))
    assert(all.size == 3)
    // minCount prunes, discount shifts the numerator
    val pruned = TextAnalysis.collocations(docs, col("text"),
        minCount = 2, discount = 1)
      .as[(String, String, Long, Long, Long, Long, Double)].collect()
    assert(pruned.toSeq == Seq(("a", "b", 2L, 2L, 3L, 7L, (2L - 1L) * 7L / (2.0 * 3.0))))
  }

  test("jaccardPairs matches a driver brute force on a mixed corpus") {
    val words = Seq("w0", "w1", "w2", "w3", "w4", "w5", "w6", "w7")
    // deterministic synthetic docs: doc i holds words i..i+3 mod 8
    val docs = (0 until 12).map { i =>
      (i.toLong, (0 until 4).map(j => words((i + j) % 8)).mkString(" "))
    }.toDF("doc_id", "text")
    val got = TextAnalysis.jaccardPairs(docs, col("doc_id"), col("text"),
        n = 1, simNum = 2, simDen = 5)
      .as[(Long, Long, Double)].collect().toSet
    val sets = (0 until 12).map { i =>
      i.toLong -> (0 until 4).map(j => words((i + j) % 8)).toSet
    }.toMap
    val want = (for {
      a <- sets.keys; b <- sets.keys if a < b
      c = (sets(a) & sets(b)).size
      u = (sets(a) | sets(b)).size
      if c * 5 >= 2 * u
    } yield (a, b, c.toDouble / u)).toSet
    assert(got == want)
  }
}
