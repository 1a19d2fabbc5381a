package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.EventStreams
import graft.streaming.EventStreams.{Event, FunnelOut, KmvOut, SessionOut}

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("streaming windowed agg matches batch twin on the same data") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, String, Double)]
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(min: Int) = new java.sql.Timestamp(base.getTime + min * 60000L)
    val rows = Seq(
      (1L, at(5), "click", 1.0), (2L, at(10), "click", 2.0),
      (3L, at(70), "view", 3.0))
    mem.addData(rows: _*)
    val df = mem.toDF().toDF("event_id", "ts", "event_type", "value")
    val q = EventStreams.windowedAgg(df, "10 minutes", "1 hour")
      .writeStream.outputMode("complete").format("memory").queryName("winagg").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("winagg")
      .select(col("window.start").cast("long"), $"event_type", $"n", $"v")
      .as[(Long, String, Long, Double)].collect().toSet
    val t0 = base.getTime / 1000
    assert(got == Set((t0, "click", 2L, 3.0), (t0 + 3600, "view", 1L, 3.0)))
    // twin equivalence: the SAME transform over the same prefix as a
    // batch frame (watermark is a no-op in batch) yields the same set
    val batch = EventStreams.windowedAgg(
      rows.toDF("event_id", "ts", "event_type", "value"), "10 minutes", "1 hour")
      .select(col("window.start").cast("long"), $"event_type", $"n", $"v")
      .as[(Long, String, Long, Double)].collect().toSet
    assert(got == batch)
  }

  test("streaming sessionize closes sessions on gap") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val us = 1000000L
    mem.addData(
      Event(1, 0L * us, 7L, "click", 1.0),
      Event(2, 60L * us, 7L, "click", 1.0),
      Event(3, 5000L * us, 7L, "view", 1.0)) // gap > 30 min closes session 1
    val out = EventStreams.sessionize(mem.toDS(), gapUs = 1800L * us, timeoutMs = 0)
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("sessout").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("sessout").as[SessionOut].collect().toSet
    assert(got == Set(SessionOut(7L, 0L, 60L * us, 2L)))
  }

  test("streaming funnel advances per-user stage across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val us = 1000000L
    val out = EventStreams.funnel(mem.toDS(), "view", "click", "purchase")
    val q = out.writeStream.outputMode("update").format("memory")
      .queryName("funout").start()
    // batch 1: user 7 views; user 8 clicks with no prior view
    mem.addData(
      Event(1, 10L * us, 7L, "view", 1.0),
      Event(2, 10L * us, 8L, "click", 1.0))
    q.processAllAvailable()
    // batch 2: user 7 clicks then purchases (in-batch order by ts);
    // user 8 views — click arrived earlier so stage stays 1
    mem.addData(
      Event(3, 20L * us, 7L, "click", 1.0),
      Event(4, 30L * us, 7L, "purchase", 1.0),
      Event(5, 20L * us, 8L, "view", 1.0))
    q.processAllAvailable(); q.stop()
    val last = spark.table("funout").as[FunnelOut].collect()
      .groupBy(_.user_id).map { case (u, rows) => u -> rows.map(_.stage).max }
    assert(last == Map(7L -> 3, 8L -> 1))
  }

  test("streaming KMV distinct equals the batch sketch over the same prefix") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val us = 1000000L
    val out = EventStreams.kmvDistinct(mem.toDS(), k = 8)
    val q = out.writeStream.outputMode("update").format("memory")
      .queryName("kmvout").start()
    val batch1 = (1 to 20).map(i => Event(i, i * us, (i % 25).toLong, "click", 1.0))
    val batch2 = (21 to 40).map(i => Event(i, i * us, ((i * 7) % 100).toLong, "click", 1.0))
    mem.addData(batch1: _*)
    q.processAllAvailable()
    mem.addData(batch2: _*)
    q.processAllAvailable(); q.stop()
    val rows = spark.table("kmvout").as[KmvOut].collect()
    val streamed = rows.maxBy(_.n_seen) // final state after both batches
    assert(streamed.n_seen == 40L && streamed.state_size == 8)
    val batchEst = (batch1 ++ batch2).toDF()
      .agg(graft.functions.KMinValues.kmvDistinct(col("user_id"), 8))
      .head().getDouble(0)
    assert(streamed.est_users == batchEst,
      s"stream ${streamed.est_users} != batch $batchEst")
  }

  test("streaming top-k: exact below capacity, SpaceSaving eviction above") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val us = 1000000L
    val out = EventStreams.topkHeavyHitters(mem.toDS(), k = 2, report = 2)
    val q = out.writeStream.outputMode("update").format("memory")
      .queryName("topkout").start()
    // batch 1: users 1×3, 2×2 — fits k=2 exactly
    mem.addData(
      Event(1, 1L * us, 1L, "click", 0), Event(2, 2L * us, 1L, "click", 0),
      Event(3, 3L * us, 1L, "click", 0), Event(4, 4L * us, 2L, "click", 0),
      Event(5, 5L * us, 2L, "click", 0))
    q.processAllAvailable()
    val afterB1 = spark.table("topkout").as[EventStreams.TopKOut]
      .collect().maxBy(_.n_seen)
    assert(afterB1.top_users == Seq(1L, 2L) && afterB1.top_counts == Seq(3L, 2L)
      && afterB1.n_seen == 5L, s"exact phase wrong: $afterB1")
    // batch 2: ONE event for unseen user 9 → evicts min counter
    // (user 2, count 2); user 9 inherits count 2+1 = 3
    mem.addData(Event(6, 6L * us, 9L, "click", 0))
    q.processAllAvailable(); q.stop()
    val afterB2 = spark.table("topkout").as[EventStreams.TopKOut]
      .collect().maxBy(_.n_seen)
    assert(afterB2.top_users == Seq(1L, 9L) && afterB2.top_counts == Seq(3L, 3L)
      && afterB2.n_seen == 6L, s"eviction phase wrong: $afterB2")
  }

  test("streaming upsert state equals batch latest-per-key, independent of arrival order") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val us = 1000000L
    val out = EventStreams.upsertLatest(mem.toDS())
    val q = out.writeStream.outputMode("update").format("memory")
      .queryName("upsout").start()
    // batch 1 delivers the NEWER rows first; batch 2 the older ones —
    // the (ts, id) order must win, not arrival order
    mem.addData(
      Event(10, 50L * us, 1L, "purchase", 9.0),
      Event(11, 40L * us, 2L, "view", 2.0))
    q.processAllAvailable()
    mem.addData(
      Event(1, 10L * us, 1L, "view", 1.0),   // older → ignored
      Event(12, 40L * us, 2L, "click", 3.0)) // same ts, higher id → wins
    q.processAllAvailable(); q.stop()
    val last = spark.table("upsout").as[EventStreams.UpsertOut].collect()
      .groupBy(_.user_id).map { case (u, rows) => u -> rows.maxBy(_.event_id) }
    assert(last(1L).event_id == 10L && last(1L).event_type == "purchase")
    assert(last(2L).event_id == 12L && last(2L).event_type == "click")
  }

  test("streaming pattern automaton equals the batch regex, matches straddle batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val us = 1000000L
    val out = EventStreams.patternMatches(mem.toDS())
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("patout").start()
    // batch 1 (out of order in the batch — the (ts,id) sort applies):
    // user 1 stream so far: v c p  -> match ends at 3, gap 1;
    // then v e v — the re-arm: the second v resets the gap, exactly
    // where the regex scan restarts after the intervening v
    mem.addData(
      Event(3, 30L * us, 1L, "purchase", 0.0),
      Event(1, 10L * us, 1L, "view", 0.0),
      Event(2, 20L * us, 1L, "click", 0.0),
      Event(4, 40L * us, 1L, "view", 0.0),
      Event(5, 50L * us, 1L, "error", 0.0),
      Event(6, 60L * us, 1L, "view", 0.0))
    q.processAllAvailable()
    // batch 2: the p that closes the armed v from batch 1 — the match
    // emits from RECOVERED state, gap 0 (the re-arm reset it);
    // user 2 purchases without ever viewing: no match
    mem.addData(
      Event(7, 70L * us, 1L, "purchase", 0.0),
      Event(20, 20L * us, 2L, "purchase", 0.0))
    q.processAllAvailable(); q.stop()
    val got = spark.table("patout").as[EventStreams.PatternOut]
      .collect().map(r => r.end_event_id -> r.gap).toMap
    assert(got == Map(3L -> 1L, 7L -> 0L))
    // twin equivalence on the full prefix: the batch regex operator
    // over the same nine events agrees on n_matches and max_gap
    import spark.implicits._
    val batch = Seq(
      (1L, 10L, 1L, "v"), (1L, 20L, 2L, "c"), (1L, 30L, 3L, "p"),
      (1L, 40L, 4L, "v"), (1L, 50L, 5L, "e"), (1L, 60L, 6L, "v"),
      (1L, 70L, 7L, "p"), (2L, 20L, 20L, "p"))
      .toDF("user_id", "ts", "eid", "sym")
    val twin = graft.ops.Mining.eventPatterns(batch, col("user_id"),
        col("ts"), col("eid"), col("sym"), "v[^vp]*p")
      .select(col("key"), col("n_matches"), col("max_gap"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(twin(1L) == ((2L, 1L)) && twin(2L) == ((0L, -1L)))
    assert(got.size == twin(1L)._1 && got.values.max == twin(1L)._2)
  }

  test("streaming k-step automaton equals batch timedSteps; chains straddle batches") {
    implicit val sqlCtx = spark.sqlContext
    val steps = Seq("view", "click", "purchase")
    val budgets = Seq(25L, 30L)
    // random prefix equivalence: every completion the batch chained
    // windows find, the O(k)-state automaton finds, in one batch
    val rnd = new scala.util.Random(13)
    val types = Vector("view", "click", "purchase", "error")
    val evs = (1 to 400).map { i =>
      Event(i.toLong, rnd.nextInt(50).toLong * 7L, rnd.nextInt(6).toLong,
        types(rnd.nextInt(4)), 0.0)
    }
    val mem = MemoryStream[Event]
    mem.addData(evs: _*)
    val q = EventStreams.stepMatches(mem.toDS(), steps, budgets)
      .writeStream.outputMode("append").format("memory")
      .queryName("stepout").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("stepout").as[EventStreams.StepOut].collect()
      .map(r => (r.user_id, r.end_event_id, r.start_event_id,
        r.total_ticks, r.last_gap_ticks)).toSet
    val want = graft.ops.Mining.timedSteps(
        evs.map(e => (e.user_id, e.ts_us, e.event_id, e.event_type))
          .toDF("k", "ts", "eid", "sym"),
        col("k"), col("ts"), col("eid"), col("sym"), steps, budgets)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got == want, s"${got.size} stream vs ${want.size} batch")
    assert(want.nonEmpty, "degenerate trial — no completions")
    // a chain straddling micro-batches completes from recovered
    // state: view+click land in batch 1, the purchase in batch 2
    val mem2 = MemoryStream[Event]
    val q2 = EventStreams.stepMatches(mem2.toDS(), steps, budgets)
      .writeStream.outputMode("append").format("memory")
      .queryName("stepout2").start()
    mem2.addData(
      Event(1, 0L, 9L, "view", 0.0),
      Event(2, 10L, 9L, "click", 0.0))
    q2.processAllAvailable()
    mem2.addData(
      Event(3, 35L, 9L, "purchase", 0.0),  // within 30 of the click
      Event(4, 99L, 9L, "purchase", 0.0))  // past the budget: no emit
    q2.processAllAvailable(); q2.stop()
    val got2 = spark.table("stepout2").as[EventStreams.StepOut].collect()
    assert(got2.map(r =>
      (r.end_event_id, r.start_event_id, r.total_ticks)).toSeq ==
      Seq((3L, 1L, 35L)))
  }

  test("streaming classStepMatches equals batch classSteps; blockers straddle batches") {
    implicit val sqlCtx = spark.sqlContext
    val steps = Seq("view", "click", "purchase")
    val classes = Seq(Seq("signup"), Seq("signup", "view"))
    val budgets = Seq(25L, 30L)
    // random equivalence in one micro-batch, blockers included
    val rnd = new scala.util.Random(29)
    val types = Vector("view", "click", "purchase", "signup", "error")
    val evs = (1 to 500).map { i =>
      Event(i.toLong, rnd.nextInt(60).toLong * 7L, rnd.nextInt(6).toLong,
        types(rnd.nextInt(5)), 0.0)
    }
    val mem = MemoryStream[Event]
    mem.addData(evs: _*)
    val q = EventStreams.classStepMatches(mem.toDS(), steps, classes, budgets)
      .writeStream.outputMode("append").format("memory")
      .queryName("csout").start()
    q.processAllAvailable(); q.stop()
    def rows(name: String) = spark.table(name).as[EventStreams.StepOut]
      .collect()
      .map(r => (r.user_id, r.end_event_id, r.start_event_id,
        r.total_ticks, r.last_gap_ticks)).toSet
    val got = rows("csout")
    val want = graft.ops.Mining.classSteps(
        evs.map(e => (e.user_id, e.ts_us, e.event_id, e.event_type))
          .toDF("k", "ts", "eid", "sym"),
        col("k"), col("ts"), col("eid"), col("sym"), steps, classes, budgets)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got == want, s"${got.size} stream vs ${want.size} batch")
    assert(want.nonEmpty, "degenerate trial — no completions")
    // empty classes degenerate to stepMatches exactly
    val mem0 = MemoryStream[Event]
    mem0.addData(evs: _*)
    val q0 = EventStreams.classStepMatches(
        mem0.toDS(), steps, Seq(Seq.empty, Seq.empty), budgets)
      .writeStream.outputMode("append").format("memory")
      .queryName("csout0").start()
    q0.processAllAvailable(); q0.stop()
    val memS = MemoryStream[Event]
    memS.addData(evs: _*)
    val qS = EventStreams.stepMatches(memS.toDS(), steps, budgets)
      .writeStream.outputMode("append").format("memory")
      .queryName("csoutS").start()
    qS.processAllAvailable(); qS.stop()
    assert(rows("csout0") == rows("csoutS"))
    // a blocker in batch 1 kills a chain whose completion arrives in
    // batch 2 — the blocker POSITION survives the micro-batch
    // boundary; a fresh view in batch 2 then restarts the chain
    val mem2 = MemoryStream[Event]
    val q2 = EventStreams.classStepMatches(mem2.toDS(), steps, classes, budgets)
      .writeStream.outputMode("append").format("memory")
      .queryName("csout2").start()
    mem2.addData(
      Event(1, 0L, 9L, "view", 0.0),
      Event(2, 5L, 9L, "signup", 0.0))   // blocks view->click
    q2.processAllAvailable()
    mem2.addData(
      Event(3, 10L, 9L, "click", 0.0),   // blocked by the signup
      Event(4, 20L, 9L, "purchase", 0.0)) // no chain to complete
    q2.processAllAvailable()
    mem2.addData(
      Event(5, 30L, 9L, "view", 0.0),
      Event(6, 40L, 9L, "click", 0.0),
      Event(7, 60L, 9L, "purchase", 0.0)) // clean chain completes
    q2.processAllAvailable(); q2.stop()
    val got2 = spark.table("csout2").as[EventStreams.StepOut].collect()
    assert(got2.map(r =>
      (r.end_event_id, r.start_event_id, r.total_ticks)).toSeq ==
      Seq((7L, 5L, 30L)))
  }

  test("streaming retractAgg equals batch stateZSum per prefix, any arrival order") {
    implicit val sqlCtx = spark.sqlContext
    import graft.ops.Incremental
    import graft.streaming.EventStreams.{ZRow, ZSumOut}
    val rnd = new scala.util.Random(23)
    // random signed stream with duplicate values and DELETE-FIRST
    // arrivals (every 5th row retracts a value inserted later)
    val all = (0 until 300).map { i =>
      ZRow(s"k${i % 4}", (rnd.nextInt(40)).toDouble / 2.0,
        if (i % 3 == 0) -1L else 1L)
    }
    val (b1, b2) = all.splitAt(140)
    val mem = MemoryStream[ZRow]
    val q = EventStreams.retractAgg(mem.toDS())
      .writeStream.outputMode("update").format("memory")
      .queryName("zout").start()
    mem.addData(b1: _*)
    q.processAllAvailable()
    // prefix check after batch 1
    def latest(): Map[String, (Long, Long)] =
      spark.table("zout").as[ZSumOut].collect()
        .groupBy(_.key).map { case (k, rs) =>
          val last = rs.maxBy(_.version)
          k -> ((last.n, last.sum_cents))
        }
    def batchState(rows: Seq[ZRow]): Map[String, (Long, Long)] =
      Incremental.stateZSum(
          rows.toDF("k", "v", "m"), col("k"), col("v"), col("m"))
        .select(col("k"), col("n"),
          (col("sum_v") * 100).cast("long").as("cents"))
        .as[(String, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
    val p1 = latest().filter { case (_, (n, c)) => n != 0L || c != 0L }
    assert(p1 == batchState(b1), "prefix 1 diverged")
    mem.addData(b2: _*)
    q.processAllAvailable(); q.stop()
    val p2 = latest().filter { case (_, (n, c)) => n != 0L || c != 0L }
    assert(p2 == batchState(all), "full stream diverged")
    assert(p2.nonEmpty)
  }

  test("streaming compiledMatches equals batch compiler; chains straddle batches; resets kill") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.EventStreams.CompiledOut
    val us = 1000000L
    val (steps, resets) = graft.ops.Mining.compilePattern("v[^vcps]*c[^vcps]*p")
    val budgets = Seq(30L * us, 50L * us)
    // random in-order streams (the batch (ts, id) order == arrival
    // order, the stated cross-batch trade), split mid-chain
    val rnd = new scala.util.Random(83)
    val syms = Vector("v", "c", "p", "s", "e", "x")
    val all = (1 to 600).map { i =>
      graft.streaming.EventStreams.Event(
        i.toLong, i.toLong * 7L * us, rnd.nextInt(6).toLong,
        syms(rnd.nextInt(6)), 0.0)
    }.sortBy(e => (e.ts_us, e.event_id))
    val (b1, b2) = all.splitAt(280)
    val mem = MemoryStream[graft.streaming.EventStreams.Event]
    val q = graft.streaming.EventStreams
      .compiledMatches(mem.toDS(), steps, resets, budgets)
      .writeStream.outputMode("append").format("memory")
      .queryName("cmout").start()
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable(); q.stop()
    val got = spark.table("cmout").as[CompiledOut].collect()
      .map(o => (o.user_id, o.end_event_id, o.start_event_id, o.total_ticks))
      .toSet
    val want = graft.ops.Mining.compiledMatches(
        all.toDF(), col("user_id"), col("ts_us"), col("event_id"),
        col("event_type"), steps, resets, budgets)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == want && want.nonEmpty, s"${got.size} vs ${want.size}")
    // a chain straddling micro-batches completed (some match's start
    // is in batch 1 and end in batch 2)
    val lastB1 = b1.last.event_id
    assert(want.exists(m => m._3 <= lastB1 && m._2 > lastB1),
      "no match straddled the batch split — weak trial")
    // hand-crafted: reset kills, consumption blocks reuse
    val mem2 = MemoryStream[graft.streaming.EventStreams.Event]
    def ev(id: Long, t: Long, u: Long, s: String) =
      graft.streaming.EventStreams.Event(id, t * us, u, s, 0.0)
    val q2 = graft.streaming.EventStreams
      .compiledMatches(mem2.toDS(), steps, resets)
      .writeStream.outputMode("append").format("memory")
      .queryName("cmout2").start()
    mem2.addData(
      ev(1, 1, 1, "v"), ev(2, 2, 1, "e"), ev(3, 3, 1, "c"), ev(4, 4, 1, "p"),
      ev(5, 5, 1, "c"), ev(6, 6, 1, "p"),             // consumed: no reuse
      ev(7, 1, 2, "v"), ev(8, 2, 2, "s"), ev(9, 3, 2, "c"), ev(10, 4, 2, "p"))
    q2.processAllAvailable(); q2.stop()
    val got2 = spark.table("cmout2").as[CompiledOut].collect()
      .map(o => (o.user_id, o.end_event_id, o.start_event_id)).toSet
    assert(got2 == Set((1L, 4L, 1L)), s"got $got2")
  }

  test("streaming deltaJoinStream equals the batch Z-join per prefix; deletes straddle batches") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.EventStreams.{ZJoinRow, ZJoinOut}
    val rnd = new scala.util.Random(37)
    // random two-sided CDC with duplicate payloads (mult > 1 arises),
    // deletes of rows inserted in an EARLIER batch, and
    // delete-BEFORE-insert residues (every 11th row deletes a row
    // whose insert rides a later batch)
    val all = (0 until 400).map { i =>
      ZJoinRow(i % 2, rnd.nextInt(6).toLong, s"p${rnd.nextInt(4)}",
        if (i % 11 == 0 || (i % 5 == 0 && i > 150)) -1L else 1L)
    }
    val batches = Seq(all.slice(0, 120), all.slice(120, 260), all.slice(260, 400))
    val mem = MemoryStream[ZJoinRow]
    val q = EventStreams.deltaJoinStream(mem.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("zjout").start()
    // the batch reference: Z-join of the folded inputs — Σ over
    // (l, r) pairs of m_l·m_r, grouped by output row
    def want(rows: Seq[ZJoinRow]): Map[(Long, String, String), Long] = {
      def fold(side: Int) = rows.filter(_.side == side)
        .groupBy(r => (r.key, r.payload))
        .view.mapValues(_.map(_.mult).sum).filter(_._2 != 0L).toMap
      val (l, r) = (fold(0), fold(1))
      l.toSeq.flatMap { case ((k, lp), lm) =>
        r.collect { case ((rk, rp), rm) if rk == k =>
          (k, lp, rp) -> lm * rm
        }
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum)
        .filter(_._2 != 0L).toMap
    }
    def got(): Map[(Long, String, String), Long] =
      spark.table("zjout").as[ZJoinOut].collect()
        .groupBy(o => (o.key, o.l_payload, o.r_payload))
        .view.mapValues(_.map(_.mult).sum).filter(_._2 != 0L).toMap
    var prefix = Seq.empty[ZJoinRow]
    batches.foreach { b =>
      mem.addData(b: _*)
      q.processAllAvailable()
      prefix ++= b
      assert(got() == want(prefix), s"prefix of ${prefix.size} diverged")
    }
    q.stop()
    assert(got().nonEmpty && got().values.exists(_ > 1L),
      "degenerate trial: no multiplicities above 1")
    // folding the stream's emissions also equals the batch
    // deltaJoinZ APPLICATION on the same final tables
    import graft.ops.Incremental
    def sideDf(side: Int) = all.filter(_.side == side)
      .map(r => (r.key, r.payload, r.mult))
    val l = sideDf(0); val r = sideDf(1)
    val zl = Incremental.stateZ(l.toDF("k", "v", "m"),
      col("k"), col("v"), col("m"))
      .select(col("k").as("lk"), col("v").as("lp"), col("mult").as("_ml"))
    val zr = Incremental.stateZ(r.toDF("k", "v", "m"),
      col("k"), col("v"), col("m"))
      .select(col("k").as("rk"), col("v").as("rp"), col("mult").as("_mr"))
    val batchJoin = zl.join(zr, col("lk") === col("rk"))
      .select(col("lk"), col("lp"), col("rp"),
        (col("_ml") * col("_mr")).as("mult"))
      .as[(Long, String, String, Long)].collect()
      .map(t => (t._1, t._2, t._3) -> t._4).toMap
    assert(got() == batchJoin, "stream fold != batch Z-join of folded inputs")
  }

  test("streaming deltaOuterJoinStream equals the batch full-outer Z-join per prefix") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.EventStreams.{ZJoinRow, ZOuterOut}
    val rnd = new scala.util.Random(53)
    // random two-sided CDC where keys OSCILLATE between matched and
    // unmatched: one-sided keys (6, 7 left-only; 8 right-only),
    // deletes that net a side to zero and later re-inserts, and
    // delete-before-insert residues
    val all = (0 until 420).map { i =>
      val key =
        if (i % 13 == 0) 6L + (i / 13) % 3 else rnd.nextInt(6).toLong
      val side = if (key == 6L || key == 7L) 0 else if (key == 8L) 1 else i % 2
      ZJoinRow(side, key, s"p${rnd.nextInt(3)}",
        if (i % 11 == 0 || (i % 5 == 0 && i > 140)) -1L else 1L)
    }
    val batches = Seq(all.slice(0, 130), all.slice(130, 270), all.slice(270, 420))
    val mem = MemoryStream[ZJoinRow]
    val q = EventStreams.deltaOuterJoinStream(mem.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("zoout").start()
    // the referee view: inner pairs over both netted Z-sets, plus
    // each side's null-extension rows exactly when the OTHER side's
    // net count is zero — the batch kernel's count semantics
    type K = (Long, Option[String], Option[String])
    def want(rows: Seq[ZJoinRow]): Map[K, Long] = {
      def fold(side: Int) = rows.filter(_.side == side)
        .groupBy(r => (r.key, r.payload))
        .view.mapValues(_.map(_.mult).sum).filter(_._2 != 0L).toMap
      val (l, r) = (fold(0), fold(1))
      val keys = (l.keys.map(_._1) ++ r.keys.map(_._1)).toSet
      keys.toSeq.flatMap { k =>
        val lp = l.collect { case ((kk, p), m) if kk == k => p -> m }.toSeq
        val rp = r.collect { case ((kk, p), m) if kk == k => p -> m }.toSeq
        val inner = for ((a, ma) <- lp; (b, mb) <- rp)
          yield ((k, Option(a), Option(b)): K) -> ma * mb
        val lNull = if (rp.map(_._2).sum == 0L)
          lp.map { case (a, ma) => ((k, Option(a), None): K) -> ma }
        else Seq.empty
        val rNull = if (lp.map(_._2).sum == 0L)
          rp.map { case (b, mb) => ((k, None, Option(b)): K) -> mb }
        else Seq.empty
        inner ++ lNull ++ rNull
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum)
        .filter(_._2 != 0L).toMap
    }
    def got(): Map[K, Long] =
      spark.table("zoout").as[ZOuterOut].collect()
        .groupBy(o => (o.key, Option(o.l_payload), Option(o.r_payload)))
        .view.mapValues(_.map(_.mult).sum).filter(_._2 != 0L).toMap
    var prefix = Seq.empty[ZJoinRow]
    batches.foreach { b =>
      mem.addData(b: _*)
      q.processAllAvailable()
      prefix ++= b
      assert(got() == want(prefix), s"prefix of ${prefix.size} diverged")
    }
    q.stop()
    val fin = got()
    assert(fin.exists(_._1._2.isEmpty) && fin.exists(_._1._3.isEmpty),
      "degenerate trial: no null-extension rows on one of the sides")
    // folding the stream's emissions equals folding the single-run
    // batch deltaFullJoinZ from EMPTY bases over the same raw deltas
    import graft.ops.Incremental
    def deltas(side: Int, k: String, p: String) = all.filter(_.side == side)
      .map(r => (r.key, r.payload, r.mult)).toDF(k, p, "mult")
    val emptyL = Seq.empty[(Long, String)].toDF("lk", "lp")
    val emptyR = Seq.empty[(Long, String)].toDF("rk", "rp")
    val batchFold = Incremental.deltaFullJoinZ(
        emptyL, deltas(0, "lk", "lp"), emptyR, deltas(1, "rk", "rp"),
        col("lk"), col("rk"))
      .select(coalesce(col("lk"), col("rk")).as("k"),
        col("lp"), col("rp"), col("mult"))
      .as[(Long, Option[String], Option[String], Long)].collect()
      .groupBy(t => (t._1, t._2, t._3))
      .view.mapValues(_.map(_._4).sum).filter(_._2 != 0L).toMap
    assert(fin == batchFold, "stream fold != batch full-outer Z-join")
  }

  test("streaming CDC -> MV: mvJoinAggStream relayed into retractAgg equals the batch MV") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.EventStreams.{ZMvRow, ZRow, ZSumOut}
    val rnd = new scala.util.Random(59)
    // two-sided CDC: measure rows (values) and dimension rows
    // (groups) interleave per join key, deletes straddle batches
    val all = (0 until 360).map { i =>
      ZMvRow(i % 2, rnd.nextInt(6).toLong, s"g${rnd.nextInt(4)}",
        (rnd.nextInt(800) / 4.0),
        if (i % 9 == 0 || (i % 5 == 0 && i > 150)) -1L else 1L)
    }
    val batches = Seq(all.slice(0, 100), all.slice(100, 240), all.slice(240, 360))
    val mem = MemoryStream[ZMvRow]
    val q1 = EventStreams.mvJoinAggStream(mem.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("mvstage1").start()
    // referee: per join key net both Z-maps; every (value, group)
    // pair contributes vm*gm to group's count and round-half-up
    // CENTS — the batch DECIMAL(18,2) discipline retractAgg shares
    def cents(v: Double): Long = scala.math.BigDecimal(v)
      .setScale(2, scala.math.BigDecimal.RoundingMode.HALF_UP)
      .*(scala.math.BigDecimal(100)).toLongExact
    def want(rows: Seq[ZMvRow]): Map[String, (Long, Long)] =
      rows.groupBy(_.key).toSeq.flatMap { case (_, rs) =>
        def net[A](side: Int, f: ZMvRow => A) = rs.filter(_.side == side)
          .groupBy(f).view.mapValues(_.map(_.mult).sum)
          .filter(_._2 != 0L).toSeq
        for ((v, vm) <- net(0, _.value); (g, gm) <- net(1, _.group))
          yield g -> ((vm * gm, cents(v) * vm * gm))
      }.groupBy(_._1)
        .view.mapValues(ps => (ps.map(_._2._1).sum, ps.map(_._2._2).sum))
        .filter { case (_, (n, c)) => n != 0L || c != 0L }.toMap
    // per prefix: folding stage-1 emissions matches the referee MV
    def stage1Fold(): Map[String, (Long, Long)] =
      spark.table("mvstage1").as[ZRow].collect()
        .groupBy(_.key)
        .view.mapValues(rs =>
          (rs.map(_.mult).sum, rs.map(r => cents(r.value) * r.mult).sum))
        .filter { case (_, (n, c)) => n != 0L || c != 0L }.toMap
    var prefix = Seq.empty[ZMvRow]
    batches.foreach { b =>
      mem.addData(b: _*)
      q1.processAllAvailable()
      prefix ++= b
      assert(stage1Fold() == want(prefix), s"prefix ${prefix.size} diverged")
    }
    q1.stop()
    assert(want(all).nonEmpty, "degenerate trial: empty MV")
    // end-to-end RELAY: stage-1 emissions feed retractAgg as a second
    // streaming query (order-free — the fold is commutative); the
    // latest state row per group is the maintained MV
    val relayed = spark.table("mvstage1").as[ZRow].collect().toSeq
    val mem2 = MemoryStream[ZRow]
    val q2 = EventStreams.retractAgg(mem2.toDS())
      .writeStream.outputMode("update").format("memory")
      .queryName("mvstage2").start()
    mem2.addData(rnd.shuffle(relayed): _*)
    q2.processAllAvailable()
    val got = spark.table("mvstage2").as[ZSumOut].collect()
      .groupBy(_.key).map { case (k, rows) =>
        val last = rows.maxBy(_.version)
        k -> ((last.n, last.sum_cents))
      }
      .filter { case (_, (n, c)) => n != 0L || c != 0L }
    q2.stop()
    assert(got == want(all), "relayed MV state != batch recompute")
  }

  test("streaming quotaStream CDC folds to the batch fixedKState per prefix") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.EventStreams.{QuotaRow, QuotaOut}
    val rnd = new scala.util.Random(41)
    // unique ids across strata; enough volume that evictions happen
    val all = rnd.shuffle((0 until 600).toVector).map { i =>
      QuotaRow(s"g${i % 5}", i.toLong)
    }
    val batches = Seq(all.slice(0, 150), all.slice(150, 400), all.slice(400, 600))
    val mem = MemoryStream[QuotaRow]
    val q = EventStreams.quotaStream(mem.toDS(), k = 8)
      .writeStream.outputMode("append").format("memory")
      .queryName("quotaout").start()
    def got(): Set[(String, Long, Long)] =
      spark.table("quotaout").as[QuotaOut].collect()
        .groupBy(o => (o.stratum, o.id, o.h))
        .view.mapValues(_.map(_.mult).sum).filter(_._2 > 0L)
        .keys.toSet
    var prefix = Seq.empty[QuotaRow]
    batches.foreach { b =>
      mem.addData(b: _*)
      q.processAllAvailable()
      prefix ++= b
      val want = graft.llm.Sampling.fixedKState(
          prefix.map(r => (r.stratum, r.id)).toDF("g", "id"),
          col("id"), col("g"), k = 8)
        .as[(String, Long, Long)].collect().toSet
      assert(got() == want, s"prefix ${prefix.size} diverged")
    }
    q.stop()
    // evictions actually happened (not an append-only trial)
    assert(spark.table("quotaout").as[QuotaOut].collect()
      .exists(_.mult == -1L), "degenerate trial: no evictions")
  }

  test("streaming asofStream CDC folds to the batch as-of join per prefix") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.EventStreams.{AsOfRow, AsOfOut}
    val rnd = new scala.util.Random(89)
    // interleaved late trades AND late quotes per key; quote (key, ts)
    // unique by construction (ts drawn without replacement per key)
    val all = (0 until 5).flatMap { k =>
      val qTs = rnd.shuffle((0 until 80).toVector).take(30)
        .map(t => AsOfRow(1, k.toLong, t * 10L, 0L))
      val tr = (0 until 60).map(i =>
        AsOfRow(0, k.toLong, rnd.nextInt(820).toLong,
          k * 1000L + i))
      rnd.shuffle(qTs ++ tr)
    }
    val shuffled = rnd.shuffle(all.toVector)
    val batches = Seq(shuffled.slice(0, 150), shuffled.slice(150, 300),
      shuffled.slice(300, shuffled.size))
    val mem = MemoryStream[AsOfRow]
    val q = EventStreams.asofStream(mem.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("asofout").start()
    def got(): Set[(Long, Long, Long, Option[Long])] =
      spark.table("asofout").as[AsOfOut].collect()
        .groupBy(o => (o.key, o.trade_id, o.ts, o.match_ts))
        .view.mapValues(_.map(_.mult).sum).filter(_._2 > 0L)
        .keys.toSet
    var prefix = Seq.empty[AsOfRow]
    batches.foreach { b =>
      mem.addData(b: _*)
      q.processAllAvailable()
      prefix ++= b
      val trades = prefix.filter(_.side == 0)
        .map(r => (r.key, r.id, r.ts)).toDF("k", "trade_id", "ts")
      val quotes = prefix.filter(_.side == 1)
        .map(r => (r.key, r.ts)).toDF("qk", "q_ts")
      val want = graft.ops.AsOf.join(
          trades, col("k"), col("ts"), quotes, col("qk"), col("q_ts"),
          rightPayload = Seq("match_ts" -> col("q_ts")))
        .as[(Long, Long, Long, Option[Long])].collect().toSet
      assert(got() == want, s"prefix ${prefix.size} diverged")
    }
    q.stop()
    assert(spark.table("asofout").as[AsOfOut].collect()
      .exists(_.mult == -1L), "degenerate trial: no late-quote re-matches")
  }

  test("streaming attribution carries first/last click across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val us = 1000000L
    val out = EventStreams.attribution(mem.toDS())
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("attrout").start()
    // batch 1: clicks 1,3 then purchase 5 (out of order in the batch —
    // the (ts,id) sort must apply click 3 before purchase 5)
    mem.addData(
      Event(5, 50L * us, 1L, "purchase", 9.0),
      Event(1, 10L * us, 1L, "click", 0.0),
      Event(3, 30L * us, 1L, "click", 0.0))
    q.processAllAvailable()
    // batch 2: another click then purchase — first stays 1, last moves
    mem.addData(
      Event(7, 70L * us, 1L, "click", 0.0),
      Event(9, 90L * us, 1L, "purchase", 4.0),
      Event(20, 20L * us, 2L, "purchase", 1.0)) // user 2: no clicks ever
    q.processAllAvailable(); q.stop()
    val rows = spark.table("attrout").as[EventStreams.AttributionOut]
      .collect().map(r => r.purchase_id -> ((r.first_click, r.last_click))).toMap
    assert(rows(5L) == ((1L, 3L)), "batch-1 purchase sees in-batch clicks")
    assert(rows(9L) == ((1L, 7L)), "first click persists, last advances")
    assert(rows(20L) == ((-1L, -1L)), "clickless user attributes to none")
  }

  test("streaming dedup drops repeated ids within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(min: Int) = new java.sql.Timestamp(base.getTime + min * 60000L)
    val rows = Seq((1L, at(0), "a"), (1L, at(1), "a-dup"), (2L, at(2), "b"))
    mem.addData(rows: _*)
    val df = mem.toDF().toDF("event_id", "ts", "payload")
    val q = EventStreams.dedup(df, Seq("event_id"))
      .writeStream.outputMode("append").format("memory").queryName("dedup").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("dedup").select("event_id").as[Long].collect().toList.sorted
    assert(got == List(1L, 2L))
    // twin equivalence: batch exact dedup over the same prefix keeps
    // the same key set (q_dedup_exact's dropDuplicates semantics)
    val batch = rows.toDF("event_id", "ts", "payload")
      .dropDuplicates("event_id")
      .select("event_id").as[Long].collect().toList.sorted
    assert(got == batch)
  }

  test("stream-static enrich joins each micro-batch against the dim") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val rows = Seq((1L, "click"), (2L, "view"), (3L, "click"))
    mem.addData(rows: _*)
    val dim = Seq(("click", 10), ("view", 20)).toDF("event_type", "weight")
    val df = mem.toDF().toDF("event_id", "event_type")
    val q = EventStreams.enrich(df, dim, Seq("event_type"))
      .writeStream.outputMode("append").format("memory").queryName("enriched").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("enriched").select("event_id", "weight")
      .as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 10, 2L -> 20, 3L -> 10))
    // twin equivalence: the same broadcast-join transform on the same
    // prefix as a batch frame
    val batch = EventStreams.enrich(
      rows.toDF("event_id", "event_type"), dim, Seq("event_type"))
      .select("event_id", "weight").as[(Long, Int)].collect().toMap
    assert(got == batch)
  }

  test("stream-stream interval join matches within-window pairs only") {
    implicit val sqlCtx = spark.sqlContext
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(min: Int) = new java.sql.Timestamp(base.getTime + min * 60000L)
    val clicks = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val views = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val clickRows = Seq((1L, at(0), 7L), (2L, at(30), 7L), (3L, at(5), 9L))
    val viewRows = Seq((100L, at(4), 7L), (101L, at(29), 7L), (102L, at(50), 9L))
    clicks.addData(clickRows: _*)
    views.addData(viewRows: _*)
    val l = clicks.toDF().toDF("click_id", "ts", "user_id")
    val r = views.toDF().toDF("view_id", "ts", "user_id")
    val q = EventStreams.intervalJoin(l, r, "user_id", within = "10 minutes")
      .select(col("click_id"), col("view_id"))
      .writeStream.outputMode("append").format("memory").queryName("ssjoin").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("ssjoin").as[(Long, Long)].collect().toSet
    // click1 at 0 matches view100 at 4 (within 10m); click2 at 30 has no
    // view in [30,40]; click3 user 9 at 5: view102 at 50 is out of window
    assert(got == Set((1L, 100L)))
    // twin equivalence: the same interval-join transform over the
    // same prefixes as batch frames (q_interval_join's semantics)
    val batch = EventStreams.intervalJoin(
      clickRows.toDF("click_id", "ts", "user_id"),
      viewRows.toDF("view_id", "ts", "user_id"),
      "user_id", within = "10 minutes")
      .select(col("click_id"), col("view_id"))
      .as[(Long, Long)].collect().toSet
    assert(got == batch)
  }

  test("streaming anomaly watch equals the batch scorer over in-order days") {
    import graft.streaming.EventStreams.{AnomalyOut, DayCount}
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[DayCount]
    val out = EventStreams.anomalyWatch(mem.toDS(), window = 7)
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("anomout").start()
    // 10 days of counts with variance, split across micro-batches to
    // prove state carries the trailing buffer over
    val counts = Seq(10L, 12L, 9L, 11L, 10L, 13L, 10L, 30L, 11L, 10L)
      .zipWithIndex.map { case (n, i) => DayCount("click", i + 1L, n) }
    mem.addData(counts.take(6): _*)
    q.processAllAvailable()
    mem.addData(counts.drop(6): _*)
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("anomout").as[AnomalyOut].collect()
      .map(a => (a.day, a.n_events, a.baseline_mean, a.z.getOrElse(Double.NaN)))
      .toSet
    val batch = graft.ops.Timeseries
      .anomalyScores(counts.toDF("event_type", "day", "n"),
        "event_type", "day", "n", window = 7)
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3),
        if (r.isNullAt(4)) Double.NaN else r.getDouble(4)))
      .toSet
    assert(streamed == batch, s"stream $streamed != batch $batch")
    assert(streamed.exists { case (day, _, _, z) => day == 8L && z > 4.0 },
      "the planted spike on day 8 must score")
  }

  test("checkpoint RESTART: mapGroupsWithState state survives a real stop/start cycle") {
    // the property production streams actually rely on (r9 gap #3):
    // a query stopped mid-stream and RESTARTED as a fresh query
    // instance from the same checkpoint dir must recover its state
    // store, not recompute from scratch — no prior spec killed a
    // query. foreachBatch sink (memory sink refuses recovery).
    import graft.streaming.EventStreams.UpsertOut
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val us = 1000000L
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val buf = new scala.collection.mutable.ArrayBuffer[(Long, UpsertOut)]
    def start() = EventStreams.upsertLatest(mem.toDS())
      .writeStream.outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.Dataset[UpsertOut], id: Long) =>
        val rows = df.collect()
        buf.synchronized { rows.foreach(r => buf += ((id, r))) }
      }
      .start()
    val q1 = start()
    mem.addData(
      Event(10, 50L * us, 1L, "purchase", 9.0),
      Event(11, 40L * us, 2L, "view", 2.0))
    q1.processAllAvailable()
    q1.stop() // the "kill": query object discarded, state only on disk
    // data arrives while the query is DOWN
    mem.addData(
      Event(1, 10L * us, 1L, "view", 1.0),   // OLDER than the pre-restart purchase
      Event(12, 40L * us, 2L, "click", 3.0)) // same ts as pre-restart, higher id
    val q2 = start()
    q2.processAllAvailable(); q2.stop()
    // batch 1's emissions (before the kill)
    val b1 = buf.synchronized(buf.filter(_._1 == 0L).map(_._2)).toSeq
    assert(b1.exists(r => r.user_id == 1L && r.event_id == 10L))
    // the restarted query's decisions REQUIRE the recovered state:
    // without it, user 1's post-restart older row would win as
    // "latest" (view@10) instead of losing to the checkpointed
    // purchase@50, and user 2's tie-break would lack the stored row
    val b2 = buf.synchronized(buf.filter(_._1 == 1L).map(_._2)).toSeq
    assert(b2.nonEmpty, "restart must process the down-time batch")
    val u1 = b2.find(_.user_id == 1L).get
    assert(u1.event_id == 10L && u1.event_type == "purchase" && u1.ts_us == 50L * us,
      s"state lost across restart: $u1")
    val u2 = b2.find(_.user_id == 2L).get
    assert(u2.event_id == 12L && u2.event_type == "click",
      s"tie-break against checkpointed state failed: $u2")
    // and the final state equals the batch twin over the FULL stream
    val twin = Seq(
      Event(10, 50L * us, 1L, "purchase", 9.0), Event(11, 40L * us, 2L, "view", 2.0),
      Event(1, 10L * us, 1L, "view", 1.0), Event(12, 40L * us, 2L, "click", 3.0))
      .groupBy(_.user_id).map { case (u, es) =>
        u -> es.maxBy(e => (e.ts_us, e.event_id)).event_id
      }
    val finalPerUser = (b1 ++ b2).groupBy(_.user_id)
      .map { case (u, rs) => u -> rs.last.event_id }
    assert(finalPerUser == twin)
  }

  test("checkpoint RESTART: the CEP automaton's armed state survives the kill") {
    import graft.streaming.EventStreams.PatternOut
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val us = 1000000L
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt_cep").toString
    val buf = new scala.collection.mutable.ArrayBuffer[(Long, PatternOut)]
    def start() = EventStreams.patternMatches(mem.toDS())
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.Dataset[PatternOut], id: Long) =>
        val rows = df.collect()
        buf.synchronized { rows.foreach(r => buf += ((id, r))) }
      }
      .start()
    val q1 = start()
    // user 1 arms (view, then a click growing the gap) — no emission
    mem.addData(
      Event(1, 10L * us, 1L, "view", 0.0),
      Event(2, 20L * us, 1L, "click", 0.0))
    q1.processAllAvailable()
    q1.stop() // kill: the armed (true, gap=1, armTs) lives only on disk
    // the purchase arrives while the query is DOWN
    mem.addData(Event(3, 30L * us, 1L, "purchase", 0.0))
    val q2 = start()
    q2.processAllAvailable(); q2.stop()
    val all = buf.synchronized(buf.toSeq)
    // the match can only exist if the restarted instance recovered
    // the armed flag AND the accumulated gap from the state store
    assert(all.map(_._2) == Seq(PatternOut(1L, 3L, 1L)),
      s"armed state lost across restart: $all")
  }

  test("checkpoint RESTART: watermarked dedup remembers pre-restart ids") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(min: Int) = new java.sql.Timestamp(base.getTime + min * 60000L)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt_dd").toString
    val buf = new scala.collection.mutable.ArrayBuffer[Long]
    def start() = EventStreams.dedup(
        mem.toDF().toDF("event_id", "ts", "event_type"),
        Seq("event_id"), "2 hours")
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val ids = df.select("event_id").collect().map(_.getLong(0))
        buf.synchronized { ids.foreach(buf += _) }
      }
      .start()
    val q1 = start()
    mem.addData((1L, at(0), "click"), (2L, at(5), "view"))
    q1.processAllAvailable()
    q1.stop()
    // the duplicate of id 1 arrives after the restart — only the
    // checkpointed dedup state can drop it
    mem.addData((1L, at(10), "click"), (3L, at(15), "view"))
    val q2 = start()
    q2.processAllAvailable(); q2.stop()
    val got = buf.synchronized(buf.toList)
    assert(got.sorted == List(1L, 2L, 3L),
      s"id 1 must appear exactly once across the restart, got $got")
  }

  test("streaming LSH candidates equal the batch minhash kernel on the same prefix") {
    implicit val sqlCtx = spark.sqlContext
    val base = "the quick brown fox jumps over the lazy dog while seventeen " +
      "sailors watch from the harbor wall and gulls wheel overhead in the salt wind"
    val docs = Seq(
      EventStreams.Doc(1L, base),
      EventStreams.Doc(2L, base.replace("seventeen", "nineteen")), // near-dup of 1
      EventStreams.Doc(3L, base),                                  // exact dup of 1
      EventStreams.Doc(4L, "completely unrelated content about compiler " +
        "internals, register allocation and loop invariant code motion passes"),
      EventStreams.Doc(5L, base.replace("harbor wall", "harbour wall")))
    val mem = MemoryStream[EventStreams.Doc]
    mem.addData(docs: _*)
    val q = EventStreams.lshCandidates(mem.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("lshcand").start()
    q.processAllAvailable(); q.stop()
    // consumers aggregate max(est) per pair — dedups the per-bucket emits
    val got = spark.table("lshcand")
      .groupBy($"id_a", $"id_b").agg(max($"jaccard_est").as("est"))
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, e) => (a, b) -> e }.toMap
    // batch twin: same kernel params, same docs
    val batch = graft.llm.Dedup.minhashLsh(
        docs.toDF().toDF("doc_id", "text"), $"doc_id", $"text")
      .groupBy($"id_a", $"id_b").agg(max($"jaccard_est").as("est"))
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, e) => (a, b) -> e }.toMap
    assert(got == batch, s"stream $got vs batch $batch")
    assert(got.contains((1L, 3L)) && got((1L, 3L)) == 1.0,
      "exact dups must surface as est-1.0 pairs")
    assert(got.contains((1L, 2L)), "near-dups must surface")
    assert(!got.keySet.exists { case (a, b) => a == 4L || b == 4L },
      "unrelated doc must not pair")
  }

  test("streaming LSH state carries across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val base = "pack my box with five dozen liquor jugs said the sphinx of " +
      "black quartz while the wizards jumped quickly over the frozen river delta"
    val mem = MemoryStream[EventStreams.Doc]
    val q = EventStreams.lshCandidates(mem.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("lshinc").start()
    mem.addData(EventStreams.Doc(10L, base))
    q.processAllAvailable()
    assert(spark.table("lshinc").isEmpty, "a lone doc pairs with nothing")
    // the near-dup arrives a micro-batch LATER — the pair must come from
    // bucket state, not from within-batch comparison
    mem.addData(EventStreams.Doc(11L, base.replace("five", "nine")))
    q.processAllAvailable(); q.stop()
    val got = spark.table("lshinc")
      .groupBy($"id_a", $"id_b").agg(max($"jaccard_est").as("est"))
      .as[(Long, Long, Double)].collect()
    assert(got.length == 1 && got.head._1 == 10L && got.head._2 == 11L
      && got.head._3 >= 0.5, s"cross-batch near-dup pair expected, got ${got.toList}")
  }

  test("streaming LSH emits one in-band saturation marker per bucket, exactly at the cap") {
    implicit val sqlCtx = spark.sqlContext
    // identical texts share every band bucket; maxBucket = 2 means the
    // third arrival is the first REJECTED one
    val text = "jackdaws love my big sphinx of quartz and the five boxing " +
      "wizards jump quickly over the lazy river barge at dawn"
    val mem = MemoryStream[EventStreams.Doc]
    val q = EventStreams.lshEvents(mem.toDS(), maxBucket = 2)
      .writeStream.outputMode("append").format("memory")
      .queryName("lshsat").start()
    // two admitted docs: pairs, NO marker anywhere
    mem.addData(EventStreams.Doc(1L, text), EventStreams.Doc(2L, text))
    q.processAllAvailable()
    assert(spark.table("lshsat").filter($"kind" === "saturated").isEmpty,
      "no marker below the cap")
    assert(spark.table("lshsat").filter($"kind" === "pair").count() == 16L,
      "the est-1.0 pair appears once per band")
    // the third arrival is rejected in all 16 buckets -> exactly one
    // marker per bucket, naming the rejected doc
    mem.addData(EventStreams.Doc(3L, text))
    q.processAllAvailable()
    val markers = spark.table("lshsat").filter($"kind" === "saturated")
      .select($"band", $"bucket", $"saturated_at")
      .as[(Int, String, Long)].collect()
    assert(markers.length == 16, s"one marker per band bucket: ${markers.length}")
    assert(markers.forall(_._3 == 3L), "saturated_at names the first rejected doc")
    assert(markers.map(_._1).sorted.toSeq == (0 until 16),
      "every band's bucket reports")
    assert(markers.forall { case (b, key, _) => key.startsWith(s"$b:") })
    // a fourth rejected arrival adds NO second marker (exactly-once
    // per bucket, flag rides the recovered state)
    mem.addData(EventStreams.Doc(4L, text))
    q.processAllAvailable(); q.stop()
    assert(spark.table("lshsat").filter($"kind" === "saturated").count() == 16L,
      "markers are exactly-once per bucket")
    // pair rows carry neutral marker fields
    assert(spark.table("lshsat").filter($"kind" === "pair")
      .filter($"band" =!= -1 || $"bucket" =!= "" || $"saturated_at" =!= -1L)
      .isEmpty)
  }

  test("custom codegen expressions run inside a streaming query") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    mem.addData((1L, "hello world"), (2L, "hello world"), (3L, "different text"))
    val df = mem.toDF().toDF("doc_id", "text")
      .select($"doc_id", graft.functions.F.simhash64($"text").as("sig"))
    val q = df.writeStream.outputMode("append").format("memory")
      .queryName("streamsig").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("streamsig").as[(Long, Long)].collect().toMap
    assert(got(1L) == got(2L), "identical docs must hash equal in-stream")
    assert(got(1L) != got(3L))
  }
}
