package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.EventStreams
import graft.streaming.EventStreams.{AsOfOut, AsOfRow, Scd2Event, Scd2Out, ZBandOut, ZBandRow}

/** The WATERMARK-BOUNDED streaming surfaces (r15 — the r14 verdict's
  * top item): the CDC twins whose state EVICTS at the frozen horizon
  * instead of holding the view's inputs forever. Each surface pins
  * the three contract legs the verdict named:
  *  (a) fold-equality with the batch twin is UNCHANGED on any stream
  *      the watermark contract admits;
  *  (b) state size is bounded by rows inside the lateness window —
  *      observed IN-BAND through mult = 0 probe rows under a long
  *      in-order stream, idle keys included (event-time timeouts);
  *  (c) the horizon boundary is pinned on BOTH sides: a row exactly
  *      AT the watermark is late (Spark's stateful-operator rule,
  *      ts <= watermark), one strictly above is processed.
  */
class BoundedStreamsSpec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------------- as-of

  test("asofStreamBounded: fold == batch as-of per prefix; state bounded; at-horizon handled") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(17)
    val LATE = 500L
    // per key: one trade and one quote per 100 ms step — an in-order
    // stream cut into time-contiguous batches (within a batch any
    // order is admissible: the horizon only advances between batches)
    val STEPS = 80
    val B = 1000000L // clear of the initial watermark (0)
    val all = (0 until STEPS).flatMap { s =>
      (0 until 3).flatMap { k =>
        val t = B + s * 100L
        Seq(AsOfRow(0, k.toLong, t + rnd.nextInt(40), k * 1000L + s),
          AsOfRow(1, k.toLong, t + 50L + rnd.nextInt(40), 0L))
      }
    }
    val batches = all.grouped(30).map(b => rnd.shuffle(b.toVector)).toSeq
    val mem = MemoryStream[AsOfRow]
    val q = EventStreams.asofStreamBounded(mem.toDS(), LATE, probe = true)
      .writeStream.outputMode("append").format("memory")
      .queryName("asofb").start()
    def outRows() = spark.table("asofb").as[AsOfOut].collect().toSeq
    def fold(rows: Seq[AsOfOut]) = rows.filter(_.mult != 0L)
      .groupBy(o => (o.key, o.trade_id, o.ts, o.match_ts))
      .view.mapValues(_.map(_.mult).sum).filter(_._2 > 0L).keys.toSet
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
      assert(fold(outRows()) == want, s"prefix ${prefix.size} diverged")
    }
    // (b) the state bound: every probe (post-eviction sizes) stays
    // within the lateness window — ~2 rows per 100 ms step over
    // 500 ms, +1 carried quote, + the in-flight batch — while the
    // key's TOTAL row count is 80; late-quote re-matches did occur
    val probes = outRows().filter(_.mult == 0L)
    assert(probes.nonEmpty)
    val maxHeld = probes.map(p => p.trade_id + p.ts).max
    assert(maxHeld <= 30L, s"state not bounded: max held $maxHeld")
    assert(outRows().exists(_.mult == -1L), "degenerate: no re-matches")
    // idle-key drain: key 9 gets one early row, then only key 0
    // advances the watermark — the event-time timeout must evict key
    // 9's trade without any further key-9 input
    val t9 = (0 until 12).map(i =>
      AsOfRow(0, 9L, B + 12000L + i, 9000L + i))
    mem.addData(t9: _*)
    q.processAllAvailable()
    mem.addData(AsOfRow(0, 0L, B + 20000L, 1L))
    q.processAllAvailable()
    mem.addData(AsOfRow(0, 0L, B + 21000L, 2L))
    q.processAllAvailable()
    val p9 = outRows().filter(o => o.key == 9L && o.mult == 0L)
    assert(p9.nonEmpty && p9.last.trade_id == 0L,
      s"idle key 9 not drained: ${p9.mkString(", ")}")
    // (c) the horizon boundary, both sides: watermark is now
    // B + 21000 − 500 = B + 20500. A quote exactly AT it is LATE
    // (ts <= watermark — Spark's stateful-operator rule) and drops
    // with no emission; one millisecond above claims the held trade
    mem.addData(AsOfRow(1, 0L, B + 20500L, 0L))
    q.processAllAvailable()
    assert(!outRows().exists(_.match_ts == Some(B + 20500L)),
      "at-watermark quote must be late")
    mem.addData(AsOfRow(1, 0L, B + 20501L, 0L))
    q.processAllAvailable()
    val rematch = outRows().filter(o =>
      o.key == 0L && o.trade_id == 2L && o.match_ts == Some(B + 20501L))
    assert(rematch.map(_.mult).sum == 1L,
      "above-watermark quote was not processed")
    q.stop()
  }

  test("asofStreamBounded emissions == unbounded asofStream on an admissible stream") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(23)
    val B = 1000000L
    val all = (0 until 60).flatMap { s =>
      (0 until 2).map { k =>
        val side = rnd.nextInt(2)
        AsOfRow(side, k.toLong, B + s * 100L + rnd.nextInt(60), s.toLong)
      }
    }
    val batches = all.grouped(40).map(_.toVector).toSeq
    def run(bounded: Boolean): Seq[AsOfOut] = {
      val mem = MemoryStream[AsOfRow]
      val name = if (bounded) "asofb2" else "asofu2"
      val ds = if (bounded)
        EventStreams.asofStreamBounded(mem.toDS(), 500L)
      else EventStreams.asofStream(mem.toDS())
      val q = ds.writeStream.outputMode("append").format("memory")
        .queryName(name).start()
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      val out = spark.table(name).as[AsOfOut].collect().toSeq
      q.stop()
      out
    }
    def multiset(rows: Seq[AsOfOut]) =
      rows.groupBy(identity).view.mapValues(_.size).toMap
    assert(multiset(run(bounded = true)) == multiset(run(bounded = false)))
  }

  test("asofStreamBounded survives kill/restart: books, watermark, and a straddling re-match recover") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files
      .createTempDirectory("asof_chk").toString
    val mem = MemoryStream[AsOfRow]
    val buf = new scala.collection.mutable.ArrayBuffer[AsOfOut]
    def start() = EventStreams.asofStreamBounded(mem.toDS(), 500L)
      .writeStream.outputMode("append")
      .option("checkpointLocation", dir)
      .foreachBatch { (df: org.apache.spark.sql.Dataset[AsOfOut], _: Long) =>
        val rows = df.collect()
        buf.synchronized { rows.foreach(buf += _) }
      }
      .start()
    val B = 1000000L
    val q1 = start()
    // trade at B+1000 matched to the quote at B+800
    mem.addData(AsOfRow(1, 1L, B + 800L, 0L),
      AsOfRow(0, 1L, B + 1000L, 42L))
    q1.processAllAvailable()
    q1.stop() // the kill
    val q2 = start()
    // a late quote straddling the kill re-matches the RECOVERED trade
    mem.addData(AsOfRow(1, 1L, B + 900L, 0L))
    q2.processAllAvailable()
    q2.stop()
    val folded = buf.synchronized(buf.toSeq).filter(_.mult != 0L)
      .groupBy(o => (o.key, o.trade_id, o.ts, o.match_ts))
      .view.mapValues(_.map(_.mult).sum).filter(_._2 > 0L).keys.toSet
    assert(folded == Set((1L, 42L, B + 1000L, Some(B + 900L))),
      s"recovered trade not re-matched: $folded")
  }

  // ---------------------------------------------- banded delta join

  test("bandedJoinStream: fold == batch banded Z-join per prefix; deletes straddle batches; state drains") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(31)
    val BAND = 300L
    val LATE = 400L
    // inserts in time order; ~30% get a delete 1–2 batches later
    // (within the lateness window, so the retraction is admissible)
    val B = 1000000L
    val inserts = (0 until 300).map { s =>
      ZBandRow(rnd.nextInt(2), rnd.nextInt(3).toLong, B + s * 20L,
        s"p${s % 7}", 1L)
    }
    val slots = inserts.zipWithIndex.map { case (r, i) =>
      if (i % 3 == 0 && i < 290)
        Seq((r, i), (r.copy(mult = -1L), i + rnd.nextInt(10)))
      else Seq((r, i))
    }
    val timed = slots.flatten.sortBy(_._2).map(_._1)
    val batches = timed.grouped(25).map(b => rnd.shuffle(b.toVector)).toSeq
    val mem = MemoryStream[ZBandRow]
    val q = EventStreams.bandedJoinStream(mem.toDS(), BAND, LATE,
        probe = true)
      .writeStream.outputMode("append").format("memory")
      .queryName("bandout").start()
    def outRows() = spark.table("bandout").as[ZBandOut].collect().toSeq
    def fold(rows: Seq[ZBandOut]) = rows.filter(_.mult != 0L)
      .groupBy(o => (o.key, o.l_ts, o.l_payload, o.r_ts, o.r_payload))
      .view.mapValues(_.map(_.mult).sum).filter(_._2 != 0L).toMap
    def want(rows: Seq[ZBandRow]) = {
      def net(side: Int) = rows.filter(_.side == side)
        .groupBy(r => (r.key, r.ts, r.payload))
        .view.mapValues(_.map(_.mult).sum).filter(_._2 != 0L).toSeq
      (for {
        ((lk, lts, lp), lm) <- net(0)
        ((rk, rts, rp), rm) <- net(1)
        if lk == rk && math.abs(lts - rts) <= BAND
      } yield ((lk, lts, lp, rts, rp), lm * rm)).toMap
    }
    var prefix = Seq.empty[ZBandRow]
    batches.foreach { b =>
      mem.addData(b: _*)
      q.processAllAvailable()
      prefix ++= b
      assert(fold(outRows()) == want(prefix),
        s"prefix ${prefix.size} diverged")
    }
    assert(want(prefix).nonEmpty, "degenerate: empty view")
    assert(prefix.exists(_.mult == -1L), "degenerate: no deletes")
    // state bound: held rows per key stay within the band + lateness
    // + in-flight-batch window (≲1 s ≈ 67 rows over 3 keys) while a
    // key sees ~133 rows in total over the stream
    val probes = outRows().filter(_.mult == 0L)
    assert(probes.nonEmpty)
    assert(probes.map(p => p.l_ts + p.r_ts).max <= 45L,
      s"state not bounded: ${probes.map(p => p.l_ts + p.r_ts).max}")
    // full drain: advance the watermark far past everything with a
    // lone row on another key; every original key's state empties
    mem.addData(ZBandRow(0, 99L, B + 100000L, "z", 1L))
    q.processAllAvailable()
    mem.addData(ZBandRow(0, 99L, B + 101000L, "w", 1L))
    q.processAllAvailable()
    val drained = outRows().filter(o => o.mult == 0L && o.key != 99L)
      .groupBy(_.key).map { case (k, ps) => k -> ps.last }
    assert(drained.nonEmpty && drained.values.forall(p =>
      p.l_ts == 0L && p.r_ts == 0L), s"not drained: $drained")
    q.stop()
  }

  test("bandedJoinStream: at-horizon rows processed, below-horizon dropped") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[ZBandRow]
    val q = EventStreams.bandedJoinStream(mem.toDS(), 1000L, 500L)
      .writeStream.outputMode("append").format("memory")
      .queryName("bandedge").start()
    val B = 1000000L
    mem.addData(ZBandRow(0, 1L, B + 1000L, "a", 1L))
    q.processAllAvailable() // watermark → B + 500
    // exactly AT the watermark: LATE (ts <= watermark, Spark's
    // stateful-operator rule) — dropped, no emission
    mem.addData(ZBandRow(1, 1L, B + 500L, "x", 1L))
    q.processAllAvailable()
    val got = spark.table("bandedge").as[ZBandOut].collect().toSeq
    assert(!got.exists(_.r_payload == "x"), got)
    // strictly above it: processed (|1000 − 501| ≤ band)
    mem.addData(ZBandRow(1, 1L, B + 501L, "y", 1L))
    q.processAllAvailable()
    val after = spark.table("bandedge").as[ZBandOut].collect().toSeq
    assert(after.contains(
      ZBandOut(1L, B + 1000L, "a", B + 501L, "y", 1L)), after)
    q.stop()
  }

  test("bounded CDC composes through aggregation: bandedJoinStream → retractAgg == batch banded MV") {
    // the BOUNDED stage-1 feeding the MV fold — the st_mv relay with
    // evicting state: left payload carries the measure, right the
    // group; the relay needs no ordering (the fold is commutative)
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.EventStreams.{ZRow, ZSumOut}
    val rnd = new scala.util.Random(59)
    val B = 1000000L
    val BAND = 400L
    val rows = (0 until 200).map { s =>
      if (s % 2 == 0)
        ZBandRow(0, (s % 3).toLong, B + s * 20L, s"${(s % 5) + 1}.0", 1L)
      else
        ZBandRow(1, (s % 3).toLong, B + s * 20L, s"g${s % 4}", 1L)
    }
    val batches = rows.grouped(50).map(b => rnd.shuffle(b.toVector)).toSeq
    val mem = MemoryStream[ZBandRow]
    val q1 = EventStreams.bandedJoinStream(mem.toDS(), BAND, 300L)
      .writeStream.outputMode("append").format("memory")
      .queryName("mvb1").start()
    batches.foreach { b => mem.addData(b: _*); q1.processAllAvailable() }
    q1.stop()
    val stage1 = spark.table("mvb1").as[ZBandOut].collect().toSeq
      .map(o => ZRow(o.r_payload, o.l_payload.toDouble, o.mult))
    val mem2 = MemoryStream[ZRow]
    val q2 = EventStreams.retractAgg(mem2.toDS())
      .writeStream.outputMode("update").format("memory")
      .queryName("mvb2").start()
    mem2.addData(rnd.shuffle(stage1.toVector): _*)
    q2.processAllAvailable()
    q2.stop()
    val got = spark.table("mvb2").as[ZSumOut].collect()
      .groupBy(_.key).map { case (k, rs) =>
        val last = rs.maxBy(_.version); k -> ((last.n, last.sum_cents))
      }.filter { case (_, (n, c)) => n != 0L || c != 0L }
    // batch recompute: the banded join of the folded sides, aggregated
    val want = (for {
      l <- rows if l.side == 0
      r <- rows if r.side == 1 && r.key == l.key &&
        math.abs(l.ts - r.ts) <= BAND
    } yield (r.payload, l.payload.toDouble))
      .groupBy(_._1).map { case (g, vs) =>
        g -> ((vs.size.toLong, vs.map(v => (v._2 * 100).toLong).sum))
      }
    assert(got == want && want.nonEmpty)
  }

  test("bandedJoinStream survives kill/restart: state, watermark, and a straddling delete recover") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files
      .createTempDirectory("band_chk").toString
    val mem = MemoryStream[ZBandRow]
    val buf = new scala.collection.mutable.ArrayBuffer[ZBandOut]
    def start() = EventStreams.bandedJoinStream(mem.toDS(), 1000L, 500L)
      .writeStream.outputMode("append")
      .option("checkpointLocation", dir)
      .foreachBatch { (df: org.apache.spark.sql.Dataset[ZBandOut], _: Long) =>
        val rows = df.collect()
        buf.synchronized { rows.foreach(buf += _) }
      }
      .start()
    val B = 1000000L
    val q1 = start()
    mem.addData(ZBandRow(0, 1L, B + 1000L, "a", 1L),
      ZBandRow(1, 1L, B + 1200L, "x", 1L))
    q1.processAllAvailable()
    q1.stop() // the kill: state + watermark only in the checkpoint
    val q2 = start()
    // post-restart: a right row joins the RECOVERED left row, a
    // delete straddles the kill (retracting the pre-kill join), and a
    // fresh live left row 'b' arrives
    mem.addData(ZBandRow(1, 1L, B + 1500L, "y", 1L),
      ZBandRow(0, 1L, B + 1000L, "a", -1L),
      ZBandRow(0, 1L, B + 1400L, "b", 1L))
    q2.processAllAvailable()
    // the recovered WATERMARK (B+1500−500 = B+1000 after this batch)
    // still gates late rows: one below it must be dropped — it would
    // otherwise join the live 'b' row (|1400−900| ≤ band)
    mem.addData(ZBandRow(1, 1L, B + 900L, "late", 1L))
    q2.processAllAvailable()
    q2.stop()
    val all = buf.synchronized(buf.toSeq)
    def fold(rows: Seq[ZBandOut]) = rows.filter(_.mult != 0L)
      .groupBy(o => (o.key, o.l_ts, o.l_payload, o.r_ts, o.r_payload))
      .view.mapValues(_.map(_.mult).sum).filter(_._2 != 0L).toMap
    // a's joins net to zero through the straddling delete; b's two
    // joins are live; the late row joined nothing
    assert(fold(all) == Map(
      (1L, B + 1400L, "b", B + 1200L, "x") -> 1L,
      (1L, B + 1400L, "b", B + 1500L, "y") -> 1L), fold(all).toString)
    assert(all.exists(o =>
        o.l_payload == "a" && o.r_payload == "x" && o.mult == 1L),
      "pre-kill join missing")
    assert(all.exists(o =>
        o.l_payload == "a" && o.r_payload == "x" && o.mult == -1L),
      "straddling delete did not retract the pre-kill join from recovered state")
    assert(!all.exists(o => o.r_payload == "late"),
      "recovered watermark did not gate the late row")
  }

  // ------------------------------------------------------------ scd2

  test("scd2Stream: fold == batch Scd2.build per prefix; late events straddle batches; frozen prefix evicts") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(47)
    val LATE = 300L
    // events per key every 100 ms, with late ones placed 1–2 batches
    // after their timestamp (inside the lateness window)
    val B = 1000000L
    val raw = (0 until 90).flatMap { s =>
      (0 until 2).map { k =>
        Scd2Event(k.toLong, s * 10L + k, s"a${rnd.nextInt(4)}",
          B + s * 100L + rnd.nextInt(50))
      }
    }
    val timed = raw.map { e =>
      val slot = e.ts / 100 + (if (rnd.nextInt(4) == 0) 2 else 0)
      (e, slot)
    }.sortBy(_._2).map(_._1)
    val batches = timed.grouped(36).map(b => rnd.shuffle(b.toVector)).toSeq
    val mem = MemoryStream[Scd2Event]
    val q = EventStreams.scd2Stream(mem.toDS(), LATE, probe = true)
      .writeStream.outputMode("append").format("memory")
      .queryName("scd2out").start()
    def outRows() = spark.table("scd2out").as[Scd2Out].collect().toSeq
    def fold(rows: Seq[Scd2Out]) = rows.filter(_.mult != 0L)
      .groupBy(o => (o.key, o.event_id, o.version, o.attr,
        o.valid_from, o.valid_to, o.is_current))
      .view.mapValues(_.map(_.mult).sum).filter(_._2 > 0L).keys.toSet
    var prefix = Seq.empty[Scd2Event]
    batches.foreach { b =>
      mem.addData(b: _*)
      q.processAllAvailable()
      prefix ++= b
      val want = graft.ops.Scd2.build(
          prefix.map(e => (e.key, e.event_id, e.attr, e.ts))
            .toDF("k", "eid", "attr", "ets"),
          col("k"), col("eid"), col("attr"), col("ets"))
        .as[(Long, Long, Long, String, Long, Option[Long], Boolean)]
        .collect().toSet
      assert(fold(outRows()).map(o =>
        (o._1, o._2, o._3, o._4, o._5, o._6, o._7)) == want,
        s"prefix ${prefix.size} diverged")
    }
    // a late event actually split a closed interval across batches
    assert(outRows().count(_.mult == -1L) > 0, "degenerate: no splits")
    // frozen-prefix eviction: each key holds ~90 versions in total,
    // but the held chain stays inside the lateness window (~3 steps
    // + open row + in-flight batch), and the frozen count grows
    val probes = outRows().filter(_.mult == 0L)
    val last = probes.groupBy(_.key).map(_._2.last)
    assert(last.forall(_.event_id <= 45L),
      s"chain not evicted: ${last.map(p => p.key -> p.event_id)}")
    assert(last.forall(_.version >= 40L),
      s"frozen counts too small: ${last.map(p => p.key -> p.version)}")
    q.stop()
  }

  test("scd2Stream survives kill/restart from a real checkpoint") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files
      .createTempDirectory("scd2_chk").toString
    val mem = MemoryStream[Scd2Event]
    // foreachBatch sink: the memory sink refuses recovery
    val buf = new scala.collection.mutable.ArrayBuffer[Scd2Out]
    def start() = EventStreams.scd2Stream(mem.toDS(), 300L)
      .writeStream.outputMode("append")
      .option("checkpointLocation", dir)
      .foreachBatch { (df: org.apache.spark.sql.Dataset[Scd2Out], _: Long) =>
        val rows = df.collect()
        buf.synchronized { rows.foreach(buf += _) }
      }
      .start()
    val q1 = start()
    mem.addData(Scd2Event(1L, 1L, "a", 100L), Scd2Event(1L, 3L, "c", 300L))
    q1.processAllAvailable()
    q1.stop() // the "kill": state only on disk
    val q2 = start()
    // the late split arrives after the restart — state must recover
    // (without it, event 2 would chain as a lone version 1)
    mem.addData(Scd2Event(1L, 2L, "b", 200L))
    q2.processAllAvailable()
    q2.stop()
    val folded = buf.synchronized(buf.toSeq)
      .filter(_.mult != 0L)
      .groupBy(o => (o.key, o.event_id, o.version, o.attr,
        o.valid_from, o.valid_to, o.is_current))
      .view.mapValues(_.map(_.mult).sum).filter(_._2 > 0L).keys.toSet
    assert(folded == Set(
      (1L, 1L, 1L, "a", 100L, Some(200L), false),
      (1L, 2L, 2L, "b", 200L, Some(300L), false),
      (1L, 3L, 3L, "c", 300L, None, true)))
  }
}
