package graft

import org.apache.spark.sql.functions._
import graft.ops._

class OpsSpec extends SparkSpec {
  import spark.implicits._

  test("mergeIndicator classifies both/left_only/right_only") {
    val l = Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "lv")
    val r = Seq((2, "x"), (3, "y"), (4, "z")).toDF("k2", "rv")
    val m = Reconcile.mergeIndicator(l, r, col("k") === col("k2"))
      .select(coalesce(col("k"), col("k2")).as("kk"), col(Reconcile.IndicatorCol))
      .as[(Int, String)].collect().toMap
    assert(m == Map(1 -> "left_only", 2 -> "both", 3 -> "both", 4 -> "right_only"))
  }

  test("mergeIndicatorWithFallback joins by primary key when any remoteId is usable") {
    val file = Seq(("1", "Store A"), ("2", "Store B"), ("3", "Store C"))
      .toDF("unit", "loc_name")
    // unit 2's API row has a blank remoteId but a matching name: with
    // OTHER usable remoteIds present the primary key must win, so it
    // stays unmatched (left_only + right_only), not name-matched
    val api = Seq(("1", "store a"), ("", "store b")).toDF("remote_id", "api_name")
    val m = Reconcile.mergeIndicatorWithFallback(
        file, api, col("remote_id"),
        col("unit") === col("remote_id"),
        lower(trim(col("loc_name"))) === col("api_name"))
      .groupBy(col(Reconcile.IndicatorCol)).count()
      .as[(String, Long)].collect().toMap
    assert(m == Map("both" -> 1L, "left_only" -> 2L, "right_only" -> 1L))
  }

  test("mergeIndicatorWithFallback falls back to the name key when every remoteId is blank") {
    val file = Seq(("1", "Store A"), ("2", "Store B"), ("3", "Store C"))
      .toDF("unit", "loc_name")
    val api = Seq(("", "store a"), ("", "store b"), ("", "store zz"))
      .toDF("remote_id", "api_name")
    val m = Reconcile.mergeIndicatorWithFallback(
        file, api, col("remote_id"),
        col("unit") === col("remote_id"),
        lower(trim(col("loc_name"))) === col("api_name"))
      .groupBy(col(Reconcile.IndicatorCol)).count()
      .as[(String, Long)].collect().toMap
    assert(m == Map("both" -> 2L, "left_only" -> 1L, "right_only" -> 1L))
  }

  test("mergeIndicatorWithFallback: null or whitespace remoteIds force the primary branch") {
    // pandas `(remoteId == "").all()`: NaN and " " rows compare False,
    // so the frame is NOT all-blank and the primary key is used even
    // though no remoteId is actually usable — names must not match.
    val file = Seq(("1", "Store A"), ("2", "Store B")).toDF("unit", "loc_name")
    val api = Seq((null.asInstanceOf[String], "store a"), (" ", "store b"))
      .toDF("remote_id", "api_name")
    val m = Reconcile.mergeIndicatorWithFallback(
        file, api, col("remote_id"),
        col("unit") === col("remote_id"),
        lower(trim(col("loc_name"))) === col("api_name"))
      .groupBy(col(Reconcile.IndicatorCol)).count()
      .as[(String, Long)].collect().toMap
    assert(m == Map("left_only" -> 2L, "right_only" -> 2L))
  }

  test("loadedCountCheck reports equality and strict mode raises on mismatch") {
    val loaded = Seq(1, 2, 3).toDF("id")
    val expected = Seq(10, 20, 30).toDF("id")
    val ok = Reconcile.loadedCountCheck(loaded, expected).head()
    assert(ok.getAs[Boolean]("ok") && ok.getAs[Long]("loaded_n") == 3L)
    val bad = Reconcile.loadedCountCheck(loaded, expected.limit(2))
    assert(!bad.head().getAs[Boolean]("ok"))
    intercept[IllegalStateException] {
      Reconcile.loadedCountCheck(loaded, expected.limit(2), strict = true)
    }
  }

  test("anti+semi partition the left frame") {
    val c = spark.read.parquet(s"$sf/customer.parquet")
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val cond = col("c_custkey") === col("o_custkey")
    val anti = Reconcile.antiJoin(c, o, cond).count()
    val semi = Reconcile.semiJoin(c, o, cond).count()
    assert(anti + semi == c.count())
  }

  test("hierarchy groups: children point at an existing top") {
    val align = Seq(("R1", "D1"), ("R1", "D2"), ("R2", "D3"), ("R1", "D1"))
      .toDF("region", "district")
    val g = Hierarchy.buildGroups(align, "region", "district", "Region", "District")
    val tops = g.filter(col("level_name") === "Region")
      .select("group_name").as[String].collect().toSet
    assert(tops == Set("R1", "R2"))
    val children = g.filter(col("level_name") === "District")
    assert(children.count() == 3)
    assert(children.filter(!col("parent_name").isin(tops.toSeq: _*)).count() == 0)
  }

  test("keepFirst picks minimal order tuple per key") {
    val df = Seq((1, 10, "b"), (1, 5, "a"), (2, 7, "c")).toDF("k", "ord", "v")
    val got = Collect.keepFirst(df, col("k"), col("ord"), col("v"))
      .select(col("k"), col("_first.ord")).as[(Int, Int)].collect().toMap
    assert(got == Map(1 -> 5, 2 -> 7))
  }

  test("sessionize splits on gap") {
    val us = 1000000L
    val df = Seq(
      (1L, 0L * us, 1L), (1L, 60L * us, 2L), (1L, 5000L * us, 3L),
      (2L, 0L * us, 4L)
    ).toDF("uid", "ts_us", "eid")
    val got = Sessionize.sessions(df, col("uid"), col("ts_us"), col("eid"), 1800L * us)
    assert(got.count() == 3)
    assert(got.filter(col("key") === 1L && col("n_events") === 2).count() == 1)
  }

  test("saltedJoin equals a plain join") {
    val probe = Seq((1, "a", 10.0), (2, "b", 20.0), (3, "a", 30.0))
      .toDF("id", "k", "v")
    val build = Seq(("a", 100), ("b", 200)).toDF("bk", "w")
    val got = Skew.saltedJoin(probe, build, col("k"), col("bk"), col("id"), salts = 4)
      .select(col("id"), col("w")).as[(Int, Int)].collect().toSet
    val want = probe.join(build, col("k") === col("bk"))
      .select(col("id"), col("w")).as[(Int, Int)].collect().toSet
    assert(got == want && got.size == 3)
  }

  test("exactMoments matches closed-form on a tiny frame") {
    val df = Seq(("g", 1.0, 2.0), ("g", 3.0, 6.0), ("g", 5.0, 10.0))
      .toDF("k", "x", "y")
    val row = Stats.exactMoments(df, col("k"), col("x"), col("y")).collect()(0)
    assert(row.getAs[Double]("mean_x") == 3.0)
    assert(math.abs(row.getAs[Double]("var_x") - 8.0 / 3) < 1e-12)
    // y = 2x exactly => corr 1
    assert(math.abs(row.getAs[Double]("corr_xy") - 1.0) < 1e-12)
  }

  test("DataProfile counts nulls and cardinality in one pass") {
    val df = Seq(
      (Some(1), Some("a")), (Some(2), None), (None, Some("a"))
    ).toDF("x", "y")
    val got = DataProfile.profile(df)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("x") == ((3L, 1L, 2L)))
    assert(got("y") == ((3L, 1L, 1L)))
    // single job: exactly one aggregation over the input
    assert(DataProfile.profile(df).queryExecution.executedPlan.toString
      .contains("HashAggregate") )
  }

  test("AsOf.join picks the latest right row at-or-before each left row") {
    val trades = Seq((1L, "A", 100L), (2L, "A", 205L), (3L, "B", 150L))
      .toDF("trade_id", "sym", "t_ts")
    val quotes = Seq(
      ("A", 90L, 10.0), ("A", 100L, 11.0), ("A", 200L, 12.0),
      ("B", 160L, 99.0))
      .toDF("q_sym", "q_ts", "px")
    val got = AsOf.join(
      trades, col("sym"), col("t_ts"),
      quotes, col("q_sym"), col("q_ts"),
      rightPayload = Seq("px" -> col("px")))
      .select(col("trade_id"), col("px"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got(1L) == Some(11.0)) // inclusive: quote AT 100 matches
    assert(got(2L) == Some(12.0)) // latest at-or-before 205
    assert(got(3L) == None)       // B's only quote is later
  }

  test("AsOf.deltaJoin: late quotes re-match; fold == corrected as-of recompute") {
    // hand-crafted first: base quote A@100/px 11; base trades A@150
    // (matched 11) and A@50 (matched NULL). Delta quotes: A@120
    // (claims the @150 trade), A@10 (claims the previously-NULL @50
    // trade), B@5 (fresh key). Delta trade B@7 matches the delta
    // quote directly.
    val baseT = Seq((1L, "A", 150L), (2L, "A", 50L))
      .toDF("trade_id", "sym", "t_ts")
    val dT = Seq((3L, "B", 7L)).toDF("trade_id", "sym", "t_ts")
    val baseQ = Seq(("A", 100L, 11.0)).toDF("q_sym", "q_ts", "px")
    val dQ = Seq(("A", 120L, 12.0), ("A", 10L, 9.0), ("B", 5L, 1.0))
      .toDF("q_sym", "q_ts", "px")
    val delta = AsOf.deltaJoin(baseT, dT, baseQ, dQ,
        col("sym"), col("t_ts"), col("q_sym"), col("q_ts"),
        rightPayload = Seq("px" -> col("px")))
      .as[(Long, String, Long, Option[Double], Long)].collect().toSet
    assert(delta == Set(
      (1L, "A", 150L, Some(12.0), 1L), (1L, "A", 150L, Some(11.0), -1L),
      (2L, "A", 50L, Some(9.0), 1L), (2L, "A", 50L, None, -1L),
      (3L, "B", 7L, Some(1.0), 1L)))
    // random fold equivalence: base result ∪ delta, Σ mult, keep > 0
    // == the full as-of over the corrected tables — multiple delta
    // quotes inside one gap, ties at trade timestamps, fresh keys,
    // and delta trades matching delta quotes all land in the trial
    val rnd = new scala.util.Random(73)
    val allQ = rnd.shuffle(
      (for (k <- 0 to 4; t <- 0 to 60) yield (k, t))
        .filter(_ => rnd.nextBoolean()).toVector)
      .map { case (k, t) => (s"k$k", t * 10L, rnd.nextInt(100).toDouble) }
    val allT = (0 until 300).map(i =>
      (i.toLong, s"k${rnd.nextInt(6)}", rnd.nextInt(650).toLong))
    val (bQ, deltaQ) = allQ.partition(q => (q._2 / 10) % 3 != 0)
    val (bT, deltaT) = allT.partition(t => t._1 % 4 != 0)
    def Q(rows: Seq[(String, Long, Double)]) = rows.toDF("q_sym", "q_ts", "px")
    def T(rows: Seq[(Long, String, Long)]) = rows.toDF("trade_id", "sym", "t_ts")
    val base = AsOf.join(T(bT), col("sym"), col("t_ts"),
        Q(bQ), col("q_sym"), col("q_ts"),
        rightPayload = Seq("px" -> col("px")))
      .withColumn("mult", lit(1L))
    val d = AsOf.deltaJoin(T(bT), T(deltaT), Q(bQ), Q(deltaQ),
      col("sym"), col("t_ts"), col("q_sym"), col("q_ts"),
      rightPayload = Seq("px" -> col("px")))
    val cols = Seq(col("trade_id"), col("sym"), col("t_ts"), col("px"))
    val folded = base.unionByName(d)
      .groupBy(cols: _*).agg(sum(col("mult")).as("mult"))
      .filter(col("mult") > 0L).select(cols: _*)
      .as[(Long, String, Long, Option[Double])].collect().toSet
    val want = AsOf.join(T(allT), col("sym"), col("t_ts"),
        Q(allQ), col("q_sym"), col("q_ts"),
        rightPayload = Seq("px" -> col("px")))
      .as[(Long, String, Long, Option[Double])].collect().toSet
    assert(folded == want && want.nonEmpty)
    assert(d.filter(col("mult") === -1L).count() > 0,
      "degenerate trial: no re-matches")
    // the claim frame broadcasts — the base-left scan is probed, not
    // shuffled
    val plan = d.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"), plan)
    // r15 (r14 verdict item 2): ALL THREE right-side passes are
    // broadcast-semi SLICED to delta-touched keys — the union next
    // pass (ΔQ keys), the old-match pass (ΔQ keys), and the ΔT arm's
    // corrected-right as-of (ΔT keys). No arm shuffles the full right
    // side into a window.
    assert("LeftSemi".r.findAllIn(plan).size >= 3, plan)
    // reserved working names are rejected loudly (r14 advice)
    val clash = intercept[IllegalArgumentException] {
      AsOf.deltaJoin(baseT.withColumn("_tq", lit(1)),
        dT.withColumn("_tq", lit(1)), baseQ, dQ,
        col("sym"), col("t_ts"), col("q_sym"), col("q_ts"),
        rightPayload = Seq("px" -> col("px")))
    }
    assert(clash.getMessage.contains("_tq") &&
      clash.getMessage.contains("reserved"))
    // NULL-KEY trial (r15 review): the as-of window groups null keys
    // as one real key, so a late null-key quote must claim null-key
    // base trades — every key pass is null-safe
    val nT = Seq((1L, Option("A"), 150L), (2L, Option.empty[String], 150L))
      .toDF("trade_id", "sym", "t_ts")
    val nQ0 = Seq((Option.empty[String], 100L, 7.0))
      .toDF("q_sym", "q_ts", "px")
    val ndQ = Seq((Option.empty[String], 120L, 8.0))
      .toDF("q_sym", "q_ts", "px")
    val nGot = AsOf.deltaJoin(nT, nT.limit(0), nQ0, ndQ,
        col("sym"), col("t_ts"), col("q_sym"), col("q_ts"),
        rightPayload = Seq("px" -> col("px")))
      .as[(Long, Option[String], Long, Option[Double], Long)]
      .collect().toSet
    assert(nGot == Set(
      (2L, None, 150L, Some(8.0), 1L),
      (2L, None, 150L, Some(7.0), -1L)),
      s"null-key late quote must re-match the null-key trade: $nGot")
  }

  test("Scd2.deltaMaintain: late events split, close, renumber; == rebuild of the full log") {
    import graft.ops.Scd2
    // user 1: versions at 10 (a), 30 (b); a LATE event at 20 (c) must
    // split [10,30) into [10,20)+[20,30) and renumber b to version 3;
    // a late event at 40 (d) closes the open row. user 2 untouched.
    val base = Seq(
      (1L, 101L, "a", 10L), (1L, 102L, "b", 30L),
      (2L, 201L, "x", 5L))
      .toDF("uid", "eid", "at", "ets")
    val late = Seq((1L, 103L, "c", 20L), (1L, 104L, "d", 40L))
      .toDF("uid", "eid", "at", "ets")
    val store = Scd2.build(base, col("uid"), col("eid"), col("at"),
      col("ets")).localCheckpoint()
    val got = Scd2.deltaMaintain(store, late, col("uid"), col("eid"),
        col("at"), col("ets"))
      .as[(Long, Long, Long, String, Long, Option[Long], Boolean)]
      .collect().toSet
    assert(got == Set(
      (1L, 101L, 1L, "a", 10L, Some(20L), false),
      (1L, 103L, 2L, "c", 20L, Some(30L), false),
      (1L, 102L, 3L, "b", 30L, Some(40L), false),
      (1L, 104L, 4L, "d", 40L, None, true),
      (2L, 201L, 1L, "x", 5L, None, true)))
    // untouched user 2's row is the STORE row bit-for-bit
    assert(got.filter(_._1 == 2L) ==
      store.as[(Long, Long, Long, String, Long, Option[Long], Boolean)]
        .collect().toSet.filter(_._1 == 2L))
    // random fold equivalence: maintenance == rebuild of the full log
    // (same-ts ties resolved by event_id on both paths)
    val rnd = new scala.util.Random(79)
    val all = (0 until 400).map(i =>
      (rnd.nextInt(8).toLong, i.toLong, s"a${rnd.nextInt(4)}",
        rnd.nextInt(50).toLong * 3L))
    val (b2, l2) = all.partition(_._2 % 4 != 0)
    def D(rows: Seq[(Long, Long, String, Long)]) =
      rows.toDF("uid", "eid", "at", "ets")
    val store2 = Scd2.build(D(b2), col("uid"), col("eid"), col("at"),
      col("ets")).localCheckpoint()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().toSeq.map(_.toSeq).sortBy(_.mkString("|"))
    val maintained = Scd2.deltaMaintain(store2, D(l2), col("uid"),
      col("eid"), col("at"), col("ets"))
    val rebuilt = Scd2.build(D(all), col("uid"), col("eid"), col("at"),
      col("ets"))
    assert(rows(maintained) == rows(rebuilt) && all.nonEmpty)
    // schema guard fires loudly
    assert(intercept[IllegalArgumentException] {
      Scd2.deltaMaintain(store2.drop("event_id"), D(l2), col("uid"),
        col("eid"), col("at"), col("ets"))
    }.getMessage.contains("build() schema"))
  }

  test("Scd2.deltaMaintain: null-key late events rebuild WITH the null-key store slice (r15)") {
    import graft.ops.Scd2
    // build() windows null keys as ONE group; the touched-key probe
    // must therefore be null-safe, or the old null-key rows pass
    // through untouched while the late event renumbers in isolation
    val base = Seq(
      (Option("a"), 1L, "x", 10L),
      (Option.empty[String], 2L, "y", 10L),
      (Option.empty[String], 3L, "z", 30L))
      .toDF("uid", "eid", "at", "ets")
    val late = Seq((Option.empty[String], 4L, "w", 20L))
      .toDF("uid", "eid", "at", "ets")
    val store = Scd2.build(base, col("uid"), col("eid"), col("at"),
      col("ets")).localCheckpoint()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().toSeq.map(_.toSeq).sortBy(_.mkString("|"))
    val maintained = Scd2.deltaMaintain(store, late, col("uid"),
      col("eid"), col("at"), col("ets"))
    val rebuilt = Scd2.build(base.unionByName(late), col("uid"),
      col("eid"), col("at"), col("ets"))
    assert(rows(maintained) == rows(rebuilt))
    // the null-key chain renumbered 1..3 with the split interval
    val nulls = maintained.filter(col("key").isNull)
      .as[(Option[String], Long, Long, String, Long, Option[Long], Boolean)]
      .collect().toSet
    assert(nulls == Set(
      (None, 2L, 1L, "y", 10L, Some(20L), false),
      (None, 4L, 2L, "w", 20L, Some(30L), false),
      (None, 3L, 3L, "z", 30L, None, true)))
  }

  test("Scd2.pruneFrozen + deltaMaintain: retention keeps ABSOLUTE versions; prune→fold == full build filtered") {
    import graft.ops.Scd2
    // the batch analog of scd2Stream's frozen-prefix eviction: prune
    // versions with valid_to <= H (a per-key chain PREFIX — the open
    // row always survives), then keep folding late events with
    // ts > H. The maintained suffix must equal the FULL-log build
    // filtered by retention, with absolute version numbers.
    val rnd = new scala.util.Random(113)
    // + one solo-event key (100): only an open row, so never pruned —
    // the guaranteed offset-0 key for the last check
    val all = (0 until 500).map(i =>
      (rnd.nextInt(9).toLong, i.toLong, s"a${rnd.nextInt(4)}",
        rnd.nextInt(50).toLong * 3L)) :+ (100L, 9000L, "solo", 3L)
    val h = 75L
    val (base, lateAll) = all.partition(_._2 % 4 != 0)
    val (l2, l1) = lateAll.partition(_._4 > h) // fold l1 pre-prune
    def D(rows: Seq[(Long, Long, String, Long)]) =
      rows.toDF("uid", "eid", "at", "ets")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().toSeq.map(_.toSeq).sortBy(_.mkString("|"))
    val s0 = Scd2.build(D(base), col("uid"), col("eid"), col("at"),
      col("ets")).localCheckpoint()
    val s1 = Scd2.deltaMaintain(s0, D(l1), col("uid"), col("eid"),
      col("at"), col("ets")).localCheckpoint()
    val pruned = Scd2.pruneFrozen(s1, h).localCheckpoint()
    assert(pruned.count() < s1.count(), "degenerate: nothing pruned")
    // versions stay ABSOLUTE through the prune (suffix property)
    assert(pruned.filter(col("version") > 1L).count() > 0L)
    val s2 = Scd2.deltaMaintain(pruned, D(l2), col("uid"), col("eid"),
      col("at"), col("ets"))
    val truth = Scd2.pruneFrozen(
      Scd2.build(D(all), col("uid"), col("eid"), col("at"),
        col("ets")), h)
    assert(rows(s2) == rows(truth) && l1.nonEmpty && l2.nonEmpty)
    // the pruned-history guard: an event preceding its key's first
    // RETAINED version fails loudly instead of taking a wrong
    // absolute version
    val offKey = s2.groupBy(col("key"))
      .agg(min(col("version")).as("mv")).filter(col("mv") > 1L)
      .select(col("key")).as[Long].head()
    val early = Seq((offKey, 9999L, "zz", 0L))
      .toDF("uid", "eid", "at", "ets")
    val e = intercept[Throwable] {
      Scd2.deltaMaintain(s2.localCheckpoint(), early, col("uid"),
        col("eid"), col("at"), col("ets")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("pruned history")),
      msgs(e).mkString("\n"))
    // unpruned keys (version 1 retained) still accept earlier-than-
    // first events — offset 0 keeps the pre-retention behavior
    val early2 = Seq((100L, 9998L, "yy", 0L))
      .toDF("uid", "eid", "at", "ets")
    val s3 = Scd2.deltaMaintain(s2.localCheckpoint(), early2,
      col("uid"), col("eid"), col("at"), col("ets"))
    assert(s3.filter(col("event_id") === 9998L)
      .select(col("version")).as[Long].head() == 1L)
  }

  test("AsOf.join tolerance nulls matches staler than the bound") {
    val trades = Seq((1L, "A", 100L), (2L, "A", 205L), (3L, "A", 500L))
      .toDF("trade_id", "sym", "t_ts")
    val quotes = Seq(("A", 90L, 10.0), ("A", 200L, 12.0))
      .toDF("q_sym", "q_ts", "px")
    val got = AsOf.join(
      trades, col("sym"), col("t_ts"),
      quotes, col("q_sym"), col("q_ts"),
      rightPayload = Seq("px" -> col("px")),
      tolerance = Some(50L))
      .select(col("trade_id"), col("px"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got(1L) == Some(10.0)) // 100-90=10 ≤ 50
    assert(got(2L) == Some(12.0)) // 205-200=5 ≤ 50
    assert(got(3L) == None)       // latest quote 200 is 300 stale
  }

  test("Expectations: null semantics per rule family") {
    import Expectations._
    // k: 1,1,2,null — v: 5, 50, null, 7
    val fact = Seq(
      (Option(1L), Option(5.0)), (Option(1L), Option(50.0)),
      (Option(2L), None), (Option.empty[Long], Option(7.0)))
      .toDF("k", "v")
    val dim = Seq(1L).toDF("pk")
    val got = check(fact, Seq(
      NotNull("v_notnull", col("v")),       // 1 null v
      InRange("v_range", col("v"), 0, 10),  // 50 violates; null v skipped
      Unique("k_unique", col("k")),         // 3 non-null k, 2 distinct → 1
      RefIntegrity("k_fk", col("k"), dim, "pk"))) // k=2 misses; null k skipped
      .select(col("rule"), col("violations"), col("passed"))
      .as[(String, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("v_notnull") == ((1L, false)))
    assert(got("v_range") == ((1L, false)))
    assert(got("k_unique") == ((1L, false)))
    assert(got("k_fk") == ((1L, false)))
    // all-pass suite on the clean subset
    val clean = check(fact.filter(col("k") === 1 && col("v") === 5.0),
      Seq(NotNull("nn", col("v")), Unique("u", col("k"))))
    assert(clean.filter(!col("passed")).count() == 0)
  }

  test("spanDedup drops repeated chunks and rebuilds survivors in order") {
    import graft.llm.Dedup
    // chunk=2: doc 1 = [a b][c d], doc 2 = [a b][x y], doc 3 = [c d]
    val docs = Seq(
      (1L, "a b c d"), (2L, "a b x y"), (3L, "c d"))
      .toDF("id", "txt")
    val got = Dedup.spanDedup(docs, col("id"), col("txt"), chunk = 2)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((2L, 2L, "a b c d")))  // first owner keeps all
    assert(got(2L) == ((2L, 1L, "x y")))      // [a b] deduped away
    assert(got(3L) == ((1L, 0L, "")))         // [c d] fully deduped
  }
}
