package graft

import org.apache.spark.sql.functions._
import graft.ops.{Funnel, Snapshot}
import graft.llm.TextAnalysis

class FunnelSnapshotSpec extends SparkSpec {
  import spark.implicits._

  test("Snapshot.diff classifies added/deleted/changed/same, null-safe") {
    val oldS = Seq(
      (1L, Some(10.0), "A"), // same
      (2L, Some(20.0), "B"), // changed (value)
      (3L, None: Option[Double], "C"), // same (null payload both sides)
      (4L, Some(40.0), "D") // deleted
    ).toDF("k", "v", "s")
    val newS = Seq(
      (1L, Some(10.0), "A"),
      (2L, Some(21.0), "B"),
      (3L, None: Option[Double], "C"),
      (5L, Some(50.0), "E") // added
    ).toDF("k", "v", "s")
    val got = Snapshot.diff(oldS, newS, "k", Seq("v", "s"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(
      1L -> "same", 2L -> "changed", 3L -> "same",
      4L -> "deleted", 5L -> "added"))
  }

  test("Funnel.stages requires strictly-earlier previous step") {
    val ev = Seq(
      // user 1: clean view -> click -> purchase
      (1L, 10L, 1L, "view"), (1L, 20L, 2L, "click"), (1L, 30L, 3L, "purchase"),
      // user 2: click BEFORE any view never qualifies; purchase needs
      // a qualifying click, so stage stops at 1
      (2L, 10L, 4L, "click"), (2L, 20L, 5L, "view"), (2L, 30L, 6L, "purchase"),
      // user 3: same ts, ordering falls to the tie column — the click
      // (tie 8) sees the view (tie 7) as a preceding row
      (3L, 10L, 7L, "view"), (3L, 10L, 8L, "click"),
      // user 4: nothing relevant
      (4L, 10L, 9L, "error")
    ).toDF("u", "ts", "eid", "et")
    val got = Funnel.stages(
      ev, col("u"), col("ts"), col("eid"),
      col("et") === "view", col("et") === "click", col("et") === "purchase")
      .select(col("user"), col("stage"))
      .as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 3, 2L -> 1, 3L -> 2, 4L -> 0))
  }

  test("Funnel.stages plan shuffles once (windows + agg share the user key)") {
    val ev = Seq((1L, 10L, 1L, "view")).toDF("u", "ts", "eid", "et")
    val plan = Funnel.stages(
      ev, col("u"), col("ts"), col("eid"),
      col("et") === "view", col("et") === "click", col("et") === "purchase")
      .queryExecution.executedPlan.toString
    assert("ShuffleExchange|Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      s"expected one exchange:\n$plan")
  }

  test("Funnel.retention buckets by first-week cohort and offset") {
    val ev = Seq(
      (1L, 0L), (1L, 8L),  // cohort 0, offsets 0 and 1
      (2L, 7L), (2L, 8L),  // cohort 1, offset 0 twice
      (3L, 7L)             // cohort 1, offset 0
    ).toDF("user_id", "d")
    val got = Funnel.retention(ev, "user_id", col("d"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set((0L, 0L, 1L, 1L), (0L, 1L, 1L, 1L), (1L, 0L, 2L, 3L)))
  }

  test("pathTrigrams counts consecutive triples per user, ranked") {
    val ev = Seq(
      (1L, 1L, 1L, "a"), (1L, 2L, 2L, "b"), (1L, 3L, 3L, "c"), (1L, 4L, 4L, "b"),
      (2L, 1L, 5L, "a"), (2L, 2L, 6L, "b"), (2L, 3L, 7L, "c")
    ).toDF("u", "ts", "eid", "et")
    val got = Funnel.pathTrigrams(
      ev, col("u"), col("ts"), col("eid"), col("et"), k = 10)
      .select("path", "n", "rnk").as[(String, Long, Long)].collect().toSeq
    // a>b>c twice (both users), b>c>b once (user 1)
    assert(got == Seq(("a>b>c", 2L, 1L), ("b>c>b", 1L, 2L)))
  }

  test("movingAvg averages the trailing window in exact decimal") {
    val daily = Seq(
      ("k", 1L, 10.0), ("k", 2L, 20.0), ("k", 3L, 30.0), ("k", 4L, 40.0))
      .toDF("key", "day", "v")
    val got = graft.ops.Timeseries.movingAvg(daily, "key", "day", "v", window = 3)
      .select("day", "mavg", "n_window")
      .as[(Long, Double, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 10.0, 1L), (2L, 15.0, 2L), (3L, 20.0, 3L), (4L, 30.0, 3L)))
  }

  test("fuzzyJoin: two-ended blocking catches an edit at either end, folds double hits") {
    val l = Seq((1L, "martha king"), (2L, "zachary s")).toDF("id", "s")
    val r = Seq(
      (10L, "marta king"),   // mid deletion: both ends match (distinct folds it)
      (11L, "xachary s"),    // HEAD edit: prefix blocks differ, suffix catches
      (12L, "martha kingz"), // TAIL edit: suffix blocks differ, prefix catches
      (13L, "xartha kinx"),  // edits at BOTH ends (d=2): out of τ=1 scope
      (14L, "martha king")   // exact
    ).toDF("id", "s")
    val got = graft.ops.Reconcile.fuzzyJoin(
      l, col("id"), col("s"), r, col("id"), col("s"), maxDist = 1)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 10L, 1L), (2L, 11L, 1L), (1L, 12L, 1L), (1L, 14L, 0L)))
  }

  test("fuzzyJoin REJECTS maxDist ≥ 2 — its blocking would silently lose recall there") {
    val df = Seq((1L, "abc")).toDF("id", "s")
    val e = intercept[IllegalArgumentException] {
      graft.ops.Reconcile.fuzzyJoin(
        df, col("id"), col("s"), df, col("id"), col("s"), maxDist = 2)
    }
    assert(e.getMessage.contains("fuzzyJoinSegments"))
  }

  test("fuzzyJoinSegments at τ=2 finds pairs the two-ended scheme structurally cannot") {
    val l = Seq((1L, "martha king"), (2L, "zachary s")).toDF("id", "s")
    val r = Seq(
      (10L, "marta king"),
      (13L, "xartha kinx"), // edits at BOTH ends: invisible to prefix∪suffix
      (14L, "martha king")
    ).toDF("id", "s")
    val got = graft.ops.Reconcile.fuzzyJoinSegments(
      l, col("id"), col("s"), r, col("id"), col("s"), maxDist = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 10L, 1L), (1L, 13L, 2L), (1L, 14L, 0L)))
  }

  test("fuzzyJoinSegments compressed mode: canonical ids + carrier counts, expansion-consistent") {
    // replicated corpus: "alpha name" carried by 3 left ids, its
    // 1-edit neighbor by 2 right ids; an unrelated singleton pair
    val l = Seq((7L, "alpha name"), (3L, "alpha name"), (9L, "alpha name"),
      (20L, "other thing")).toDF("id", "s")
    val r = Seq((105L, "alpha namex"), (101L, "alpha namex"),
      (200L, "other thing")).toDF("id", "s")
    val comp = graft.ops.Reconcile.fuzzyJoinSegments(
        l, col("id"), col("s"), r, col("id"), col("s"), maxDist = 2,
        expandIds = false)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    // canonical = min id per string; n = carrier count
    assert(comp == Set((3L, 101L, 1L, 3L, 2L), (20L, 200L, 0L, 1L, 1L)))
    // the expanded mode is exactly the compressed rows fanned out:
    // n_a × n_b id pairs per string pair
    val exp = graft.ops.Reconcile.fuzzyJoinSegments(
        l, col("id"), col("s"), r, col("id"), col("s"), maxDist = 2)
      .as[(Long, Long, Long)].collect()
    assert(exp.length == 3 * 2 + 1)
    assert(exp.count(p => p._1 == 3L || p._1 == 7L || p._1 == 9L) == 6)
  }

  test("fuzzyJoinSegments is COMPLETE: every planted ≤2-edit pair is found (120 random docs)") {
    val rnd = new scala.util.Random(20260814L)
    val ab = "abcdefghij"
    def randStr(n: Int): String = (1 to n).map(_ => ab(rnd.nextInt(ab.length))).mkString
    def edit1(s: String): String = rnd.nextInt(3) match {
      case 0 if s.nonEmpty => // delete
        val i = rnd.nextInt(s.length); s.take(i) + s.drop(i + 1)
      case 1 => // insert
        val i = rnd.nextInt(s.length + 1)
        s.take(i) + ab(rnd.nextInt(ab.length)) + s.drop(i)
      case _ if s.nonEmpty => // substitute
        val i = rnd.nextInt(s.length)
        s.take(i) + ab(rnd.nextInt(ab.length)) + s.drop(i + 1)
      case _ => s + ab(rnd.nextInt(ab.length))
    }
    // lengths 1..24 cover the short-string regime where segments are
    // empty (L < τ+1) — the geometry's trickiest corner
    val bases = (0 until 120).map(i => (i.toLong, randStr(1 + rnd.nextInt(24))))
    val dirty = bases.map { case (i, s) => (i + 1000L, edit1(edit1(s))) }
    val got = graft.ops.Reconcile.fuzzyJoinSegments(
        bases.toDF("id", "s"), col("id"), col("s"),
        dirty.toDF("id", "s"), col("id"), col("s"), maxDist = 2)
      .select($"id_a", $"id_b", $"d").as[(Long, Long, Long)].collect().toSet
    // driver-side brute-force truth over all 120×120 pairs
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(b.length + 1)(identity)
      for (i <- 1 to a.length) {
        var prev = dp(0); dp(0) = i
        for (j <- 1 to b.length) {
          val cur = dp(j)
          dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = cur
        }
      }
      dp(b.length)
    }
    val want = (for {
      (ia, sa) <- bases; (ib, sb) <- dirty
      d = lev(sa, sb) if d <= 2
    } yield (ia, ib, d.toLong)).toSet
    assert(got == want, s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    // and in particular every planted pair (distance ≤ 2 by construction)
    bases.foreach { case (i, _) =>
      assert(got.exists(p => p._1 == i && p._2 == i + 1000L),
        s"planted pair $i not recovered")
    }
  }

  test("fuzzyJoinSegmentStats collapses clones, conserves mass, flags hot blocks") {
    // mixed corpus: 50 distinct names + 40 DISTINCT low-entropy keys
    // sharing an 8-char prefix (hot segments) + 25 exact clones of
    // one string (must collapse to ONE indexed row, the r8 sf1 lesson)
    val distinct0 = (0 until 50).map(i => (i.toLong, f"customer-$i%04d-${i * 37}%d"))
    val hot = (0 until 40).map(i => (100L + i, f"aaaaaaaa$i%04d")) // L=12
    val clones = (0 until 25).map(i => (200L + i, "zzzzzzzzzzzz"))
    val df = (distinct0 ++ hot ++ clones).toDF("id", "s")
    val stats = graft.ops.Reconcile
      .fuzzyJoinSegmentStats(df, col("id"), col("s"), maxDist = 2)
      .as[(Long, Long, Long)].collect()
    // mass conservation over DISTINCT strings: 50 + 40 + 1 per slot
    (0L to 2L).foreach { slot =>
      val mass = stats.collect { case (i, sz, n) if i == slot => sz * n }.sum
      assert(mass == 91L, s"slot $slot mass $mass (clones must collapse)")
    }
    // the histogram surfaces the hot block: slots 0 and 1 carry the
    // shared "aaaa" segment of all 40 distinct hot keys
    (0L to 1L).foreach { slot =>
      assert(stats.contains((slot, 40L, 1L)), s"slot $slot missing hot block")
    }
  }

  test("fuzzyJoinSegments salting: identical output on a low-entropy corpus, hot blocks sharded") {
    // degenerate corpus: 60 DISTINCT keys share a long low-entropy
    // prefix, so segment blocks go hot (the documented residual the
    // cap-free scheme can't avoid); salting must spread them without
    // changing a single output pair
    val keys = (0 until 60).map(i => f"aaaaaaaaaaaa$i%04d")
    val near = (0 until 60).map(i => f"aaaaaaaaaaab$i%04d") // 1 edit away
    val l = keys.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "s")
    val r = (keys ++ near).zipWithIndex
      .map { case (s, i) => (1000L + i, s) }.toDF("id", "s")
    val plain = graft.ops.Reconcile.fuzzyJoinSegments(
        l, col("id"), col("s"), r, col("id"), col("s"), maxDist = 2)
      .as[(Long, Long, Long)].collect().toSet
    val salted = graft.ops.Reconcile.fuzzyJoinSegments(
        l, col("id"), col("s"), r, col("id"), col("s"), maxDist = 2,
        maxBlockSize = 8)
      .as[(Long, Long, Long)].collect().toSet
    assert(plain.nonEmpty && salted == plain,
      s"salting changed output: missing=${(plain -- salted).take(5)} " +
        s"extra=${(salted -- plain).take(5)}")
    // the stats twin reports the spread: the hot shared-prefix blocks
    // get ⌈size/maxBlockSize⌉ shards, small blocks stay at 1
    val stats = graft.ops.Reconcile.fuzzyJoinSegmentStats(
        r, col("id"), col("s"), maxDist = 2, maxBlockSize = 8)
      .as[(Long, Long, Long, Long)].collect()
    assert(stats.exists { case (_, size, _, shards) =>
      size > 8 && shards == (size + 7) / 8 },
      s"no hot block reported sharded: ${stats.toSeq.sortBy(-_._2).take(5)}")
    assert(stats.forall { case (_, size, _, shards) =>
      size > 8 || shards == 1L }, "small blocks must not salt")
  }

  test("fuzzy kernels pin their shuffle width — AQE cannot byte-coalesce the pair stage") {
    // the r8 sf1 regression: segment keys are tiny, AQE saw a few MB
    // and fused the quadratic kernel into ONE task. The pin is an
    // explicit-numPartitions repartition (REPARTITION_BY_NUM), the
    // one shuffle origin AQE coalescing is forbidden to touch.
    val l = Seq((1L, "martha king")).toDF("id", "s")
    val r = Seq((10L, "marta king")).toDF("id", "s")
    // kernel pins + the id-pair EXPANSION pin (the r9 sf10 lesson:
    // distinct string pairs are few BYTES, so AQE coalesced the
    // expansion — multiplicative id fan-out on a replicated corpus —
    // plus its downstream partial agg into ONE task). On these tiny
    // spec frames Catalyst broadcasts the kernel joins (no shuffle to
    // coalesce — fine); the expansion pin must ALWAYS survive (r11:
    // the expansion is keyed by the 8-byte string hash _ha, not the
    // raw string — text never rides an expansion Exchange).
    val expansionPin = """hashpartitioning\(_ha#\d+L?, \d+\), REPARTITION_BY_NUM""".r
    val segPlan = graft.ops.Reconcile.fuzzyJoinSegments(
      l, col("id"), col("s"), r, col("id"), col("s"), maxDist = 2)
      .queryExecution.executedPlan.toString
    assert(segPlan.contains("REPARTITION_BY_NUM"), segPlan.take(2000))
    assert(expansionPin.findFirstIn(segPlan).isDefined,
      s"expansion not pinned:\n${segPlan.take(2000)}")
    val capPlan = graft.ops.Reconcile.fuzzyJoin(
      l, col("id"), col("s"), r, col("id"), col("s"), maxDist = 1)
      .queryExecution.executedPlan.toString
    assert(capPlan.contains("REPARTITION_BY_NUM"), capPlan.take(2000))
    assert(expansionPin.findFirstIn(capPlan).isDefined,
      s"expansion not pinned:\n${capPlan.take(2000)}")
  }

  test("fuzzyJoin skips degenerate blocks; the other end still recovers matches") {
    // every name shares the "cus" prefix (the TPC-H shape that made
    // prefix-only blocking an all-pairs product at sf1): the prefix
    // block's 100x100 candidates blow the cap and are skipped, yet
    // all 100 exact matches arrive through the small suffix blocks
    val names = (0 until 100).map(i => f"customer#$i%03d")
    val l = names.zipWithIndex.map { case (n, i) => (i.toLong, n) }.toDF("id", "s")
    val r = names.zipWithIndex.map { case (n, i) => (1000L + i, n) }.toDF("id", "s")
    val got = graft.ops.Reconcile.fuzzyJoin(
      l, col("id"), col("s"), r, col("id"), col("s"),
      maxDist = 0, maxBlockPairs = 1000L)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == (0 until 100).map(i => (i.toLong, 1000L + i, 0L)).toSet)
  }

  test("piiRedact counts sequentially and redacts all three kinds") {
    val d = Seq(
      (1L, "mail me a.b-c@x-mail.co.uk and 555-123-4567 ref 1234567890 ok"),
      (2L, "digits 12345678 stay, 123-456-7890 goes"),
      (3L, "clean text only")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.piiRedact(d, col("doc_id"), col("text"))
      .select("doc_id", "n_email", "n_phone", "n_id", "red_len")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got(1L) == ((1L, 1L, 1L, // one of each
      "mail me <EMAIL> and <PHONE> ref <ID> ok".length.toLong)))
    assert(got(2L) == ((0L, 1L, 0L, // 8-digit run is NOT an id
      "digits 12345678 stay, <PHONE> goes".length.toLong)))
    assert(got(3L) == ((0L, 0L, 0L, "clean text only".length.toLong)))
  }

  test("segmentProbeKeys kernel == the column-DSL when-tree it replaced (r17)") {
    // the DSL formulation fuzzyJoinSegments used through r16, inlined
    // verbatim as the reference: (2τ+1)²·(τ+1) when-guarded substrs,
    // null-filtered, array_distinct'ed in insertion order
    import graft.functions.F
    import org.apache.spark.sql.Column
    def segStart(L: Column, i: Int, k: Int): Column =
      (L - pmod(L, lit(k))) / k * i +
        greatest(lit(i) - (lit(k) - pmod(L, lit(k))), lit(0)) + 1
    def segLen(L: Column, i: Int, k: Int): Column =
      (L - pmod(L, lit(k))) / k +
        when(lit(i) >= lit(k) - pmod(L, lit(k)), 1).otherwise(0)
    val rnd = new scala.util.Random(7)
    val alpha = "ab cdeé世f"
    val strs = (Seq("", "a", "ab", "abc", "abcd", "kolalongword") ++
      (1 to 120).map(_ =>
        (0 until rnd.nextInt(20)).map(_ => alpha(rnd.nextInt(alpha.length))).mkString))
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }
    for (tau <- 1 to 3) {
      val k = tau + 1
      val M = length(col("s"))
      val cands = for {
        dl <- -tau to tau
        i <- 0 until k
        d <- -tau to tau
      } yield {
        val L = M + dl
        val p = segStart(L, i, k) + d
        val l = segLen(L, i, k)
        when(L >= 0 && p >= 1 && p + l - 1 <= M,
          struct(L.cast("int").as("L"), lit(i).as("i"),
            col("s").substr(p.cast("int"), l.cast("int")).as("seg")))
          .otherwise(lit(null))
      }
      val df = strs.toDF("id", "s")
        .select(col("id"),
          array_distinct(filter(array(cands: _*), _.isNotNull)).as("dsl"),
          F.segmentProbeKeys(col("s"), tau).as("kern"))
        .select(col("id"),
          col("dsl").cast("array<struct<L:int,i:int,seg:string>>").cast("string").as("a"),
          col("kern").cast("string").as("b"))
        .as[(Long, String, String)].collect()
      df.foreach { case (id, a, b) =>
        assert(a == b, s"tau=$tau id=$id: DSL=$a kernel=$b")
      }
    }
  }
}
