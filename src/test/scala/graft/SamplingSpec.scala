package graft

import org.apache.spark.sql.functions._

import graft.llm.Sampling

class SamplingSpec extends SparkSpec {

  test("correlated sampling keeps referential integrity; independent sampling breaks it") {
    import org.apache.spark.sql.functions._
    val cust = spark.read.parquet(s"$sf/customer.parquet")
      .filter(Sampling.permilleBucket(col("c_custkey"), 21L) < 100)
    val ordsCorrelated = spark.read.parquet(s"$sf/orders.parquet")
      .filter(Sampling.permilleBucket(col("o_custkey"), 21L) < 100)
    val orphansCorrelated = ordsCorrelated
      .join(cust, col("o_custkey") === col("c_custkey"), "left_anti").count()
    assert(orphansCorrelated == 0, "shared-key sampling must keep every FK resolvable")
    // independent decision (different key) orphans most sampled orders
    val ordsIndependent = spark.read.parquet(s"$sf/orders.parquet")
      .filter(Sampling.permilleBucket(col("o_orderkey"), 21L) < 100)
    val orphansIndependent = ordsIndependent
      .join(cust, col("o_custkey") === col("c_custkey"), "left_anti").count()
    assert(orphansIndependent > 0, "independent sampling should orphan joins")
  }
  import spark.implicits._

  private lazy val ids = spark.range(10000).toDF("id")

  test("bernoulli keeps ~permille/1000 and is deterministic") {
    val n1 = Sampling.bernoulli(ids, col("id"), 300).count()
    val n2 = Sampling.bernoulli(ids.repartition(5), col("id"), 300).count()
    assert(n1 == n2) // partitioning-independent
    assert(math.abs(n1 - 3000.0) / 3000.0 < 0.05, s"n=$n1")
  }

  test("bernoulli sample is monotone in rate (nested samples)") {
    val s10 = Sampling.bernoulli(ids, col("id"), 100).select("id").as[Long].collect().toSet
    val s30 = Sampling.bernoulli(ids, col("id"), 300).select("id").as[Long].collect().toSet
    assert(s10.subsetOf(s30)) // raising the rate only adds rows
  }

  test("stratified applies per-stratum rates") {
    val df = ids.withColumn("g", when(col("id") % 2 === 0, "a").otherwise("b"))
    val got = Sampling.stratified(df, col("id"), col("g"), Map("a" -> 500, "b" -> 100))
      .groupBy("g").count().as[(String, Long)].collect().toMap
    assert(math.abs(got("a") - 2500.0) / 2500.0 < 0.07, got.toString)
    assert(math.abs(got("b") - 500.0) / 500.0 < 0.15, got.toString)
  }

  test("assignSplits is exhaustive, disjoint, and roughly 80/10/10") {
    val got = Sampling.assignSplits(ids, col("id"))
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(got.keySet == Set("train", "val", "test"))
    assert(got.values.sum == 10000)
    assert(math.abs(got("train") - 8000.0) / 8000.0 < 0.05, got.toString)
  }

  test("assignSplitsByComponent: no dup pair straddles, singletons keep the id-keyed split") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text")
    // exact copies of every doc_id % 40 == 0, near-dup copies of
    // every % 50 == 0 — both relations must be split-atomic
    val planted = docs
      .unionByName(docs.filter($"doc_id" % 40 === 0)
        .select(($"doc_id" + 2000000L).as("doc_id"), $"text"))
      .unionByName(docs.filter($"doc_id" % 50 === 0)
        .select(($"doc_id" + 1000000L).as("doc_id"),
          concat($"text", lit(" near duplicate suffix")).as("text")))
    val got = Sampling
      .assignSplitsByComponent(planted, col("doc_id"), col("text"))
    val m = got.select($"doc_id", $"comp", $"split")
      .as[(Long, Long, String)].collect()
    val splitOf = m.map(r => r._1 -> r._3).toMap
    // every planted relation shares its original's split
    docs.filter($"doc_id" % 40 === 0).select($"doc_id").as[Long].collect()
      .foreach(i => assert(splitOf(i) == splitOf(i + 2000000L),
        s"exact pair ($i, ${i + 2000000L}) straddles"))
    // near-dups: only assert pairs the LSH tier actually linked
    // (recall is estimate-bounded) — linked means same comp
    val compOf = m.map(r => r._1 -> r._2).toMap
    val linked = docs.filter($"doc_id" % 50 === 0).select($"doc_id")
      .as[Long].collect().filter(i => compOf.get(i + 1000000L) == compOf.get(i))
    assert(linked.nonEmpty)
    linked.foreach(i => assert(splitOf(i) == splitOf(i + 1000000L),
      s"near-dup pair ($i, ${i + 1000000L}) straddles"))
    // a doc in no duplicate relation keeps assignSplits' decision
    val solo = m.filter(r => r._1 == r._2).map(_._1).toSet
    val idKeyed = Sampling.assignSplits(planted, col("doc_id"))
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    assert(solo.nonEmpty)
    solo.take(200).foreach(i => assert(splitOf(i) == idKeyed(i)))
    // exhaustive + disjoint
    assert(m.length == planted.count())
    assert(m.map(_._3).toSet == Set("train", "val", "test"))
  }

  test("mixWeighted emits floor(w)+Bernoulli(frac(w)) copies; explodeCopies indexes them") {
    val df = ids.withColumn("src", when(col("id") < 5000, "up").otherwise("down"))
    val mixed = Sampling.mixWeighted(df, col("id"), col("src"),
      Map("up" -> 2.5, "down" -> 0.5))
    val per = mixed.groupBy("src")
      .agg(sum("n_copies").as("n"), count(lit(1)).as("d"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(math.abs(per("up") - 12500.0) / 12500.0 < 0.05, per.toString)
    assert(math.abs(per("down") - 2500.0) / 2500.0 < 0.1, per.toString)
    // "up" rows get at least 2 copies each; exploding matches the sum
    assert(mixed.filter(col("src") === "up" && col("n_copies") < 2).count() == 0)
    val exploded = Sampling.explodeCopies(mixed)
    assert(exploded.count() == per.values.sum)
    assert(exploded.agg(max("copy_idx")).head.getInt(0) == 2) // w=2.5 → max 3 copies
  }

  test("shuffleOrder is a permutation, reproducible at any partitioning") {
    val df = ids.limit(3000)
    val a = Sampling.shuffleOrder(df, col("id"))
      .select("id", "shuffle_pos").as[(Long, Long)].collect().toMap
    val b = Sampling.shuffleOrder(df.repartition(9), col("id"))
      .select("id", "shuffle_pos").as[(Long, Long)].collect().toMap
    assert(a == b)
    assert(a.values.toSeq.sorted == (1L to 3000L)) // dense total order
    // actually shuffled: identity prefix would mean the hash did nothing
    assert((1L to 100L).count(i => a(i - 1) == i) < 5)
  }

  test("fixedKPerStratum returns exactly k per stratum, deterministically") {
    val df = ids.withColumn("g", (col("id") % 5).cast("string"))
    val got = Sampling.fixedKPerStratum(df, col("id"), col("g"), k = 7)
      .groupBy("g").count().as[(String, Long)].collect().toMap
    assert(got.values.toSeq == Seq.fill(5)(7L))
    val twice = Sampling.fixedKPerStratum(df.repartition(11), col("id"), col("g"), k = 7)
      .select("id").as[Long].collect().toSet
    val once = Sampling.fixedKPerStratum(df, col("id"), col("g"), k = 7)
      .select("id").as[Long].collect().toSet
    assert(once == twice)
  }

  test("fixedKDelta: chained append batches == the one-shot quota; untouched strata pass through") {
    val df = ids.withColumn("g", (col("id") % 7).cast("string"))
    // base misses stratum "6" entirely; batch 1 introduces it and
    // displaces members of "0"; batch 2 displaces again — membership
    // must RE-RANK, not append
    val base = df.filter(col("id") % 3 =!= 0 && col("g") =!= "6")
    val d1 = df.filter(col("id") % 3 === 0 && col("id") % 2 === 0 ||
      (col("g") === "6" && col("id") % 2 === 0))
    val d2 = df.filter(col("id") % 3 === 0 && col("id") % 2 =!= 0 ||
      (col("g") === "6" && col("id") % 2 =!= 0))
    // the splits overlap on (g=6, id%3==0) rows — dedup so ids stay
    // unique across batches (the sampler's key contract)
    val d2x = d2.exceptAll(d1)
    val state0 = Sampling.fixedKState(base, col("id"), col("g"), 5)
      .localCheckpoint()
    val state1 = Sampling.fixedKDelta(state0, d1, col("id"), col("g"), 5)
      .localCheckpoint()
    val state2 = Sampling.fixedKDelta(state1, d2x, col("id"), col("g"), 5)
    def rows(s: org.apache.spark.sql.DataFrame) =
      s.as[(String, Long, Long)].collect().toSet
    val want = Sampling.fixedKState(
      base.unionByName(d1).unionByName(d2x), col("id"), col("g"), 5)
    assert(rows(state2) == rows(want) && rows(want).nonEmpty)
    // a delta touching only stratum "1" leaves every other stratum's
    // state rows bit-identical
    val only1 = df.filter(col("g") === "1").limit(3)
      .withColumn("id", col("id") + 100000L)
    val s3 = Sampling.fixedKDelta(state2.localCheckpoint(), only1,
      col("id"), col("g"), 5)
    assert(rows(s3).filter(_._1 != "1") == rows(state2).filter(_._1 != "1"))
    // PLAN PIN: every exchange is delta-derived (the touched-frame
    // distinct and the touched-slice re-rank window) — the state scan
    // itself feeds only broadcast joins (anti passthrough, semi probe)
    val plan = s3.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size <= 3, plan)
    // the untouched branch is literally state-scan -> broadcast anti:
    // the anti join's streamed child is the raw state scan
    assert(plan.linesIterator.exists(_.contains("LeftAnti")), plan)
    // schema guard fires loudly
    assert(intercept[IllegalArgumentException] {
      Sampling.fixedKDelta(state2.drop("h"), only1, col("id"), col("g"), 5)
    }.getMessage.contains("fixedKState schema"))
    // NULL-STRATUM trial (r15 review): quotaFrame windows a null
    // stratum as one real stratum, so the touched probe must be
    // null-safe — === would pass old null-stratum rows through
    // untouched AND append the fresh sliver (evicted members survive)
    val nullBase = Seq((Option.empty[String], 10L), (None, 11L),
        (Option("g"), 12L)).toDF("g", "id")
    val nullDelta = Seq((Option.empty[String], 13L), (None, 14L))
      .toDF("g", "id")
    val ns0 = Sampling.fixedKState(nullBase, col("id"), col("g"), 2)
      .localCheckpoint()
    val ns1 = Sampling.fixedKDelta(ns0, nullDelta, col("id"), col("g"), 2)
    def nrows(s: org.apache.spark.sql.DataFrame) =
      s.as[(Option[String], Long, Long)].collect().toSet
    assert(nrows(ns1) == nrows(Sampling.fixedKState(
      nullBase.unionByName(nullDelta), col("id"), col("g"), 2)))
    assert(nrows(ns1).count(_._1.isEmpty) == 2,
      s"null stratum must re-rank to k=2 rows: ${nrows(ns1)}")
  }

  test("fixedKPerStratum broadcast guard: shuffle fallback selects the identical sample") {
    // with size-based auto-broadcast off, the only broadcast left is
    // the one the guard controls (at test SF the planner's own size
    // estimate would otherwise re-broadcast the tiny keep set — at
    // scale that estimate is exactly what can't be trusted)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val docs = spark.read.parquet(s"$sf/documents.parquet")
      val broadcasted = Sampling.fixedKPerStratum(
        docs, col("doc_id"), col("lang"), k = 7)
      // force the fallback path (bound below strata × k) on a high
      // partitions × strata product: membership must be identical —
      // the guard only changes the join strategy
      val sharded = Sampling.fixedKPerStratum(
        docs.repartition(64), col("doc_id"), col("lang"), k = 7,
        maxBroadcastRows = 1)
      val a = broadcasted.select(col("doc_id")).as[Long].collect().sorted.toSeq
      val b = sharded.select(col("doc_id")).as[Long].collect().sorted.toSeq
      assert(a == b && a.nonEmpty)
      assert(!sharded.queryExecution.sparkPlan.toString.contains("BroadcastHashJoin"),
        "guard did not disable the broadcast hint")
      assert(broadcasted.queryExecution.sparkPlan.toString.contains("BroadcastHashJoin"),
        "small keep set should still broadcast")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("allocProportional: exact budget, Hamilton quota bounds, determinism") {
    // 3 sources with sizes 700 / 250 / 50 (total 1000)
    val docs = spark.range(0, 1000)
      .selectExpr("id",
        "CASE WHEN id < 700 THEN 'big' WHEN id < 950 THEN 'mid' ELSE 'tiny' END AS src")
    val got = Sampling.allocProportional(
        docs, col("id"), col("src"), budget = 137L, salt = 3L)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    // output size is EXACTLY the budget
    assert(got.length == 137)
    // Hamilton guarantee: each group within 1 seat of its exact share
    val per = got.groupBy(_._2).view.mapValues(_.length).toMap
    val shares = Map("big" -> 137.0 * 0.7, "mid" -> 137.0 * 0.25,
      "tiny" -> 137.0 * 0.05)
    shares.foreach { case (g, s) =>
      val q = per.getOrElse(g, 0)
      assert(q >= math.floor(s) && q <= math.ceil(s),
        s"$g got $q seats for exact share $s")
    }
    // deterministic at any partitioning
    val again = Sampling.allocProportional(
        docs.repartition(7), col("id"), col("src"), budget = 137L, salt = 3L)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.sorted.toSeq == again.sorted.toSeq)
    // a different salt draws a different (same-sized) sample
    val other = Sampling.allocProportional(
        docs, col("id"), col("src"), budget = 137L, salt = 4L)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(other.length == 137 && other.sorted.toSeq != got.sorted.toSeq)
    // budget == total keeps everything; over-budget throws
    assert(Sampling.allocProportional(
      docs, col("id"), col("src"), budget = 1000L).count() == 1000L)
    val e = intercept[IllegalArgumentException] {
      Sampling.allocProportional(docs, col("id"), col("src"), budget = 1001L)
    }
    assert(e.getMessage.contains("exceeds"))
    // budget 0 yields an empty, well-typed frame
    assert(Sampling.allocProportional(
      docs, col("id"), col("src"), budget = 0L).count() == 0L)
  }

  test("kfoldAssign: every row assigned, fold sizes within one per stratum") {
    // strata of 7 and 3 rows, k = 3: sizes {3,2,2} and {1,1,1}
    val docs = spark.range(0, 10)
      .selectExpr("id", "CASE WHEN id < 7 THEN 'a' ELSE 'b' END AS g")
    val got = Sampling.kfoldAssign(docs, col("id"), col("g"), k = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(got.length == 10 && got.map(_._1).distinct.length == 10,
      "every row exactly once")
    assert(got.forall(r => r._3 >= 0 && r._3 < 3))
    val sizes = got.groupBy(r => (r._2, r._3)).view.mapValues(_.length)
    assert(sizes.filterKeys(_._1 == "a").values.toSeq.sorted == Seq(2, 2, 3))
    assert(sizes.filterKeys(_._1 == "b").values.toSeq.sorted == Seq(1, 1, 1))
    // deterministic at any partitioning; salt redraws the rotation
    val again = Sampling.kfoldAssign(
      docs.repartition(7), col("id"), col("g"), k = 3).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(got.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
    val salted = Sampling.kfoldAssign(
      docs, col("id"), col("g"), k = 3, salt = 9L).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(salted.sortBy(_._1).toSeq != got.sortBy(_._1).toSeq)
    intercept[IllegalArgumentException] {
      Sampling.kfoldAssign(docs, col("id"), col("g"), k = 1)
    }
  }

  test("kfoldAssignChunked is bit-equal to the window form; one stratum spans chunks") {
    // one GIANT stratum (the 10 TB-stratum shape) plus small ones,
    // random ids — the chunked rank must reproduce the window rank
    // exactly across chunk boundaries
    val rnd = new scala.util.Random(21)
    val rows = (0 until 30000).map { i =>
      (i.toLong * 7 + rnd.nextInt(5), if (i % 50 == 0) s"s${i % 7}" else "giant")
    }.distinct
    val docs = rows.toDF("id", "g")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, String, Int)].collect().sortBy(_._1).toSeq
    for (k <- Seq(2, 5); chunks <- Seq(1, 13)) {
      val want = canon(Sampling.kfoldAssign(docs, col("id"), col("g"), k, salt = 3L))
      val got = canon(Sampling.kfoldAssignChunked(
        docs, col("id"), col("g"), k, salt = 3L, chunks = chunks))
      assert(got == want, s"k=$k chunks=$chunks diverged")
    }
    // parallelism: the giant stratum's rows land on most chunks
    val packed = Sampling.kfoldAssignChunked(
      docs, col("id"), col("g"), k = 5, chunks = 13)
    assert(packed.rdd.getNumPartitions == 13)
    val giantChunks = packed.rdd.mapPartitions { it =>
      Iterator.single(if (it.exists(_.getString(1) == "giant")) 1 else 0)
    }.collect().sum
    assert(giantChunks > 8, s"giant stratum only on $giantChunks chunks")
    intercept[IllegalArgumentException] {
      Sampling.kfoldAssignChunked(docs, col("id"), col("g"), k = 1)
    }
    // null strata fold identically in both forms
    val withNull = (0 until 200)
      .map(i => (i.toLong, if (i % 4 == 0) null else s"s${i % 3}"))
      .toDF("id", "g")
    val wantN = canon(Sampling.kfoldAssign(withNull, col("id"), col("g"), 3))
    val gotN = canon(Sampling.kfoldAssignChunked(
      withNull, col("id"), col("g"), 3, chunks = 5))
    assert(gotN == wantN)
  }

  test("sampling decisions with different salts are decorrelated") {
    val a = Sampling.bernoulli(ids, col("id"), 500, salt = 0).select("id").as[Long].collect().toSet
    val b = Sampling.bernoulli(ids, col("id"), 500, salt = 99).select("id").as[Long].collect().toSet
    val overlap = a.intersect(b).size.toDouble
    // independent 50% samples overlap on ~25% of the universe
    assert(math.abs(overlap - 2500.0) / 2500.0 < 0.1, s"overlap=$overlap")
  }
}
