package graft

import org.apache.spark.sql.functions._

import graft.ops.Graph
import graft.llm.{Sampling, TextAnalysis}

/** Integer-exact PageRank + the r4 sampling/text additions. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank is partition-insensitive (integer contribution sums)") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (4L, 1L))
      .toDF("src", "dst")
    val a = Graph.pageRank(e, col("src"), col("dst"), iters = 3)
      .orderBy("node").collect().toSeq
    val b = Graph.pageRank(e.repartition(5), col("src"), col("dst"), iters = 3)
      .orderBy("node").collect().toSeq
    assert(a == b)
    assert(a.forall(_.getLong(1) > 0L))
  }

  test("pageRank shuffle regime (n > maxBroadcastNodes) matches broadcast bit-exactly") {
    // 211+199-node graph forced through the large-n branch (bound = 10):
    // the two regimes differ ONLY in physical layout (broadcast vs
    // shuffled contribution frame), so integer arithmetic must make
    // them bit-identical — any divergence means the src-partitioned
    // round body changed semantics, not just shape
    val e = spark.range(0, 5000)
      .selectExpr("id % 211 as src", "(id * 37 + 11) % 199 as dst")
    val small = Graph.pageRank(e, col("src"), col("dst"), iters = 3)
      .orderBy("node").collect().toSeq
    val large = Graph.pageRank(e, col("src"), col("dst"), iters = 3,
        maxBroadcastNodes = 10L)
      .orderBy("node").collect().toSeq
    assert(small == large, "shuffle regime must reproduce broadcast ranks bit-exactly")
    assert(small.nonEmpty && small.forall(_.getLong(1) > 0L))
  }

  test("pageRankConverged: eps=0 reproduces the fixed-round ranks bit-exactly") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (4L, 1L))
      .toDF("src", "dst")
    val fixed = Graph.pageRank(e, col("src"), col("dst"), iters = 3)
      .orderBy("node").collect().toSeq
    val run = Graph.pageRankConverged(e, col("src"), col("dst"), iters = 3,
      eps = Some(0L))
    assert(run.ranks.orderBy("node").collect().toSeq == fixed)
    assert(run.rounds == 3, "a non-converged graph must run every round")
  }

  test("pageRankConverged stops at the exact integer fixpoint, output unchanged") {
    // uniform 4-cycle at scale 2000: rank_0 = 500 is already the exact
    // fixpoint (75 + (500*17) div 20 = 500), so eps=0 stops after one
    // round — and because a zero-delta state is absorbing, the output
    // is bit-identical to any larger fixed iteration count
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    val run = Graph.pageRankConverged(e, col("src"), col("dst"), iters = 50,
      scale = 2000L, eps = Some(0L))
    assert(run.rounds == 1, s"fixpoint must stop the loop, ran ${run.rounds}")
    val fixed = Graph.pageRank(e, col("src"), col("dst"), iters = 50,
        scale = 2000L)
      .orderBy("node").collect().toSeq
    assert(run.ranks.orderBy("node").collect().toSeq == fixed)
    assert(fixed.forall(_.getLong(1) == 500L))
  }

  test("pageRankConverged honors a loose epsilon as an upper bound on rounds") {
    val e = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L)).toDF("src", "dst")
    val run = Graph.pageRankConverged(e, col("src"), col("dst"), iters = 10,
      eps = Some(Long.MaxValue))
    assert(run.rounds == 1, "eps above any delta stops after the first round")
    val one = Graph.pageRank(e, col("src"), col("dst"), iters = 1)
      .orderBy("node").collect().toSeq
    assert(run.ranks.orderBy("node").collect().toSeq == one)
  }

  test("pageRank orders a star graph correctly: hub above leaves") {
    // leaves all point at the hub and the hub points back — the hub
    // aggregates every leaf's mass, each leaf gets 1/n of the hub's
    val leaves = (2L to 6L)
    val e = (leaves.map(l => (l, 1L)) ++ leaves.map(l => (1L, l))).toDF("src", "dst")
    val r = Graph.pageRank(e, col("src"), col("dst"), iters = 3)
      .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap
    assert(leaves.forall(l => r(1L) > r(l)), s"hub must outrank leaves: $r")
    // symmetric leaves tie exactly — integer arithmetic, no noise
    assert(leaves.map(r).toSet.size == 1, "equivalent leaves must tie bit-exactly")
  }

  test("hopDistance equals a driver BFS on a branchy digraph; depth-8 path + early stop") {
    // r12 rework (per-round frontier checkpoints, visited = union of
    // materialized frontiers): semantics must stay exactly min-hop BFS.
    // Graph: an 8-deep path 0→1→…→8, a branch 2→20→21, a shortcut
    // 0→5 (so node 5 is hop 1, not 5), a cycle back-edge 8→0, and an
    // unreachable island 100→101.
    val edges = Seq(
      0L -> 1L, 1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L, 5L -> 6L,
      6L -> 7L, 7L -> 8L, 2L -> 20L, 20L -> 21L, 0L -> 5L, 8L -> 0L,
      100L -> 101L).toDF("src", "dst")
    val seeds = Seq(0L).toDF("s")
    // driver reference BFS
    def bfs(adj: Map[Long, Seq[Long]], seed: Set[Long], maxHops: Int): Map[Long, Long] = {
      var dist = seed.map(_ -> 0L).toMap
      var frontier = seed
      var h = 0L
      while (h < maxHops && frontier.nonEmpty) {
        val next = frontier.flatMap(n => adj.getOrElse(n, Nil))
          .filterNot(dist.contains)
        next.foreach(n => dist += n -> (h + 1L))
        frontier = next
        h += 1
      }
      dist
    }
    val adj = Seq(0L -> 1L, 1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L,
      5L -> 6L, 6L -> 7L, 7L -> 8L, 2L -> 20L, 20L -> 21L, 0L -> 5L,
      8L -> 0L, 100L -> 101L).groupMap(_._1)(_._2)
    for (cap <- Seq(3, 8, 20)) {
      val got = Graph.hopDistance(edges, col("src"), col("dst"),
          seeds, col("s"), maxHops = cap)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == bfs(adj, Set(0L), cap), s"maxHops=$cap")
    }
    // shortcut honored (min-hop): 5 is 1 hop, its successors chain on
    val d20 = Graph.hopDistance(edges, col("src"), col("dst"),
        seeds, col("s"), maxHops = 20)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d20(5L) == 1L && d20(6L) == 2L && d20(8L) == 4L)
    assert(!d20.contains(100L) && !d20.contains(101L))
    // multi-seed: seeds are hop 0, distances are min over seeds
    val multi = Graph.hopDistance(edges, col("src"), col("dst"),
        Seq(0L, 7L).toDF("s"), col("s"), maxHops = 20)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(multi(7L) == 0L && multi(8L) == 1L && multi(5L) == 1L)
  }

  test("shortestPaths equals driver Bellman-Ford (<= k-edge semantics, early stop, parallel edges)") {
    // weighted digraph: a cheap long way round (0→1→2→3, weight 3)
    // vs an expensive direct edge (0→3, weight 10) — at cap 1 the
    // direct edge wins, at cap 3 the path wins; a parallel 0→1 edge
    // of weight 7 must lose to the weight-1 edge; island unreachable
    val edges = Seq(
      (0L, 1L, 1L), (1L, 2L, 1L), (2L, 3L, 1L), (0L, 3L, 10L),
      (0L, 1L, 7L), (3L, 4L, 2L), (100L, 101L, 1L))
      .toDF("src", "dst", "w")
    val seeds = Seq(0L).toDF("s")
    // dense Bellman-Ford reference: after k rounds, dd(v) = min
    // weight over paths from the seed using <= k edges
    def bf(k: Int): Map[Long, Long] = {
      val es = Seq((0L, 1L, 1L), (1L, 2L, 1L), (2L, 3L, 1L), (0L, 3L, 10L),
        (0L, 1L, 7L), (3L, 4L, 2L), (100L, 101L, 1L))
      var dd = Map(0L -> 0L)
      for (_ <- 1 to k) {
        val next = es.flatMap { case (u, v, w) => dd.get(u).map(du => v -> (du + w)) }
        dd = (dd.toSeq ++ next).groupMapReduce(_._1)(_._2)(math.min)
      }
      dd
    }
    for (k <- Seq(1, 2, 3, 6)) {
      val got = Graph.shortestPaths(edges, col("src"), col("dst"), col("w"),
          seeds, col("s"), maxRounds = k)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == bf(k), s"maxRounds=$k: $got vs ${bf(k)}")
    }
    // cap 1: expensive direct edge; cap 3: the cheap path replaces it
    val d1 = Graph.shortestPaths(edges, col("src"), col("dst"), col("w"),
      seeds, col("s"), maxRounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d1(3L) == 10L)
    val d3 = Graph.shortestPaths(edges, col("src"), col("dst"), col("w"),
      seeds, col("s"), maxRounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d3(3L) == 3L && d3(1L) == 1L && !d3.contains(100L))
    // early stop: a huge cap converges to the true SSSP (node 4 = 5)
    val dBig = Graph.shortestPaths(edges, col("src"), col("dst"), col("w"),
      seeds, col("s"), maxRounds = 50)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dBig == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 5L))
  }

  test("temperatureSample flattens big sources and passes small ones whole") {
    val df = (1L to 2000L).map(i => (i, if (i <= 1900) "big" else "small"))
      .toDF("doc_id", "source")
    // k = 2: p_small = min(1, 2/10) = 0.2 (n=100), p_big = 2/√1900 ≈ .046
    val kept = Sampling.temperatureSample(df, col("doc_id"), col("source"), k = 2.0)
    val bySrc = kept.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val big = bySrc.getOrElse("big", 0L).toDouble
    val small = bySrc.getOrElse("small", 0L).toDouble
    // expected: big ≈ 1900·0.0459 ≈ 87, small ≈ 100·0.2 = 20; the
    // REBALANCE property is big/small shrinking from 19× to ~4×
    assert(big / small < 10.0, s"big source must be flattened: $bySrc")
    assert(small > 5 && big > 40, s"both sources must survive: $bySrc")
    // deterministic: same decisions under repartitioning
    val again = Sampling
      .temperatureSample(df.repartition(7), col("doc_id"), col("source"), k = 2.0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == kept.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("temperatureSample with k covering every source keeps everything") {
    val df = (1L to 50L).map(i => (i, "only")).toDF("doc_id", "source")
    val kept = Sampling.temperatureSample(df, col("doc_id"), col("source"), k = 8.0)
    assert(kept.count() == 50L, "p = min(1, 8/√50) > 1 clamps to keep-all")
  }

  test("anomalyScores uses the strictly-trailing window and needs a full baseline") {
    // key k: 7 days at 10, then a spike of 24
    val rows = ((1 to 7).map(d => ("k", d.toLong, 10L)) :+ (("k", 8L, 24L))).toDF(
      "key", "day", "n")
    val r = graft.ops.Timeseries.anomalyScores(rows, "key", "day", "n", window = 7)
      .collect()
    // days 1..7 lack a full trailing window; only day 8 scores
    assert(r.length == 1 && r.head.getLong(1) == 8L)
    assert(r.head.getDouble(3) == 10.0, "baseline excludes the spike itself")
    assert(r.head.isNullAt(4), "zero baseline variance yields null z, not Inf")
    // with variance: 6 tens + one 17 baseline, spike vs it
    val rows2 = ((1 to 6).map(d => ("k", d.toLong, 10L)) ++
      Seq(("k", 7L, 17L), ("k", 8L, 24L))).toDF("key", "day", "n")
    val z = graft.ops.Timeseries.anomalyScores(rows2, "key", "day", "n", window = 7)
      .collect().head.getDouble(4)
    assert(z > 4.0 && z < 5.5, s"spike should score strongly positive, got $z")
  }

  test("quantileBins splits equi-depth with the standard ntile remainder rule") {
    val df = (1L to 23L).map(i => ("g", i.toDouble, i)).toDF("g", "v", "id")
    val bins = graft.ops.Stats.quantileBins(df, col("g"), col("v"), col("id"), bins = 4)
      .collect().map(r => r.getLong(1) -> ((r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    // 23 rows into 4 tiles: 6,6,6,5 with earlier tiles taking extras
    assert(bins(1L) == ((6L, 1.0, 6.0)))
    assert(bins(2L) == ((6L, 7.0, 12.0)))
    assert(bins(3L) == ((6L, 13.0, 18.0)))
    assert(bins(4L) == ((5L, 19.0, 23.0)))
  }

  test("interleaveKey prefixes hold weight-proportional source mixes, map-only") {
    val df = (1L to 4000L).map(i => (i, if (i % 2 == 0) "a" else "b"))
      .toDF("doc_id", "source")
    val keyed = Sampling.interleaveKey(df, col("doc_id"), col("source"),
      Map("a" -> 1000, "b" -> 250))
    assert(!keyed.queryExecution.executedPlan.toString.contains("Exchange"),
      "interleave key must be a pure projection")
    // first quarter of the ikey order: a (4x weight) should outnumber
    // b by roughly 4:1 (both have 2000 rows total)
    val prefix = keyed.orderBy("ikey").limit(1000).groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val ratio = prefix("a").toDouble / prefix("b").toDouble
    assert(ratio > 2.5 && ratio < 6.0, s"expected ~4:1 prefix mix, got $prefix")
  }

  test("lshBucketStats conserves corpus mass per band") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    val n = docs.count()
    val stats = graft.llm.Dedup.lshBucketStats(docs, col("doc_id"), col("text"))
    // every doc lands in exactly one bucket per band
    val perBand = stats
      .groupBy("band")
      .agg(sum(col("bucket_size") * col("n_buckets")).as("mass"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perBand.size == 16 && perBand.values.forall(_ == n), s"mass: $perBand")
  }

  test("phashDedupPairs recovers identical payloads; hammingPairs is exact to 3 bits") {
    val df = Seq(
      (1L, "media-bytes-alpha"), (2L, "media-bytes-alpha"), // exact dup
      (3L, "media-bytes-gamma")).toDF("doc_id", "txt")
      .select(col("doc_id"), col("txt").cast("binary").as("payload"))
    val pairs = graft.llm.Multimodal
      .phashDedupPairs(spark, df, col("doc_id"), col("payload"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs == Set((1L, 2L, 0L)), s"got $pairs")
    // 1-, 2-, 3-bit perturbations are all recovered by the 4x16
    // banding (pigeonhole); 4 spread bits (one per piece) are not
    val base = 0x0123456789abcdefL
    val sigs = Seq(
      10L -> base, 11L -> (base ^ 1L), 12L -> (base ^ (1L << 16) ^ (1L << 32)),
      13L -> (base ^ (1L << 63) ^ (1L << 47) ^ (1L << 31)),
      14L -> (base ^ 1L ^ (1L << 16) ^ (1L << 32) ^ (1L << 48)))
      .toDF("doc_id", "sig")
    val got = graft.llm.Dedup.hammingPairs(sigs, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((10L, 11L)) && got.contains((10L, 12L)) &&
      got.contains((10L, 13L)), s"got $got")
    assert(!got.contains((10L, 14L)), "4 differing bits must not pair with base")
  }

  test("rareTokenStats counts hapax tokens against corpus df") {
    val df = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha beta delta"),
      (3L, "alpha epsilon epsilon")).toDF("doc_id", "text")
    // df: alpha=3, beta=2, gamma=1, delta=1, epsilon=1 (distinct per doc)
    val r = TextAnalysis.rareTokenStats(df, col("doc_id"), col("text"), minDf = 2)
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getDouble(3)))).toMap
    assert(r(1L) == ((3L, 1L, 1.0 / 3.0)))   // gamma rare
    assert(r(2L) == ((3L, 1L, 1.0 / 3.0)))   // delta rare
    assert(r(3L) == ((2L, 1L, 0.5)))         // epsilon distinct-counted once
  }

  test("triangleCounts: K4 plus a pendant edge") {
    import graft.ops.Graph
    // K4 on {1,2,3,4} = 4 triangles, every K4 node in 3 of them;
    // pendant 4–5 (and a duplicate + reversed + self-loop to exercise
    // cleanup) adds none
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 4L), (2L, 1L), (3L, 3L))
      .toDF("a", "b")
    val got = Graph.triangleCounts(edges, col("a"), col("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("ewmaDyadic: hand-computed trailing weights, window cap respected") {
    import graft.ops.Timeseries
    // one key, values 1.00, 2.00, 3.00 → cents 100, 200, 300
    val df = Seq((7L, 1L, 1.0), (7L, 2L, 2.0), (7L, 3L, 3.0))
      .toDF("k", "t", "v")
    val got = Timeseries.ewmaDyadic(
        df, col("k"), Seq(col("t")), col("v"), k = 2)
      .select(col("ord"), col("n_window"), col("ewma_num"), col("ewma"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got(1L) == ((1L, 100L, 100.0)))            // [100]: 100·2^0 / 1
    assert(got(2L) == ((2L, 100 + 400L, 500.0 / 3)))  // [100,200]: 100+200·2 / 3
    assert(got(3L) == ((2L, 200 + 600L, 800.0 / 3)))  // capped: [200,300]
  }
}
