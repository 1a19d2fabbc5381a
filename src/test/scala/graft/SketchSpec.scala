package graft

import org.apache.spark.sql.functions._

import graft.functions.{BloomOps, CountMinSketch, F}
import graft.llm.TextAnalysis

class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("CountMin estimate over-approximates and equals exact when collision-free") {
    val df = Seq.tabulate(1000)(i => s"k${i % 10}").toDF("k").repartition(6)
    val sk = df.agg(CountMinSketch.cmsAgg(col("k"), 4, 256).as("sk"))
    val got = df.groupBy("k").agg(count(lit(1)).as("exact"))
      .crossJoin(sk)
      .select(col("k"), CountMinSketch.cmsEstimate(col("sk"), col("k"), 4, 256), col("exact"))
      .as[(String, Long, Long)].collect()
    got.foreach { case (k, est, exact) =>
      assert(est >= exact, s"$k: CMS must never under-count")
    }
    // 10 keys in 4×256 counters: collisions essentially impossible
    assert(got.forall { case (_, est, exact) => est == exact })
  }

  test("CountMin estimates are independent of partitioning (merge correctness)") {
    val df = Seq.tabulate(5000)(i => s"u${i % 50}").toDF("k")
    def est(parts: Int): Map[String, Long] = {
      val d = df.repartition(parts)
      val sk = d.agg(CountMinSketch.cmsAgg(col("k"), 4, 64).as("sk"))
      d.select(col("k")).distinct().crossJoin(sk)
        .select(col("k"), CountMinSketch.cmsEstimate(col("sk"), col("k"), 4, 64))
        .as[(String, Long)].collect().toMap
    }
    assert(est(1) == est(13))
  }

  test("KMV sketch set algebra: merge+truncate equals the direct union sketch") {
    import graft.functions.KMinValues.kmvSketch
    val k = 32
    val a = spark.range(0, 500).toDF("id")          // 500 ids
    val b = spark.range(300, 900).toDF("id")        // overlap 300-499
    val u = a.union(b)
    val ska = a.agg(kmvSketch(col("id"), k)).head().getSeq[Long](0)
    val skb = b.agg(kmvSketch(col("id"), k)).head().getSeq[Long](0)
    val sku = u.agg(kmvSketch(col("id"), k)).head().getSeq[Long](0)
    // the sketch is a true monoid summary: merging two cohort
    // sketches must give exactly the union's sketch
    assert((ska ++ skb).distinct.sorted.take(k) == sku)
    // and it is insensitive to partitioning
    val sku13 = u.repartition(13).agg(kmvSketch(col("id"), k)).head().getSeq[Long](0)
    assert(sku13 == sku)
  }

  test("KMV set-op estimates are exact below k") {
    // cohorts smaller than k: the sketches hold every hash, so the
    // q_kmv_set_ops algebra must return exact values
    val df = SparkEntry.queries("q_kmv_set_ops")(spark, sf)
    val r = df.head()
    val (estU, estI) = (r.getDouble(0), r.getDouble(2))
    val (exU, exI) = (r.getLong(3), r.getLong(4))
    if (exU <= 64) assert(estU == exU.toDouble && estI == exI.toDouble)
    else {
      assert(math.abs(estU - exU) / exU < 0.5, s"union est $estU vs $exU")
      assert(estI >= 0 && estU > 0)
    }
  }

  test("Bloom prunedSemiJoin equals a plain semi join even with a tiny filter") {
    val big = spark.range(2000).toDF("x")
    val small = spark.range(0, 2000, 37).toDF("y") // 55 keys
    // 128 bits for 55 keys → heavy false positives; result must still be exact
    val got = BloomOps.prunedSemiJoin(big, col("x"), small, col("y"), mBits = 128, k = 2)
      .select("x").as[Long].collect().sorted
    val want = big.join(small, col("x") === col("y"), "left_semi")
      .select("x").as[Long].collect().sorted
    assert(got.sameElements(want))
  }

  test("Bloom probe prunes non-members before the join (no false negatives)") {
    val keys = spark.range(0, 1000, 100).toDF("y") // 10 members
    val bf = keys.agg(BloomOps.bloomAgg(col("y"), 1 << 12, 4).as("bf"))
    val probed = spark.range(1000).toDF("x").crossJoin(bf)
      .select(col("x"), BloomOps.bloomMightContain(col("bf"), col("x"), 1 << 12, 4).as("hit"))
      .as[(Long, Boolean)].collect()
    val members = (0L until 1000L by 100).toSet
    // every member passes; 4096 bits for 10 keys → pruning is near-perfect
    assert(probed.filter(p => members(p._1)).forall(_._2))
    val passed = probed.count(_._2)
    assert(passed < 30, s"bloom should prune most of 1000 probes, passed=$passed")
  }

  test("wordNgrams emits distinct in-order n-grams; short docs are empty") {
    val got = Seq("a b c b c d", "a b").toDF("t")
      .select(F.wordNgrams(col("t"), 3)).as[Seq[String]].collect()
    assert(got(0) == Seq("a b c", "b c b", "c b c", "b c d"))
    assert(got(1).isEmpty)
  }

  test("decontaminate flags exactly the docs sharing an n-gram with the benchmark") {
    val train = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "completely unrelated text here now"),
      (3L, "see the quick brown fox run")).toDF("id", "text")
    val bench = Seq("the quick brown cat", "quick brown fox tails").toDF("text")
    val got = TextAnalysis.decontaminate(
      train, col("id"), col("text"), bench, col("text"), n = 3)
      .as[(Long, Long)].collect().toMap
    // doc1: "the quick brown" + "quick brown fox"; doc3 the same two; doc2 clean
    assert(got == Map(1L -> 2L, 3L -> 2L))
  }
}
