package graft

import org.apache.spark.sql.functions._

import graft.llm.Dedup

class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("connectedComponents collapses transitive chains to min-id labels") {
    // components: {1,2,3,9}, {5,6}, {10,11,12} (chain via 11)
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 9L), (5L, 6L), (10L, 11L), (11L, 12L))
      .toDF("a", "b")
    val got = Dedup.connectedComponents(pairs, col("a"), col("b"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 1L,
      5L -> 5L, 6L -> 5L,
      10L -> 10L, 11L -> 10L, 12L -> 10L))
  }

  test("connectedComponents converges on a long path graph (worst-case diameter)") {
    val n = 64
    val pairs = (0 until n - 1).map(i => (i.toLong, i + 1L)).toDF("a", "b")
    val got = Dedup.connectedComponents(pairs, col("a"), col("b"), maxIter = 80)
      .as[(Long, Long)].collect()
    assert(got.length == n)
    assert(got.forall(_._2 == 0L))
  }

  test("driver and distributed regimes are bit-identical (r11 two-regime split)") {
    // force the distributed pointer-jumping loop with the bound at 0
    // and require exact equality with the driver union-find on a
    // graph mixing chains, stars, singleton-pair edges, dups and a
    // self-loop
    val pairs = (
      (0 until 40).map(i => (i.toLong, i + 1L)) ++          // long chain
        (50 until 60).map(i => (100L, i.toLong)) ++          // star
        Seq((200L, 201L), (201L, 200L), (300L, 300L),        // dup + loop
          (400L, 401L))
      ).toDF("a", "b")
    val driver = Dedup.connectedComponents(pairs, col("a"), col("b"),
        maxIter = 80)
      .as[(Long, Long)].collect().toSet
    val dist = Dedup.connectedComponents(pairs, col("a"), col("b"),
        maxIter = 80, maxDriverEdges = 0L)
      .as[(Long, Long)].collect().toSet
    assert(driver == dist,
      s"regimes diverge: ${driver.diff(dist)} / ${dist.diff(driver)}")
  }

  test("incrementalComponents == full recompute; cascades, relabels, new nodes") {
    // random base/delta split: incremental maintenance must equal the
    // full recompute of base ∪ delta — merges cascading through
    // several delta edges and new nodes with SMALLER ids (forcing a
    // relabel of old components) included
    val rnd = new scala.util.Random(67)
    val all = (0 until 300).map(_ =>
      (rnd.nextInt(80).toLong + 10L, rnd.nextInt(80).toLong + 10L)) ++
      Seq((1L, 50L), (2L, 95L)) // new small ids arriving in the delta
    val (base0, delta0) = all.partition { case (x, y) => (x + y) % 3 != 0 }
    // keep the small-id edges in the delta regardless of the split
    val base = base0.filterNot(e => e._1 <= 2L)
    val delta = delta0 ++ base0.filter(e => e._1 <= 2L)
    def comps(edges: Seq[(Long, Long)]) =
      Dedup.connectedComponents(edges.toDF("a", "b"), col("a"), col("b"))
    val labels0 = comps(base)
    val got = Dedup.incrementalComponents(
        labels0, delta.toDF("a", "b"), col("a"), col("b"))
      .as[(Long, Long)].collect().toSet
    val want = comps(base ++ delta).as[(Long, Long)].collect().toSet
    assert(got == want)
    // the small new ids must have relabeled their components
    assert(got.contains((50L, want.find(_._1 == 50L).get._2)) &&
      want.exists(p => p._1 == 50L && p._2 == 1L))
    // a delta that merges nothing leaves the frame bit-identical
    val noop = Seq(base.head).toDF("a", "b")
    val same = Dedup.incrementalComponents(labels0, noop, col("a"), col("b"))
      .as[(Long, Long)].collect().toSet
    assert(same == labels0.as[(Long, Long)].collect().toSet)
    // PLAN PIN: the apply is a broadcast relabel — NO shuffle of the
    // label frame, no iteration
    val applied = Dedup.incrementalComponents(
      labels0, delta.toDF("a", "b"), col("a"), col("b"))
    val plan = applied.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"expected a shuffle-free broadcast relabel:\n$plan")
    // the driver contract fails loudly
    assert(intercept[IllegalArgumentException] {
      Dedup.incrementalComponents(labels0, delta.toDF("a", "b"),
        col("a"), col("b"), maxDeltaEdges = 1L)
    }.getMessage.contains("maxDeltaEdges"))
  }

  test("nearDupComponentsDelta == nearDupComponents on the planted corpus") {
    val docs = (0 until 80).map { i =>
      val body = s"the quick brown fox ${i % 9} jumps over the lazy dog " * 4
      (i.toLong, if (i % 4 == 0) body else body + s" tail$i unique")
    }.toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long)].collect().toSet
    val full = rows(Dedup.nearDupComponents(docs, col("doc_id"), col("text")))
    val inc = rows(Dedup.nearDupComponentsDelta(
      docs, col("doc_id"), col("text"),
      deltaEdge = (a, b) => (a + b) % 3 === 0))
    assert(inc == full && full.nonEmpty)
  }

  test("connectedComponents result is partitioning-independent") {
    val pairs = (0 until 60).map(i => ((i % 20).toLong, (20 + i % 7).toLong)).toDF("a", "b")
    def run(parts: Int) =
      Dedup.connectedComponents(pairs.repartition(parts), col("a"), col("b"))
        .as[(Long, Long)].collect().toSet
    assert(run(1) == run(8))
  }
}
