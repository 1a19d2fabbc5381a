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

  test("connectedComponents result is partitioning-independent") {
    val pairs = (0 until 60).map(i => ((i % 20).toLong, (20 + i % 7).toLong)).toDF("a", "b")
    def run(parts: Int) =
      Dedup.connectedComponents(pairs.repartition(parts), col("a"), col("b"))
        .as[(Long, Long)].collect().toSet
    assert(run(1) == run(8))
  }
}
