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

  test("connectedComponents result is partitioning-independent") {
    val pairs = (0 until 60).map(i => ((i % 20).toLong, (20 + i % 7).toLong)).toDF("a", "b")
    def run(parts: Int) =
      Dedup.connectedComponents(pairs.repartition(parts), col("a"), col("b"))
        .as[(Long, Long)].collect().toSet
    assert(run(1) == run(8))
  }
}
