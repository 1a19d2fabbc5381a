package graft

import org.apache.spark.sql.functions._

import graft.llm.TextAnalysis
import graft.ops.Incremental

class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  private def canon(df: org.apache.spark.sql.DataFrame) =
    Incremental.finish(df).as[(String, Long, Double, Double, Double)]
      .collect().sortBy(_._1).toSeq

  test("merge(state(a), state(b)) == state(a ++ b) at any split") {
    val rows = (0 until 1000).map(i => (s"k${i % 7}", (i % 100) / 4.0))
    val full = rows.toDF("k", "v")
    val want = canon(Incremental.state(full, col("k"), col("v")))
    for (split <- Seq(1, 500, 999)) {
      val a = rows.take(split).toDF("k", "v")
      val b = rows.drop(split).toDF("k", "v")
      val got = canon(Incremental.merge(
        Incremental.state(a, col("k"), col("v")),
        Incremental.state(b, col("k"), col("v"))))
      assert(got == want, s"split=$split")
    }
  }

  test("merge handles keys present on only one side (identity element)") {
    val a = Seq(("x", 1.0), ("y", 2.0)).toDF("k", "v")
    val b = Seq(("y", 3.0), ("z", 4.0)).toDF("k", "v")
    val got = canon(Incremental.merge(
      Incremental.state(a, col("k"), col("v")),
      Incremental.state(b, col("k"), col("v")))).toSet
    assert(got == Set(
      ("x", 1L, 1.0, 1.0, 1.0),
      ("y", 2L, 5.0, 2.0, 3.0),
      ("z", 1L, 4.0, 4.0, 4.0)))
  }

  test("merges chain: fold of three deltas equals one-shot state") {
    val batches = Seq(
      Seq(("a", 1.0), ("b", 2.0)),
      Seq(("a", 3.0)),
      Seq(("b", -1.0), ("c", 0.5)))
    val folded = batches.map(b => Incremental.state(b.toDF("k", "v"), col("k"), col("v")))
      .reduce(Incremental.merge)
    val want = canon(Incremental.state(
      batches.flatten.toDF("k", "v"), col("k"), col("v")))
    assert(canon(folded) == want)
  }

  test("repetition stats on hand-checked docs") {
    val df = Seq(
      (1L, "a a a a"),        // bigrams: aa,aa,aa → dup 2/3; top 4/4
      (2L, "w x y z"),        // all distinct
      (3L, "spam spam ham"))  // bigrams: "spam spam","spam ham" distinct
      .toDF("id", "text")
    val got = TextAnalysis.repetition(df, col("id"), col("text"))
      .as[(Long, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 4L, 1.0 - 1.0 / 3, 1.0)))
    assert(got(2L) == ((2L, 4L, 0.0, 0.25)))
    assert(got(3L) == ((3L, 3L, 0.0, 2.0 / 3)))
  }
}
