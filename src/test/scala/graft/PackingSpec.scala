package graft

import org.apache.spark.sql.functions._

import graft.ops.Packing

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("nextFit closes a sequence exactly when the budget would overflow") {
    val df = Seq(
      ("a", 1L, 40L), ("a", 2L, 50L), ("a", 3L, 20L), // 40+50 = 90, +20 > 100
      ("a", 4L, 95L),                                  // 20+95 > 100 → new seq
      ("b", 1L, 10L))
      .toDF("g", "id", "sz")
    val got = Packing.nextFit(df, col("g"), col("id"), col("sz"), budget = 100)
      .select("grp", "ord", "seq_id").as[(String, Long, Long)].collect().toSet
    assert(got == Set(("a", 1L, 0L), ("a", 2L, 0L), ("a", 3L, 1L), ("a", 4L, 2L), ("b", 1L, 0L)))
  }

  test("a document larger than the budget still gets its own sequence") {
    val df = Seq(("a", 1L, 500L), ("a", 2L, 10L), ("a", 3L, 10L)).toDF("g", "id", "sz")
    val got = Packing.nextFit(df, col("g"), col("id"), col("sz"), budget = 100)
      .select("ord", "seq_id").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 1L))
  }

  test("packing is identical at any input partitioning") {
    val base = (0 until 500).map(i => (s"g${i % 7}", i.toLong, 10L + i % 90))
    def run(parts: Int) =
      Packing.nextFit(base.toDF("g", "id", "sz").repartition(parts),
        col("g"), col("id"), col("sz"), budget = 256)
        .select("grp", "ord", "seq_id").as[(String, Long, Long)].collect().toSet
    assert(run(1) == run(11))
  }

  test("every sequence except possibly the last per group respects the budget") {
    val df = (0 until 300).map(i => (s"g${i % 3}", i.toLong, 30L + i % 150)).toDF("g", "id", "sz")
    val fills = Packing.nextFit(df, col("g"), col("id"), col("sz"), budget = 512)
      .groupBy("grp", "seq_id").agg(sum("sz").as("fill"), max("sz").as("mx"))
      .as[(String, Long, Long, Long)].collect()
    fills.foreach { case (g, seq, fill, mx) =>
      assert(fill <= 512 || mx > 512, s"$g/$seq overfilled: $fill")
    }
  }
}
