package graft

import org.apache.spark.sql.functions._
import graft.ops.{Layout, Stats}

class LayoutStatsSpec extends SparkSpec {
  import spark.implicits._

  test("zOrderKey interleaves bits: a even positions, b odd") {
    val got = Seq((3L, 0L), (0L, 3L), (65535L, 65535L), (1L, 2L))
      .toDF("a", "b")
      .select(Layout.zOrderKey(col("a"), col("b")).as("z"))
      .as[Long].collect().toSeq
    // z(3,0) = 0b0101, z(0,3) = 0b1010, z(max,max) = 2^32-1,
    // z(1,2) = bit0 + bit3 = 9
    assert(got == Seq(5L, 10L, (1L << 32) - 1, 9L))
  }

  test("cluster() yields disjoint contiguous zkey ranges per partition") {
    val df = spark.range(0, 1024).select(
      (col("id") % 32).as("a"), (col("id") / 32).cast("long").as("b"))
    val clustered = Layout.cluster(df, col("a"), col("b"), partitions = 4)
    val ranges = clustered
      .withColumn("z", Layout.zOrderKey(col("a"), col("b")))
      .withColumn("p", spark_partition_id())
      .groupBy(col("p")).agg(min("z").as("lo"), max("z").as("hi"))
      .orderBy(col("lo"))
      .as[(Int, Long, Long)].collect()
    assert(ranges.length > 1)
    ranges.sliding(2).foreach { case Array(x, y) =>
      assert(x._3 <= y._2, s"overlapping partitions: $x vs $y")
    }
  }

  test("histogram bins by integer floor-division, bin_lo consistent") {
    val got = Stats.histogram(
      Seq(0.0, 4999.9, 5000.0, 5000.1, 12000.0).toDF("v"), col("v"), 5000L)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got(0L) == ((2L, 0L, 4999L, 0L)))
    assert(got(1L) == ((2L, 5000L, 5000L, 5000L)))
    assert(got(2L) == ((1L, 12000L, 12000L, 10000L)))
  }

  test("iqrOutliers counts values beyond Tukey fences") {
    // 11 values 0..10 -> q1=2.5 q3=7.5 iqr=5 fences [-5, 15]; add
    // outliers -100 and +100
    val data = ((0 to 10).map(_.toDouble) ++ Seq(-100.0, 100.0)).map(("k", _))
    val row = Stats.iqrOutliers(data.toDF("k", "v"), col("k"), col("v"))
      .as[(String, Long, Long, Long, Double, Double, Double, Double)]
      .collect().head
    assert(row._2 == 13L)
    assert(row._3 == 1L && row._4 == 1L) // one below, one above
  }

  test("targetEncode shrinks rare categories toward the global prior") {
    // a: 3 rows summing 6; b: 1 row of 4 — N=4, S=10, prior=2.5;
    // m=2: enc_a = (6 + 2*2.5)/(3+2) = 2.2, enc_b = (4 + 5)/3 = 3.0
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("b", 4L)).toDF("c", "y")
    val got = Stats.targetEncode(df, col("c"), col("y"), m = 2)
      .as[(String, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got("a") == (("a", 3L, 6L, 2.2)))
    assert(got("b") == (("b", 1L, 4L, 3.0)))
    // m = 0 is the plain per-category mean; a huge m pins the prior
    val raw = Stats.targetEncode(df, col("c"), col("y"), m = 0)
      .as[(String, Long, Long, Double)].collect().map(r => r._1 -> r._4).toMap
    assert(raw("a") == 2.0 && raw("b") == 4.0)
    val pinned = Stats.targetEncode(df, col("c"), col("y"), m = 1000000)
      .as[(String, Long, Long, Double)].collect().map(_._4)
    assert(pinned.forall(e => math.abs(e - 2.5) < 0.01))
  }
}
