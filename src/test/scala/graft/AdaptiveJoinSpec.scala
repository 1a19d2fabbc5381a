package graft

import org.apache.spark.sql.functions._

import graft.ops.AdaptiveJoin

/** The sketch-driven join planner: the decision must follow the
  * measured statistics, the chosen plan must actually EXECUTE as
  * chosen (explain-verified), and every arm must produce the same
  * rows bit-for-bit.
  */
class AdaptiveJoinSpec extends SparkSpec {
  import spark.implicits._

  // left: 5000 rows, key 0 hot (2500 rows), 500 tail keys
  private lazy val skewedLeft = spark.range(0, 5000)
    .selectExpr(
      "CASE WHEN id < 2500 THEN 0 ELSE id % 500 END AS lk",
      "id AS l_payload")
  // clean left: near-uniform multiplicity 10
  private lazy val cleanLeft = spark.range(0, 5000)
    .selectExpr("id % 500 AS lk", "id AS l_payload")
  // right: 500 keys x 2 rows = 1000 rows
  private lazy val bigRight = spark.range(0, 1000)
    .selectExpr("id % 500 AS rk", "id + 100000 AS r_payload")
  private lazy val smallRight = spark.range(0, 40)
    .selectExpr("id % 20 AS rk", "id + 100000 AS r_payload")

  private def plan(j: AdaptiveJoin.Joined): String = {
    j.df.count() // force AQE to finalize
    j.df.queryExecution.executedPlan.toString
  }

  test("small side broadcasts; plan shows BroadcastHashJoin") {
    val j = AdaptiveJoin.adaptiveJoin(cleanLeft, smallRight, "lk", "rk",
      broadcastMaxRows = 100L, skewMaxMult = 50L)
    assert(j.decision.strategy == "broadcast_right")
    assert(j.decision.nLeft == 5000L && j.decision.nRight == 40L)
    assert(plan(j).contains("BroadcastHashJoin"))
  }

  test("skewed probe gets salted; the salt reaches the executed join keys") {
    val j = AdaptiveJoin.adaptiveJoin(skewedLeft, bigRight, "lk", "rk",
      broadcastMaxRows = 100L, skewMaxMult = 50L)
    assert(j.decision.strategy == "salted_left", j.decision.toString)
    // key 0: ids 0..2499 plus the five tail ids divisible by 500
    assert(j.decision.maxMultLeft == 2505L && j.decision.maxMultRight == 2L)
    assert(plan(j).contains("_salt"))
  }

  test("clean large-large runs the pinned shuffle merge join") {
    val j = AdaptiveJoin.adaptiveJoin(cleanLeft, bigRight, "lk", "rk",
      broadcastMaxRows = 100L, skewMaxMult = 50L)
    assert(j.decision.strategy == "shuffle", j.decision.toString)
    val p = plan(j)
    assert(p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"))
  }

  test("all strategies produce bit-identical rows on both corpora") {
    def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
      df.collect().toSeq.map(_.toSeq).sortBy(_.mkString("|"))
    for (leftDf <- Seq(skewedLeft, cleanLeft)) {
      val want = rows(leftDf.join(bigRight, col("lk") === col("rk"))
        .select(col("lk"), col("l_payload"), col("rk"), col("r_payload")))
      for (s <- Seq("broadcast_right", "broadcast_left", "salted_left",
          "salted_right", "shuffle")) {
        val j = AdaptiveJoin.adaptiveJoin(leftDf, bigRight, "lk", "rk",
          force = Some(s))
        assert(j.df.columns.toSeq ==
          Seq("lk", "l_payload", "rk", "r_payload"), s)
        assert(rows(j.df) == want, s"strategy $s diverged")
      }
    }
  }

  test("estPairs lands within a 2x envelope of the exact join size") {
    val j = AdaptiveJoin.adaptiveJoin(cleanLeft, bigRight, "lk", "rk",
      broadcastMaxRows = 100L, skewMaxMult = 50L)
    val exact = cleanLeft.join(bigRight, col("lk") === col("rk")).count()
    assert(exact == 10000L)
    assert(j.decision.estPairs > exact / 2.0 &&
      j.decision.estPairs < exact * 2.0,
      s"estPairs ${j.decision.estPairs} vs exact $exact")
    // disjoint key spaces estimate ~0 pairs
    val disjointRight = spark.range(0, 1000)
      .selectExpr("id % 500 + 1000000 AS rk", "id AS r_payload")
    val d = AdaptiveJoin.adaptiveJoin(cleanLeft, disjointRight, "lk", "rk",
      broadcastMaxRows = 100L, skewMaxMult = 50L)
    assert(d.decision.estPairs == 0.0)
  }

  test("the two pre-flight side-stat jobs run concurrently (r12 item 6)") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
    import scala.jdk.CollectionConverters._
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, java.lang.Long]()
    val intervals = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long)]()
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts.put(j.jobId, j.time)
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val s = starts.get(j.jobId)
        if (s != null) intervals.put(j.jobId, (s.longValue, j.time))
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      // slow every scan task so each pre-flight job is wide enough
      // for its [submit, complete] interval to overlap unambiguously
      // on the driver's event timestamps
      def slow(df: org.apache.spark.sql.DataFrame, names: Seq[String]) =
        df.as[(Long, Long)]
          .mapPartitions { it => Thread.sleep(500); it }
          .toDF(names: _*)
      val j = AdaptiveJoin.adaptiveJoin(
        slow(cleanLeft, Seq("lk", "l_payload")),
        slow(bigRight, Seq("rk", "r_payload")),
        "lk", "rk", broadcastMaxRows = 100L, skewMaxMult = 5000000L)
      // decision unchanged by the concurrency
      assert(j.decision.strategy == "shuffle", j.decision.toString)
      // jobs within one side run sequentially (one future each), so
      // any overlapping pair proves cross-side concurrency
      val deadline = System.currentTimeMillis() + 15000
      def overlapping: Boolean = {
        val iv = intervals.values.asScala.toSeq
        iv.combinations(2).exists { case Seq((s1, e1), (s2, e2)) =>
          s1 < e2 && s2 < e1
        }
      }
      while (!overlapping && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(overlapping,
        s"no overlapping pre-flight jobs among ${intervals.asScala}")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("column-name collisions are rejected loudly") {
    val e = intercept[IllegalArgumentException] {
      AdaptiveJoin.adaptiveJoin(
        cleanLeft, cleanLeft.withColumnRenamed("lk", "rk"), "lk", "rk")
    }
    assert(e.getMessage.contains("disjoint"))
  }
}
