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

  test("column-name collisions are rejected loudly") {
    val e = intercept[IllegalArgumentException] {
      AdaptiveJoin.adaptiveJoin(
        cleanLeft, cleanLeft.withColumnRenamed("lk", "rk"), "lk", "rk")
    }
    assert(e.getMessage.contains("disjoint"))
  }
}
