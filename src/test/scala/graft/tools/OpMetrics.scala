package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

/** Dev tool: runs a query and prints the executed plan tree with per-operator SQL metrics (operator-level time/row attribution the stage listener cannot give). */
object OpMetrics {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        sys.env.getOrElse("SPARK_GRAFT_OBJ_AGG_KEYS", "65536"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq else graft.Bench.headline

    def walk(p: SparkPlan, depth: Int, out: StringBuilder): Unit = {
      val interesting = p.metrics.toSeq
        .filter { case (_, m) => m.value > 0 }
        .sortBy(_._1)
        .map { case (k, m) =>
          val v = m.value
          val s =
            if (m.metricType == "timing") s"${v}ms"
            else if (m.metricType == "nsTiming") f"${v / 1e6}%.0fms"
            else if (m.metricType == "size") s"${v / 1048576}MB"
            else v.toString
          s"$k=$s"
        }
      out ++= ("  " * depth) + p.getClass.getSimpleName +
        " [" + interesting.mkString(", ") + "]\n"
      val kids: Seq[SparkPlan] = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case r: ReusedExchangeExec => Seq(r.child)
        case _ => p.children
      }
      kids.foreach(walk(_, depth + 1, out))
      p.subqueries.foreach(walk(_, depth + 1, out))
    }

    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      try fn(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => () }
      fn(spark, sfDir).count() // warm at target SF
      val counted = fn(spark, sfDir).groupBy().count()
      val t0 = System.nanoTime()
      val n = counted.collect().head.getLong(0)
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"\n===== $name wall=$wall%.2fs rows=$n =====")
      val sb = new StringBuilder
      walk(counted.queryExecution.executedPlan, 0, sb)
      println(sb.toString)
    }
    spark.stop()
  }
}
