package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Dev tool: operator metrics for the pagerank edge-build subtree. */
object PrSetupProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/testdata-sf10")
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
        case s: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
          Seq(s.relation.cachedPlan)
        case _ => p.children
      }
      kids.foreach(walk(_, depth + 1, out))
      p.subqueries.foreach(walk(_, depth + 1, out))
    }

    val reps = sys.env.getOrElse("REPS", "2").toInt
    (1 to reps).foreach { rep =>
      println(s"--- rep $rep ---")
      val s = spark
      val width = s.sessionState.conf.numShufflePartitions
      val o = s.read.parquet(s"$sfDir/orders.parquet").select(col("o_orderkey"), col("o_custkey"))
      val l = s.read.parquet(s"$sfDir/lineitem.parquet").select(col("l_orderkey"), col("l_suppkey"))
      val pairs = o.join(l, col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).cast("long").as("src"),
          (col("l_suppkey") * 2 + 1).cast("long").as("dst"))
      val e0 = pairs.select(explode(array(
          struct(col("src"), col("dst")),
          struct(col("dst").as("src"), col("src").as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
      val eDst = e0.repartition(width, col("dst")).distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
      val t0 = System.nanoTime()
      val n = eDst.count()
      println(f"eDst count=$n wall=${(System.nanoTime() - t0) / 1e9}%.2fs")
      val sb = new StringBuilder
      walk(eDst.queryExecution.executedPlan, 0, sb)
      println(sb.toString)
      eDst.unpersist(true)
    }
    spark.stop()
  }
}
