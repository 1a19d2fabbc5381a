package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: split a query's fixed cost into plan-build / optimize / physical-planning / execute phases. */
object LatSplit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq else Seq("q_fuzzy_join2")
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      (1 to 3).foreach { rep =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.optimizedPlan // force analysis+optimization
        val t2 = System.nanoTime()
        df.queryExecution.executedPlan // physical planning
        val t3 = System.nanoTime()
        val n = df.count()
        val t4 = System.nanoTime()
        println(f"LAT $name rep$rep build=${(t1 - t0) / 1e9}%5.2f opt=${(t2 - t1) / 1e9}%5.2f phys=${(t3 - t2) / 1e9}%5.2f exec=${(t4 - t3) / 1e9}%5.2f rows=$n")
      }
    }
    spark.stop()
  }
}
