package graft

import org.apache.spark.sql.SparkSession

/** Dev profiling main: per-query cold + warm timings and formatted
  * plans (run manually, not part of the driver contract).
  */
object Profile {
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
    val names = if (args.nonEmpty) args.toSeq else Bench.headline
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      var rows = 0L
      def run(): Double = {
        val t0 = System.nanoTime(); rows = fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9
      }
      val cold = run(); val warm = run(); val warm2 = run()
      println(f"PROFILE $name%-20s cold=$cold%7.2fs warm=$warm%7.2fs warm2=$warm2%7.2fs rows=$rows")
    }
    if (sys.env.contains("GRAFT_EXPLAIN")) {
      names.foreach { name =>
        println(s"===== EXPLAIN $name =====")
        SparkEntry.queries(name)(spark, sfDir).explain("formatted")
      }
    }
    spark.stop()
  }
}
