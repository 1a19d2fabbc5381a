package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: dump .explain("formatted") for named queries into plans/<round>/<name>_<suffix>.txt. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val suffix = sys.env.getOrElse("GRAFT_PLAN_SUFFIX", "after")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      // mirror the Bench session so dumped plans match what it runs
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        sys.env.getOrElse("SPARK_GRAFT_OBJ_AGG_KEYS", "65536"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get("plans/r18"))
    args.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val s = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"plans/r18/${name}_$suffix.txt"), s)
      println(s"dumped $name")
    }
    spark.stop()
  }
}
