package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Scratch (dev-only): dump the pageRank SETUP subtree plans — the
  * part change 1 of r17 touched; the query-level plan only shows the
  * final checkpointed scan because the iteration runs eagerly.
  */
object TmpPrPlan {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val o = spark.read.parquet(s"$sfDir/orders.parquet").select(col("o_orderkey"), col("o_custkey"))
    val l = spark.read.parquet(s"$sfDir/lineitem.parquet").select(col("l_orderkey"), col("l_suppkey"))
    val pairs = o.join(l, col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).cast("long").as("src"),
        (col("l_suppkey") * 2 + 1).cast("long").as("dst"))
    val e0 = pairs.select(explode(array(
        struct(col("src"), col("dst")),
        struct(col("dst").as("src"), col("src").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
    val eDst = e0.repartition(32, col("dst")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    def fmt(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    // BEFORE (r16 shape): union-distinct nodes + outdeg agg + left join
    val nodes = eDst.select(col("src").as("node"))
      .union(eDst.select(col("dst").as("node"))).distinct()
    val outdeg = eDst.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val before = nodes
      .join(outdeg.withColumnRenamed("src", "node"), Seq("node"), "left")
      .select(col("node"), coalesce(col("deg"), lit(0L)).as("deg"))
    // AFTER (r17): one explode + one map-combined aggregation
    val after = eDst.select(explode(array(
        struct(col("src").as("node"), lit(1L).as("d")),
        struct(col("dst").as("node"), lit(0L).as("d")))).as("e"))
      .select(col("e.node").as("node"), col("e.d").as("d"))
      .groupBy(col("node")).agg(sum(col("d")).as("deg"))
    val hdr = "\n\n== pageRank nodesDeg SETUP subtree (change 1; the " +
      "query-level plan above only shows the final checkpointed scan " +
      "because the iteration runs eagerly) ==\n"
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("plans/r17/q_pagerank_before.txt"),
      hdr + "-- r16 shape: union-distinct + outdeg agg + left join --\n" + fmt(before),
      java.nio.file.StandardOpenOption.APPEND)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("plans/r17/q_pagerank_after.txt"),
      hdr + "-- r17 shape: one explode + one map-combined agg --\n" + fmt(after),
      java.nio.file.StandardOpenOption.APPEND)
    println("appended")
    spark.stop()
  }
}
