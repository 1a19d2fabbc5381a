package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Scratch: phase timing of q_pagerank's setup vs rounds (dev-only). */
object TmpPr {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def tm[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"TM $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs"); r
    }
    val reps = sys.env.getOrElse("REPS", "2").toInt
    (1 to reps).foreach { rep =>
      println(s"--- rep $rep ---")
      val s = spark
      val o = s.read.parquet(s"$sfDir/orders.parquet").select(col("o_orderkey"), col("o_custkey"))
      val l = s.read.parquet(s"$sfDir/lineitem.parquet").select(col("l_orderkey"), col("l_suppkey"))
      val pairs = o.join(l, col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).cast("long").as("src"),
          (col("l_suppkey") * 2 + 1).cast("long").as("dst"))
      val e0 = pairs.select(explode(array(
          struct(col("src"), col("dst")),
          struct(col("dst").as("src"), col("src").as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
      val width = s.sessionState.conf.numShufflePartitions
      val eDst = e0.repartition(width, col("dst")).distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
      tm("eDst materialize+count")(eDst.count())
      // current setup: union-distinct nodes + outdeg + join
      val nodes = eDst.select(col("src").as("node"))
        .union(eDst.select(col("dst").as("node"))).distinct()
      val outdeg = eDst.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      val nodesDeg = nodes
        .join(outdeg.withColumnRenamed("src", "node"), Seq("node"), "left")
        .select(col("node"), coalesce(col("deg"), lit(0L)).as("deg"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val n = tm("nodesDeg (current) count")(nodesDeg.count())
      // fused alternative: one explode + one agg
      val nodesDeg2 = eDst.select(explode(array(
          struct(col("src").as("node"), lit(1L).as("d")),
          struct(col("dst").as("node"), lit(0L).as("d")))).as("e"))
        .select(col("e.node").as("node"), col("e.d").as("d"))
        .groupBy(col("node")).agg(sum(col("d")).as("deg"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val n2 = tm("nodesDeg (fused) count")(nodesDeg2.count())
      val same = nodesDeg.as("a").join(nodesDeg2.as("b"), Seq("node"))
        .filter(col("a.deg") =!= col("b.deg")).count()
      println(s"n=$n n2=$n2 degDiff=$same")
      val base = (1000000000000L * 3 / 20) / n
      var rank = nodesDeg.withColumn("rank", lit(1000000000000L / n))
      def bcast(df: org.apache.spark.sql.DataFrame) = broadcast(df)
      var it = 0
      while (it < 3) {
        val next = tm(s"round $it")(
          graft.ops.Graph.pageRankRound(eDst, nodesDeg, rank, base, bcast)
            .localCheckpoint())
        rank = next
        it += 1
      }
      tm("final count")(rank.count())
      eDst.unpersist(true); nodesDeg.unpersist(true); nodesDeg2.unpersist(true)
    }
    spark.stop()
  }
}
