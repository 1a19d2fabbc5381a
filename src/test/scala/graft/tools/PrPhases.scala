package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Dev tool: phase-time q_pagerank's pipeline (edge build, setup
  * exchanges, per-round cost) so optimization targets the measured
  * phase, not a guess. Mirrors ops/Graph.pageRankConverged inline.
  */
object PrPhases {
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
    def tm[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"TM $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs"); r
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
      val ne = tm("eDst repart+distinct+persist")(eDst.count())
      val nodesDeg = eDst
        .select(explode(array(
          struct(col("src").as("node"), lit(1L).as("d")),
          struct(col("dst").as("node"), lit(0L).as("d")))).as("e"))
        .select(col("e.node").as("node"), col("e.d").as("d"))
        .groupBy(col("node")).agg(sum(col("d")).as("deg"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val n = tm("nodesDeg agg+persist+count")(nodesDeg.count())
      println(s"   edges=$ne nodes=$n")
      val scale = 1000000000000L
      val base = (scale * 3 / 20) / n
      var rank = nodesDeg.withColumn("rank", lit(scale / n))
      (1 to 3).foreach { it =>
        rank = tm(s"round $it (join+agg+ckpt)") {
          val contribSrc = rank.filter(col("deg") > 0)
            .select(col("node").as("src"), expr("rank div deg").as("c"))
          val contribs = eDst.join(broadcast(contribSrc), Seq("src"))
            .select(col("dst").as("node"), col("c"))
            .groupBy(col("node")).agg(sum(col("c")).as("in_mass"))
          nodesDeg.join(contribs, Seq("node"), "left")
            .select(col("node"), col("deg"),
              (lit(base) + expr("(coalesce(in_mass, 0L) * 17) div 20")).as("rank"))
            .localCheckpoint()
        }
      }
      tm("final count")(rank.count())
      eDst.unpersist(true)
      nodesDeg.unpersist(true)
    }
    spark.stop()
  }
}
