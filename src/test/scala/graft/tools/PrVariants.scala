package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Dev tool: A/B the pagerank edge-frame materialization strategies
  * (columnar persist vs localCheckpoint, compressed vs not) and check
  * whether the round plan stays Exchange-free under each.
  */
object PrVariants {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/testdata-sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val compressed = sys.env.getOrElse("CACHE_COMPRESSED", "true")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.inMemoryColumnarStorage.compressed", compressed)
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
        sys.env.getOrElse("SHJ_THRESHOLD", "0"))
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        sys.env.getOrElse("SPARK_GRAFT_OBJ_AGG_KEYS", "65536"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def tm[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"TM $label%-34s ${(System.nanoTime() - t0) / 1e9}%7.2fs"); r
    }
    val variant = sys.env.getOrElse("VARIANT", "persist") // persist | ckpt
    val reps = sys.env.getOrElse("REPS", "2").toInt
    // interleave materialization strategies per rep
    val cycle = Seq("persist", "ckpt", "nopersist")
    (1 to reps).foreach { rep =>
      val pairsDistinct = false
      val variantR = cycle((rep - 1) % cycle.size)
      println(s"--- rep $rep variant=$variantR pairsDistinct=$pairsDistinct ---")
      val s = spark
      val width = s.sessionState.conf.numShufflePartitions
      val o = s.read.parquet(s"$sfDir/orders.parquet").select(col("o_orderkey"), col("o_custkey"))
      val l = s.read.parquet(s"$sfDir/lineitem.parquet").select(col("l_orderkey"), col("l_suppkey"))
      val pairs = o.join(l, col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).cast("long").as("src"),
          (col("l_suppkey") * 2 + 1).cast("long").as("dst"))
      val pIn = if (pairsDistinct) pairs.distinct() else pairs
      val e0 = pIn.select(explode(array(
          struct(col("src"), col("dst")),
          struct(col("dst").as("src"), col("src").as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
      // bipartite parity: src/dst of the fwd and rev edge sets are
      // disjoint, so distinct(pairs)-then-explode == explode-then-
      // distinct; the ranksum check proves it per run
      val eRaw =
        if (pairsDistinct) e0.repartition(width, col("dst"))
        else e0.repartition(width, col("dst")).distinct()
      val eDst: DataFrame = variantR match {
        case "ckpt" => tm("eDst localCheckpoint")(eRaw.localCheckpoint())
        case "nopersist" =>
          tm("eDst bare noop-sink")(
            eRaw.write.format("noop").mode("overwrite").save())
          // still persist so the rest of the rep runs comparably
          val d = eRaw.persist(StorageLevel.MEMORY_AND_DISK)
          tm("eDst persist+count (after bare)")(d.count())
          d
        case _ =>
          val d = eRaw.persist(StorageLevel.MEMORY_AND_DISK)
          tm("eDst persist+count")(d.count())
          d
      }
      val nodesDeg = eDst
        .select(explode(array(
          struct(col("src").as("node"), lit(1L).as("d")),
          struct(col("dst").as("node"), lit(0L).as("d")))).as("e"))
        .select(col("e.node").as("node"), col("e.d").as("d"))
        .groupBy(col("node")).agg(sum(col("d")).as("deg"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val n = tm("nodesDeg agg+persist+count")(nodesDeg.count())
      val scale = 1000000000000L
      val base = (scale * 3 / 20) / n
      var rank = nodesDeg.withColumn("rank", lit(scale / n))
      (1 to 3).foreach { it =>
        val next = {
          val contribSrc = rank.filter(col("deg") > 0)
            .select(col("node").as("src"), expr("rank div deg").as("c"))
          val contribs = eDst.join(broadcast(contribSrc), Seq("src"))
            .select(col("dst").as("node"), col("c"))
            .groupBy(col("node")).agg(sum(col("c")).as("in_mass"))
          nodesDeg.join(contribs, Seq("node"), "left")
            .select(col("node"), col("deg"),
              (lit(base) + expr("(coalesce(in_mass, 0L) * 17) div 20")).as("rank"))
        }
        if (it == 1) {
          val nEx = next.queryExecution.executedPlan.toString()
            .linesIterator.count(_.contains("Exchange"))
          println(s"   round-plan Exchange lines: $nEx")
        }
        rank = tm(s"round $it (join+agg+ckpt)")(next.localCheckpoint())
      }
      val chk = tm("final sum(rank)")(
        rank.agg(sum(col("rank"))).head.getLong(0))
      println(s"   nodes=$n ranksum=$chk")
      eDst.unpersist(true)
      nodesDeg.unpersist(true)
    }
    spark.stop()
  }
}
