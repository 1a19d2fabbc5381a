package graft

import org.apache.spark.sql.functions._

/** Cluster-scale layout techniques, spec-verified on the local
  * session: bucketed tables co-locate join keys so repeated joins
  * skip the shuffle entirely; date-partitioned layout prunes
  * untouched partitions at planning time; AQE right-sizes reducer
  * counts at runtime. These are the biggest levers at 100 TB — a
  * nightly-reconciliation pipeline (the reference's shape) pre-buckets
  * both sides once and joins for free every run after.
  */
class ScaleSpec extends SparkSpec {

  test("bucketed join on co-located keys runs with zero exchanges") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bk").toString
    graft.ops.Layout.bucketWrite(
      spark.read.parquet(s"$sf/customer.parquet"),
      "cust_b", s"$dir/cust_b", 4, "c_custkey")
    graft.ops.Layout.bucketWrite(
      spark.read.parquet(s"$sf/orders.parquet"),
      "ord_b", s"$dir/ord_b", 4, "o_custkey")
    val joined = spark.table("cust_b")
      .join(spark.table("ord_b"), col("c_custkey") === col("o_custkey"))
      .groupBy(col("c_custkey")).agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")
    assert(joined.count() > 0)
  }

  test("q_bucket_join: the sort-merge join subtree has no Exchange and no Sort") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // AQE's wrapper hides the join subtree from node collection;
    // the static plan is what the shape assertion needs
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // since SPARK-28632 the scan only reports the buckets' sortBy
    // ordering behind this flag (it requires one file per bucket,
    // which Layout.bucketWrite guarantees via its pre-repartition)
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    try {
      val df = SparkEntry.queries("q_bucket_join")(spark, sf)
      val smj = df.queryExecution.executedPlan.collectFirst {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      }
      assert(smj.isDefined, "expected a sort-merge join of the bucketed tables")
      val exchanges = smj.get.collect {
        case e: org.apache.spark.sql.execution.exchange.Exchange => e
      }
      val sorts = smj.get.collect {
        case s: org.apache.spark.sql.execution.SortExec => s
      }
      assert(exchanges.isEmpty, "bucketed join should read buckets in place")
      assert(sorts.isEmpty, "sortBy buckets should make the merge sort-free")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.unset("spark.sql.legacy.bucketedTableScan.outputOrdering")
    }
  }

  test("date-partitioned layout prunes partitions at the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    spark.read.parquet(s"$sf/orders.parquet")
      .withColumn("order_year", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("order_year").parquet(dir)
    val q = spark.read.parquet(dir).filter(col("order_year") === 1997)
      .select(col("o_orderkey"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(order_year"),
      s"no partition pruning in scan:\n$plan")
    assert(q.count() > 0)
  }

  test("deterministic sampling is map-only: no Exchange in the plan") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val plan = graft.llm.Sampling
      .stratified(docs, col("doc_id"), col("lang"), Map("en" -> 500), 250)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"sampling must compose with the scan shuffle-free:\n$plan")
  }

  test("Bloom probe prunes the big side BEFORE the semi join's shuffle") {
    // the Bloom path matters in the no-broadcast regime (dim too big
    // to broadcast → shuffle semi join); with broadcast on, Catalyst
    // correctly reorders the cheap broadcast semi join first and the
    // Bloom is redundant — so pin that regime here
    val thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val big = spark.read.parquet(s"$sf/lineitem.parquet")
      val small = spark.read.parquet(s"$sf/supplier.parquet")
        .filter(col("s_acctbal") > 1000).select(col("s_suppkey"))
      val q = graft.functions.BloomOps.prunedSemiJoin(
        big, col("l_suppkey"), small, col("s_suppkey"))
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("bloommightcontain"), s"no Bloom probe in plan:\n$plan")
      // the probe is a literal predicate pinned below the big side's
      // Exchange: filter first, shuffle the survivors
      val exchangeIdx = plan.indexOf("Exchange hashpartitioning(l_suppkey")
      val filterIdx = plan.indexOf("bloommightcontain")
      assert(exchangeIdx >= 0 && exchangeIdx < filterIdx,
        s"Bloom probe must run below the semi join's shuffle:\n$plan")
      assert(q.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
  }

  test("decontaminate broadcasts the benchmark grams, never shuffles the corpus side for the join") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val q = graft.llm.TextAnalysis.decontaminate(
      docs.filter(col("doc_id") % 97 =!= 0), col("doc_id"), col("text"),
      docs.filter(col("doc_id") % 97 === 0), col("text"), n = 3)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"benchmark gram set should broadcast:\n$plan")
  }

  test("AQE coalesces the tiny post-shuffle partitions") {
    val parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try {
      val df = spark.read.parquet(s"$sf/orders.parquet")
        .groupBy(col("o_custkey")).agg(count(lit(1)))
      df.collect()
      val finalPlan = df.queryExecution.executedPlan.toString
      assert(finalPlan.contains("AQEShuffleRead coalesced"),
        s"AQE did not coalesce the 32 tiny reducers:\n$finalPlan")
    } finally spark.conf.set("spark.sql.shuffle.partitions", parts)
  }

  test("AQE splits a planted skewed JOIN partition at runtime (skew=true)") {
    import org.apache.spark.sql.functions.{col, concat, lit, when}
    // AQE's skew handling covers shuffled JOINS only: it re-plans an
    // oversized post-shuffle partition into sub-splits at runtime.
    // Manual salting (ops/Skew.scala) remains required for (a) skewed
    // AGGREGATIONS — no AQE rule exists — and (b) joins where the
    // split threshold can't be tuned per-query. This spec pins down
    // the boundary: the planted heavy-hitter join below needs no
    // salting, just AQE.
    val tuned = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = tuned.map { case (k, _) => k -> spark.conf.getOption(k) }
    tuned.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // half the probe rows hit key 0 — the classic heavy-hitter key
      val probe = spark.range(0, 200000).select(
        when(col("id") % 2 === 0, 0L).otherwise(col("id") % 1000).as("k"),
        concat(lit("padding-padding-padding-padding-"), col("id")).as("pl"))
      val dim = spark.range(0, 1000).select(col("id").as("k"), (col("id") * 2).as("w"))
      val joined = probe.join(dim, "k")
      // collect() drives THIS Dataset's QueryExecution (count() would
      // plan a separate aggregate query and leave this one unexecuted)
      assert(joined.collect().length == 200000, "inner join keeps every probe row")
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE did not mark the skewed join for splitting:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
