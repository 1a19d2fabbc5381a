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
    val c = spark.read.parquet(s"$sf/customer.parquet")
    val o = spark.read.parquet(s"$sf/orders.parquet")
    c.write.mode("overwrite").bucketBy(4, "c_custkey")
      .sortBy("c_custkey").saveAsTable("cust_b")
    o.write.mode("overwrite").bucketBy(4, "o_custkey")
      .sortBy("o_custkey").saveAsTable("ord_b")
    val joined = spark.table("cust_b")
      .join(spark.table("ord_b"), col("c_custkey") === col("o_custkey"))
      .groupBy(col("c_custkey")).agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")
    assert(joined.count() > 0)
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
}
