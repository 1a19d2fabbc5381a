package graft

import org.apache.spark.sql.functions._
import graft.llm.Curation
import graft.ops.Skew

class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("salted aggregation equals direct groupBy") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
    val salted = Skew.saltedCountSum(ev, col("event_type"), col("value"), col("event_id"))
      .as[(String, Long, Double)].collect().map { case (k, n, v) => k -> (n, v) }.toMap
    val direct = ev.groupBy(col("event_type"))
      .agg(count(lit(1)),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2))).cast("double"))
      .as[(String, Long, Double)].collect().map { case (k, n, v) => k -> (n, v) }.toMap
    assert(salted == direct)
  }

  test("curation drops planted near-dup copies, keeps originals") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val planted = docs.select($"doc_id", $"text").unionByName(
      docs.filter($"doc_id" % 50 === 0).select(
        ($"doc_id" + 1000000L).as("doc_id"),
        concat($"text", lit(" near duplicate suffix")).as("text")))
    val surviving = Curation.curate(planted, col("doc_id"), col("text"), minJaccard = 0.6)
      .select($"doc_id").as[Long].collect().toSet
    val plantedIds = docs.filter($"doc_id" % 50 === 0).select($"doc_id")
      .as[Long].collect().map(_ + 1000000L).toSet
    // every planted copy whose original survived must be gone
    val survivedOriginals = plantedIds.filter(p => surviving.contains(p - 1000000L))
    assert(survivedOriginals.forall(p => !surviving.contains(p)),
      s"planted copies kept: ${survivedOriginals.filter(surviving.contains)}")
    assert(surviving.nonEmpty)
  }

  test("curate is lazy: zero jobs at plan build, release() drops the caches") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").select($"doc_id", $"text")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          s: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val before = spark.sparkContext.getPersistentRDDs.keySet
      val curated = Curation.curateReleasable(docs, col("doc_id"), col("text"))
      Thread.sleep(300) // listener events are delivered asynchronously
      assert(jobs.get() == 0, s"plan construction ran ${jobs.get()} jobs")
      assert(curated.df.count() > 0) // the one consuming action
      curated.release()
      // no curate-created blocks outlive release()
      val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
      assert(leaked.isEmpty, s"release() left cached RDDs behind: $leaked")
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
