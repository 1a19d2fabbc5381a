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

  test("curateDelta: survivors(base) ∪ delta-survivors == full curate; guards fire") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text")
    // delta (all ids above the base): planted near-dups of base docs
    // (must drop), exact dups of base texts (must drop), fresh texts
    // (survive iff quality passes), and a near-dup PAIR inside the
    // delta itself (higher id drops)
    val base = docs
    val freshA = "the freshest of documents, words many and varied " * 8
    val delta = docs.filter($"doc_id" % 50 === 0).select(
        ($"doc_id" + 1000000L).as("doc_id"),
        concat($"text", lit(" near duplicate suffix")).as("text"))
      .unionByName(docs.filter($"doc_id" === 7L).select(
        ($"doc_id" + 2000000L).as("doc_id"), $"text"))  // exact dup
      .unionByName(Seq(
        (3000000L, freshA),
        (3000001L, freshA + " tail"), // near-dup of 3000000 -> drops
        (3000002L, "x")               // too short: quality-dropped
      ).toDF("doc_id", "text"))
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select($"doc_id").as[Long].collect().toSet
    val baseSurv = ids(Curation.curate(base, col("doc_id"), col("text"),
      minJaccard = 0.6))
    val newSurv = ids(Curation.curateDelta(base, delta, col("doc_id"),
      col("text"), minJaccard = 0.6))
    val want = ids(Curation.curate(base.unionByName(delta),
      col("doc_id"), col("text"), minJaccard = 0.6))
    assert(baseSurv.union(newSurv) == want)
    assert(newSurv.contains(3000000L) && !newSurv.contains(3000001L) &&
      !newSurv.contains(3000002L) && !newSurv.contains(2000007L))
    // the SELF-SUSTAINING path: passing the persisted qualified-base
    // class frame yields the identical result with no base-doc access
    import graft.llm.{Dedup, TextAnalysis}
    val bQual = base.join(
      TextAnalysis.qualityScore(base, col("doc_id"), col("text"))
        .filter($"quality" >= 0.4).select($"doc_id"),
      Seq("doc_id"), "left_semi")
    val frame = Dedup.contentClasses(bQual, col("doc_id"), col("text"))
      .classes.localCheckpoint()
    val newSurv2 = ids(Curation.curateDelta(base, delta, col("doc_id"),
      col("text"), minJaccard = 0.6, baseClasses = Some(frame)))
    assert(newSurv2 == newSurv)
    // append-only contract violated -> loud error
    assert(intercept[IllegalArgumentException] {
      Curation.curateDelta(base, delta.withColumn("doc_id",
        $"doc_id" - 3000000L), col("doc_id"), col("text"))
    }.getMessage.contains("append-only"))
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
