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

  test("curateDeltaSaturation: cap proximity in-band; would_cross == the hard-stop condition") {
    // two base near-dups and one fresh delta near-dup share (most of)
    // their 16 band buckets — under cap 2 those buckets go 2 base →
    // 3 members, exactly curateDelta's rejection condition
    val baseTxt = ("a perfectly ordinary document with plenty of " +
      "distinct interesting words that go on and on for a while ") * 3
    val base = Seq(
      (1L, baseTxt + "alpha"),
      (2L, baseTxt + "beta"),
      (3L, "completely different content about other topics entirely " +
        "sharing nothing with the first cluster of documents at all"))
      .toDF("doc_id", "text")
    val delta = Seq((10L, baseTxt + "gamma")).toDF("doc_id", "text")
    def report(cap: Int) = Curation.curateDeltaSaturation(
        base, delta, col("doc_id"), col("text"), maxBucket = cap)
      .select($"band", $"touched_buckets", $"max_members", $"max_base",
        $"near_cap", $"would_cross", $"saturation_permille")
      .as[(Int, Long, Long, Long, Long, Long, Long)].collect().toSeq
    val tight = report(cap = 2)
    val crossing = tight.filter(_._6 > 0L)
    assert(crossing.nonEmpty, s"no crossing band reported: $tight")
    // the crossing bands carry the full proximity picture: 3 members
    // over a cap of 2 (1500 permille), 2 of them base
    assert(crossing.forall(b => b._3 == 3L && b._4 == 2L && b._7 == 1500L),
      crossing.toString)
    // the report is the WARNING surface (never throws); the fold
    // itself rejects the identical condition loudly
    assert(intercept[IllegalArgumentException] {
      Curation.curateDelta(base, delta, col("doc_id"), col("text"),
        maxBucket = 2).collect()
    }.getMessage.contains("over the LSH cap"))
    // under a roomier cap nothing crosses — the same buckets surface
    // as near-cap (3 of 4 = 750 permille): saturation seen COMING
    val roomy = report(cap = 4)
    assert(roomy.forall(_._6 == 0L), roomy.toString)
    assert(roomy.exists(_._5 > 0L) && roomy.map(_._7).max == 750L,
      roomy.toString)
    // and curateDelta folds CLEAN at that cap — gamma is correctly
    // decided a near-dup loser of alpha (no survivors, no throw)
    assert(Curation.curateDelta(base, delta, col("doc_id"), col("text"),
      maxBucket = 4).collect().isEmpty)
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
