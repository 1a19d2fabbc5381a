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
}
