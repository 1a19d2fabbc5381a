package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end training-data curation: the composition a 100 TB
  * pipeline actually runs — quality gate → exact dedup → near-dup
  * removal — keeping the minimal doc id of every duplicate cluster as
  * canonical. Each stage is one of the §2 operators; the composition
  * stays fully declarative (Catalyst sees the whole plan).
  */
object Curation {

  /** Returns the surviving (doc_id, text) after:
    *  1. quality filter (composite score ≥ `minQuality`),
    *  2. exact dedup (keep min doc_id per content hash),
    *  3. near-dup removal: MinHash-LSH candidates verified by exact
    *     character-5-gram Jaccard ≥ `minJaccard`; of each verified
    *     pair, the higher id is dropped.
    */
  def curate(
      docs: DataFrame,
      id: Column,
      text: Column,
      minQuality: Double = 0.4,
      minJaccard: Double = 0.8): DataFrame = {
    val base = docs.select(id.as("doc_id"), text.as("text"))

    val quality = TextAnalysis.qualityScore(base, col("doc_id"), col("text"))
      .filter(col("quality") >= minQuality)
      .select(col("doc_id"))
    // persisted: referenced by both the dedup branch and the final
    // anti-join — without it Catalyst re-executes the whole upstream
    // (scan + quality scoring + hashing) once per reference
    val qualified = base.join(quality, Seq("doc_id"), "left_semi").persist()

    val exactKeep = Dedup.exact(qualified, col("doc_id"), col("text"))
      .select(col("keep_id").as("doc_id"))
    val exactDeduped = qualified.join(exactKeep, Seq("doc_id"), "left_semi").persist()

    // Near-dup stage is EXACT-verified: MinHash-LSH proposes cheap
    // candidates, the exact 5-gram set Jaccard decides (tiered, same
    // shape as Dedup.ngramJaccard) — so "near-dup" has a precise,
    // engine-independent definition a brute-force oracle can check.
    val nearDupLosers = Dedup
      .ngramJaccard(exactDeduped, col("doc_id"), col("text"),
        n = 5, minJaccard = minJaccard, candidateMinEst = 0.5)
      .select(col("id_b").as("doc_id"))
      .distinct()
    // Materialize the result so the intermediates can be unpersisted
    // before returning — a long-lived session calling curate()
    // repeatedly must not accumulate cached blocks. The result stays
    // cached (callers drop it with result.unpersist() when done);
    // repeated calls on the SAME input reuse one cache entry — the
    // CacheManager dedupes identical plans, so this does not grow.
    val result = exactDeduped.join(nearDupLosers, Seq("doc_id"), "left_anti").persist()
    result.count()
    qualified.unpersist()
    exactDeduped.unpersist()
    result
  }
}
