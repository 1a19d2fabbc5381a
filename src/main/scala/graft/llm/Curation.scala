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

  /** The curated frame plus a `release()` that drops the two cached
    * intermediates once the caller has materialized (written/counted)
    * `df` — calling it earlier is safe but forfeits the cache reuse.
    */
  final case class Curated(df: DataFrame, release: () => Unit)

  /** Returns the surviving (doc_id, text) after:
    *  1. quality filter (composite score ≥ `minQuality`),
    *  2. exact dedup (keep min doc_id per content hash),
    *  3. near-dup removal: MinHash-LSH candidates verified by exact
    *     character-5-gram Jaccard ≥ `minJaccard`; of each verified
    *     pair, the higher id is dropped.
    *
    * Fully lazy — building the plan runs ZERO Spark jobs; the single
    * action that consumes the result computes each cached
    * intermediate once (they are referenced twice in the plan, which
    * is why they persist). Call `release()` after that action;
    * [[curate]] is the fire-and-forget variant for sessions that end
    * soon after (the two cached frames then live until session end).
    */
  def curateReleasable(
      docs: DataFrame,
      id: Column,
      text: Column,
      minQuality: Double = 0.4,
      minJaccard: Double = 0.8): Curated = {
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
    val result = exactDeduped.join(nearDupLosers, Seq("doc_id"), "left_anti")
    Curated(result, () => { qualified.unpersist(); exactDeduped.unpersist() })
  }

  /** [[curateReleasable]] without the release handle. */
  def curate(
      docs: DataFrame,
      id: Column,
      text: Column,
      minQuality: Double = 0.4,
      minJaccard: Double = 0.8): DataFrame =
    curateReleasable(docs, id, text, minQuality, minJaccard).df
}
