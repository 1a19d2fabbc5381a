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

  /** The curated frame plus a `release()` that drops the one cached
    * intermediate (the content-class frame) once the caller has
    * materialized (written/counted) `df` — calling it earlier is safe
    * but forfeits the cache reuse.
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
    val qualified = base.join(quality, Seq("doc_id"), "left_semi")

    // ONE collapse serves both dedup stages (r11, the r10 verdict's
    // item 6): the content classes ARE the exact dedup (keep the min
    // id per distinct text = the class rep) AND the distinct-content
    // level the near-dup tier runs at. Member-level pairs NEVER
    // materialize anywhere in this plan — exact-duplicate mass
    // vanishes at the collapse (map-side partial agg), and near-dup
    // losers are decided and dropped at REP level. Persisted: the
    // class frame feeds both the loser computation and the final
    // anti-join (persist keeps outputPartitioning under AQE — §5).
    val classes = Dedup
      .contentClasses(qualified, col("doc_id"), col("text"))
      .classes.persist()

    // Near-dup stage is EXACT-verified: MinHash-LSH proposes cheap
    // candidates, the exact 5-gram set Jaccard decides (tiered, same
    // shape as Dedup.ngramJaccard) — so "near-dup" has a precise,
    // engine-independent definition a brute-force oracle can check.
    // Of each verified rep pair, the higher id is dropped.
    val nearDupLosers = Dedup
      .ngramJaccardReps(classes,
        n = 5, minJaccard = minJaccard, candidateMinEst = 0.5)
      .select(col("id_b").as("rep"))
      .distinct()
    val result = classes.join(nearDupLosers, Seq("rep"), "left_anti")
      .select(col("rep").as("doc_id"), col("_t").as("text"))
    Curated(result, () => { classes.unpersist(); () })
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
