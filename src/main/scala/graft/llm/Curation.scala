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

  /** INCREMENTAL curation (r14): fold an APPEND batch into a curated
    * corpus at delta cost, emitting exactly the NEW survivor rows —
    * the nightly 0.1 % ingest probes the corpus instead of
    * re-curating it. Rests on the APPEND-ONLY ID CONTRACT (checked
    * loudly unless `checkContract = false`): every delta id exceeds
    * every base id — the production reality of monotone ids — which
    * makes the whole pipeline MONOTONE for existing survivors: a new
    * pair's higher id is always the new doc, so base survivors never
    * change and the maintenance is purely additive.
    *
    * Per stage:
    *  1. quality scores the delta only (per-row);
    *  2. exact dedup: delta texts already present among the QUALIFIED
    *     base are duplicates of a smaller id and drop; the membership
    *     test collapses the delta to distinct hashes, broadcast-SEMI
    *     probes the base class frame (one scan — the pre-flight cost
    *     class; production persists the class frame), and the matched
    *     hash sliver (delta-bounded) broadcast-ANTI filters the delta;
    *  3. near-dup: base + fresh-delta rep signatures band as in the
    *     batch path, but only buckets a FRESH rep lands in aggregate
    *     (no recall loss — every pair involving a fresh rep shares
    *     each of its buckets with it), the bucket cap evaluates on the
    *     FULL probed membership exactly like the batch run, candidate
    *     pairs keep only fresh-rep losers-to-be, and the exact 5-gram
    *     Jaccard decides; a fresh rep survives iff no verified pair
    *     names it as the higher id.
    *
    * CAP-CROSSING GUARD (in-band, the no-silent-caps idiom): a delta
    * that pushes a previously-under-cap bucket OVER the cap would
    * RETRACT base-base candidate pairs — base survivors could change,
    * which additive maintenance cannot express. The kernel detects
    * every such bucket (a delta-touched-bucket-sized aggregation) and
    * FAILS LOUDLY naming one, directing the caller to a full
    * [[curate]] run. Spec-pinned: survivors(base) ∪ this == the batch
    * [[curate]] over base ∪ delta.
    */
  def curateDelta(
      baseDocs: DataFrame,
      deltaDocs: DataFrame,
      id: Column,
      text: Column,
      minQuality: Double = 0.4,
      minJaccard: Double = 0.8,
      candidateMinEst: Double = 0.5,
      maxBucket: Int = 64,
      checkContract: Boolean = true,
      baseClasses: Option[DataFrame] = None): DataFrame = {
    import graft.functions.F
    val (bClasses, fresh, buckets) = deltaBucketFrames(
      baseDocs, deltaDocs, id, text, minQuality, checkContract,
      baseClasses)
    val crossing = buckets
      .filter(col("n_base").between(2, maxBucket) &&
        col("n_all") > maxBucket)
      .select(col("band"), col("bucket"), col("n_base"), col("n_all"))
      .limit(1).collect()
    require(crossing.isEmpty, {
      val c = crossing.head
      s"curateDelta: delta pushes bucket (band=${c.get(0)}, " +
        s"bucket=${c.get(1)}) over the LSH cap " +
        s"(${c.get(2)} base -> ${c.get(3)} members > $maxBucket) — " +
        "base candidate pairs would retract; run the full curate"
    })
    val candidates = buckets
      .filter(col("n_all").between(2, maxBucket))
      .select(explode(F.minhashBucketPairs(col("items"),
        candidateMinEst)).as("p"))
      .select(col("p.id_a"), col("p.id_b")).distinct()
      // only pairs whose HIGHER id is a fresh rep can drop one
      .join(broadcast(fresh.select(col("rep").as("id_b"))),
        Seq("id_b"), "left_semi")
    val texts = bClasses.select(col("rep"), col("_t"))
      .unionByName(fresh.select(col("rep"), col("_t")))
    val losers = candidates
      .join(texts.select(col("rep").as("id_a"), col("_t").as("_ta")),
        Seq("id_a"))
      .join(texts.select(col("rep").as("id_b"), col("_t").as("_tb")),
        Seq("id_b"))
      .filter(F.ngramJaccardSim(col("_ta"), col("_tb"), 5) >= minJaccard)
      .select(col("id_b").as("rep")).distinct()
    fresh.join(losers, Seq("rep"), "left_anti")
      .select(col("rep").as("doc_id"), col("_t").as("text"))
  }

  /** Stages 1–3 of [[curateDelta]] up to the touched-bucket frame,
    * shared with [[curateDeltaSaturation]]: (base class frame, fresh
    * delta classes, touched buckets (band, bucket, items, n_base,
    * n_all)). Semantics documented on [[curateDelta]].
    */
  private def deltaBucketFrames(
      baseDocs: DataFrame,
      deltaDocs: DataFrame,
      id: Column,
      text: Column,
      minQuality: Double,
      checkContract: Boolean,
      baseClasses: Option[DataFrame]): (DataFrame, DataFrame, DataFrame) = {
    import graft.functions.F
    val base = baseDocs.select(id.as("doc_id"), text.as("text"))
    val delta = graft.ops.Maintenance.insertOnly(
        deltaDocs, "Curation.curateDelta",
        "removing a document can resurrect the survivors it displaced " +
          "(exact-dup reps and near-dup losers), which additive " +
          "maintenance cannot express — run the full curate")
      .select(id.as("doc_id"), text.as("text"))
    if (checkContract) {
      val bounds = base.agg(max(col("doc_id"))).collect().head
      val dmin = delta.agg(min(col("doc_id"))).collect().head
      if (!bounds.isNullAt(0) && !dmin.isNullAt(0))
        require(bounds.getLong(0) < dmin.getLong(0),
          s"curateDelta: append-only id contract violated — " +
            s"max base id ${bounds.getLong(0)} >= min delta id " +
            s"${dmin.getLong(0)}; run the full curate")
    }
    def qualified(d: DataFrame) = d.join(
      TextAnalysis.qualityScore(d, col("doc_id"), col("text"))
        .filter(col("quality") >= minQuality).select(col("doc_id")),
      Seq("doc_id"), "left_semi")
    // `baseClasses` is the SELF-SUSTAINING path: pass the persisted
    // qualified-base class frame ((rep, n, _t) — the frame [[curate]]
    // already builds) and a maintenance run touches NO base document:
    // every base access below reads this frame. Absent, it recomputes
    // from `baseDocs` — one quality + collapse pass per run, the
    // pre-flight cost class the persisted frame removes.
    val bClasses = baseClasses.getOrElse(Dedup
      .contentClasses(qualified(base), col("doc_id"), col("text"))
      .classes.localCheckpoint())
    val dClasses = Dedup
      .contentClasses(qualified(delta), col("doc_id"), col("text"))
      .classes
    // stage 2: the delta's FRESH-content classes. The hash is a
    // PREFILTER only (r15, r14 advice): the anti-join decides on the
    // TEXT of the delta-bounded matched base sliver, so a 64-bit
    // collision between a fresh delta text and an unrelated base text
    // can no longer drop a survivor — membership stays text-exact,
    // the batch contentClasses contract.
    val dHashes = dClasses.select(xxhash64(col("_t")).as("_dh")).distinct()
    val presentTexts = bClasses
      .join(broadcast(dHashes), xxhash64(col("_t")) === col("_dh"),
        "left_semi")
      .select(col("_t").as("_bt")).distinct()
    val fresh = dClasses
      .join(broadcast(presentTexts), col("_t") === col("_bt"),
        "left_anti")
      .localCheckpoint()
    // stage 3: delta-scoped banding, batch-identical caps
    val bands = 16
    val rows = 64 / bands
    def banded(classes: DataFrame, isNew: Boolean) = classes
      .select(col("rep"), lit(isNew).as("_new"),
        F.minhashSig(col("_t"), 5, 64).as("sig"))
      .select(col("rep"), col("_new"), col("sig"),
        explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .withColumn("bucket", hash(col("band"),
        slice(col("sig"), col("band") * rows + 1, lit(rows))))
    val touched = banded(fresh, isNew = true)
      .select(col("band"), col("bucket")).distinct()
    val probed = banded(bClasses, isNew = false)
      .unionByName(banded(fresh, isNew = true))
      .join(broadcast(touched), Seq("band", "bucket"), "left_semi")
    val buckets = probed.groupBy(col("band"), col("bucket"))
      .agg(
        collect_list(struct(col("rep").as("doc_id"), col("sig")))
          .as("items"),
        sum(when(col("_new"), 0L).otherwise(1L)).as("n_base"),
        count(lit(1)).as("n_all"))
      .localCheckpoint()
    (bClasses, fresh, buckets)
  }

  /** CAP-PROXIMITY report for [[curateDelta]] (r15, r14 verdict item
    * 7 — the `dd_lsh_stats` idiom applied to the maintenance path):
    * the in-band cap-crossing require is the hard stop; a pipeline
    * wants to see saturation COMING, so this report aggregates the
    * delta-touched buckets per band — max members, max base members,
    * `saturation_permille` = max(n_all)·1000 / maxBucket (integer,
    * engine-exact), plus the counts an operator alarms on:
    * `near_cap` (within 25 % of the cap, still under it) and
    * `would_cross` (exactly [[curateDelta]]'s rejection condition —
    * a previously-under-cap bucket the delta pushes over). Unlike
    * [[curateDelta]] it never throws: the report IS the warning
    * surface, runnable before the fold commits. Same delta-scoped
    * cost shape (touched buckets only).
    */
  def curateDeltaSaturation(
      baseDocs: DataFrame,
      deltaDocs: DataFrame,
      id: Column,
      text: Column,
      minQuality: Double = 0.4,
      maxBucket: Int = 64,
      checkContract: Boolean = true,
      baseClasses: Option[DataFrame] = None): DataFrame = {
    require(maxBucket >= 1, s"maxBucket must be >= 1, got $maxBucket")
    val (_, _, buckets) = deltaBucketFrames(
      baseDocs, deltaDocs, id, text, minQuality, checkContract,
      baseClasses)
    buckets
      .groupBy(col("band"))
      .agg(
        count(lit(1)).as("touched_buckets"),
        max(col("n_all")).as("max_members"),
        max(col("n_base")).as("max_base"),
        sum(when(col("n_all") <= maxBucket &&
            col("n_all") * 4L >= maxBucket.toLong * 3L, 1L)
          .otherwise(0L)).as("near_cap"),
        sum(when(col("n_base").between(2, maxBucket) &&
            col("n_all") > maxBucket, 1L)
          .otherwise(0L)).as("would_cross"))
      // integer DIV — no float share anywhere in the report
      .withColumn("saturation_permille",
        expr(s"CAST((max_members * 1000L) DIV ${maxBucket}L AS BIGINT)"))
  }
}
