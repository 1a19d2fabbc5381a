package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{F, VectorSum}

/** Distributed embedding clustering + semantic deduplication
  * (SemDeDup, Abbas et al. 2023: k-means the embedding space, then
  * search near-duplicates only WITHIN a cluster — the cluster plays
  * the role the LSH bucket plays in `dd_embed_cosine`, but groups by
  * global geometry instead of random hyperplanes).
  *
  * The k-means here is Lloyd's algorithm made fully DETERMINISTIC and
  * engine-independent:
  *  - init: the k corpus vectors with the smallest splitmix64(id) —
  *    a reproducible data sample, no RNG state (same recipe as
  *    [[Ann.ivfTopK]]'s centroids);
  *  - assignment: map-only codegen [[graft.functions.NearestCentroid]]
  *    projection (centroids are driver-embedded literals — the corpus
  *    is never joined or shuffled to learn its cell);
  *  - update: centroid means are computed in FIXED-POINT integer
  *    arithmetic ([[graft.functions.QuantizeVec]] →
  *    [[graft.functions.VectorSumLong]] → floor-div) because float
  *    summation is order-dependent: integer sums are partition-order
  *    invariant, so the result is bit-identical on any cluster AND
  *    recomputable by a SQL oracle. The quantization error (2^-20
  *    per component per round) is far below any clustering-relevant
  *    signal.
  *
  * Scale shape per iteration: one map-only assignment pass + one
  * aggregation whose map-side partial state is k × dim longs —
  * the shuffle carries (cells × partitions) partial-sum rows, never
  * vectors. `iters` full passes total, exactly Lloyd's cost.
  */
object Cluster {

  /** Binary fixed-point scale for centroid arithmetic (2^20). */
  private val Bits = 20
  private val Scale = (1L << Bits).toDouble

  /** `centroids`: (cid, cent_vec array<float>, n); `assigned`:
    * (vec_id, c_vec, cell) — assignment against the FINAL centroids.
    */
  final case class KMeans(centroids: DataFrame, assigned: DataFrame)

  /** `iters` rounds of deterministic Lloyd k-means over `vec`.
    * Cells that lose all members simply drop out of the centroid set
    * (k can shrink); ties in the assignment argmax go to the larger
    * cid, matching `max(struct(cos, cid))` exactly.
    *
    * `trainPermille` < 1000 trains on a deterministic splitmix
    * sample (bucket(vec_id, salt 5) < permille) and assigns the FULL
    * corpus against the learned centroids — the standard 100 TB
    * k-means shape: Lloyd's passes touch the sample only, so
    * training cost is corpus-size-independent at a fixed sample
    * size, while assignment stays one map-only full pass. The
    * sample is a pure function of ids (reproducible, append-stable,
    * oracle-replicable); default 1000 = train on everything.
    */
  def kmeans(df: DataFrame, id: Column, vec: Column, k: Int, iters: Int,
      trainPermille: Int = 1000): KMeans = {
    val c = df.select(id.as("vec_id"), vec.as("c_vec"))
    val train =
      if (trainPermille >= 1000) c
      else c.filter(Sampling.permilleBucket(col("vec_id"), 5L) < trainPermille)
    var cent: DataFrame = train
      .orderBy(F.splitmix64(col("vec_id")), col("vec_id")).limit(k)
      .select(col("vec_id").as("cid"), col("c_vec").as("cent_vec"))
    var it = 0
    while (it < iters) {
      // new centroid = per-dim integer mean: floorDiv(sum(q), n) at
      // scale 2^20, re-expressed in floats (|mean| ≤ 2^20 needs ≤ 21
      // mantissa bits — the float is exact). The floorDiv is spelled
      // (x − posmod(x, n)) div n so Spark and the oracle agree on
      // negative sums regardless of each engine's division rounding.
      cent = Ann.assignCells(train, cent)
        .select(col("cell"), VectorSum.quantizeVec(col("c_vec"), Bits).as("qv"))
        .groupBy(col("cell"))
        .agg(VectorSum.vecSumLong(col("qv")).as("s"), count(lit(1)).as("n"))
        .select(
          col("cell").as("cid"),
          expr(s"transform(s, x -> CAST(CAST(((x - ((x % n + n) % n)) div n) AS DOUBLE) / ${Scale}D AS FLOAT))")
            .as("cent_vec"),
          col("n"))
      it += 1
    }
    KMeans(cent, Ann.assignCells(c, cent))
  }

  /** Per-cell membership stats joined with the final centroid's first
    * component — a compact, hash-checkable view of the whole
    * clustering (counts prove the assignment; c0 proves the integer
    * centroid update).
    */
  def cellStats(km: KMeans): DataFrame = {
    val sizes = km.assigned.groupBy(col("cell")).agg(count(lit(1)).as("n_members"))
    val c0 = km.centroids.select(
      col("cid").as("cell"),
      element_at(col("cent_vec"), 1).cast("double").as("c0"))
    sizes.join(broadcast(c0), Seq("cell"))
      .select(col("cell"), col("n_members"), col("c0"))
  }

  /** SemDeDup: near-duplicate pairs (exact double cosine ≥ `minCos`)
    * searched only within k-means cells. Each vector lives in exactly
    * one cell, so no cross-bucket pair dedup pass is needed (unlike
    * the SRP-bucket variant). `maxCell` guards degenerate clusterings
    * the way `maxBucket` guards LSH skew — at scale, k must grow with
    * the corpus (SemDeDup uses ~√n cells) so cells stay bounded.
    *
    * Identical VECTORS collapse to their min-id representative after
    * assignment (the [[Dedup.contentClasses]] idiom, r10; k-means
    * itself stays on the FULL corpus — duplicate mass legitimately
    * weights the centroid means). Assignment is a pure function of
    * the vector, so a class shares one cell; `maxCell` counts
    * DISTINCT vectors, cross-vector pairs come from capped cells, and
    * vector-equal pairs are emitted unconditionally with their
    * self-cosine computed by the same double formula the kernel uses.
    * Pre-r10, a ×100-replicated corpus blew every cell cap and
    * returned exact-EMPTY.
    */
  def semanticNearDupPairs(
      df: DataFrame, id: Column, vec: Column,
      minCos: Double = 0.98, k: Int = 8, iters: Int = 2,
      maxCell: Int = 4096, trainPermille: Int = 1000): DataFrame = {
    val width = df.sparkSession.sessionState.conf.numShufflePartitions
    val km = kmeans(df, id, vec, k, iters, trainPermille)
    // the contentClasses hash-collapse inline — collapse FIRST, then
    // assign cells to class REPS only: assignment is a pure function
    // of the vector, so every member shares its rep's cell by
    // construction, the driver-embedded centroid expression appears
    // in exactly ONE plan subtree, and assignment cost is paid per
    // DISTINCT vector instead of per raw row. Membership is DUP-ONLY,
    // via the 8-byte hash join against the n ≥ 2 class slice (see
    // Dedup.contentClasses for the shape rationale — empty and
    // broadcast on a duplication-free corpus). k-means TRAINING stays
    // on the full corpus: duplicate mass legitimately weights the
    // centroid means.
    // r18: the shared collapse with its checkpoint hook replaces the
    // inline copy — the class frame is consumed by FOUR subtrees below
    // (repPairs, selfPairs, and both membership legs), so without the
    // checkpoint the vector collapse re-aggregated wherever column
    // pruning defeated AQE exchange reuse.
    val cc = Dedup.contentClasses(df, id, vec, checkpoint = true)
    val classes = Ann.assignCells(
        cc.classes.select(col("rep"), col("n"), col("_t").as("c_vec")),
        km.centroids)
      .select(col("rep"), col("n"), col("c_vec").as("_t"), col("cell"))
    val dupMembers = cc.dupMembers
    val repPairs = classes
      .select(col("cell"), col("rep").as("vec_id"), col("_t").as("v"))
      .groupBy(col("cell"))
      .agg(collect_list(struct(col("vec_id"), col("v"))).as("items"))
      .filter(size(col("items")).between(2, maxCell))
      .select(col("cell"), explode(F.cosineBucketPairs(col("items"), minCos)).as("p"))
      .select(col("cell"), col("p.id_a"), col("p.id_b"), col("p.cos"))
    // bespoke expansion (Dedup.expandClassPairs doesn't carry `cell`)
    // but the same r11 unified shape: classes with n ≥ 2 contribute a
    // SELF rep-pair (r, r, self-cos) — computed once per class, same
    // double formula as the kernel — and two LEFT membership joins
    // against the dup-only frame (misses coalesce to the rep id)
    // expand cross and within-class pairs together, exactly once per
    // member pair (`_ma < _mb` guards the self pairs; see
    // Dedup.expandClassPairs). Pinned width on the fan-out join — the
    // §5 byte-coalescing lesson.
    val selfPairs = classes.filter(col("n") >= 2)
      .select(col("cell"), col("rep").as("id_a"), col("rep").as("id_b"),
        F.cosineSim(col("_t"), col("_t")).as("cos"))
      .filter(col("cos") >= minCos)
    val ma = dupMembers.select(col("rep").as("id_a"), col("doc_id").as("_ma"))
    val mb = dupMembers.select(col("rep").as("id_b"), col("doc_id").as("_mb"))
    repPairs.unionByName(selfPairs)
      .repartition(width, col("id_a"))
      .join(ma, Seq("id_a"), "left")
      .join(mb, Seq("id_b"), "left")
      .select(col("cell"), col("id_a"), col("id_b"), col("cos"),
        coalesce(col("_ma"), col("id_a")).as("_ma"),
        coalesce(col("_mb"), col("id_b")).as("_mb"))
      .filter(col("id_a") =!= col("id_b") || col("_ma") < col("_mb"))
      .select(col("cell"),
        least(col("_ma"), col("_mb")).as("id_a"),
        greatest(col("_ma"), col("_mb")).as("id_b"),
        col("cos"))
  }
}
