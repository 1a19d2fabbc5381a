package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset reconciliation: the Spark-native re-expression of pandas
  * `merge(how="outer", indicator=True)` and its `_merge`-based splits,
  * which the reference uses to diff file-vs-API locations, users and
  * districts (reference `weekly alignments GQL API.py:391-425,
  * 805-841`).
  *
  * Scale notes: `mergeIndicator` is a single full-outer join — one
  * shuffle on the join key, streamed, never materialized on the
  * driver (pandas holds both frames in RAM). The indicator is derived
  * from per-side constant marker columns, so it is correct even when
  * join keys are nullable. Anti/semi variants map to Spark's
  * `left_anti`/`left_semi`, which skip materializing the right side's
  * payload entirely.
  */
object Reconcile {

  val IndicatorCol = "merge_status"

  /** Full-outer join `left` with `right` on `cond`, adding a
    * `merge_status` column ∈ {both, left_only, right_only}.
    */
  def mergeIndicator(left: DataFrame, right: DataFrame, cond: Column): DataFrame = {
    val lTag = "_graft_present_l"
    val rTag = "_graft_present_r"
    val l = left.withColumn(lTag, lit(true))
    val r = right.withColumn(rTag, lit(true))
    l.join(r, cond, "full_outer")
      .withColumn(
        IndicatorCol,
        when(col(lTag).isNotNull && col(rTag).isNotNull, "both")
          .when(col(lTag).isNotNull, "left_only")
          .otherwise("right_only"))
      .drop(lTag, rTag)
  }

  /** Dynamic reconcile key (reference 390-415, 481-506): join by the
    * primary condition (file `Unit` = API `remoteId`) normally, but
    * fall back to the secondary condition (normalized location name)
    * exactly when the reference's `(remoteId == "").all()` is true —
    * i.e. EVERY row of the API frame carries the literal empty
    * string. Null (pandas NaN) and whitespace-only remoteIds make the
    * elementwise `== ""` False, so their presence forces the PRIMARY
    * branch, and an empty API frame vacuously falls back — both
    * replicated here. The branch test is one `LIMIT 1` scan over the
    * API frame (control-plane-sized next to the fact data), after
    * which either branch is the one-shuffle [[mergeIndicator]].
    */
  def mergeIndicatorWithFallback(
      left: DataFrame,
      right: DataFrame,
      rightPrimary: Column,
      primaryCond: Column,
      fallbackCond: Column): DataFrame = {
    // usable key ⇔ some row where (remoteId == "") does NOT hold:
    // null or any non-empty string (whitespace included)
    val anyUsableKey = !right
      .filter(rightPrimary.isNull || rightPrimary =!= lit(""))
      .isEmpty
    mergeIndicator(left, right, if (anyUsableKey) primaryCond else fallbackCond)
  }

  /** Rows of `left` with no match in `right` — the reference's
    * `_merge == "left_only"` split (new records not yet in the API).
    */
  def antiJoin(left: DataFrame, right: DataFrame, cond: Column): DataFrame =
    left.join(right, cond, "left_anti")

  /** Rows of `left` with at least one match in `right` — the
    * reference's `_merge == "both"` split, without duplicating on
    * multi-matches.
    */
  def semiJoin(left: DataFrame, right: DataFrame, cond: Column): DataFrame =
    left.join(right, cond, "left_semi")

  /** Count rows per indicator bucket — the reference prints these
    * counts as its reconciliation report.
    */
  def indicatorCounts(left: DataFrame, right: DataFrame, cond: Column): DataFrame =
    mergeIndicator(left, right, cond)
      .groupBy(IndicatorCol)
      .agg(count(lit(1)).as("n"))

  /** Blocked fuzzy join with TWO-ENDED, SIZE-CAPPED blocking:
    * candidate pairs share either the first or the last
    * `blockPrefix` chars of the (pre-normalized) match string; only
    * candidates are scored with Levenshtein and kept at distance ≤
    * `maxDist`. The approximate-match half of the reference's
    * name-fallback reconcile (reference 390-415 joins on normalized
    * names exactly; this tolerates typos/truncations).
    *
    * Why two ends: a single edit cannot touch both the first and the
    * last `blockPrefix` chars of a string longer than 2·blockPrefix,
    * so prefix∪suffix candidate generation is COMPLETE for maxDist=1
    * (each pair is caught by at least one end). Why the cap: blocks
    * whose candidate count exceeds `maxBlockPairs` are skipped
    * outright — a degenerate block (every TPC-H customer name starts
    * "cus…", so a prefix-only scheme silently degrades to an
    * all-pairs product: ~22.5e9 Levenshtein calls at sf1) costs
    * quadratic work while contributing near-zero precision; the
    * other end's block still catches pairs whose entropy lives
    * there. Same bounded-candidate idiom as `dd_minhash_lsh`'s
    * bucket cap and `dd_containment`'s df bound.
    *
    * Shape: duplicate strings collapse first (r8 — blocking, cap and
    * kernel all see DISTINCT strings; id pairs re-expand via two
    * equi-joins after verification), explode to 2 block keys per
    * string, one equi-shuffle per side on the block key at pinned
    * width (AQE must not byte-coalesce a compute-quadratic stage),
    * block sizes pre-counted so oversized blocks never reach the
    * join, `distinct` folds pairs caught by both ends. Levenshtein
    * runs inside whole-stage codegen. Distance semantics are
    * engine-portable (unit-cost edit distance, identical in DuckDB).
    */
  /** @param expandIds true (default): emit every matching (id_a,
    *   id_b) pair — inherently quadratic in duplicate multiplicity
    *   because the OUTPUT is (a c-fold replicated corpus emits c²
    *   rows per matching string pair). false: the representative-
    *   COMPRESSED form (r10) — one row per matching STRING pair as
    *   (id_a, id_b, d, n_a, n_b) with id_a/id_b the min ids carrying
    *   each string and n_a/n_b the carrier counts; linear in distinct
    *   content, and every id-level aggregate is recoverable (counts
    *   via n products, id minima via the canonical ids).
    */
  def fuzzyJoin(
      left: DataFrame, leftId: Column, leftStr: Column,
      right: DataFrame, rightId: Column, rightStr: Column,
      maxDist: Int, blockPrefix: Int = 3,
      maxBlockPairs: Long = 1000000L,
      expandIds: Boolean = true): DataFrame = {
    require(maxDist <= 1,
      s"fuzzyJoin's prefix∪suffix blocking is COMPLETE only for maxDist ≤ 1 " +
        s"(got $maxDist): a 2-edit pair can touch both ends and never share " +
        s"a block, silently losing recall. Use fuzzyJoinSegments for τ ≥ 2.")
    val width = left.sparkSession.sessionState.conf.numShufflePartitions
    // r11 (the Dedup.contentClasses idiom, closing the r10 verdict's
    // "fuzzy twin" note): membership frames carry (id, 8-byte string
    // hash) ONLY — the pre-r11 la/ra were distinct (id, STRING) rows,
    // a full-corpus text Exchange paid once here and once more in the
    // expansion join. Distinct BEFORE the re-expansion joins: a
    // duplicated (id, string) input row must not duplicate
    // (id_a, id_b, d) output rows.
    val keyedL = left.select(leftId.as("id_a"), leftStr.as("_sa"))
      .withColumn("_ha", xxhash64(col("_sa")))
    val keyedR = right.select(rightId.as("id_b"), rightStr.as("_sb"))
      .withColumn("_hb", xxhash64(col("_sb")))
    val ma = keyedL.select(col("id_a"), col("_ha")).distinct()
    val mb = keyedR.select(col("id_b"), col("_hb")).distinct()
    // r8 (same lesson as fuzzyJoinSegments): blocking, the block-size
    // cap and the Levenshtein kernel all operate on DISTINCT strings —
    // a c-fold duplicated corpus no longer pays c² kernel calls, and
    // the cap measures distinct-pair work instead of tripping on
    // duplication (which silently DROPPED recall as corpora grew:
    // duplicate-inflated blocks blew the cap and were skipped).
    // Map-combined hash-agg: duplicate text dedups BEFORE the
    // Exchange, which ships each distinct string once.
    val ld = keyedL.groupBy(col("_ha")).agg(graft.functions.FirstAny.firstAny(col("_sa")).as("_sa"))
      .select(col("_sa"))
    val rd = keyedR.groupBy(col("_hb")).agg(graft.functions.FirstAny.firstAny(col("_sb")).as("_sb"))
      .select(col("_sb"))
    def blocked(df: DataFrame, sName: String) = {
      val s = col(sName)
      val tail = s.substr(
        greatest(length(s) - (blockPrefix - 1), lit(1)), lit(blockPrefix))
      df.select(s,
        explode(array(
          concat(lit("p:"), substring(s, 1, blockPrefix)),
          concat(lit("s:"), tail))).as("_blk"))
    }
    val lb = blocked(ld, "_sa")
    val rb = blocked(rd, "_sb")
    val ok = lb.groupBy(col("_blk")).agg(count(lit(1)).as("_na"))
      .join(rb.groupBy(col("_blk")).agg(count(lit(1)).as("_nb")), "_blk")
      .filter(col("_na") * col("_nb") <= maxBlockPairs)
      .select(col("_blk"))
    // pinned-width kernel join: the per-block cap bounds one block's
    // candidates, not a whole AQE-coalesced task's — byte-based
    // coalescing must not fuse many blocks into one task
    val stringPairs = lb.join(ok, "_blk")
      .repartition(width, col("_blk"))
      .join(rb.repartition(width, col("_blk")), "_blk")
      // |len(a)-len(b)| lower-bounds the edit distance: prune with two
      // precomputed ints before paying the Levenshtein DP.
      // Semantically a no-op (never drops a d ≤ maxDist pair), so the
      // oracle needs no twin of it.
      .filter(abs(length(col("_sa")) - length(col("_sb"))) <= maxDist)
      // bounded DP (r17): the threshold form computes the banded
      // O(len·maxDist) diagonal instead of the full O(len²) table and
      // returns -1 past the bound — exact for every d ≤ maxDist, so
      // the surviving rows and their d are bit-identical to the
      // unbounded call (the oracle keeps its plain levenshtein)
      .withColumn("d", levenshtein(col("_sa"), col("_sb"), maxDist))
      .filter(col("d") >= 0)
      // hash projection BEFORE the fold: the prefix+suffix double-catch
      // distinct and everything downstream shuffle 24-byte rows, never
      // the verified strings (the distinct itself rides the expansion
      // repartition inside expandOrCompress — one Exchange, not two)
      .select(xxhash64(col("_sa")).as("_ha"),
        xxhash64(col("_sb")).as("_hb"), col("d"))
    expandOrCompress(stringPairs, ma, mb, width, expandIds)
  }

  /** The shared output tail of [[fuzzyJoin]]/[[fuzzyJoinSegments]]:
    * either the pinned-width id EXPANSION (the distinct string pairs
    * are few BYTES, so AQE would coalesce their stage to one task —
    * but each pair fans out to (ids per left string)×(ids per right
    * string) id pairs on a replicated corpus, so that one task would
    * run the whole expansion + the downstream partial agg), or the
    * representative-compressed form: canonical (min) ids + carrier
    * counts per side, one row per verified string pair.
    *
    * r11: pairs arrive as (_ha, _hb, d) — 8-byte string hashes — and
    * the membership sides as (id, hash), so neither the expansion nor
    * the compression ever ships text (identical results modulo 2^-64
    * xxhash64 collisions, the contentClasses convention).
    */
  private def expandOrCompress(
      hashPairs: DataFrame, ma: DataFrame, mb: DataFrame,
      width: Int, expandIds: Boolean): DataFrame = {
    // the multi-block-catch fold rides the pinned expansion
    // repartition (r17): hash(_ha) partitioning satisfies the
    // (_ha,_hb,d) dedup clustering, so the dropDuplicates aggregates
    // partition-locally and the _ha-keyed join below reuses the same
    // layout — the pre-r17 shape paid a separate (_ha,_hb,d)-keyed
    // distinct Exchange and then re-exchanged by _ha anyway
    val pairs = hashPairs.repartition(width, col("_ha"))
      .dropDuplicates(Seq("_ha", "_hb", "d"))
    if (expandIds)
      pairs
        .join(ma, "_ha")
        .join(mb, "_hb")
        .select(col("id_a"), col("id_b"), col("d").cast("long").as("d"))
    else {
      val ca = ma.groupBy(col("_ha"))
        .agg(min(col("id_a")).as("id_a"), count(lit(1)).as("n_a"))
      val cb = mb.groupBy(col("_hb"))
        .agg(min(col("id_b")).as("id_b"), count(lit(1)).as("n_b"))
      pairs
        .join(ca, "_ha").join(cb, "_hb")
        .select(col("id_a"), col("id_b"), col("d").cast("long").as("d"),
          col("n_a"), col("n_b"))
    }
  }

  /** Blocked fuzzy join COMPLETE for ANY `maxDist`, via
    * segment-partition blocking (the PassJoin family: Li, Deng, Feng,
    * "PASS-JOIN: a partition-based method for similarity joins",
    * VLDB 2012 — public literature, re-expressed on Spark
    * primitives). Each RIGHT string of length L splits into τ+1
    * contiguous segments; by pigeonhole, any string within edit
    * distance τ contains at least one segment VERBATIM, aligned
    * within ±τ of its source position. So the right side indexes its
    * τ+1 (L, segIdx, segment) keys, and each LEFT string probes, for
    * every candidate right-length L in [len−τ, len+τ], each segment
    * slot's substring at the ≤ 2τ+1 admissible shifts — a bounded
    * (2τ+1)²·(τ+1) key fan-out per probe row, all computed as
    * codegen'd array expressions and exploded. Candidates verify
    * with one Levenshtein call.
    *
    * Because the blocking is COMPLETE (no size cap — unlike
    * [[fuzzyJoin]]'s capped scheme), the result set is EXACTLY
    * `{(a,b) : lev(a,b) ≤ maxDist}`: a cross-engine oracle can
    * verify it with a naive join, no blocking twin needed.
    *
    * Two hard-won scale lessons are baked into the shape (both
    * caught live by the r8 sf1 sweep, where ×10 replication makes
    * every part NAME appear ~10 times):
    *
    *  1. **Duplicate strings collapse before the pair kernel.** Edit
    *     distance depends only on the strings, so the segment join
    *     runs over DISTINCT strings and the verified string pairs
    *     expand back to id pairs with two equi-joins. A corpus where
    *     each string repeats c times would otherwise pay c² copies
    *     of every candidate (155M raw candidates at sf1; ~1/100th
    *     after collapse) — this is the main defense against the
    *     low-entropy-corpus quadratic the scaladoc used to only
    *     warn about.
    *  2. **The kernel's shuffle width is pinned.** Segment keys are
    *     tiny, so AQE sees a few MB of shuffle bytes and coalesced
    *     the whole join into ONE task — while the fan-out inside
    *     was quadratic (a single task burned 30+ CPU-minutes of
    *     Levenshtein at sf1). `repartition(width, _k)` on both
    *     sides (REPARTITION_BY_NUM — exempt from AQE coalescing)
    *     keeps the kernel spread across the configured parallelism;
    *     bytes-based coalescing is the wrong oracle when compute
    *     per byte is unbounded.
    *
    * Residual caveat: many distinct strings sharing one segment
    * still form a hot block — [[fuzzyJoinSegmentStats]] is the
    * histogram that makes that visible.
    */
  // segment geometry for a string of length L (1-based substr), k
  // segments: base = ⌊L/k⌋, rem = L mod k; segments 0..k-rem-1 have
  // length base, the last rem have base+1 —
  // start_i = i·base + max(i-(k-rem), 0) + 1
  private def segStart(L: Column, i: Int, k: Int): Column =
    (L - pmod(L, lit(k))) / k * i +
      greatest(lit(i) - (lit(k) - pmod(L, lit(k))), lit(0)) + 1
  private def segLen(L: Column, i: Int, k: Int): Column =
    (L - pmod(L, lit(k))) / k +
      when(lit(i) >= lit(k) - pmod(L, lit(k)), 1).otherwise(0)

  /** Indexed-side block stream for [[fuzzyJoinSegments]]: each
    * (distinct) right string exploded to its τ+1 (L, segIdx,
    * segment) keys. `strs` must expose the string column `_sb`.
    */
  private def segmentBlocks(strs: DataFrame, k: Int): DataFrame = {
    val s = col("_sb")
    val L = length(s)
    val entries = (0 until k).map { i =>
      struct(L.as("L"), lit(i).as("i"),
        s.substr(segStart(L, i, k).cast("int"), segLen(L, i, k).cast("int")).as("seg"))
    }
    strs.select(s, explode(array(entries: _*)).as("_k"))
  }

  /** @param maxBlockSize 0 disables salting. When > 0, any indexed-
    *   side block with more than `maxBlockSize` distinct strings is
    *   SALTED: its right strings split into ⌈size/maxBlockSize⌉
    *   hash-assigned shards and the block's probes replicate across
    *   them — so one task's candidate fan-out for that block is
    *   |probes|·maxBlockSize instead of |probes|·|block|, while every
    *   (probe, indexed) pair still meets in exactly one shard.
    *   COMPLETENESS IS PRESERVED (unlike [[fuzzyJoin]]'s cap, which
    *   skips): total work is unchanged — it is compute the residual
    *   hot block forces anyway — but it spreads across the cluster
    *   instead of degenerating into one quadratic task.
    *   [[fuzzyJoinSegmentStats]] with the same `maxBlockSize` reports
    *   which blocks salted and how many shards each got.
    */
  /** @param expandIds [[fuzzyJoin]]'s parameter: false returns the
    *   representative-compressed (id_a, id_b, d, n_a, n_b) form —
    *   one row per verified string pair, linear in distinct content.
    */
  def fuzzyJoinSegments(
      left: DataFrame, leftId: Column, leftStr: Column,
      right: DataFrame, rightId: Column, rightStr: Column,
      maxDist: Int, maxBlockSize: Int = 0,
      expandIds: Boolean = true): DataFrame = {
    require(maxDist >= 1, s"maxDist must be ≥ 1, got $maxDist")
    val tau = maxDist
    val k = tau + 1
    val width = left.sparkSession.sessionState.conf.numShufflePartitions

    // r11 hash membership (see fuzzyJoin): distinct (id, 8-byte hash)
    // rows — a duplicated input row must not duplicate output rows
    // after the re-expansion joins below, and no Exchange here or in
    // the expansion carries text
    val keyedL = left.select(leftId.as("id_a"), leftStr.as("_sa"))
      .withColumn("_ha", xxhash64(col("_sa")))
    val keyedR = right.select(rightId.as("id_b"), rightStr.as("_sb"))
      .withColumn("_hb", xxhash64(col("_sb")))
    val ma = keyedL.select(col("id_a"), col("_ha")).distinct()
    val mb = keyedR.select(col("id_b"), col("_hb")).distinct()
    // the pair kernel sees each STRING once, however many ids carry
    // it — map-combined, so duplicate text dedups before the Exchange
    val ld = keyedL.groupBy(col("_ha")).agg(graft.functions.FirstAny.firstAny(col("_sa")).as("_sa"))
      .select(col("_sa"))
    val rd = keyedR.groupBy(col("_hb")).agg(graft.functions.FirstAny.firstAny(col("_sb")).as("_sb"))
      .select(col("_sb"))

    // right (indexed) side: its own τ+1 segments, exact positions
    val rb = segmentBlocks(rd, k)
    // left (probe) side: for each candidate right-length and segment
    // slot, the substring at every admissible shift — out-of-range
    // probes dropped, dedup, explode. ONE codegen kernel call (r17):
    // the previous formulation built the (2τ+1)²·(τ+1) candidates as
    // a 75-`when` (τ=2) column tree whose analysis, optimizer walks,
    // 2.2 MB task binaries and codegen dominated the query's FIXED
    // cost at every SF; the kernel emits the identical (L, i, seg)
    // array (same segment geometry, same insertion-order dedup —
    // spec-pinned against the DSL form on random strings).
    val lb = ld.select(col("_sa"),
      explode(graft.functions.F.segmentProbeKeys(col("_sa"), tau)).as("_k"))
    // optional hot-block salting (see scaladoc): the shard column is
    // a constant 0 when off or for un-hot blocks, so the join key
    // (_k, _sh) degenerates to the unsalted behavior everywhere
    // except inside oversized blocks
    val (lbS, rbS) =
      if (maxBlockSize <= 0)
        (lb.withColumn("_sh", lit(0)), rb.withColumn("_sh", lit(0)))
      else {
        // hot blocks are few by definition (each holds > maxBlockSize
        // of the distinct corpus) — broadcast their shard counts
        val hot = rb.groupBy(col("_k")).agg(count(lit(1)).as("_n"))
          .filter(col("_n") > maxBlockSize)
          .select(col("_k"),
            ceil(col("_n") / maxBlockSize).cast("int").as("_shards"))
        val rbSalt = rb.join(broadcast(hot), Seq("_k"), "left")
          .withColumn("_sh",
            coalesce(pmod(xxhash64(col("_sb")), col("_shards")).cast("int"),
              lit(0)))
          .drop("_shards")
        val lbSalt = lb.join(broadcast(hot), Seq("_k"), "left")
          .withColumn("_sh",
            explode(when(col("_shards").isNull, array(lit(0)))
              .otherwise(sequence(lit(0), col("_shards") - 1))))
          .drop("_shards")
        (lbSalt, rbSalt)
      }
    // pinned-width kernel join (see scaladoc lesson 2), then verify
    val stringPairs = lbS.repartition(width, col("_k"), col("_sh"))
      .join(rbS.repartition(width, col("_k"), col("_sh")), Seq("_k", "_sh"))
      // cheap length prefilter before the Levenshtein DP
      .filter(abs(length(col("_sa")) - length(col("_sb"))) <= tau)
      // bounded DP (r17, see fuzzyJoin): banded O(len·τ) with -1 past
      // the bound — surviving rows and d bit-identical to the
      // unbounded call
      .withColumn("d", levenshtein(col("_sa"), col("_sb"), tau))
      .filter(col("d") >= 0)
      // hash projection BEFORE the fold (see fuzzyJoin): the
      // multi-block-catch distinct shuffles 24-byte rows and rides
      // the expansion repartition (one Exchange, not two)
      .select(xxhash64(col("_sa")).as("_ha"),
        xxhash64(col("_sb")).as("_hb"), col("d"))
    expandOrCompress(stringPairs, ma, mb, width, expandIds)
  }

  /** Block-size histogram for [[fuzzyJoinSegments]]' indexed side —
    * the no-silent-caps report (same idiom as `Dedup.lshBucketStats`):
    * per segment slot, how many (length, slot, segment) blocks exist
    * at each size, over the DISTINCT strings the kernel actually
    * indexes (exact duplicates collapse before the pair kernel, so
    * they never make a block hot). `fuzzyJoinSegments` is
    * complete-by-construction and deliberately uncapped, so many
    * distinct low-entropy strings sharing a segment still go
    * quadratic inside the hottest block; this histogram is the
    * tell — a max bucket_size near the distinct-corpus size means
    * "normalize or salt upstream, or use the capped τ=1 fuzzyJoin".
    * One extra aggregation over the exact block stream the join
    * shuffles; no change to the join itself.
    */
  /** @param maxBlockSize mirror of [[fuzzyJoinSegments]]' parameter:
    *   when > 0, appends `n_shards` — the shard count salting gives a
    *   block of that size (1 = unsalted) — so the histogram reports
    *   exactly which residual hot blocks the salt spreads and how
    *   far. 0 keeps the legacy 3-column schema.
    */
  def fuzzyJoinSegmentStats(
      right: DataFrame, rightId: Column, rightStr: Column,
      maxDist: Int, maxBlockSize: Int = 0): DataFrame = {
    require(maxDist >= 1, s"maxDist must be ≥ 1, got $maxDist")
    // mirror the join exactly: the kernel indexes DISTINCT strings
    val base = segmentBlocks(
        right.select(rightStr.as("_sb")).distinct(), maxDist + 1)
      .groupBy(col("_k"))
      .agg(count(lit(1)).as("bucket_size"))
      .groupBy(col("_k.i").cast("long").as("seg_idx"), col("bucket_size"))
      .agg(count(lit(1)).as("n_blocks"))
    if (maxBlockSize <= 0) base
    else base.withColumn("n_shards",
      when(col("bucket_size") > maxBlockSize,
        ceil(col("bucket_size") / maxBlockSize))
        .otherwise(lit(1L)))
  }

  /** Post-load resync validation (reference 38-42): after the
    * delete + reload cycle the just-loaded group count must equal the
    * count the file asked for. Returns a one-row
    * (loaded_n, expected_n, ok) report — two single-row aggregates,
    * no data movement beyond the counts; with `strict` the mismatch
    * raises, which is the reference's `raise Exception` behavior.
    */
  def loadedCountCheck(
      loaded: DataFrame, expected: DataFrame,
      strict: Boolean = false): DataFrame = {
    val report = loaded.agg(count(lit(1)).as("loaded_n"))
      .crossJoin(expected.agg(count(lit(1)).as("expected_n")))
      .withColumn("ok", col("loaded_n") === col("expected_n"))
    if (strict) {
      val row = report.head()
      if (!row.getAs[Boolean]("ok"))
        throw new IllegalStateException(
          s"loaded-count mismatch: loaded=${row.getAs[Long]("loaded_n")} " +
            s"expected=${row.getAs[Long]("expected_n")}")
    }
    report
  }
}
