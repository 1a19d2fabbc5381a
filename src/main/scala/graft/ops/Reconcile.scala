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
    * Shape: explode to 2 block keys per row, one equi-shuffle per
    * side on the block key, block sizes pre-counted so oversized
    * blocks never reach the join, `distinct` folds pairs caught by
    * both ends. Levenshtein runs inside whole-stage codegen.
    * Distance semantics are engine-portable (unit-cost edit
    * distance, identical in DuckDB).
    */
  def fuzzyJoin(
      left: DataFrame, leftId: Column, leftStr: Column,
      right: DataFrame, rightId: Column, rightStr: Column,
      maxDist: Int, blockPrefix: Int = 3,
      maxBlockPairs: Long = 1000000L): DataFrame = {
    require(maxDist <= 1,
      s"fuzzyJoin's prefix∪suffix blocking is COMPLETE only for maxDist ≤ 1 " +
        s"(got $maxDist): a 2-edit pair can touch both ends and never share " +
        s"a block, silently losing recall. Use fuzzyJoinSegments for τ ≥ 2.")
    def blocked(df: DataFrame, id: Column, s: Column, idName: String, sName: String) = {
      val tail = s.substr(
        greatest(length(s) - (blockPrefix - 1), lit(1)), lit(blockPrefix))
      df.select(id.as(idName), s.as(sName),
        explode(array(
          concat(lit("p:"), substring(s, 1, blockPrefix)),
          concat(lit("s:"), tail))).as("_blk"))
    }
    val lb = blocked(left, leftId, leftStr, "id_a", "_sa")
    val rb = blocked(right, rightId, rightStr, "id_b", "_sb")
    val ok = lb.groupBy(col("_blk")).agg(count(lit(1)).as("_na"))
      .join(rb.groupBy(col("_blk")).agg(count(lit(1)).as("_nb")), "_blk")
      .filter(col("_na") * col("_nb") <= maxBlockPairs)
      .select(col("_blk"))
    lb.join(ok, "_blk")
      .join(rb, "_blk")
      // |len(a)-len(b)| lower-bounds the edit distance: prune with two
      // precomputed ints before paying the O(len²) Levenshtein DP.
      // Semantically a no-op (never drops a d ≤ maxDist pair), so the
      // oracle needs no twin of it.
      .filter(abs(length(col("_sa")) - length(col("_sb"))) <= maxDist)
      .withColumn("d", levenshtein(col("_sa"), col("_sb")))
      .filter(col("d") <= maxDist)
      .select(col("id_a"), col("id_b"), col("d").cast("long").as("d"))
      .distinct()
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
    * verify it with a naive join, no blocking twin needed. The cost:
    * a degenerate corpus (many identical segments — low-entropy
    * machine-generated keys) can still produce a hot block; callers
    * with such data should normalize or salt upstream, or use the
    * capped τ=1 [[fuzzyJoin]]. Shape: one shuffle per side on the
    * block key, `distinct` folds multi-block catches.
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

  /** Indexed-side block stream for [[fuzzyJoinSegments]]: each right
    * string exploded to its τ+1 (L, segIdx, segment) keys.
    */
  private def segmentBlocks(
      right: DataFrame, rightId: Column, rightStr: Column, k: Int): DataFrame = {
    val L = length(rightStr)
    val entries = (0 until k).map { i =>
      struct(L.as("L"), lit(i).as("i"),
        rightStr.substr(segStart(L, i, k).cast("int"), segLen(L, i, k).cast("int")).as("seg"))
    }
    right.select(rightId.as("id_b"), rightStr.as("_sb"),
      explode(array(entries: _*)).as("_k"))
  }

  def fuzzyJoinSegments(
      left: DataFrame, leftId: Column, leftStr: Column,
      right: DataFrame, rightId: Column, rightStr: Column,
      maxDist: Int): DataFrame = {
    require(maxDist >= 1, s"maxDist must be ≥ 1, got $maxDist")
    val tau = maxDist
    val k = tau + 1

    // right (indexed) side: its own τ+1 segments, exact positions
    val rb = segmentBlocks(right, rightId, rightStr, k)
    // left (probe) side: for each candidate right-length and segment
    // slot, the substring at every admissible shift — null out
    // out-of-range probes, dedup, explode
    val lb = {
      val M = length(leftStr)
      val cands = for {
        dl <- -tau to tau
        i <- 0 until k
        d <- -tau to tau
      } yield {
        val L = M + dl
        val p = segStart(L, i, k) + d
        val l = segLen(L, i, k)
        when(L >= 0 && p >= 1 && p + l - 1 <= M, // L=0: empty right string still indexable
          struct(L.as("L"), lit(i).as("i"),
            leftStr.substr(p.cast("int"), l.cast("int")).as("seg")))
          .otherwise(lit(null))
      }
      left.select(leftId.as("id_a"), leftStr.as("_sa"),
        explode(array_distinct(filter(array(cands: _*), _.isNotNull))).as("_k"))
    }
    lb.join(rb, "_k")
      // cheap length prefilter before the O(len²) Levenshtein DP
      .filter(abs(length(col("_sa")) - length(col("_sb"))) <= tau)
      .withColumn("d", levenshtein(col("_sa"), col("_sb")))
      .filter(col("d") <= tau)
      .select(col("id_a"), col("id_b"), col("d").cast("long").as("d"))
      .distinct()
  }

  /** Block-size histogram for [[fuzzyJoinSegments]]' indexed side —
    * the no-silent-caps report (same idiom as `Dedup.lshBucketStats`):
    * per segment slot, how many (length, slot, segment) blocks exist
    * at each size. `fuzzyJoinSegments` is complete-by-construction
    * and deliberately uncapped, so a degenerate corpus (low-entropy
    * machine-generated keys sharing segments) silently goes quadratic
    * inside the hottest block; this histogram is the tell — a
    * max bucket_size near the corpus size means "normalize or salt
    * upstream, or use the capped τ=1 fuzzyJoin". One extra
    * aggregation over the exact block stream the join shuffles; no
    * change to the join itself.
    */
  def fuzzyJoinSegmentStats(
      right: DataFrame, rightId: Column, rightStr: Column,
      maxDist: Int): DataFrame = {
    require(maxDist >= 1, s"maxDist must be ≥ 1, got $maxDist")
    segmentBlocks(right, rightId, rightStr, maxDist + 1)
      .groupBy(col("_k"))
      .agg(count(lit(1)).as("bucket_size"))
      .groupBy(col("_k.i").cast("long").as("seg_idx"), col("bucket_size"))
      .agg(count(lit(1)).as("n_blocks"))
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
