package graft.llm

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.F

/** Deterministic dataset sampling / splitting / mixing for
  * training-data pipelines.
  *
  * Everything here is a pure function of the row's id through
  * SplitMix64 — no RNG state, no `rand()`. That is the property a
  * 100 TB pipeline actually needs: the sample is reproducible across
  * retries, executors, and engine versions; adding data never
  * reshuffles previous decisions; and any row's fate can be audited
  * offline. All ops are map-only (no shuffle): they compose with
  * scans at full parallelism and survive any scale-up untouched.
  *
  * The per-mille bucket is `(splitmix64(id + salt) >>> 1) % 1000` —
  * logical shift keeps the value nonnegative so signed `%` equals
  * unsigned, and the identical arithmetic is replicable in any
  * engine with 64-bit integers (the DuckDB oracle recomputes it in
  * HUGEINT). Distinct `salt`s decorrelate decisions that compose in
  * one pipeline (sample → split → mix).
  */
object Sampling {

  /** Pseudo-random per-mille bucket of an id column: uniform in
    * [0, 1000) and a deterministic function of (id, salt).
    */
  def permilleBucket(id: Column, salt: Long): Column =
    shiftrightunsigned(F.splitmix64(id + lit(salt)), 1) % 1000

  /** Deterministic Bernoulli sample: keep ~`permille`/1000 of rows. */
  def bernoulli(df: DataFrame, id: Column, permille: Int, salt: Long = 0L): DataFrame =
    df.filter(permilleBucket(id, salt) < permille)

  /** Stratified sample with per-stratum keep rates (per-mille).
    * Strata absent from `rates` keep `defaultPermille`. One map-side
    * filter — the rate table is compiled into the predicate, so the
    * scan's pushdown and partitioning are untouched.
    */
  def stratified(
      df: DataFrame,
      id: Column,
      stratum: Column,
      rates: Map[String, Int],
      defaultPermille: Int = 0,
      salt: Long = 0L): DataFrame = {
    val rate = rates.toSeq.sortBy(_._1).foldLeft(lit(defaultPermille)) {
      case (acc, (k, v)) => when(stratum === lit(k), lit(v)).otherwise(acc)
    }
    df.filter(permilleBucket(id, salt) < rate)
  }

  /** Deterministic train/val/test assignment by id hash: adds a
    * `split` column. Percentages are integer percents; rows land in
    * train when bucket < pctTrain, val when < pctTrain+pctVal, else
    * test. Stable under appends and engine changes.
    */
  def assignSplits(
      df: DataFrame,
      id: Column,
      pctTrain: Int = 80,
      pctVal: Int = 10,
      salt: Long = 42L): DataFrame = {
    val b = shiftrightunsigned(F.splitmix64(id + lit(salt)), 1) % 100
    df.withColumn(
      "split",
      when(b < pctTrain, lit("train"))
        .when(b < pctTrain + pctVal, lit("val"))
        .otherwise(lit("test")))
  }

  /** LEAKAGE-SAFE train/val/test assignment: the split decision keys
    * on the document's NEAR-DUP COMPONENT ([[Dedup.nearDupComponents]]
    * — exact-duplicate classes unioned with LSH-verified near-dup
    * clusters, transitively closed), not its id. Id-keyed splitting
    * puts ~20% of every duplicate pair's copies in eval — on a real
    * web corpus that is memorized-train-data sitting in the test
    * set; component-keyed splitting makes straddling IMPOSSIBLE by
    * construction, the property a contamination audit
    * (`ds_leakage_audit`) can only detect after the fact.
    *
    * Documents in no duplicate relation (the vast majority) have
    * comp == doc_id, so their assignment is IDENTICAL to
    * [[assignSplits]] with the same salt — adopting the safe variant
    * reshuffles only the duplicated slice of an existing split.
    *
    * Scale shape: the component frame is duplicate-mass-sized (empty
    * on a clean corpus → AQE broadcasts the left join and the whole
    * op is the near-dup pass + a map); the bucket decision is the
    * same pure splitmix function, map-only. Output: (doc_id, comp,
    * split).
    */
  def assignSplitsByComponent(
      df: DataFrame,
      id: Column,
      text: Column,
      pctTrain: Int = 80,
      pctVal: Int = 10,
      salt: Long = 42L): DataFrame = {
    val comp = Dedup.nearDupComponents(df, id, text)
    val b = shiftrightunsigned(F.splitmix64(col("comp") + lit(salt)), 1) % 100
    df.select(id.as("doc_id"))
      .join(comp, Seq("doc_id"), "left")
      .withColumn("comp", coalesce(col("comp"), col("doc_id")))
      .withColumn(
        "split",
        when(b < pctTrain, lit("train"))
          .when(b < pctTrain + pctVal, lit("val"))
          .otherwise(lit("test")))
  }

  /** Weighted source mixing (epoch composition): each row gets
    * `floor(w) + Bernoulli(frac(w))` copies where `w` is its
    * source's weight — the standard way to up-/down-sample corpora
    * into a training mix while keeping every decision a pure
    * function of the row id. Weights are taken to per-mille
    * precision. Adds `n_copies`; `explodeCopies` materializes the
    * repetition (`copy_idx` distinguishes repeats downstream).
    */
  def mixWeighted(
      df: DataFrame,
      id: Column,
      source: Column,
      weights: Map[String, Double],
      salt: Long = 7L): DataFrame = {
    val wPm = weights.toSeq.sortBy(_._1).foldLeft(lit(0)) {
      case (acc, (k, v)) =>
        when(source === lit(k), lit(math.round(v * 1000).toInt)).otherwise(acc)
    }
    val whole = (wPm / 1000).cast("int")
    val extra = when(permilleBucket(id, salt) < wPm % 1000, 1).otherwise(0)
    df.withColumn("n_copies", (whole + extra).cast("int"))
  }

  /** Temperature-rebalanced source sampling (the τ=1/2 "temperature"
    * downsampling used to flatten a skewed source mix): each row of
    * source s survives with probability p_s = min(1, k / √n_s), so a
    * source's expected contribution is min(n_s, k·√n_s) — huge
    * sources are downsampled toward the τ=0.5 power of their size,
    * tiny sources pass through whole.
    *
    * Deterministic AND engine-exact: the per-row uniform is the
    * 53-bit splitmix64 fraction (exact in a double), and p_s uses
    * only count→double (exact below 2^53), IEEE sqrt (correctly
    * rounded, bit-identical everywhere) and one division — so the
    * oracle reproduces every decision bit-for-bit.
    *
    * Scale shape: one map-combined count aggregation over the corpus
    * (a few-row result), broadcast back, then a map-only filter —
    * the data never shuffles.
    */
  def temperatureSample(
      df: DataFrame, id: Column, source: Column,
      k: Double, salt: Long = 19L): DataFrame = {
    val counts = df.groupBy(source.as("_src")).agg(count(lit(1)).as("_n"))
    val u = shiftrightunsigned(F.splitmix64(id + lit(salt)), 11)
      .cast("double") * lit(1.1102230246251565e-16) // 2^-53
    val p = least(lit(1.0), lit(k) / sqrt(col("_n").cast("double")))
    df.join(broadcast(counts), source === col("_src"))
      .filter(u < p)
      .drop("_src", "_n")
  }

  /** Weighted interleave ORDER (the epoch scheduling companion to
    * [[mixWeighted]]'s copy counts): sorting by the emitted `ikey`
    * yields a global training order in which EVERY prefix contains
    * sources in proportion to their weights — rows with hash h sort
    * at h/w, so a prefix cut at threshold τ holds each source's rows
    * with h < τ·w, a fraction ∝ w.
    *
    * ikey = (splitmix64(id+salt) >>> 11) div w_permille — pure
    * integer math on the 53-bit hash, map-only (no per-source rank
    * window, which would funnel each source through one partition at
    * scale). Compose with [[shuffleOrder]]'s range-partition sort to
    * materialize the order.
    */
  def interleaveKey(
      df: DataFrame, id: Column, source: Column,
      weightsPermille: Map[String, Int], salt: Long = 23L): DataFrame = {
    require(weightsPermille.values.forall(_ > 0), "weights must be positive")
    val wPm = weightsPermille.toSeq.sortBy(_._1).foldLeft(lit(1)) {
      case (acc, (k, v)) => when(source === lit(k), lit(v)).otherwise(acc)
    }
    df.withColumn("_u", shiftrightunsigned(F.splitmix64(id + lit(salt)), 11))
      .withColumn("_w", wPm.cast("long"))
      .withColumn("ikey", expr("_u div _w"))
      .drop("_u", "_w")
  }

  /** Explode `n_copies` into one row per copy with a 0-based
    * `copy_idx`; rows with zero copies disappear. Map-only.
    */
  def explodeCopies(df: DataFrame): DataFrame =
    // sequence(a, b) with a > b yields a DESCENDING array, so guard
    // n_copies = 0 explicitly rather than relying on an empty sequence
    df.filter(col("n_copies") > 0)
      .withColumn("copy_idx", explode(sequence(lit(0), col("n_copies") - 1)))

  /** Deterministic global shuffle: a total training order given by
    * sorting on splitmix64(id+salt).
    *
    * Scale shape: RANGE partition on the hash + per-partition sort +
    * `zipWithIndex` (which turns per-partition counts into global
    * offsets with one extra count job) — every partition stays
    * parallel. A global `row_number()` window would funnel ALL rows
    * through ONE partition, which is exactly the plan that dies at
    * 100 TB. Positions are dense 1..n in (hash, id) order and
    * reproducible from the ids alone.
    */
  def shuffleOrder(df: DataFrame, id: Column, salt: Long = 13L): DataFrame = {
    val s = df.sparkSession
    val sorted = df
      .withColumn("__h", F.splitmix64(id + lit(salt)))
      .withColumn("__id", id.cast("long"))
      .repartitionByRange(col("__h"), col("__id"))
      .sortWithinPartitions(col("__h"), col("__id"))
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+
        org.apache.spark.sql.types.StructField(
          "shuffle_pos", org.apache.spark.sql.types.LongType, nullable = false))
    val rows = sorted.rdd.zipWithIndex().map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    s.createDataFrame(rows, schema).drop("__h", "__id")
  }

  /** Exactly-k-per-stratum deterministic sample: the k rows with the
    * smallest id hash in each stratum (a fixed QUOTA — unlike
    * rate-based sampling, membership must re-rank under appends).
    *
    * Scale shape: a map-side bounded selection first — each input
    * partition keeps only its local k smallest hashes per stratum
    * (state: strata × k longs) — so the shuffle carries at most
    * partitions × strata × k candidate rows instead of the full
    * table; the exact window rank then runs on that sliver. A plain
    * per-stratum window would sort entire strata (one 10 TB stratum
    * = one sorting partition).
    *
    * The final semi join back to the full rows broadcasts `keep`
    * (exactly strata × k ids) only while that stays under
    * `maxBroadcastRows`; past the bound — many strata × large k can
    * exceed executor broadcast limits — it falls back to a shuffle
    * semi join. The bound is checked against a caller-supplied
    * `strataCount` (free, fully lazy) when given; otherwise the keep
    * sliver itself is cached and counted — NOT a distinct-count over
    * the full stratum column — so the corpus is scanned once here
    * (the same map-side selection the join needs, now cached and
    * reused by it) and the decision compares actual kept rows. The
    * cached sliver is ≤ strata × k ids and lives until session end.
    */
  def fixedKPerStratum(
      df: DataFrame, id: Column, stratum: Column, k: Int,
      salt: Long = 0L,
      strataCount: Option[Long] = None,
      maxBroadcastRows: Long = 4L * 1000 * 1000): DataFrame = {
    val keep = quotaFrame(df, id, stratum, k, salt).select(col("__id"))
    val keepSide = strataCount match {
      case Some(n) =>
        if (n * k <= maxBroadcastRows) broadcast(keep) else keep
      case None =>
        val cached = keep.persist()
        if (cached.count() <= maxBroadcastRows) broadcast(cached) else cached
    }
    df.join(keepSide, id.cast("long") === keepSide("__id"), "left_semi")
  }

  /** The exact-quota frame behind [[fixedKPerStratum]]: the k rows
    * with the smallest (hash, id) per stratum, as (__st, __id, __h).
    * Map-side bounded selection (strata × k heap entries per task)
    * then ONE window rank over the sliver.
    */
  private def quotaFrame(
      df: DataFrame, id: Column, stratum: Column, k: Int,
      salt: Long): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val keyed = df.select(
      stratum.cast("string").as("__st"),
      id.cast("long").as("__id"),
      F.splitmix64(id + lit(salt)).as("__h"))
    val localTop = keyed.as[(String, Long, Long)].mapPartitions { it =>
      val heaps = scala.collection.mutable.HashMap
        .empty[String, java.util.PriorityQueue[(Long, Long)]]
      // max-heap on (hash, id): evict the largest once size > k
      val cmp = Ordering.Tuple2(Ordering.Long, Ordering.Long).reverse
      it.foreach { case (st, i, h) =>
        val q = heaps.getOrElseUpdate(st,
          new java.util.PriorityQueue[(Long, Long)](k + 1, cmp))
        q.add((h, i))
        if (q.size > k) q.poll()
      }
      heaps.iterator.flatMap { case (st, q) =>
        q.iterator().asScala.map { case (h, i) => (st, i, h) }
      }
    }.toDF("__st", "__id", "__h")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__st")).orderBy(col("__h"), col("__id"))
    localTop
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .select(col("__st"), col("__id"), col("__h"))
  }

  /** The MAINTAINED quota state of [[fixedKPerStratum]] (r14):
    * (stratum, id, h), at most k rows per stratum. Persist it and
    * fold append batches in with [[fixedKDelta]] — a fixed quota is
    * the sampling design whose membership must RE-RANK under appends
    * (a new smaller hash evicts a member), so unlike rate-based
    * sampling it genuinely needs maintained state.
    */
  def fixedKState(
      df: DataFrame, id: Column, stratum: Column, k: Int,
      salt: Long = 0L): DataFrame =
    quotaFrame(df, id, stratum, k, salt).select(
      col("__st").as("stratum"), col("__id").as("id"), col("__h").as("h"))

  /** Fold an APPEND batch into the maintained quota state at
    * delta cost (r14): top-k selection is foldable —
    * topk(A ∪ B) = topk(topk(A) ∪ topk(B)) per stratum — so only the
    * delta-touched strata re-rank: the delta reduces to its own quota
    * sliver (map-side bounded), untouched strata pass through a
    * broadcast ANTI join with NO shuffle, and the touched slice
    * (broadcast SEMI ∪ delta sliver) re-ranks — a window over
    * ≤ 2k rows per touched stratum. Ids must be unique across
    * base ∪ all deltas (the sampler's key contract); deletions are
    * out of scope (an evicted row is forgotten — quota membership
    * under deletes needs the runner-up history this state drops).
    * Returns the updated state; spec pins equality with
    * [[fixedKState]] over the unioned input and the untouched-strata
    * passthrough.
    */
  def fixedKDelta(
      state: DataFrame, delta: DataFrame, id: Column, stratum: Column,
      k: Int, salt: Long = 0L): DataFrame = {
    val want = Seq("stratum", "id", "h")
    require(state.columns.toSeq == want,
      s"fixedKDelta: state must have the fixedKState schema " +
        s"(${want.mkString(",")}), got ${state.columns.mkString(",")}")
    val deltaGuarded = graft.ops.Maintenance.insertOnly(
      delta, "Sampling.fixedKDelta",
      "an evicted row is forgotten, so quota membership under deletes " +
        "needs the runner-up history this state drops — run " +
        "fixedKState over the corrected input")
    // the delta sliver materializes once (≤ touched-strata × k rows,
    // control-plane sized): it feeds BOTH the touched frame and the
    // re-rank union, and lazy it would re-execute the delta scan per
    // consumer (the q_itemsets idiom)
    val dq = quotaFrame(deltaGuarded, id, stratum, k, salt).select(
        col("__st").as("stratum"), col("__id").as("id"), col("__h").as("h"))
      .localCheckpoint()
    val touched = dq.select(col("stratum").as("_t_st")).distinct()
    // NULL-SAFE (r15 review): quotaFrame windows a null stratum as
    // one real stratum, so a null-stratum delta must pull the old
    // null-stratum rows into the re-rank — === would pass them
    // through untouched AND append the fresh sliver (up to 2k rows,
    // evicted members surviving)
    val cond = col("stratum") <=> col("_t_st")
    val untouched = state.join(broadcast(touched), cond, "left_anti")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("stratum")).orderBy(col("h"), col("id"))
    val kept = state.join(broadcast(touched), cond, "left_semi")
      .unionByName(dq)
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .drop("__rk")
    untouched.unionByName(kept)
  }

  /** Curriculum phase assignment: global rank by (score, id) → phase
    * `(rank−1)·phases div n` — the curriculum-learning schedule
    * (easy→hard ordering consumed phase by phase), exact-bucketed
    * like ntile but with an explicit floor-div rule both engines
    * spell identically.
    *
    * Scale shape: the `shuffleOrder` idiom — range-repartition on the
    * sort key + per-partition sort + zipWithIndex — so the global
    * rank NEVER single-partitions (a bare `ntile().over(orderBy)`
    * window would). Costs one extra control-plane count pass for n.
    */
  def curriculumPhases(
      df: DataFrame, id: Column, score: Column, phases: Int = 4): DataFrame = {
    val s = df.sparkSession
    val base = df.select(id.cast("long").as("doc_id"), score.as("score"))
    val n = base.count()
    val sorted = base
      .repartitionByRange(col("score"), col("doc_id"))
      .sortWithinPartitions(col("score"), col("doc_id"))
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+
        org.apache.spark.sql.types.StructField(
          "rank", org.apache.spark.sql.types.LongType, nullable = false))
    val rows = sorted.rdd.zipWithIndex().map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    s.createDataFrame(rows, schema)
      .withColumn("phase", expr(s"((rank - 1) * $phases) div ${n}L"))
  }

  /** Token-budget mixture allocation by integer waterfilling: given a
    * per-source token total and a corpus-wide budget B (`budgetNum/
    * budgetDen` of all tokens), fully fund every source small enough
    * that granting it leaves at least its own size × remaining-source
    * count on the table, and split what is left evenly (floor) among
    * the large sources — the standard "cap the head, keep the tail"
    * mixture rule (each source gets min(nₛ, cap) with one shared cap).
    * The greedy criterion is monotone in source size, so a per-row
    * window test decides funded/capped without iteration.
    *
    * All arithmetic is integer (sums, products, floor-div) — the
    * allocation is bit-exact everywhere; `rate = alloc / n` is the
    * only IEEE op. Floor remainders stay unallocated (≤ #capped
    * sources tokens, documented, deterministic).
    *
    * Scale: one map-combined agg reduces the corpus to a SOURCES-sized
    * frame; the waterfilling windows run on that tiny frame (a global
    * window over k sources, not over data — explicitly fine). Apply
    * the resulting rate with a splitmix threshold filter (the
    * `ds_temperature_sample` idiom) for the data-plane pass.
    */
  def tokenBudgetAllocation(
      df: DataFrame, source: Column, tokens: Column,
      budgetNum: Long = 3, budgetDen: Long = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perSource = df.groupBy(source.as("source"))
      .agg(sum(tokens.cast("long")).as("n_tokens"))
    val ordered = Window.orderBy(col("n_tokens"), col("source"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy()
    val ranked = perSource
      .withColumn("rn", row_number().over(Window.orderBy(col("n_tokens"), col("source"))))
      .withColumn("cum", sum(col("n_tokens")).over(ordered))
      .withColumn("k", count(lit(1)).over(all))
      .withColumn("total", sum(col("n_tokens")).over(all))
      .withColumn("budget", expr(s"(total * $budgetNum) div $budgetDen"))
      // funded ⇔ granting n to this and every remaining (larger)
      // source would not exceed what is left before this row
      .withColumn("funded",
        expr("n_tokens * (k - rn + 1) <= budget - (cum - n_tokens)"))
    val capped = ranked
      .withColumn("cum_funded", sum(when(col("funded"), col("n_tokens"))).over(all))
      .withColumn("n_funded", sum(when(col("funded"), 1L).otherwise(0L)).over(all))
      .withColumn("cap",
        expr("CASE WHEN k > n_funded THEN " +
          "(budget - coalesce(cum_funded, 0L)) div (k - n_funded) END"))
    capped.select(
      col("source"),
      col("n_tokens"),
      when(col("funded"), col("n_tokens")).otherwise(col("cap")).as("alloc"),
      col("funded"),
      (when(col("funded"), col("n_tokens")).otherwise(col("cap")).cast("double")
        / col("n_tokens").cast("double")).as("rate"))
  }

  /** Poisson(1) CDF thresholds for [[poissonBootstrap]]'s inverse-CDF
    * weight lookup: u < cdf(k) ⇒ weight ≤ k. Fixed double literals so
    * the identical comparison runs in every engine; truncated at
    * weight 8 (tail mass ~1.1e-6 — the bias is negligible and, more
    * importantly, identical everywhere).
    */
  private val poissonCdf: Array[Double] = Array(
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238462, 0.9963401531726563, 0.9994058151824183,
    0.999916758850712, 0.9999897508033253)

  /** Poisson bootstrap: per-key uncertainty for a mean without
    * replicating the data (the resampling scheme for massive
    * distributed data — each row's multiplicity in replicate r is
    * drawn Poisson(1) instead of jointly multinomial, so weights are
    * a pure per-row function). Here the draw is DETERMINISTIC:
    * inverse-CDF lookup on the 53-bit splitmix64 uniform of
    * (id·reps + r + salt) — reproducible across retries, engines,
    * and partitionings like every sampler in this module.
    *
    * Scale shape: weight generation is map-only; ONE shuffle (the
    * key aggregation) carries 2·reps map-combined partial sums per
    * key — the corpus is never copied `reps` times. Integer weights ×
    * long values keep every Σ exact; each replicate mean is a single
    * IEEE division of exact-integer operands (bit-identical in any
    * engine while the sums stay under 2^53 — at 100 TB per-key value
    * sums beyond that, quantize `value` coarser or emit the raw
    * (Σwv, Σw) pairs instead of means).
    *
    * Returns per key: n, mean, and [boot_lo, boot_hi] — the min/max
    * of the `reps` replicate means (with reps=16, an ~88% band by
    * the replicate-range rule; raise reps for tighter quantiles).
    *
    * Degenerate replicates: a replicate whose weights all draw 0
    * (probability e^-n per replicate for an n-row key) has no mean —
    * its 0/0 division is NULL and least/greatest skip it, so tiny
    * keys get a band over fewer than `reps` replicates, and a key
    * where EVERY replicate degenerates returns a NULL band. Callers
    * bootstrapping 1-row keys should raise `reps` or test n first;
    * for keys beyond a few dozen rows the effect is unreachable.
    */
  def poissonBootstrap(
      df: DataFrame, id: Column, key: Column, value: Column,
      reps: Int = 16, salt: Long = 0L): DataFrame = {
    require(reps >= 2, "need at least 2 replicates for a band")
    val wCols = (0 until reps).map { r =>
      val u = shiftrightunsigned(
        F.splitmix64(id * lit(reps.toLong) + lit(r.toLong + salt)), 11)
        .cast("double") * lit(1.1102230246251565e-16) // 2^-53
      poissonCdf.zipWithIndex.reverse.foldLeft(lit(poissonCdf.length): Column) {
        case (acc, (c, k)) => when(u < lit(c), lit(k)).otherwise(acc)
      }.cast("long").as(s"_w$r")
    }
    val base = df.select(
      Seq(key.as("_key"), value.cast("long").as("_v")) ++ wCols: _*)
    val aggs =
      Seq(sum(col("_v")).as("_tot")) ++
      (0 until reps).flatMap { r =>
        Seq(
          sum(col(s"_w$r") * col("_v")).as(s"_s$r"),
          sum(col(s"_w$r")).as(s"_c$r"))
      }
    val means = (0 until reps).map { r =>
      col(s"_s$r").cast("double") / col(s"_c$r").cast("double")
    }
    base.groupBy(col("_key"))
      .agg(count(lit(1)).as("n"), aggs: _*)
      .select(
        col("_key").as("key"), col("n"),
        (col("_tot").cast("double") / col("n").cast("double")).as("mean"),
        least(means: _*).as("boot_lo"),
        greatest(means: _*).as("boot_hi"))
  }

  /** Integer-exact largest-remainder (Hamilton) allocation of a
    * global sample `budget` across groups, then a deterministic
    * smallest-hash draw of each group's quota — the budget-allocation
    * step a dataset-mixing pipeline runs before assembling a
    * training mix ("give me exactly N docs, proportional to source
    * sizes, reproducibly").
    *
    * Allocation is EXACT integer arithmetic (no float shares, no
    * rounding drift): group g with n_g of T rows gets
    * floor(budget·n_g / T) seats, and the R = budget − Σ floor
    * leftover seats go to the R largest remainders
    * (budget·n_g mod T, ties by group name ascending) — so the
    * output size is exactly `budget` whenever budget ≤ T, at most
    * one seat from exact proportionality per group (the Hamilton
    * guarantee), and a SQL oracle replays every seat. The per-group
    * draw is the smallest-(splitmix64(id+salt), id) prefix — the
    * [[fixedKPerStratum]] decision rule, so growing a group only
    * ever swaps members in/out deterministically.
    *
    * Scale shape: the count aggregation is map-combined
    * (group-cardinality rows cross the wire); quotas are computed on
    * the DRIVER from the collected per-group counts (control-plane —
    * the BPE/centroid idiom; group counts are bounded by the number
    * of SOURCES, not by rows) and rejoin as a broadcast literal
    * frame; the draw is one grp-keyed window. Output: (doc_id, grp).
    */
  def allocProportional(
      df: DataFrame, id: Column, group: Column, budget: Long,
      salt: Long = 0L): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    val s = df.sparkSession
    import s.implicits._
    val keyed = df.select(
      group.cast("string").as("grp"),
      id.cast("long").as("doc_id"),
      F.splitmix64(id + lit(salt)).as("_h"))
    val counts = keyed.groupBy(col("grp")).agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect()
    // a null group would NPE inside Ordering[String] below (r12
    // advice) — fail with the actual contract violation instead
    require(counts.forall(_._1 != null),
      "allocProportional: group column contains NULLs — filter or " +
        "coalesce them upstream")
    val sorted = counts.sortBy(_._1)
    val total = sorted.map(_._2).sum
    require(budget <= total,
      s"budget $budget exceeds the corpus size $total")
    if (total == 0) return keyed.select(col("doc_id"), col("grp")).limit(0)
    val floors = sorted.map { case (g, n) => (g, budget * n / total) }
    val leftover = budget - floors.map(_._2).sum
    val bonus = sorted
      .map { case (g, n) => (g, budget * n % total) }
      .sortBy { case (g, rem) => (-rem, g) }
      .take(leftover.toInt).map(_._1).toSet
    val quotas = floors.map { case (g, f) =>
      (g, f + (if (bonus(g)) 1L else 0L))
    }
    val quotaDf = broadcast(quotas.toSeq.toDF("grp", "_quota"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp")).orderBy(col("_h"), col("doc_id"))
    keyed.join(quotaDf, "grp")
      .withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= col("_quota"))
      .select(col("doc_id"), col("grp"))
  }

  /** Exact-size k-fold cross-validation assignment: every row gets a
    * fold in [0, k) and, within each stratum, fold sizes differ by at
    * most ONE — the CV contract [[splitAssign]]'s rate-based hash
    * buckets cannot give (binomial fold sizes) — via the
    * deterministic rank rotation fold = (rank − 1) mod k over the
    * (splitmix64(id+salt), id) order, the [[fixedKPerStratum]]
    * decision rule: growing a stratum reshuffles membership
    * deterministically, and two engines replay the identical folds.
    *
    * Scale shape: ONE stratum-keyed window (shuffle + per-stratum
    * sort). The sort is the price of the exact-size contract — a
    * map-only mod-hash assign is [[splitAssign]]; use it when
    * approximate fold sizes are fine. A single 10 TB stratum is one
    * sorting partition here — [[kfoldAssignChunked]] is the
    * bit-equal chunk-parallel form for that shape. Output:
    * (doc_id, stratum, fold).
    */
  def kfoldAssign(
      df: DataFrame, id: Column, stratum: Column, k: Int,
      salt: Long = 0L): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__st")).orderBy(col("__h"), col("__id"))
    df.select(
        stratum.cast("string").as("__st"),
        id.cast("long").as("__id"),
        F.splitmix64(id + lit(salt)).as("__h"))
      .withColumn("fold", ((row_number().over(w) - 1) % k).cast("int"))
      .select(col("__id").as("doc_id"), col("__st").as("stratum"),
        col("fold"))
  }

  /** [[kfoldAssign]] at CHUNK parallelism (r13): the window form
    * sorts each stratum in ONE task, so a single 10 TB stratum is
    * one sorting partition. This form RANGE-partitions on (stratum,
    * hash, id) — a giant stratum spreads over every chunk — and
    * recovers the exact global rank with the two-pass idiom of
    * [[graft.ops.Packing.nextFit]], simpler here because rank state
    * composes by ADDITION: pass 1 counts each chunk-run per stratum
    * (control-plane rows), the driver prefix-sums them in chunk
    * order, pass 2 emits fold = (offset + local position) mod k.
    * Bit-equal to [[kfoldAssign]] (spec-pinned, giant strata and
    * chunk-spanning included); sorts are per-chunk and spill
    * externally. One shuffle write, two passes sharing its map
    * output. `chunks` = 0 uses spark.sql.shuffle.partitions;
    * `materializeInput` as in nextFit (default on — the range
    * exchange's sampling job would re-execute an expensive upstream).
    */
  def kfoldAssignChunked(
      df: DataFrame, id: Column, stratum: Column, k: Int,
      salt: Long = 0L, chunks: Int = 0,
      materializeInput: Boolean = true): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val proj = df.select(
      stratum.cast("string").as("st"),
      F.splitmix64(id + lit(salt)).as("h"),
      id.cast("long").as("id"))
    graft.ops.Chunked.rangedRank(proj, chunks, materializeInput)
      .select(
        col("id").as("doc_id"), col("st").as("stratum"),
        (col("rnk") % k).cast("int").as("fold"))
  }
}
