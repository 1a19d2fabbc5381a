package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-sequence analytics over an event log: conversion funnels
  * and cohort retention. Both are one-shuffle patterns — everything
  * after the per-user hash partition is windows / partial aggregation
  * over co-located rows, so they hold at 100 TB of events.
  */
object Funnel {

  /** Per-user funnel: the first time each of three ordered steps is
    * completed, where a step only counts if a STRICTLY EARLIER event
    * (in (`ord`, `tie`) order) completed the previous step.
    *
    * Output: one row per user — `t1`/`t2`/`t3` (order value of the
    * first qualifying event per step, null if never reached) and
    * `stage` (0–3, deepest step reached).
    *
    * Shape: one shuffle on `user`, one sort by (`ord`, `tie`); the
    * qualifying test for step k is a running `min` over the preceding
    * frame of step k−1's qualifying order values — three chained
    * window projections sharing the same partitioning and sort (no
    * extra exchange), then a partial-aggregated `groupBy(user)`. No
    * per-user driver state; state per row is O(1).
    */
  def stages(
      events: DataFrame, user: Column, ord: Column, tie: Column,
      step1: Column, step2: Column, step3: Column): DataFrame = {
    val prev = Window
      .partitionBy(user)
      .orderBy(ord, tie)
      .rowsBetween(Window.unboundedPreceding, -1)
    val q1 = events
      .withColumn("_q1", when(step1, ord))
      .withColumn("_q2",
        when(step2 && min(col("_q1")).over(prev).isNotNull, ord))
      .withColumn("_q3",
        when(step3 && min(col("_q2")).over(prev).isNotNull, ord))
    q1.groupBy(user.as("user"))
      .agg(
        min(col("_q1")).as("t1"),
        min(col("_q2")).as("t2"),
        min(col("_q3")).as("t3"))
      .withColumn(
        "stage",
        when(col("t3").isNotNull, 3)
          .when(col("t2").isNotNull, 2)
          .when(col("t1").isNotNull, 1)
          .otherwise(0)
          .cast("int"))
  }

  /** Corpus-wide top-k user-journey trigrams: consecutive
    * (step, next, next²) triples in each user's (`ord`, `tie`)-ordered
    * event stream, counted across all users. The product-analytics
    * "what paths do users actually take" primitive.
    *
    * Shape: `lead` windows on the user key (one shuffle), hash count
    * with map-side partials, and the final top-k is TakeOrdered over
    * k·partitions candidates — never a global sort. Deterministic
    * tiebreak on the path string.
    */
  def pathTrigrams(
      events: DataFrame, user: Column, ord: Column, tie: Column,
      step: Column, k: Int = 20): DataFrame = {
    val w = Window.partitionBy(user).orderBy(ord, tie)
    val top = events
      .select(step.as("_s"),
        lead(step, 1).over(w).as("_s1"),
        lead(step, 2).over(w).as("_s2"))
      .filter(col("_s1").isNotNull && col("_s2").isNotNull)
      .select(concat_ws(">", col("_s"), col("_s1"), col("_s2")).as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(k)
    top.withColumn("rnk",
      row_number().over(Window.orderBy(col("n").desc, col("path"))).cast("long"))
  }

  /** Cohort retention: users bucketed by the week of their first
    * event; activity counted per (cohort week, whole weeks since the
    * user's first event).
    *
    * `day` must be a non-negative integer day index (so truncating and
    * floor division agree — DuckDB's `//` floors, Spark's `div`
    * truncates toward zero).
    *
    * Shape: per-user `min(day)` aggregation (shuffle on user), join
    * back to the event log on the SAME key — the exchange is reused,
    * events are never re-partitioned a second way — then a
    * (cohort, offset) aggregation whose distinct-user count
    * partial-aggregates map-side.
    */
  def retention(events: DataFrame, user: String, day: Column): DataFrame = {
    val firstDay = events
      .groupBy(col(user))
      .agg(min(day).as("_first_day"))
    events
      .select(col(user), day.as("_day"))
      .join(firstDay, user)
      .select(
        expr("_first_day div 7").as("cohort_week"),
        expr("(_day - _first_day) div 7").as("week_offset"),
        col(user))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(
        countDistinct(col(user)).as("n_users"),
        count(lit(1)).as("n_events"))
  }
}
