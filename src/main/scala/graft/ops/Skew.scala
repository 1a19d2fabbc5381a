package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Skew-safe two-phase aggregation: pre-aggregate on (key, salt) so a
  * heavy-hitter key spreads over `salts` reducers before the final
  * per-key merge. Same result as a direct groupBy (count/sum are
  * associative; sums run in exact decimal), different shuffle shape —
  * the 100 TB insurance when a handful of keys dominate (AQE's skew
  * handling covers joins, not aggregations).
  */
object Skew {

  /** Salted equi-join for skewed keys when BOTH sides are too big to
    * broadcast: the probe side gets a deterministic salt from
    * `saltSource`, the build side is replicated `salts`× (explode of
    * a literal range — no extra scan), and the join key becomes
    * (key, salt). A heavy-hitter key's rows now spread over `salts`
    * reducers instead of one. Results identical to a plain join.
    */
  def saltedJoin(
      probe: DataFrame,
      build: DataFrame,
      probeKey: Column,
      buildKey: Column,
      saltSource: Column,
      salts: Int = 8): DataFrame = {
    val salted = probe.withColumn("_salt", pmod(hash(saltSource), lit(salts)))
    val replicated = build
      .withColumn("_salt", explode(sequence(lit(0), lit(salts - 1))))
    salted
      .join(replicated, probeKey === buildKey && salted("_salt") === replicated("_salt"))
      .drop("_salt")
  }

  /** count(*) and decimal-exact sum per key, two-phase via salt. */
  def saltedCountSum(
      df: DataFrame,
      key: Column,
      value: Column,
      saltSource: Column,
      salts: Int = 8): DataFrame =
    df.groupBy(key.as("key"), pmod(hash(saltSource), lit(salts)).as("_salt"))
      .agg(
        count(lit(1)).as("_n"),
        sum(value.cast(DecimalType(18, 2))).as("_v"))
      .groupBy(col("key"))
      .agg(
        sum(col("_n")).as("n"),
        sum(col("_v")).cast("double").as("v"))
}
