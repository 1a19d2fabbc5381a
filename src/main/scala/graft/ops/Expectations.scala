package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectation suite (the "validate counts
  * before load" discipline of the reference — `weekly alignments GQL
  * API.py:224-246` checks loaded == expected — generalized to the
  * rule families a warehouse gate actually runs: completeness, domain,
  * range, uniqueness, referential integrity).
  *
  * Scale contract: ALL row-level rules (not-null / in-range / in-set)
  * and every referential rule fold into ONE pass over the fact table —
  * each FK dimension is broadcast (distinct keys only) onto the scan
  * as a left-outer marker join, and a single global aggregation emits
  * every violation count at once. No fact-side shuffle at any size;
  * the only exchanges are the dimensions' tiny distinct-aggregations
  * and the one-row final agg. Uniqueness is the exception — counting
  * distinct keys inherently shuffles the key column once.
  *
  * Null semantics (documented, DuckDB-consistent): InRange/InSet skip
  * nulls (a null is not a domain violation — NotNull is the rule that
  * catches it); Unique counts only non-null keys; RefIntegrity counts
  * only non-null FKs that miss the dimension.
  */
object Expectations {

  sealed trait Rule { def name: String }

  /** `col IS NULL` is a violation. */
  final case class NotNull(name: String, c: Column) extends Rule

  /** Non-null value outside [lo, hi] is a violation. */
  final case class InRange(name: String, c: Column, lo: Double, hi: Double)
      extends Rule

  /** Non-null value outside the accepted set is a violation. */
  final case class InSet(name: String, c: Column, allowed: Seq[String])
      extends Rule

  /** Violations = non-null rows minus distinct non-null keys (the
    * number of rows that are an extra occurrence of some key).
    */
  final case class Unique(name: String, c: Column) extends Rule

  /** Non-null FK with no match in `dim[pk]` is a violation. `dim` must
    * be dimension-sized (it is distinct-projected and broadcast).
    */
  final case class RefIntegrity(name: String, fk: Column, dim: DataFrame, pk: String)
      extends Rule

  /** Evaluate every rule against `df` in a single fact-table pass.
    * Output: one row per rule — (rule, n_rows, violations, passed).
    */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "at least one expectation required")

    // Attach one broadcast marker column per referential rule. The
    // marker is the (distinct) PK re-exposed under a private name, so
    // a null marker on a non-null FK means "missing in dimension".
    val refs = rules.collect { case r: RefIntegrity => r }
    val withMarkers = refs.zipWithIndex.foldLeft(df) { case (acc, (r, i)) =>
      val marker = s"__ref_$i"
      val dimKeys = r.dim.select(col(r.pk).as(marker)).distinct()
      acc.join(broadcast(dimKeys), r.fk === col(marker), "left_outer")
    }

    def violations(rule: Rule): Column = rule match {
      case NotNull(n, c) =>
        sum(when(c.isNull, 1L).otherwise(0L)).as(n)
      case InRange(n, c, lo, hi) =>
        sum(when(c.isNotNull && !c.between(lo, hi), 1L).otherwise(0L)).as(n)
      case InSet(n, c, allowed) =>
        sum(when(c.isNotNull && !c.isin(allowed: _*), 1L).otherwise(0L)).as(n)
      case Unique(n, c) =>
        (count(c) - countDistinct(c)).as(n)
      case r: RefIntegrity =>
        val i = refs.indexOf(r)
        sum(when(r.fk.isNotNull && col(s"__ref_$i").isNull, 1L).otherwise(0L))
          .as(r.name)
    }

    val aggd = withMarkers.agg(
      count(lit(1)).as("__n"),
      rules.map(violations): _*)

    // One row in, |rules| rows out: explode an array of per-rule
    // structs (driver-size literal list, no extra job).
    val report = aggd.select(
      explode(array(rules.map(r => struct(
        lit(r.name).as("rule"),
        col("__n").as("n_rows"),
        col(r.name).as("violations"))): _*)).as("e"))
    report.select(
      col("e.rule").as("rule"),
      col("e.n_rows").as("n_rows"),
      col("e.violations").as("violations"),
      (col("e.violations") === 0L).as("passed"))
  }
}
