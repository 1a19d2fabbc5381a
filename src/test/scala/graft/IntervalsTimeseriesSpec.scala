package graft

import org.apache.spark.sql.functions._
import graft.functions.F
import graft.ops.{Intervals, Stats, Timeseries}

/** Binned interval-overlap join, resample/forward-fill, and the
  * order-independent table checksum.
  */
class IntervalsTimeseriesSpec extends SparkSpec {
  import spark.implicits._

  test("overlapPairs equals the naive theta join, exactly once per pair") {
    // spans chosen to cross bin boundaries both ways (len 1..40 vs
    // binWidth 8) so the max(start)-bin dedup rule is exercised
    val a = (1L to 60L)
      .map(i => (i, i * 7 % 97, i * 7 % 97 + i % 40))
      .toDF("ak", "as_", "ae")
    val b = (1L to 70L)
      .map(i => (i, i * 11 % 101, i * 11 % 101 + i % 13))
      .toDF("bk", "bs", "be")
    val got = Intervals
      .overlapPairs(a, "as_", "ae", b, "bs", "be", binWidth = 8L)
      .select("ak", "bk", "overlap_len")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sorted
    val want = a
      .crossJoin(b)
      .filter(col("as_") <= col("be") && col("bs") <= col("ae"))
      .select(
        col("ak"), col("bk"),
        (least(col("ae"), col("be")) - greatest(col("as_"), col("bs")) + 1)
          .cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sorted
    assert(want.nonEmpty && got.toSeq == want.toSeq) // no dupes, no misses
  }

  test("overlapPairs bin width does not change the result") {
    val a = (1L to 30L).map(i => (i, i * 3 % 50, i * 3 % 50 + i % 20)).toDF("ak", "as_", "ae")
    val b = (1L to 30L).map(i => (i, i * 5 % 53, i * 5 % 53 + i % 7)).toDF("bk", "bs", "be")
    def run(w: Long) = Intervals
      .overlapPairs(a, "as_", "ae", b, "bs", "be", w)
      .select("ak", "bk").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(run(1L) == run(16L) && run(16L) == run(1000L))
  }

  test("resampleFill: dense spine, forward-filled values, staleness") {
    val daily = Seq(
      ("u", 10L, 1.5), ("u", 13L, 2.5), ("u", 14L, 4.0),
      ("v", 5L, 9.0))
      .toDF("k", "day", "x")
    val got = Timeseries
      .resampleFill(daily, "k", "day", "x")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    val want = Seq(
      ("u", 10L, 1.5, 0L), ("u", 11L, 1.5, 1L), ("u", 12L, 1.5, 2L),
      ("u", 13L, 2.5, 0L), ("u", 14L, 4.0, 0L),
      ("v", 5L, 9.0, 0L))
    assert(got.toSeq == want)
  }

  test("checksumRollup is invariant under repartitioning and row order") {
    val d = spark.read.parquet(s"$sf/documents.parquet")
    val h = F.splitmix64(F.fnvText(col("text")).bitwiseXOR(col("doc_id")))
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .collect()
      .map(r => (Option(r.get(0)).map(_.toString).getOrElse("∅"), r.getLong(1), r.getLong(2)))
      .sorted.toSeq
    val base = canon(Stats.checksumRollup(d, col("source"), h))
    val shuffled = canon(Stats.checksumRollup(
      d.repartition(7, col("doc_id")), col("source"), h))
    assert(base == shuffled)
    // grand-total row present: one null-group row covering all rows
    assert(base.count(_._1 == "∅") == 1)
    assert(base.filter(_._1 == "∅").map(_._2).head == d.count())
  }

  test("checksumRollup detects a single-row content change") {
    val d = spark.read.parquet(s"$sf/documents.parquet")
    val tweaked = d.withColumn(
      "text",
      when(col("doc_id") === 7L, concat(col("text"), lit("!"))).otherwise(col("text")))
    val h = F.splitmix64(F.fnvText(col("text")).bitwiseXOR(col("doc_id")))
    def total(df: org.apache.spark.sql.DataFrame) = Stats
      .checksumRollup(df, col("source"), h)
      .filter(col("grp").isNull).select("xor_hash").head().getLong(0)
    assert(total(d) != total(tweaked))
  }

  test("seasonalDecompose: periodic series has zero residual, boundaries shortened") {
    // steps 0..20, 10 events per step plus 7 extra on every dow-0
    // step: the perfectly periodic case — for every FULL window the
    // trend is 11 (each 7-window holds exactly one dow-0), seasonal
    // is +6 at dow 0 and -1 elsewhere, residual exactly 0
    val rows = for {
      s <- 0 to 20
      c = 10 + (if (s % 7 == 0) 7 else 0)
      i <- 1 to c
    } yield ("k", s.toLong, i)
    val df = rows.toDF("k", "s", "i")
    val got = graft.ops.Timeseries.seasonalDecompose(df, col("k"), col("s"))
      .as[(String, Long, Int, Long, Double, Double, Double)]
      .collect().map(r => r._2 -> r).toMap
    assert(got.size == 21)
    (3 to 17).foreach { s =>
      val (_, _, dow, n, trend, seasonal, residual) = got(s.toLong)
      assert(trend == 11.0, s"step $s trend $trend")
      assert(seasonal == (if (dow == 0) 6.0 else -1.0), s"step $s")
      assert(residual == 0.0, s"step $s residual $residual")
      assert(n == (if (dow == 0) 17L else 10L))
    }
    // boundary step 0: window holds steps 0..3 only (cnt 4), trend is
    // the shortened mean (17+10+10+10)/4, seasonal still the fitted
    // dow-0 index, residual the exact fixed-order remainder
    val b = got(0L)
    assert(b._5 == 47.0 / 4.0 && b._6 == 6.0)
    assert(b._7 == 17.0 - 47.0 / 4.0 - 6.0)
  }
}
