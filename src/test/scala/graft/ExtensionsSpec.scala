package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {

  test("extensions register SQL functions") {
    // force a NEW session (sharing any existing SparkContext) so
    // withExtensions actually applies — getOrCreate would return the
    // shared test session built without them
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      import spark.implicits._
      Seq((1L, "the quick brown fox")).toDF("id", "txt")
        .createOrReplaceTempView("t")
      val row = spark.sql(
        """SELECT simhash64(txt) AS sh, rolling_fingerprint(txt, 8) AS fp,
          |       size(minhash_sig(txt, 5, 32)) AS mh,
          |       size(char_ngrams(txt, 3)) AS ng
          |FROM t""".stripMargin).head()
      assert(row.getLong(0) == graft.functions.HashOps.simhash64(
        org.apache.spark.unsafe.types.UTF8String.fromString("the quick brown fox")))
      assert(row.getInt(2) == 32)
      assert(row.getInt(3) > 0)
      val cos = spark.sql(
        "SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
          "array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)))").head().getDouble(0)
      assert(math.abs(cos - 1.0) < 1e-12)
      val wng = spark.sql("SELECT word_ngrams(txt, 2) FROM t").head().getSeq[String](0)
      assert(wng == Seq("the quick", "quick brown", "brown fox"))
      val kmv = spark.sql(
        "SELECT kmv_distinct(x, 64) FROM (SELECT explode(sequence(1, 40)) AS x)")
        .head().getDouble(0)
      assert(kmv == 40.0) // below k: exact
      val sk = spark.sql(
        "SELECT kmv_sketch(x, 16) FROM (SELECT explode(sequence(1, 40)) AS x)")
        .head().getSeq[Long](0)
      assert(sk.size == 16 && sk == sk.sorted) // k-truncated, ascending
      val qv = spark.sql(
        "SELECT quantize_vec(array(CAST(0.5 AS FLOAT), CAST(-0.25 AS FLOAT)), 20)")
        .head().getSeq[Long](0)
      assert(qv == Seq(524288L, -262144L)) // floor(v * 2^20), exact
      val vs = spark.sql(
        """SELECT vec_sum_long(v) FROM (
          |  SELECT array(CAST(1 AS BIGINT), CAST(2 AS BIGINT)) AS v
          |  UNION ALL SELECT array(CAST(10 AS BIGINT), CAST(20 AS BIGINT)))""".stripMargin)
        .head().getSeq[Long](0)
      assert(vs == Seq(11L, 22L))

      // r12 registrations: the sampling hash, occurrence-level grams,
      // the one-pass exact Jaccard kernel, and the first_any aggregate
      val sm = spark.sql("SELECT splitmix64(CAST(7 AS BIGINT))").head().getLong(0)
      assert(sm == graft.functions.HashOps.splitmix64(7L))
      val wna = spark.sql("SELECT word_ngrams_all('a b a b', 2)")
        .head().getSeq[String](0)
      assert(wna == Seq("a b", "b a", "a b")) // duplicates kept, in order
      val js = spark.sql("SELECT ngram_jaccard_sim('abcd', 'bcde', 2)")
        .head().getDouble(0)
      assert(js == 2.0 / 4.0) // {ab,bc,cd} vs {bc,cd,de}: 2 shared of 4
      val fa = spark.sql(
        "SELECT first_any(x) FROM (SELECT explode(array('only')) AS x)")
        .head().getString(0)
      assert(fa == "only")

      // --- GlobalWindowCheck guardrail ---
      val globalWin =
        "SELECT row_number() OVER (ORDER BY txt) FROM t"
      val partitionedWin =
        "SELECT row_number() OVER (PARTITION BY id ORDER BY txt) FROM t"
      // default: permitted (Spark's own WARN only)
      assert(spark.sql(globalWin).count() == 1)
      spark.conf.set("spark.graft.failGlobalWindow", "true")
      val err = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql(globalWin).count()
      }
      assert(err.getMessage.contains("single-partition"),
        s"wrong error: ${err.getMessage}")
      // partitioned windows still analyze under strict mode
      assert(spark.sql(partitionedWin).count() == 1)
      spark.conf.set("spark.graft.failGlobalWindow", "false")
    } finally {
      // restore the shared session; don't stop the shared SparkContext
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
