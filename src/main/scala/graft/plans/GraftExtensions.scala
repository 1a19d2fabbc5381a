package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions._

/** SparkSessionExtensions entry point: registers the graft custom
  * expressions as SQL functions, so `spark.sql("SELECT simhash64(text)
  * …")` works next to the Column API. Enable with:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)          // programmatic, or
  *   .config("spark.sql.extensions", "graft.plans.GraftExtensions")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** Reject wrong arity at analysis time with a proper
    * AnalysisException (standard WRONG_NUM_ARGS error class) instead
    * of a raw NoSuchElementException from args.head at build time.
    */
  private def checkArity(
      name: String, args: Seq[Expression], min: Int, max: Int): Unit =
    if (args.length < min || args.length > max)
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> s"`$name`",
          "expectedNum" -> (if (min == max) s"$min" else s"$min to $max"),
          "actualNum" -> args.length.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"),
        cause = None)

  override def apply(ext: SparkSessionExtensions): Unit = {
    def info(name: String, usage: String) =
      new ExpressionInfo("graft.functions", name, usage)

    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(str) - 64-bit SimHash of whitespace tokens"),
      (args: Seq[Expression]) => { checkArity("simhash64", args, 1, 1); SimHash64(args.head) }))

    ext.injectFunction((
      FunctionIdentifier("rolling_fingerprint"),
      info("rolling_fingerprint", "rolling_fingerprint(str, window) - winnowing min rolling hash"),
      (args: Seq[Expression]) => { checkArity("rolling_fingerprint", args, 1, 2)
        RollingFingerprint(args.head,
          if (args.length > 1) intArg(args(1), "window") else 16) }))

    ext.injectFunction((
      FunctionIdentifier("minhash_sig"),
      info("minhash_sig", "minhash_sig(str, shingle, perms) - MinHash signature array"),
      (args: Seq[Expression]) => { checkArity("minhash_sig", args, 1, 3)
        MinHashSig(args.head,
          if (args.length > 1) intArg(args(1), "shingle") else 5,
          if (args.length > 2) intArg(args(2), "perms") else 64) }))

    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(a, b) - cosine similarity of float arrays"),
      (args: Seq[Expression]) => { checkArity("cosine_sim", args, 2, 2); CosineSim(args.head, args(1)) }))

    ext.injectFunction((
      FunctionIdentifier("srp_bucket"),
      info("srp_bucket", "srp_bucket(vec, planes) - sign-random-projection LSH bucket"),
      (args: Seq[Expression]) => { checkArity("srp_bucket", args, 1, 2)
        SrpBucket(args.head, if (args.length > 1) intArg(args(1), "planes") else 8) }))

    ext.injectFunction((
      FunctionIdentifier("char_ngrams"),
      info("char_ngrams", "char_ngrams(str, n) - distinct character n-grams"),
      (args: Seq[Expression]) => { checkArity("char_ngrams", args, 1, 2)
        CharNgrams(args.head, if (args.length > 1) intArg(args(1), "n") else 3) }))

    ext.injectFunction((
      FunctionIdentifier("word_ngrams"),
      info("word_ngrams", "word_ngrams(str, n) - distinct space-joined word n-grams"),
      (args: Seq[Expression]) => { checkArity("word_ngrams", args, 1, 2)
        WordNgrams(args.head, if (args.length > 1) intArg(args(1), "n") else 3) }))

    ext.injectFunction((
      FunctionIdentifier("kmv_distinct"),
      info("kmv_distinct",
        "kmv_distinct(col, k) - deterministic bottom-k distinct-count estimate (aggregate)"),
      (args: Seq[Expression]) => { checkArity("kmv_distinct", args, 1, 2)
        KMinValues(args.head,
          if (args.length > 1) intArg(args(1), "k") else 64).toAggregateExpression() }))

    ext.injectFunction((
      FunctionIdentifier("kmv_sketch"),
      info("kmv_sketch",
        "kmv_sketch(col, k) - bottom-k hash sketch array for distributed set algebra (aggregate)"),
      (args: Seq[Expression]) => { checkArity("kmv_sketch", args, 1, 2)
        KMinValuesSketch(args.head,
          if (args.length > 1) intArg(args(1), "k") else 64).toAggregateExpression() }))

    ext.injectFunction((
      FunctionIdentifier("quantize_vec"),
      info("quantize_vec",
        "quantize_vec(vec, bits) - fixed-point floor(v*2^bits) per component, array<float> -> array<long>"),
      (args: Seq[Expression]) => { checkArity("quantize_vec", args, 1, 2)
        QuantizeVec(args.head, if (args.length > 1) intArg(args(1), "bits") else 20) }))

    ext.injectFunction((
      FunctionIdentifier("vec_sum_long"),
      info("vec_sum_long",
        "vec_sum_long(vec) - element-wise sum of array<long> columns, order-invariant (aggregate)"),
      (args: Seq[Expression]) => { checkArity("vec_sum_long", args, 1, 1)
        VectorSumLong(args.head).toAggregateExpression() }))

    ext.injectFunction((
      FunctionIdentifier("splitmix64"),
      info("splitmix64",
        "splitmix64(n) - the SplitMix64 mix of a long; the library's deterministic sampling/salting hash"),
      (args: Seq[Expression]) => { checkArity("splitmix64", args, 1, 1)
        Splitmix64(args.head) }))

    ext.injectFunction((
      FunctionIdentifier("word_ngrams_all"),
      info("word_ngrams_all",
        "word_ngrams_all(str, n) - ALL word n-grams in token order (duplicates kept, index = position)"),
      (args: Seq[Expression]) => { checkArity("word_ngrams_all", args, 1, 2)
        WordNgramsAll(args.head, if (args.length > 1) intArg(args(1), "n") else 3) }))

    ext.injectFunction((
      FunctionIdentifier("ngram_jaccard_sim"),
      info("ngram_jaccard_sim",
        "ngram_jaccard_sim(a, b, n) - exact character-n-gram set Jaccard of two strings, one pass"),
      (args: Seq[Expression]) => { checkArity("ngram_jaccard_sim", args, 2, 3)
        NgramJaccardSim(args.head, args(1),
          if (args.length > 2) intArg(args(2), "n") else 3) }))

    ext.injectFunction((
      FunctionIdentifier("first_any"),
      info("first_any",
        "first_any(col) - arbitrary-but-deterministic-per-group first value; object-hash aggregate that avoids first()'s SortAggregate demotion on string/array buffers (aggregate)"),
      (args: Seq[Expression]) => { checkArity("first_any", args, 1, 1)
        graft.functions.FirstAny(args.head).toAggregateExpression() }))

    ext.injectCheckRule(spark => new GlobalWindowCheck(spark))
  }
}

/** Analysis-time guardrail for the single most common silent scale
  * killer: a window function with an EMPTY partition spec moves the
  * ENTIRE dataset to one partition (Spark itself only logs a WARN,
  * which nobody reads on a cluster). With
  * `spark.graft.failGlobalWindow=true` the plan is REJECTED at
  * analysis instead, with a pointer at the offending expression —
  * turn it on for data-plane jobs; leave it off (default) where a
  * global window over an already-aggregated sources/groups-sized
  * frame is a deliberate choice (e.g. the `ds_token_budget`
  * waterfilling windows over one row per source).
  */
class GlobalWindowCheck(spark: org.apache.spark.sql.SparkSession)
    extends (org.apache.spark.sql.catalyst.plans.logical.LogicalPlan => Unit) {
  import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Window => WindowNode}

  override def apply(plan: LogicalPlan): Unit = {
    val strict = spark.conf
      .getOption("spark.graft.failGlobalWindow").exists(_.toBoolean)
    if (strict) plan.foreach {
      case w: WindowNode if w.partitionSpec.isEmpty =>
        throw new org.apache.spark.sql.AnalysisException(
          errorClass = "USER_RAISED_EXCEPTION",
          messageParameters = Map("errorMessage" ->
            ("graft strict mode: window with empty PARTITION BY would " +
              s"single-partition the data: ${w.windowExpressions.mkString(", ")}. " +
              "Partition the window, use the range-repartition + zipWithIndex " +
              "idiom for global ranks, or unset spark.graft.failGlobalWindow.")))
      case _ => ()
    }
  }
}
