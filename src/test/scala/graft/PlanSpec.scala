package graft

/** Locks in the SURVEY.md §5 plan properties: pushdown reaches the
  * parquet scan, dimension joins broadcast, aggregations keep their
  * map-side partial phase. A regression here is a scale regression
  * even if results stay correct.
  */
class PlanSpec extends SparkSpec {

  private def physicalPlan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q_agg_pricing pushes the shipdate filter and prunes columns") {
    val plan = physicalPlan("q_agg_pricing")
    assert(plan.contains("PushedFilters"), "no pushdown section in scan")
    assert(plan.contains("GreaterThanOrEqual(l_shipdate"), s"shipdate filter not pushed")
    assert(!plan.contains("l_orderkey"), "reads columns the query never uses")
  }

  test("q_hierarchy_rollup broadcasts every dimension join") {
    val plan = physicalPlan("q_hierarchy_rollup")
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"),
      "fact-side shuffle join appeared — dimension broadcast lost")
  }

  test("dd_exact_hash aggregates with a map-side partial phase") {
    val plan = physicalPlan("dd_exact_hash")
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      "expected partial+final HashAggregate pair")
  }

  test("dd_minhash_lsh: hash-keyed collapse, no sort demotion, sig per distinct (r11)") {
    // the r10 collapse was Window.partitionBy(text): a full-corpus
    // Exchange KEYED BY the raw text plus a per-partition text sort.
    // The r11 shape: collapse groups by xxhash64(text) with FirstAny
    // (object hash agg — the built-in first()'s variable-length
    // buffer demotes the whole aggregation to SortAggregate), the
    // signature is computed AFTER the collapse once per DISTINCT
    // content (sig-at-the-scan was measured 2x slower on the 10x-
    // replicated sf1 corpus — c-fold sig CPU), and no SortAggregate
    // node appears anywhere in the operator.
    val plan = physicalPlan("dd_minhash_lsh")
    assert(!"""hashpartitioning\(_t#""".r.findFirstIn(plan).isDefined,
      "raw text is an Exchange key again")
    assert(!plan.contains("SortAggregate"),
      "collapse demoted to SortAggregate again (built-in first()?)")
    // r18: the collapse materializes once at construction
    // (localCheckpoint), so the query-level plan shows its RESULT as
    // an ExistingRDD scan — the collapse's own plan shape is asserted
    // on the un-checkpointed subtree (identical code path).
    assert(plan.contains("ExistingRDD"),
      "collapse is no longer materialized once (checkpoint hook lost)")
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val collapse = graft.llm.Dedup.contentClasses(
        docs, org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
      .classes.queryExecution.executedPlan.toString
    assert("""partial_first_any\(_t#""".r.findFirstIn(collapse).isDefined,
      "collapse lost its map-side FirstAny partial aggregation")
    assert(!collapse.contains("SortAggregate"),
      "collapse demoted to SortAggregate again (built-in first()?)")
    assert("""hashpartitioning\(_h#""".r.findFirstIn(collapse).isDefined,
      "collapse is no longer keyed by the 8-byte content hash")
  }

  test("q_merge_indicator uses a single full-outer join") {
    val plan = physicalPlan("q_merge_indicator")
    assert("FullOuter".r.findAllIn(plan).size == 1)
  }

  test("custom expressions appear inside WholeStageCodegen spans") {
    val df = SparkEntry.queries("txt_fingerprint")(spark, sf)
    val qe = df.queryExecution
    assert(qe.executedPlan.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec]),
      "no codegen span at all")
    val hasCustom = qe.optimizedPlan.expressions.exists(_.exists {
      case _: graft.functions.RollingFingerprint => true
      case _: graft.functions.SimHash64 => true
      case _ => false
    })
    assert(hasCustom, "fingerprint expressions missing from optimized plan")
  }

  test("q_range_join broadcasts the range table (BNLJ, no cartesian)") {
    val plan = physicalPlan("q_range_join")
    assert(plan.contains("BroadcastNestedLoopJoin"),
      "non-equi range join should be a broadcast nested loop")
    assert(!plan.contains("CartesianProduct"),
      "unbroadcast cartesian product appeared")
  }

  test("q_exact_stats is one shuffle with map-side partials") {
    val plan = physicalPlan("q_exact_stats")
    assert("partial_sum".r.findAllIn(plan).size >= 1, "no partial aggregation")
    assert("Exchange".r.findAllIn(plan).size == 1,
      "exact moments should need exactly one shuffle")
  }

  test("txt_ngram_stats uses distributed TakeOrdered, not a global sort") {
    val plan = physicalPlan("txt_ngram_stats")
    assert(plan.contains("TakeOrderedAndProject"),
      "top-k should compile to TakeOrderedAndProject")
  }

  test("ann_range_search broadcasts queries and prunes with pushdown") {
    val plan = physicalPlan("ann_range_search")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"))
    assert(plan.contains("LessThan(vec_id,5)"), "query-side filter not pushed to scan")
  }

  test("IVF cell assignment is map-only: zero Exchange between scan and cell") {
    import org.apache.spark.sql.functions.col
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding").as("c_vec"))
    val cent = e.orderBy(graft.functions.F.splitmix64(col("vec_id")), col("vec_id"))
      .limit(4).select(col("vec_id").as("cid"), col("c_vec").as("cent_vec"))
    val assigned = graft.llm.Ann.assignCells(e, cent)
    val plan = assigned.queryExecution.executedPlan
    assert(!plan.toString.contains("Exchange"),
      "corpus→cell assignment must not shuffle or join")
    assert(plan.toString.toLowerCase.contains("nearestcentroid"),
      "assignment should run through the NearestCentroid codegen expression")
    // and the full query still carries the map-only shape: the only
    // exchanges left belong to the probe join + final rank
    val full = physicalPlan("ann_ivf_topk")
    assert(!full.contains("CartesianProduct"), "assignment cross join reappeared")
  }

  test("txt_char_stats is map-only: zero Exchange (r8 — was a 100x per-char explode shuffle)") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val plan = graft.llm.TextAnalysis
      .charStats(docs, col("doc_id"), col("text"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "char stats must not shuffle")
    assert(plan.toLowerCase.contains("charstatsvec"),
      "char stats should run through the CharStatsVec codegen kernel")
    val tt = graft.llm.TextAnalysis
      .typeToken(docs, col("doc_id"), col("text"))
      .queryExecution.executedPlan.toString
    assert(!tt.contains("Exchange") && tt.toLowerCase.contains("typetokenvec"),
      "type/token stats must be a zero-shuffle TypeTokenVec projection")
  }

  test("two-phase weightedPercentiles is bit-identical to the single-window scan") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    // adversarial shape: heavy value ties (only 17 distinct v), zero
    // weights, a group with a single row, a NULL group (must behave
    // as one ordinary group, like Window.partitionBy), tiny bucket
    // count so every boundary collision path is exercised
    val rnd = new scala.util.Random(8L)
    val rows = (0 until 5000).map { i =>
      (if (i % 11 == 0) null else s"g${i % 3}",
        (rnd.nextInt(17) * 10).toLong, rnd.nextInt(4).toLong, i.toLong)
    } :+ (("solo", 7L, 5L, 99999L))
    val df = spark.createDataFrame(rows).toDF("g", "v", "w", "id")
    val fast = graft.ops.Stats.weightedPercentiles(
        df, col("g"), col("v"), col("w"), tie = Seq(col("id")), buckets = 4)
      .withColumnRenamed("_g", "g")
    val cum = Window.partitionBy(col("g")).orderBy(col("v"), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val slow = df
      .withColumn("cum", sum(col("w")).over(cum))
      .withColumn("tw", sum(col("w")).over(Window.partitionBy(col("g"))))
      .groupBy(col("g"))
      .agg(
        min(when(col("cum") * 4 >= col("tw"), col("v"))).as("p25"),
        min(when(col("cum") * 2 >= col("tw"), col("v"))).as("p50"),
        min(when(col("cum") * 4 >= col("tw") * 3, col("v"))).as("p75"),
        max(col("tw")).as("total_w"))
    val a = fast.orderBy("g").collect().toSeq
    val b = slow.orderBy("g").collect().toSeq
    assert(a == b, s"fast=$a\nslow=$b")
    // parameterized percentile set: a p99-style call through the same
    // two-phase machinery (the fraction drives BOTH the candidate
    // filter and the final aggregate from one Seq)
    val fast99 = graft.ops.Stats.weightedPercentiles(
        df, col("g"), col("v"), col("w"), tie = Seq(col("id")), buckets = 4,
        percentiles = Seq(("p99", 99, 100), ("p50", 1, 2)))
      .withColumnRenamed("_g", "g")
    val slow99 = df
      .withColumn("cum", sum(col("w")).over(cum))
      .withColumn("tw", sum(col("w")).over(Window.partitionBy(col("g"))))
      .groupBy(col("g"))
      .agg(
        min(when(col("cum") * 100 >= col("tw") * 99, col("v"))).as("p99"),
        min(when(col("cum") * 2 >= col("tw"), col("v"))).as("p50"),
        max(col("tw")).as("total_w"))
    val a99 = fast99.orderBy("g").collect().toSeq
    val b99 = slow99.orderBy("g").collect().toSeq
    assert(a99 == b99, s"fast99=$a99\nslow99=$b99")
  }

  test("pageRank round plans ZERO Exchanges in the broadcast regime") {
    import org.apache.spark.sql.functions._
    val width = spark.sessionState.conf.numShufflePartitions
    // mirror pageRank's setup exactly: dst-partitioned stationary
    // edges, checkpointed node+deg frame, then ONE round through the
    // factored round body — the per-iteration cost a 50-round run
    // multiplies
    val raw = spark.range(0, 2000).selectExpr(
      "id % 97 as src", "(id * 31) % 89 as dst")
    val e = raw.repartition(width, col("dst")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val nodesDeg = nodes
      .join(e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .withColumnRenamed("src", "node"), Seq("node"), "left")
      .select(col("node"), coalesce(col("deg"), lit(0L)).as("deg"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    nodesDeg.count()
    val rank = nodesDeg.withColumn("rank", lit(1000000L)).localCheckpoint()
    val round = graft.ops.Graph.pageRankRound(
      e, nodesDeg, rank, 100L, broadcast)
    round.count() // finalize the adaptive plan
    // walk the EXECUTED round plan only — a cached relation's build
    // plan legitimately contains the setup exchanges, but it is
    // materialized once, not per round, and collect() does not
    // descend into InMemoryRelation
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    def shuffles(p: SparkPlan): Int = {
      val self = if (p.isInstanceOf[ShuffleExchangeLike]) 1 else 0
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case _ => p.children
      }
      self + kids.map(shuffles).sum
    }
    val n = shuffles(round.queryExecution.executedPlan)
    val plan = round.queryExecution.executedPlan.toString
    e.unpersist(); nodesDeg.unpersist()
    assert(n == 0,
      s"PR round must reuse the stationary dst partitioning — found $n shuffle Exchanges:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      "contribution frame should broadcast onto the stationary edges")
  }

  test("pageRank large regime shuffles only node-sized frames, never the edges") {
    import org.apache.spark.sql.functions._
    val width = spark.sessionState.conf.numShufflePartitions
    // mirror the n > maxBroadcastNodes setup: edges re-laid by src ONCE
    // and persisted, node+deg frame persisted, bcast = identity — the
    // shape a >10M-node graph actually runs
    val raw = spark.range(0, 2000).selectExpr(
      "id % 97 as src", "(id * 31) % 89 as dst")
    val eDst = raw.repartition(width, col("dst")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nodes = eDst.select(col("src").as("node"))
      .union(eDst.select(col("dst").as("node"))).distinct()
    val nodesDeg = nodes
      .join(eDst.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .withColumnRenamed("src", "node"), Seq("node"), "left")
      .select(col("node"), coalesce(col("deg"), lit(0L)).as("deg"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    nodesDeg.count()
    val eSrc = eDst.repartition(width, col("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    eSrc.count()
    val rank = nodesDeg.withColumn("rank", lit(1000000L)).localCheckpoint()
    val round = graft.ops.Graph.pageRankRound(
      eSrc, nodesDeg, rank, 100L, identity)
    round.count() // finalize the adaptive plan
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    def walk(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case _ => p.children
      }
      p +: kids.flatMap(walk)
    }
    val all = walk(round.queryExecution.executedPlan)
    val shuffleSubtrees = all.collect { case s: ShuffleExchangeLike => s }
    val plan = round.queryExecution.executedPlan.toString
    eDst.unpersist(); nodesDeg.unpersist(); eSrc.unpersist()
    // the edge cache scans with [src, dst] columns; a stationary edge
    // frame means no shuffle's INPUT subtree scans raw edges — the dst
    // aggregation shuffle sits ABOVE a partial HashAggregate, so what
    // crosses the wire is map-combined contribution rows, and the src
    // join reuses the persisted hash(src) layout on the edge side
    def scansRawEdges(p: SparkPlan): Boolean = walk(p).exists { n =>
      val s = n.nodeName
      (s.contains("InMemoryTableScan") || s.contains("TableCacheQueryStage")) &&
        n.output.map(_.name).toSet == Set("src", "dst")
    }
    val offending = shuffleSubtrees.filter(s =>
      s.children.exists(c => scansRawEdges(c) &&
        !walk(c).exists(_.nodeName.contains("HashAggregate"))))
    assert(offending.isEmpty,
      s"edges must never cross a shuffle un-aggregated:\n$plan")
    // node-sized shuffles only: the N-row contribution frame to the
    // stationary src partitions, the map-combined dst aggregation, and
    // (at most) the contribs side of the rank assembly
    assert(shuffleSubtrees.nonEmpty,
      s"the large regime must shuffle the contribution frame — the walk found none:\n$plan")
    assert(shuffleSubtrees.size <= 3,
      s"expected <= 3 node-sized shuffles, found ${shuffleSubtrees.size}:\n$plan")
  }

  test("dd_containment is single-lineage: exactly three shuffles, no join") {
    val plan = physicalPlan("dd_containment")
    // gram-posting aggregation + per-doc window; the pair
    // aggregation reuses the window's id_a partitioning (subset
    // clustering), and a self-join formulation would add joins and
    // re-execute the posting subtree
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 2,
      s"expected exactly 2 hash exchanges")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      "containment must not join")
  }

  test("q_itemsets: map-side pair fan-out, broadcast supports, no basket self-join") {
    val plan = physicalPlan("q_itemsets")
    // the oracle's formulation is a basket self-join; the engine must
    // instead fan pairs out map-side from per-basket arrays — any
    // SortMergeJoin means the self-join shape crept in, and the
    // item-support/total joins must broadcast (item-cardinality
    // frames), never shuffle the pair stream
    assert(!plan.contains("SortMergeJoin"),
      "basket self-join shape — pair generation must be map-side")
    assert(plan.contains("BroadcastHashJoin"), "supports must broadcast")
    // the basket-array frame materializes ONCE: every consumer scans
    // the checkpointed partitions, so the plan holds no collect_set
    // re-execution and only the pair-count + item-support shuffles
    assert(!plan.contains("collect_set"),
      "basket aggregation re-executed — the checkpoint reuse is gone")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size <= 3,
      s"unexpected extra shuffles:\n$plan")
  }

  test("q_event_pattern is one key shuffle: single hash Exchange, no join") {
    val plan = physicalPlan("q_event_pattern")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      s"expected exactly one key shuffle:\n$plan")
    assert(!plan.contains("Join"), "CEP must not join")
  }

  test("q_event_pattern_timed: one key shuffle, no join, no per-key collect") {
    val plan = physicalPlan("q_event_pattern_timed")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      s"expected exactly one key shuffle:\n$plan")
    assert(!plan.contains("Join"), "window CEP must not join")
    assert(!plan.contains("collect_list"),
      "per-key array materialization crept into the windows path")
  }

  test("q_event_pattern_steps: k-step CEP is one key shuffle, no join, no collect") {
    val plan = physicalPlan("q_event_pattern_steps")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      s"expected exactly one key shuffle:\n$plan")
    assert(!plan.contains("Join"), "chained-window CEP must not join")
    assert(!plan.contains("collect_list"),
      "per-key array materialization crept into the k-step path")
  }

  test("ann_ivf_delta: cell frame materialized once, totals broadcast") {
    val plan = physicalPlan("ann_ivf_delta")
    // the corpus-sized assignment+count ran ONCE at the cell-frame
    // checkpoint (otherwise Catalyst re-executes it for the totals
    // subtree — the q_itemsets failure); the final plan reads the
    // materialized cells twice and the 1-row totals broadcast
    assert(!plan.contains("nearestcentroid"),
      "corpus assignment re-executed — the cell checkpoint is gone")
    assert("Exchange hashpartitioning".r.findAllIn(plan).isEmpty,
      s"corpus-sized shuffle in the report plan:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin"),
      "totals must broadcast, not shuffle")
    assert(!plan.contains("SortMergeJoin"), "corpus-side join appeared")
  }

  test("q_seasonal: corpus-sized work is one count agg; seasonal joins broadcast") {
    val plan = physicalPlan("q_seasonal")
    // the (key, step) count + the range window reuse ONE key-side
    // partitioning lineage; the key x 7 seasonal frame comes back
    // broadcast — a shuffled join would re-key the calendar frame
    assert(plan.contains("BroadcastHashJoin"), "seasonal frame must broadcast")
    assert(!plan.contains("SortMergeJoin"), "calendar frame got shuffled")
  }

  test("q_target_encode: category frame materialized once, totals broadcast") {
    val plan = physicalPlan("q_target_encode")
    // the corpus aggregation happens in the localCheckpoint job; the
    // final plan must read the materialized category rows, not
    // re-aggregate lineitem (no FileScan of the corpus, no partial
    // count/sum pair over it)
    assert(!plan.contains("FileScan"),
      "corpus re-scanned — the checkpoint reuse is gone")
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), "totals must ride a broadcast")
  }

  test("txt_collocations: vocab joins broadcast onto the bigram stream") {
    val plan = physicalPlan("txt_collocations")
    assert(plan.contains("BroadcastHashJoin"), "vocab supports must broadcast")
    assert(!plan.contains("SortMergeJoin"),
      "vocab-keyed shuffle join appeared — broadcast lost")
  }

  test("dd_incremental_lsh probes buckets via broadcast, never shuffles the corpus for the probe") {
    val plan = physicalPlan("dd_incremental_lsh")
    assert(plan.contains("BroadcastExchange"),
      "delta/relevant-rep keys should broadcast")
    assert("LeftSemi".r.findAllIn(plan).size >= 2,
      "membership prune + delta-pair filter should both be semi joins")
    // r18: the collapse and the banded bucket probe materialize ONCE
    // at construction (localCheckpoint) — the query-level plan must
    // read their results as ExistingRDD and never re-plan the
    // banding/probe (pre-r18 the corpus re-aggregated per consumer).
    // The membership left-joins MAY plan as SortMergeJoin statically
    // (a LogicalRDD has no size stats, so no static broadcast); AQE
    // converts them to broadcast at runtime when small, and on a
    // duplicate-heavy corpus the shuffle is the right plan anyway.
    assert(plan.contains("ExistingRDD"),
      "probe/collapse no longer materialized once (checkpoint lost)")
    // `is_delta` is the PRE-collapse tag: it only appears when a
    // consumer re-plans the base+delta collapse aggregation itself
    // (21 occurrences pre-r18, one per re-planned subtree; 0 once the
    // collapse is checkpointed — consumers read has_delta from the
    // materialized classes).
    assert(!plan.contains("is_delta"),
      "a consumer re-plans the base+delta collapse at the query level")
  }

  test("ds_temperature_sample broadcasts counts; the data stream never shuffles") {
    val plan = physicalPlan("ds_temperature_sample")
    assert(plan.contains("BroadcastHashJoin"),
      "source-count frame must broadcast back onto the scan")
    // the only exchanges allowed belong to the tiny counts aggregation
    // (partial/final + its broadcast); the document stream itself must
    // not hash-repartition
    assert(!plan.contains("SortMergeJoin"), "data-side shuffle join appeared")
  }

  test("q_key_skew is two chained hash aggregations, no joins") {
    val plan = physicalPlan("q_key_skew")
    assert(!plan.contains("Join"), "skew profile must not join")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size <= 2,
      "expected at most (group,key) + (group) shuffles")
  }

  test("ds_epoch_plan stays map-only end to end") {
    val plan = physicalPlan("ds_epoch_plan")
    assert(!plan.contains("Exchange"),
      "epoch composition must be a pure projection chain")
  }

  test("txt_type_token is a single map-only projection") {
    val plan = physicalPlan("txt_type_token")
    assert(!plan.contains("Exchange"),
      "lexical stats must not shuffle — higher-order funcs, not explode+groupBy")
  }

  test("dd_span_dedup uses exactly two shuffles: rank-by-segment, rebuild-by-doc") {
    val plan = physicalPlan("dd_span_dedup")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 2,
      "expected seg_text window + doc_id rebuild only")
  }

  test("txt_inverted_index final groupBy reuses the window's token partitioning") {
    val plan = physicalPlan("txt_inverted_index")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size <= 2,
      "expected (token,doc) agg + token window; final agg must not re-shuffle")
  }

  test("q_expectations: one fact pass, dims broadcast, no fact shuffle join") {
    val plan = physicalPlan("q_expectations")
    assert(plan.contains("BroadcastHashJoin"), "FK dimension must broadcast")
    assert(!plan.contains("SortMergeJoin"), "fact-side shuffle join appeared")
  }

  test("q_winsorize broadcasts the bounds frame; no fact-side shuffle join") {
    val plan = physicalPlan("q_winsorize")
    assert(plan.contains("BroadcastHashJoin"), "bounds frame must broadcast")
    assert(!plan.contains("SortMergeJoin"), "fact-side shuffle join appeared")
  }

  test("q_corr_matrix is one scan and one global aggregation") {
    val plan = physicalPlan("q_corr_matrix")
    assert(!plan.contains("Join"), "moment computation must not join")
    assert("Scan parquet".r.findAllIn(plan).size == 1,
      "all 15 moments must come from a single lineitem scan")
  }

  test("txt_surprisal corpus total is a broadcast, not a vocab-wide window") {
    val plan = physicalPlan("txt_surprisal")
    assert(!plan.contains("Window"), "global window over the vocab appeared")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      "1-row corpus total must broadcast")
  }

  test("q_threshold_sweep aggregates the corpus BEFORE any window") {
    val plan = physicalPlan("q_threshold_sweep")
    // the suffix-sum window must run on the tiny bins frame: in plan
    // text (children print below parents) the Window sits above the
    // final aggregate, never between scan and aggregation
    val win = plan.indexOf("Window")
    val agg = plan.indexOf("HashAggregate")
    assert(win >= 0 && agg >= 0 && win < agg,
      "window must consume the aggregated bins frame, not the corpus")
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      "bin aggregation lost its map-side partial phase")
  }

  test("ds_bootstrap weights are map-only: one Exchange total") {
    val plan = physicalPlan("ds_bootstrap")
    assert("Exchange".r.findAllIn(plan).size == 1,
      "replicate weights must not add shuffles beyond the key agg")
    assert(!plan.contains("Join"), "bootstrap must not join or replicate")
  }

  test("txt_boilerplate never goes all-pairs") {
    val plan = physicalPlan("txt_boilerplate")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "segment-df join must stay an equi-join on the segment key")
  }

  test("txt_chunk_windows is map-only: zero Exchange") {
    val plan = physicalPlan("txt_chunk_windows")
    assert(!plan.contains("Exchange"),
      "window/stride chunking must not shuffle")
    assert(!plan.contains("Join"), "chunking must not self-join")
  }

  test("q_hll_distinct is two aggregations, no join") {
    val plan = physicalPlan("q_hll_distinct")
    assert(!plan.contains("Join"), "HLL must not join")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size <= 2,
      "HLL is (key,idx) then (key) — at most two shuffles")
    assert("HashAggregate".r.findAllIn(plan).size >= 3,
      "register and fold aggregations must keep map-side partials")
  }

  test("driver entry() returns rows (smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
