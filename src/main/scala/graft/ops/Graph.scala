package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed iterative graph analytics (beyond the label-propagation
  * connected components in [[graft.llm.Dedup.connectedComponents]]).
  *
  * PageRank here is made fully deterministic the same way the k-means
  * centroid update is: ALL arithmetic is scaled-integer. Float
  * summation order would make the ranks partition-dependent; integer
  * contribution sums are commutative, so the result is bit-identical
  * on any cluster and recomputable by a SQL oracle with the division
  * chain unrolled.
  */
object Graph {

  /** Fixed-iteration PageRank in scaled-integer arithmetic.
    *
    * Semantics (unnormalized variant — deterministic and oracle-
    * checkable):
    *   rank_0(v)   = scale div N
    *   contrib(u→v)= rank_t(u) div outdeg(u)
    *   rank_{t+1}(v) = (3·scale div 20) div N + (Σ contrib · 17) div 20
    * i.e. damping 0.85 = 17/20 as exact integer ops; mass lost to
    * dangling nodes and floor-division remainders is NOT redistributed
    * (ranks are scores, not a probability distribution — ordering is
    * what matters, and floor loss is ≤ outdeg ULPs per node).
    *
    * Scale shape per iteration: one shuffle joining ranks to edges on
    * src + one aggregation on dst — the canonical distributed PR
    * round. `edges` is cached by the caller if reused; the node count
    * is the only driver-side scalar (one count job, control-plane).
    */
  def pageRank(
      edges: DataFrame, src: Column, dst: Column,
      iters: Int = 3, scale: Long = 1000000000000L,
      maxBroadcastNodes: Long = 10000000L): DataFrame = {
    // localCheckpoint each round (the connectedComponents idiom):
    // without it iteration t's LAZY plan re-executes iterations
    // 1..t−1, turning k rounds into O(k²) work and unbounded plan
    // depth — the difference between 3 rounds locally and 50 rounds
    // on a cluster.
    val e = edges.select(src.cast("long").as("src"), dst.cast("long").as("dst"))
      .distinct().localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().localCheckpoint()
    val n = nodes.count()
    require(n > 0, "pageRank: empty graph")
    // A checkpointed frame has no catalog stats, so Catalyst will
    // never broadcast the rank side on its own and every round pays a
    // full edge shuffle. The node count is already on the driver:
    // below the bound, hint the (node, rank) side broadcast — each
    // round then joins map-side against the stationary edge partitions
    // and the only shuffle left is the dst aggregation. Past the
    // bound (rank table genuinely cluster-sized), fall back to the
    // co-partitioned shuffle join: edgesDeg is checkpointed once and
    // both sides hash on the join key.
    val small = n <= maxBroadcastNodes
    def bcast(df: DataFrame): DataFrame = if (small) broadcast(df) else df
    val base = (scale * 3 / 20) / n
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val edgesDeg = e.join(bcast(outdeg), Seq("src")).localCheckpoint()
    var rank = nodes.withColumn("rank", lit(scale / n))
    var it = 0
    while (it < iters) {
      val contribs = edgesDeg
        .join(bcast(rank.withColumnRenamed("node", "src")), Seq("src"))
        .select(col("dst").as("node"), expr("rank div deg").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("in_mass"))
      rank = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + expr("(coalesce(in_mass, 0L) * 17) div 20")).as("rank"))
        .localCheckpoint()
      // round t−1's checkpoint blocks are reclaimed by the
      // ContextCleaner once this reassignment drops the last
      // reference — a 50-round run tends toward one live rank RDD,
      // not 50 (localCheckpoint blocks are not CacheManager entries;
      // an explicit Dataset.unpersist would be a no-op here).
      it += 1
    }
    rank
  }

  /** Exact per-node triangle counts via degree-ordered orientation —
    * the standard communication-optimal distributed algorithm: orient
    * every undirected edge from its lower-(degree, id) endpoint to the
    * higher one, so each triangle {s,a,b} is generated exactly once as
    * a wedge at its smallest vertex (s→a, s→b with key(a) < key(b))
    * closed by the oriented edge a→b. Wedge work is Σ outdeg² which
    * orientation bounds by O(m^1.5) total — the reason this survives
    * power-law degree skew where a naive s-keyed self-join on the
    * unoriented graph explodes at hub nodes.
    *
    * Shuffles: dedup (1), degree agg + two degree joins, wedge
    * self-join keyed on s, closure join keyed on the (a,b) pair, final
    * participation agg. Every join key is data-sized, never a cross
    * product. Output: (node, n_tri) for nodes in ≥1 triangle.
    */
  def triangleCounts(edges: DataFrame, a: Column, b: Column): DataFrame = {
    val e0 = edges
      .select(a.cast("long").as("a"), b.cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
      .distinct()
    val deg = e0.select(explode(array(col("u"), col("v"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("d"))
    // orient by (degree, id); carry the head's key for wedge ordering
    val ed = e0
      .join(deg.select(col("node").as("u"), col("d").as("du")), Seq("u"))
      .join(deg.select(col("node").as("v"), col("d").as("dv")), Seq("v"))
      .select(
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")),
          struct(col("u").as("s"), col("v").as("t"), col("dv").as("dt")))
          .otherwise(struct(col("v").as("s"), col("u").as("t"), col("du").as("dt")))
          .as("e"))
      .select(col("e.s").as("s"), col("e.t").as("t"), col("e.dt").as("dt"))
    val e1 = ed.select(col("s"), col("t").as("x"), col("dt").as("dx"))
    val e2 = ed.select(col("s"), col("t").as("y"), col("dt").as("dy"))
    val wedges = e1.join(e2, Seq("s"))
      .filter(struct(col("dx"), col("x")) < struct(col("dy"), col("y")))
    val tri = wedges.join(
      ed.select(col("s").as("x"), col("t").as("y")), Seq("x", "y"))
    tri
      .select(explode(array(col("s"), col("x"), col("y"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_tri"))
  }

  /** Fixed-round k-core peeling: `rounds` iterations of "drop every
    * node with degree < k, then drop edges touching dropped nodes".
    * With enough rounds this converges to the exact k-core; a FIXED
    * round count keeps the operator deterministic, oracle-checkable
    * (the SQL unrolls the same rounds), and cluster-friendly — each
    * round is one degree aggregation + two semi joins on a frame that
    * only shrinks, checkpointed so round t never re-executes rounds
    * 1..t−1. Callers needing the true fixpoint raise `rounds` until
    * the surviving count stabilizes (monotone, so convergence is
    * detectable from the count alone).
    *
    * Output: (node, deg) for nodes still meeting deg ≥ k after the
    * last peel.
    */
  def kcorePeel(
      edges: DataFrame, a: Column, b: Column,
      k: Int, rounds: Int = 3): DataFrame = {
    var e = edges
      .select(a.cast("long").as("a"), b.cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
      .distinct().localCheckpoint()
    var r = 0
    while (r < rounds) {
      val deg = e.select(explode(array(col("u"), col("v"))).as("node"))
        .groupBy(col("node")).agg(count(lit(1)).as("d"))
      val keep = deg.filter(col("d") >= k).select(col("node"))
      e = e
        .join(keep.select(col("node").as("u")), Seq("u"), "left_semi")
        .join(keep.select(col("node").as("v")), Seq("v"), "left_semi")
        .localCheckpoint()
      r += 1
    }
    e.select(explode(array(col("u"), col("v"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
      .filter(col("deg") >= k)
  }
}
