package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.llm.Cluster

/** Deterministic k-means + SemDeDup (llm/Cluster.scala). */
class ClusterSpec extends SparkSpec {

  private def emb: DataFrame =
    spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))

  test("kmeans is partition-insensitive: integer centroid sums make the result exact") {
    val a = Cluster.cellStats(
      Cluster.kmeans(emb, col("vec_id"), col("embedding"), k = 4, iters = 2))
      .orderBy("cell").collect().toSeq
    val b = Cluster.cellStats(
      Cluster.kmeans(emb.repartition(7), col("vec_id"), col("embedding"), k = 4, iters = 2))
      .orderBy("cell").collect().toSeq
    assert(a == b, "cellStats must be bit-identical under repartitioning")
    assert(a.nonEmpty && a.map(_.getLong(1)).sum == emb.count())
  }

  test("kmeans assignment covers every vector exactly once") {
    val km = Cluster.kmeans(emb, col("vec_id"), col("embedding"), k = 4, iters = 1)
    assert(km.assigned.count() == emb.count())
    assert(km.assigned.groupBy("vec_id").count().filter(col("count") > 1).isEmpty)
    // every assigned cell is a live centroid
    val cells = km.assigned.select("cell").distinct().collect().map(_.getLong(0)).toSet
    val cids = km.centroids.select("cid").collect().map(_.getLong(0)).toSet
    assert(cells.subsetOf(cids))
  }

  test("semanticNearDupPairs equals brute-force within-cell cosine pairs") {
    val planted = {
      val dups = emb.filter(col("vec_id") % 10 === 0).select(
        (col("vec_id") + 1000L).as("vec_id"),
        transform(col("embedding"), x => (x.cast("double") * 1.001).cast("float"))
          .as("embedding"))
      emb.unionByName(dups)
    }
    val got = Cluster
      .semanticNearDupPairs(planted, col("vec_id"), col("embedding"),
        minCos = 0.98, k = 4, iters = 2)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force: same kmeans cells, all pairs, exact cosine filter
    val km = Cluster.kmeans(planted, col("vec_id"), col("embedding"), k = 4, iters = 2)
    val a = km.assigned.select(col("cell"), col("vec_id").as("ia"), col("c_vec").as("va"))
    val b = km.assigned.select(col("cell"), col("vec_id").as("ib"), col("c_vec").as("vb"))
    val want = a.join(b, Seq("cell")).filter(col("ia") < col("ib"))
      .filter(graft.functions.F.cosineSim(col("va"), col("vb")) >= 0.98)
      .select("ia", "ib").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
    // the planted scaled copies are cosine-collinear with their
    // originals, so every one must be recovered
    val plantedPairs = emb.filter(col("vec_id") % 10 === 0)
      .select("vec_id").collect().map(r => (r.getLong(0), r.getLong(0) + 1000L)).toSet
    assert(plantedPairs.subsetOf(got), "SemDeDup must recover all planted dups")
  }

  test("kmeans final assignment is map-only: zero Exchange in the assigned plan") {
    val km = Cluster.kmeans(emb, col("vec_id"), col("embedding"), k = 4, iters = 1)
    val plan = km.assigned.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      "assignment must be a projection over the scan — centroids ride as literals")
    assert(plan.toLowerCase.contains("nearestcentroid"))
  }
}
