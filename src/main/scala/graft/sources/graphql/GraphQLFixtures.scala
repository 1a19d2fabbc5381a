package graft.sources.graphql

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._

/** Deterministic in-memory "GraphQL API" fixtures (this container has
  * zero egress): render a parquet table into standard
  * `data.<type>.edges[].node` pages and serve them through a
  * [[PageFetcher]]. The driver-side `collect()` here plays the role
  * of the remote API server holding the dataset — the Spark read
  * path under test (pagination → partition-per-page → distributed
  * parse/flatten) is the production one.
  */
object GraphQLFixtures {

  final case class FixturePageFetcher(pages: Vector[String]) extends PageFetcher {
    override def fetch(after: Option[String]): Page = {
      val idx = after.map(_.toInt + 1).getOrElse(0)
      Page(pages(idx), if (idx < pages.length - 1) Some(idx.toString) else None)
    }
  }

  def jsonEscape(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  private def jsonValue(v: Any): String = v match {
    case null => "null"
    case s: String => "\"" + jsonEscape(s) + "\""
    case d: Double => java.lang.Double.toString(d)
    case f: Float => java.lang.Float.toString(f)
    case other => other.toString // Long / Int / Boolean
  }

  private def renderPage(
      queryType: String, rows: Seq[Row], schema: StructType,
      pageIdx: Int, hasNext: Boolean): String = {
    val edges = rows.zipWithIndex.map { case (r, i) =>
      val fields = schema.fields.zipWithIndex
        .map { case (f, fi) => "\"" + f.name + "\": " + jsonValue(r.get(fi)) }
        .mkString(", ")
      s"""{"cursor": "p${pageIdx}e$i", "node": {$fields}}"""
    }.mkString("[", ", ", "]")
    s"""{"data": {"$queryType": {"pageInfo": {"hasNextPage": $hasNext, "endCursor": "$pageIdx"}, "edges": $edges}}}"""
  }

  /** Register a fixture API with the reference's NESTED shape
    * (`QUERY_HIERARCHY_GROUPS`, ref 1015-1042): region rows as parent
    * nodes, their nations as an embedded `children` connection. Each
    * parent inlines at most `inlineChildren` child edges; parents
    * with more get `children.pageInfo.hasNextPage = true` and a
    * registered continuation fetcher at `<name>#children#<parentId>`
    * serving the remainder in `childPageSize` pages — the per-node
    * second-level pagination a real API would answer. Returns the
    * top-level fetcher name.
    */
  def registerNestedApi(
      spark: SparkSession,
      dir: String,
      queryType: String = "hierarchyGroups",
      pageSize: Int = 2,
      inlineChildren: Int = 3,
      childPageSize: Int = 2): String = {
    import org.apache.spark.sql.functions.col
    val name = s"$queryType@$dir#nested"
    val regions = spark.read.parquet(s"$dir/region.parquet")
      .select(col("r_regionkey").cast("long"), col("r_name"))
      .collect().sortBy(_.getLong(0))
    val nations = spark.read.parquet(s"$dir/nation.parquet")
      .select(col("n_regionkey").cast("long"),
        col("n_nationkey").cast("long"), col("n_name"))
      .collect().groupBy(_.getLong(0))

    def childEdge(n: Row, i: Int): String =
      s"""{"cursor": "k$i", "node": {"child_id": ${n.getLong(1)}, "child_name": "${jsonEscape(n.getString(2))}"}}"""
    def childConn(edges: Seq[String], hasNext: Boolean, cur: String): String =
      s"""{"pageInfo": {"hasNextPage": $hasNext, "endCursor": "$cur"}, "edges": ${edges.mkString("[", ", ", "]")}}"""

    val parentPages = regions.grouped(pageSize).toVector
    val pages = parentPages.zipWithIndex.map { case (grp, pi) =>
      val nodes = grp.map { r =>
        val rk = r.getLong(0)
        val kids = nations.getOrElse(rk, Array.empty[Row]).sortBy(_.getLong(1)).toSeq
        val inline = kids.take(inlineChildren)
        val more = kids.length > inlineChildren
        if (more) {
          val rest = kids.drop(inlineChildren)
          val restPages0 = rest.grouped(childPageSize).toVector
          val childPages = restPages0.zipWithIndex.map { case (cg, ci) =>
            val conn = childConn(
              cg.zipWithIndex.map { case (n, i) => childEdge(n, i) },
              hasNext = ci < restPages0.length - 1, cur = ci.toString)
            s"""{"data": {"children": $conn}}"""
          }
          PageFetchers.register(s"$name#children#$rk", FixturePageFetcher(childPages))
        }
        val conn = childConn(
          inline.zipWithIndex.map { case (n, i) => childEdge(n, i) },
          hasNext = more, cur = "inline")
        s"""{"cursor": "p$pi", "node": {"parent_id": $rk, "parent_name": "${jsonEscape(r.getString(1))}", "children": $conn}}"""
      }
      s"""{"data": {"$queryType": {"pageInfo": {"hasNextPage": ${pi < parentPages.length - 1}, "endCursor": "$pi"}, "edges": ${nodes.mkString("[", ", ", "]")}}}}"""
    }
    PageFetchers.register(name, FixturePageFetcher(pages))
    name
  }

  /** Register the authenticated-bootstrap fixture set (the
    * reference's `get_users_account_ids` world, ref:98-135): an
    * `accounts` ids API listing one account id per region, plus one
    * per-account `nations` API serving that region's nations.
    * Returns (idsFetcherName, accountIds, accountFetcherNameFor,
    * nationSchema); the caller decides the auth gating
    * (`FixtureHttpServer.requireAuth`) and transport.
    */
  def registerAuthApi(
      spark: SparkSession,
      dir: String,
      stem: String = "authApi",
      idsPageSize: Int = 2): (String, Seq[String], String => String, StructType) = {
    import org.apache.spark.sql.functions.col
    val regions = spark.read.parquet(s"$dir/region.parquet")
      .select(col("r_regionkey").cast("long"))
      .collect().map(_.getLong(0)).sorted.toSeq
    val ids = regions.map(_.toString)
    val idsSchema = new StructType().add("account_id", StringType)
    val idGroups = ids.map(Row(_)).grouped(idsPageSize).toVector
    val idPages = idGroups.zipWithIndex.map { case (g, i) =>
      renderPage("accounts", g, idsSchema, i, hasNext = i < idGroups.length - 1)
    }
    val idsName = s"$stem@$dir#accounts"
    PageFetchers.register(idsName, FixturePageFetcher(idPages))
    val nations = spark.read.parquet(s"$dir/nation.parquet")
    val nSchema = nations.schema
    val byRegion = nations.collect().toSeq
      .groupBy(_.getAs[Number]("n_regionkey").longValue())
    def acctName(id: String): String = s"$stem@$dir#acct#$id"
    regions.foreach { rk =>
      val rows = byRegion.getOrElse(rk, Seq.empty)
        .sortBy(_.getAs[Number]("n_nationkey").longValue())
      PageFetchers.register(acctName(rk.toString), FixturePageFetcher(Vector(
        renderPage("nations", rows, nSchema, 0, hasNext = false))))
    }
    (idsName, ids, acctName, nSchema)
  }

  /** Register a fixture API serving `table` from `dir` under query
    * type `queryType`; returns (fetcherName, nodeSchema).
    */
  def registerTableApi(
      spark: SparkSession,
      dir: String,
      table: String,
      queryType: String,
      pageSize: Int = 64): (String, StructType) = {
    val df = spark.read.parquet(s"$dir/$table.parquet")
    val schema = df.schema
    val rows = df.collect().toSeq
    val groups0 = rows.grouped(pageSize).toVector
    val groups = if (groups0.isEmpty) Vector(Seq.empty[Row]) else groups0
    val pages = groups.zipWithIndex.map { case (g, i) =>
      renderPage(queryType, g, schema, i, hasNext = i < groups.length - 1)
    }
    val name = s"$queryType@$dir/$table"
    PageFetchers.register(name, FixturePageFetcher(pages))
    (name, schema)
  }
}
