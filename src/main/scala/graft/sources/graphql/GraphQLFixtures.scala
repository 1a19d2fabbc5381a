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
