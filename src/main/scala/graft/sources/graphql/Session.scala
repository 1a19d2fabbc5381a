package graft.sources.graphql

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import scala.jdk.CollectionConverters._

/** Authenticated session bootstrap — the reference's
  * `establish_connections` + `get_users_account_ids` composition
  * (`weekly alignments GQL API.py:93-135`): attach the token header
  * to every request, prefetch the account ids the session is scoped
  * to, then run the per-account extracts those ids parameterize.
  *
  * Failure taxonomy: a bad/expired token answers 401 — the 4xx
  * fail-fast class ([[Http.post]] raises `IllegalArgumentException`,
  * which [[RetryingFetcher]] does NOT retry; re-sending a rejected
  * credential just hammers the API, exactly the reference's raise).
  *
  * Scale stance: the id prefetch is CONTROL-PLANE work — the
  * reference gets one user's handful of account ids — so it walks
  * the standard cursor protocol on the driver, holding ids only.
  * The per-account extracts are each a full DSv2 paged scan
  * (partition-per-page, executor-side bodies); the union is
  * O(#accounts) plan nodes, bounded by the same handful.
  */
object Session {

  /** The token-bearing fetcher every call in the session shares. */
  def authenticatedFetcher(
      url: String,
      token: String,
      query: String,
      queryType: Option[String] = None,
      headerName: String = "Authorization",
      tokenPrefix: String = "Bearer ",
      extraHeaders: Map[String, String] = Map.empty): HttpPageFetcher =
    HttpPageFetcher(
      url = url,
      query = query,
      headers = extraHeaders + (headerName -> s"$tokenPrefix$token"),
      queryType = queryType)

  /** Prefetch the session's account ids (ref:98-135): page the ids
    * query through the authenticated fetcher and pull
    * `data.<queryType>.edges[].node.<idField>`. The first POST
    * proves the credentials — 401 propagates as the non-retryable
    * class before any extract is planned.
    */
  def accountIds(
      idsFetcher: PageFetcher,
      queryType: String,
      idField: String): Seq[String] =
    PagedGraphQL.fetchAllPages(idsFetcher).flatMap { json =>
      val edges = Http.mapper.readTree(json)
        .path("data").path(queryType).path("edges")
      edges.elements().asScala.map { e =>
        val v = e.path("node").path(idField)
        // a missing idField must fail loudly: MissingNode.toString is
        // "" and would silently register + query an empty account id
        if (v.isMissingNode || v.isNull)
          throw new IllegalArgumentException(
            s"account id field '$idField' missing from edge: $e")
        if (v.isTextual) v.asText else v.toString
      }.toSeq
    }

  /** The full composition: authenticate → prefetch account ids →
    * one paged DSv2 scan per account, each flattened and tagged with
    * `account_id`, unioned. Fetchers are injected so the transport
    * composes: production passes
    * `id => new RetryingFetcher(authenticatedFetcher(url, token,
    * queryFor(id), Some(queryType)))` — the same shape the specs
    * drive through the loopback HTTP fixture with auth enforced.
    */
  def readAllAccounts(
      spark: SparkSession,
      idsFetcher: PageFetcher,
      idsQueryType: String,
      idField: String,
      accountFetcher: String => PageFetcher,
      queryType: String,
      nodeSchema: StructType): DataFrame = {
    val ids = accountIds(idsFetcher, idsQueryType, idField)
    require(ids.nonEmpty, "bootstrap returned no account ids")
    ids.map { id =>
      val name = s"session#$queryType#$id@${java.util.UUID.randomUUID()}"
      PageFetchers.register(name, accountFetcher(id))
      GraphQL
        .flattenResponse(GraphQL.readPages(spark, name), queryType, nodeSchema)
        .withColumn("account_id", lit(id))
    }.reduce(_ unionByName _)
  }
}
