package graft.sources.graphql

import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Cursor-paginated GraphQL ingestion (the reference's
  * `fetch_data_from_graphql_api`, `weekly alignments GQL
  * API.py:178-221`, and its `edges/node/pageInfo` response shape,
  * ref 1002-1093) re-expressed as a Spark DSv2 batch source.
  *
  * Split of labor at scale: cursor pagination is inherently serial,
  * so the *driver* walks `pageInfo.endCursor` (exactly like the
  * reference's while-loop) at planning time — but it keeps ONLY the
  * per-page continuation cursors, discarding each page body as soon
  * as its cursor is extracted. Planner-held state is O(pages ×
  * cursor bytes), not O(pages × body bytes): a 10k-page × ~1 MB
  * extract costs the driver ~10 GB if bodies are buffered, versus
  * ~100 KB of cursors here. Each InputPartition carries (index,
  * after-cursor, fetcher) and the *executor* re-fetches its single
  * page, then does all parsing, edge-explosion and flattening in
  * parallel. The trade is a second fetch per page (planning walk +
  * executor read) — API round-trips are the currency that buys
  * bounded driver heap; the walk is control-plane traffic either
  * way. Fetchers must therefore be stateless in `after` (the same
  * cursor re-yields the same page — true of any cursor-paginated
  * API, and of [[RetryingFetcher]] re-sends).
  */

/** One GraphQL page: raw JSON body + continuation token. */
final case class Page(json: String, endCursor: Option[String])

/** Transport abstraction — the reference's `gql_api.post`. Network
  * implementations live behind this trait; tests and the driver
  * fixture use in-memory fetchers (zero-egress container).
  */
trait PageFetcher extends Serializable {
  def fetch(after: Option[String]): Page
}

/** Bounded-retry wrapper for transient transport failures (the
  * reference's httpx POSTs against a live API): IOExceptions retry
  * with exponential backoff up to `maxRetries`, anything else — a
  * GraphQL error payload, a schema mismatch — propagates immediately
  * (retrying a semantic error just hammers the API). The sleeper is
  * injectable so specs run without wall-clock waits.
  */
final class RetryingFetcher(
    inner: PageFetcher,
    maxRetries: Int = 3,
    baseDelayMs: Long = 100,
    sleeper: Long => Unit = Thread.sleep)
    extends PageFetcher {
  override def fetch(after: Option[String]): Page = {
    var attempt = 0
    while (true) {
      try return inner.fetch(after)
      catch {
        case e: java.io.IOException =>
          if (attempt >= maxRetries) throw e
          sleeper(baseDelayMs << attempt)
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }
}

/** Driver-side cursor walk. */
object PagedGraphQL {

  /** Walk the pagination and return only each page's AFTER-cursor
    * (`None` for the first page) — one body is resident at a time,
    * discarded as soon as `endCursor` is read. This is what the
    * planner holds: cursors, never bodies.
    */
  def fetchAllCursors(fetcher: PageFetcher): Seq[Option[String]] = {
    val cursors = Seq.newBuilder[Option[String]]
    var cursor: Option[String] = None
    var more = true
    while (more) {
      cursors += cursor
      val p = fetcher.fetch(cursor)
      cursor = p.endCursor
      more = p.endCursor.isDefined
    }
    cursors.result()
  }

  /** Collect all page bodies (driver-resident — fine for tests and
    * control-plane-sized extracts; the scan path uses
    * [[fetchAllCursors]] instead).
    */
  def fetchAllPages(fetcher: PageFetcher): Seq[String] = {
    val pages = Seq.newBuilder[String]
    var cursor: Option[String] = None
    var more = true
    while (more) {
      val p = fetcher.fetch(cursor)
      pages += p.json
      cursor = p.endCursor
      more = p.endCursor.isDefined
    }
    pages.result()
  }
}

/** Named fetcher registry — DSv2 options are strings, so fetchers are
  * registered under a name the `fetcher` option refers to.
  */
object PageFetchers {
  /** Bounded like [[ContinuationGroups]]: session bootstrap and
    * nested flattening register fresh UUID-named fetchers per call,
    * so an unbounded map is a driver-lifetime leak. Outer paged
    * scans re-resolve their fetcher name on every action (Spark
    * builds a fresh Scan per physical planning), so the cap is
    * generous — eviction only bites a driver that keeps >MaxFetchers
    * DataFrames live at once, and then it names itself loudly.
    */
  val MaxFetchers = 4096
  private val evicted =
    java.util.Collections.newSetFromMap(
      new java.util.LinkedHashMap[String, java.lang.Boolean](64, 0.75f, false) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, java.lang.Boolean]): Boolean =
          size() > MaxFetchers
      })
  private val registry =
    new java.util.LinkedHashMap[String, PageFetcher](64, 0.75f, false) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, PageFetcher]): Boolean = {
        val evict = size() > MaxFetchers
        if (evict) evicted.add(e.getKey)
        evict
      }
    }
  def register(name: String, f: PageFetcher): Unit =
    registry.synchronized { registry.put(name, f); () }
  def remove(name: String): Unit =
    registry.synchronized { registry.remove(name); () }
  def apply(name: String): PageFetcher = registry.synchronized {
    val f = registry.get(name)
    if (f == null) {
      if (evicted.contains(name))
        throw new NoSuchElementException(
          s"page fetcher evicted: $name — >$MaxFetchers fetchers registered " +
            "after it; drop finished DataFrames' fetchers with remove(), or " +
            "act on scans before registering that many more")
      throw new NoSuchElementException(s"page fetcher not registered: $name")
    }
    f
  }
  private[graft] def registeredCount: Int = registry.synchronized(registry.size)
}

object GraphQLSource {
  /** Connector output: one row per page; downstream `from_json` +
    * explode distributes the parse.
    */
  val pageSchema: StructType = StructType(Seq(
    StructField("page_idx", IntegerType, nullable = false),
    StructField("json", StringType, nullable = false)))
}

class GraphQLTableProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraphQLSource.pageSchema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GraphQLTable(properties.get("fetcher"))
}

private class GraphQLTable(fetcherName: String) extends Table with SupportsRead {
  override def name(): String = s"graphql($fetcherName)"
  override def schema(): StructType = GraphQLSource.pageSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new GraphQLScan(fetcherName)
}

private class GraphQLScan(fetcherName: String) extends Scan with Batch {
  override def readSchema(): StructType = GraphQLSource.pageSchema
  override def toBatch: Batch = this
  // driver-side cursor walk at planning time; partitions carry only
  // (index, after-cursor, fetcher) — bodies are fetched by executors.
  // The fetcher instance ships inside the partition (Serializable),
  // so a real cluster's executors don't need the driver's registry.
  // Lazy: Spark calls planInputPartitions more than once per query
  // (plan + exec), and the walk must not re-fetch each time.
  private lazy val planned: Array[InputPartition] = {
    val fetcher = PageFetchers(fetcherName)
    PagedGraphQL.fetchAllCursors(fetcher)
      .zipWithIndex
      .map { case (after, i) => PagePartition(i, after, fetcher): InputPartition }
      .toArray
  }
  override def planInputPartitions(): Array[InputPartition] = planned
  override def createReaderFactory(): PartitionReaderFactory = PageReaderFactory
}

final case class PagePartition(idx: Int, after: Option[String], fetcher: PageFetcher)
    extends InputPartition

/** Registry for continuation groups: a batch of per-parent child
  * paginations planned as ONE scan. Each entry is (parentKey,
  * fetcherName) — the fetcher serving that parent's remaining child
  * pages.
  */
object ContinuationGroups {
  /** Registry lifecycle: a group lives here only between
    * registration and its scan's FIRST `planInputPartitions` — the
    * scan consumes it (removes the entry) once partitions are built
    * and re-executions replay from the planned-partition cache, not
    * this registry (Spark constructs a fresh Scan per action, so a
    * lazy val alone would re-walk cursors AND re-need the entry).
    * The LRU cap is therefore a backstop against DataFrames that are
    * created and never acted on, not the cleanup mechanism. If that
    * backstop does fire before a scan planned, [[apply]] names the
    * eviction explicitly instead of a bare not-registered error.
    */
  val MaxGroups = 1024
  private val evicted =
    java.util.Collections.newSetFromMap(
      new java.util.LinkedHashMap[String, java.lang.Boolean](64, 0.75f, false) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, java.lang.Boolean]): Boolean =
          size() > MaxGroups
      })
  private val registry =
    new java.util.LinkedHashMap[String, Seq[(String, String)]](64, 0.75f, false) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, Seq[(String, String)]]): Boolean = {
        val evict = size() > MaxGroups
        if (evict) evicted.add(e.getKey)
        evict
      }
    }
  def register(name: String, entries: Seq[(String, String)]): Unit =
    registry.synchronized {
      // re-registering a previously-evicted name makes it live again —
      // the tombstone must not outlive the fresh entry (r9 advice)
      evicted.remove(name)
      registry.put(name, entries); ()
    }
  def remove(name: String): Unit =
    registry.synchronized { registry.remove(name); () }
  def apply(name: String): Seq[(String, String)] = registry.synchronized {
    val e = registry.get(name)
    if (e == null) {
      if (evicted.contains(name))
        throw new NoSuchElementException(
          s"continuation group evicted before its scan planned: $name — " +
            s">$MaxGroups groups registered after it; act on (or plan) the " +
            "flattened DataFrame before registering that many more groups")
      throw new NoSuchElementException(s"continuation group not registered: $name")
    }
    e
  }
  private[graft] def registeredCount: Int = registry.synchronized(registry.size)
}

object ContinuationSource {
  /** One row per continuation page, tagged with its parent key so a
    * single downstream join restores parent context.
    */
  val schema: StructType = StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("page_idx", IntegerType, nullable = false),
    StructField("json", StringType, nullable = false)))
}

/** DSv2 source that plans EVERY parent's child-page continuations as
  * partitions of one scan — `option("group", name)` names a
  * [[ContinuationGroups]] entry. This is what keeps nested
  * pagination O(1) in PLAN size: ten thousand parents with extra
  * child pages are ten thousand `(key, cursor, fetcher)` partitions
  * of a single BatchScan node, not ten thousand
  * filter+scan+crossJoin subtrees. The driver-side planning walk per
  * fetcher keeps only cursors (same control-plane currency as the
  * outer [[GraphQLScan]]); bodies are fetched by executors.
  */
class GraphQLContinuationProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ContinuationSource.schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new ContinuationTable(properties.get("group"))
}

private class ContinuationTable(group: String) extends Table with SupportsRead {
  override def name(): String = s"graphql_continuations($group)"
  override def schema(): StructType = ContinuationSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new ContinuationScan(group)
}

private object ContinuationScan {
  /** First-plan results, keyed by group. Spark builds a FRESH Scan
    * per action (each physical planning calls newScanBuilder), so an
    * instance-level lazy val caches nothing across actions — this
    * shared cache is what makes re-execution (a) not re-walk the
    * cursor chains and (b) not need the consumed registry entry.
    * Bounded like the registry; an entry holds only (key, cursor)
    * pairs + fetcher refs, the same control-plane currency.
    */
  /** Groups planned (registry entry consumed) whose cached partitions
    * were later LRU-evicted. A re-execution of such a DataFrame can
    * neither hit the cache nor re-walk cursors from the consumed
    * registry entry — the error must name the eviction, mirroring
    * `ContinuationGroups`' evicted-set message, instead of the bare
    * not-registered error an unconsumed group would get.
    */
  private val evicted =
    java.util.Collections.newSetFromMap(
      new java.util.LinkedHashMap[String, java.lang.Boolean](64, 0.75f, false) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, java.lang.Boolean]): Boolean =
          size() > ContinuationGroups.MaxGroups
      })
  private val planCache =
    new java.util.LinkedHashMap[String, Array[InputPartition]](64, 0.75f, false) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, Array[InputPartition]]): Boolean = {
        val evict = size() > ContinuationGroups.MaxGroups
        if (evict) evicted.add(e.getKey)
        evict
      }
    }
  def planOnce(group: String): Array[InputPartition] = planCache.synchronized {
    val hit = planCache.get(group)
    if (hit != null) hit
    else {
      // registry FIRST (r9 advice): a group re-registered under the
      // same name after its planned partitions were LRU-evicted is
      // freshly plannable — raising the evicted-specific error there
      // (which advises rebuilding, i.e. exactly what the caller just
      // did) would wedge the name forever. The consumed-and-evicted
      // story is only accurate when the registry ALSO has nothing.
      val entries =
        try ContinuationGroups(group)
        catch {
          case _: NoSuchElementException if evicted.contains(group) =>
            throw new NoSuchElementException(
              s"continuation group consumed and its planned partitions evicted: " +
                s"$group — >${ContinuationGroups.MaxGroups} groups planned after " +
                "it; re-execute (or persist) long-lived flattened DataFrames " +
                "before planning that many more groups, or rebuild this one " +
                "from its source")
        }
      val parts = entries.flatMap { case (key, fetcherName) =>
        val fetcher = PageFetchers(fetcherName)
        PagedGraphQL.fetchAllCursors(fetcher).zipWithIndex.map {
          case (after, i) => KeyedPagePartition(key, i, after, fetcher): InputPartition
        }
      }.toArray
      planCache.put(group, parts)
      evicted.remove(group)
      // consumed: the registry entry's job is done; the LRU there is
      // now a backstop for never-planned groups only
      ContinuationGroups.remove(group)
      parts
    }
  }
}

private class ContinuationScan(group: String) extends Scan with Batch {
  override def readSchema(): StructType = ContinuationSource.schema
  override def toBatch: Batch = this
  // per-instance lazy on top of the shared cache: planInputPartitions
  // runs more than once per execution (plan + exec) on one instance
  private lazy val planned: Array[InputPartition] = ContinuationScan.planOnce(group)
  override def planInputPartitions(): Array[InputPartition] = planned
  override def createReaderFactory(): PartitionReaderFactory = KeyedPageReaderFactory
}

final case class KeyedPagePartition(
    key: String, idx: Int, after: Option[String], fetcher: PageFetcher)
    extends InputPartition

object KeyedPageReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[KeyedPagePartition]
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = !emitted
      override def get(): InternalRow = {
        emitted = true
        InternalRow(
          UTF8String.fromString(p.key),
          p.idx,
          UTF8String.fromString(p.fetcher.fetch(p.after).json))
      }
      override def close(): Unit = ()
    }
  }
}

object PageReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[PagePartition]
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = !emitted
      override def get(): InternalRow = {
        emitted = true
        // executor-side single-page fetch: the only place a body
        // materializes is the task that parses it
        InternalRow(p.idx, UTF8String.fromString(p.fetcher.fetch(p.after).json))
      }
      override def close(): Unit = ()
    }
  }
}
