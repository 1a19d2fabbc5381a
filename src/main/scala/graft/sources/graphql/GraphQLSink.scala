package graft.sources.graphql

import java.util
import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** GraphQL mutation sink — the reference's load phase (`weekly
  * alignments GQL API.py`: create-levels / create-groups / assign
  * mutations with batched list inputs, ref 38-42, 969-1160) as a
  * Spark DSv2 batch write.
  *
  * Shape at scale: every executor partition renders its rows into
  * `input: [...]` batches of `batchSize` and posts them through a
  * [[MutationSender]] — mutations fan out across the cluster, the
  * driver never materializes rows. Task retries can re-send a batch
  * (standard at-least-once sink semantics), so the target mutations
  * must be idempotent upserts — which the reference's create/assign
  * calls are.
  *
  * Usage:
  * {{{
  * df.write.format("graft.sources.graphql.GraphQLSinkProvider")
  *   .option("sender", name)         // registered MutationSender
  *   .option("mutation", "createHierarchyGroups")
  *   .option("batchSize", "256")
  *   .mode("append").save()
  * }}}
  */
trait MutationSender extends Serializable {
  def send(mutation: String): Unit
}

/** Named sender registry (DSv2 options are strings). */
object MutationSenders {
  private val registry = TrieMap.empty[String, MutationSender]
  def register(name: String, s: MutationSender): Unit = registry.put(name, s)
  def apply(name: String): MutationSender = registry(name)
  def get(name: String): Option[MutationSender] = registry.get(name)
}

/** In-memory capture for tests / local dry-runs: records every
  * mutation payload in arrival order (thread-safe).
  */
final class CapturingSender extends MutationSender {
  private val buf = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  override def send(mutation: String): Unit = buf.add(mutation)
  def captured: Seq[String] = buf.asScala.toSeq
}

class GraphQLSinkProvider extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    throw new IllegalArgumentException(
      "graphql sink is write-only; schema comes from the written frame")
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GraphQLSinkTable(
      schema,
      properties.get("sender"),
      Option(properties.get("mutation")).getOrElse("upsert"),
      Option(properties.get("batchSize")).map(_.toInt).getOrElse(256))
}

private class GraphQLSinkTable(
    writeSchema: StructType, sender: String, mutation: String, batchSize: Int)
    extends Table with SupportsWrite {
  override def name(): String = s"graphql_sink($sender)"
  override def schema(): StructType = writeSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_WRITE).asJava
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new MutationBatchWrite(info.schema(), sender, mutation, batchSize)
      }
    }
}

private class MutationBatchWrite(
    schema: StructType, sender: String, mutation: String, batchSize: Int)
    extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    // resolve the named sender HERE, on the driver, and ship the
    // Serializable instance inside the factory — executor JVMs never
    // saw the driver's register() call
    MutationWriterFactory(schema, sender, MutationSenders(sender), mutation, batchSize)
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

private final case class MutationWriterFactory(
    schema: StructType, senderName: String, shipped: MutationSender,
    mutation: String, batchSize: Int)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] = {
    // Task closures are serialized even in local mode, so `shipped`
    // is a COPY here. Prefer the registry's original when this JVM
    // has one (local mode — lets tests observe a stateful sender);
    // fall back to the shipped copy on real executors.
    val sender = MutationSenders.get(senderName).getOrElse(shipped)
    new MutationDataWriter(schema, sender, mutation, batchSize)
  }
}

/** Renders rows into `mutation { <name>(input: [{...}, …]) }` batches
  * and flushes every `batchSize` rows — mirroring the reference's
  * chunked list-input mutations.
  */
private final class MutationDataWriter(
    schema: StructType, sender: MutationSender, mutation: String, batchSize: Int)
    extends DataWriter[InternalRow] {

  private val batch = Vector.newBuilder[String]
  private var pending = 0

  private def renderValue(row: InternalRow, i: Int, dt: DataType): String = {
    if (row.isNullAt(i)) "null"
    else dt match {
      case StringType => "\"" + GraphQLFixtures.jsonEscape(row.getUTF8String(i).toString) + "\""
      case LongType => row.getLong(i).toString
      case IntegerType => row.getInt(i).toString
      case DoubleType => java.lang.Double.toString(row.getDouble(i))
      case FloatType => java.lang.Float.toString(row.getFloat(i))
      case BooleanType => row.getBoolean(i).toString
      case other => throw new IllegalArgumentException(
        s"graphql sink: unsupported field type $other")
    }
  }

  override def write(row: InternalRow): Unit = {
    val obj = schema.fields.zipWithIndex
      .map { case (f, i) => "\"" + f.name + "\": " + renderValue(row, i, f.dataType) }
      .mkString("{", ", ", "}")
    batch += obj
    pending += 1
    if (pending >= batchSize) flush()
  }

  private def flush(): Unit = {
    val items = batch.result()
    if (items.nonEmpty) {
      sender.send(s"""mutation { $mutation(input: ${items.mkString("[", ", ", "]")}) }""")
      batch.clear()
      pending = 0
    }
  }

  override def commit(): WriterCommitMessage = {
    flush()
    new WriterCommitMessage {}
  }
  override def abort(): Unit = ()
  override def close(): Unit = ()
}
