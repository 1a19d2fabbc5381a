package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.DataType

/** First non-null value of the group, as a `TypedImperativeAggregate`
  * so it runs under ObjectHashAggregateExec.
  *
  * Why this exists: Spark's built-in `first(...)` is a
  * DeclarativeAggregate whose buffer holds the value itself — a
  * VARIABLE-LENGTH buffer for strings/arrays, which HashAggregateExec
  * cannot host, so every `groupBy(k).agg(first(text))` silently
  * falls back to SortAggregate: the whole input is SORTED by the
  * grouping key on BOTH sides of the Exchange, with the text riding
  * every comparison. For the content-collapse pre-pass (group by an
  * 8-byte content hash, keep one text per class) that sort is pure
  * waste — group membership needs no order. This object-buffer
  * version hash-aggregates: map-side partials dedup duplicate mass
  * without any sort, and the buffer is one value per group.
  *
  * Determinism: which value is "first" depends on partitioning and
  * merge order, so this is `any_value` semantics — callers must
  * group by a key the aggregated value is a pure function of (the
  * collapse groups by xxhash64(text) and keeps text: every candidate
  * value in a group is identical, making the result deterministic
  * modulo 64-bit hash collisions, exactly like the built-in first
  * was used).
  *
  * Serialization (partial-agg spill / exchange): the single value is
  * wrapped in a 1-field UnsafeRow via UnsafeProjection — works for
  * any DataType without a per-type codec.
  */
case class FirstAny(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[AnyRef] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = child.dataType
  override def prettyName: String = "first_any"

  override def createAggregationBuffer(): AnyRef = null

  override def update(buf: AnyRef, input: InternalRow): AnyRef =
    if (buf != null) buf
    else {
      val v = child.eval(input)
      // copy: the evaluated value may reference the current row's
      // (reused) backing buffer
      if (v == null) null else InternalRow.copyValue(v).asInstanceOf[AnyRef]
    }

  override def merge(a: AnyRef, b: AnyRef): AnyRef = if (a != null) a else b

  override def eval(buf: AnyRef): Any = buf

  @transient private lazy val proj = UnsafeProjection.create(Array(dataType))

  override def serialize(buf: AnyRef): Array[Byte] =
    if (buf == null) Array.emptyByteArray
    else proj.apply(InternalRow(buf)).getBytes

  override def deserialize(bytes: Array[Byte]): AnyRef =
    if (bytes.isEmpty) null
    else {
      val r = new UnsafeRow(1)
      r.pointTo(bytes, bytes.length)
      InternalRow.copyValue(r.get(0, dataType)).asInstanceOf[AnyRef]
    }

  override def withNewMutableAggBufferOffset(offset: Int): FirstAny =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): FirstAny =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): FirstAny =
    copy(child = c.head)
}

object FirstAny {
  import org.apache.spark.sql.graftbridge.SqlBridge.{column, expression}

  /** Aggregate: any (the first seen) non-null value of the group —
    * hash-aggregated (no sort fallback). Only use when the value is a
    * pure function of the grouping key.
    */
  def firstAny(c: Column): Column =
    column(FirstAny(expression(c)).toAggregateExpression())
}
