package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch (Cormode & Muthukrishnan, J. Algorithms 2005) as
  * a custom Catalyst aggregate: `depth × width` long counters,
  * updated at `depth` hash positions per row, merged by elementwise
  * addition — the mergeable fixed-memory frequency summary a 100 TB
  * pipeline uses for heavy-hitter screening where an exact
  * per-key count would shuffle billions of distinct keys.
  *
  * Fully DETERMINISTIC (unlike sampling-based Misra-Gries merges):
  * the counter array is a pure function of the multiset of inputs, so
  * estimates are reproducible at any parallelism and a SQL oracle can
  * recompute them exactly. Hash row d of key s is
  * `splitmix64(fnv1a64(utf8(s)) + d) >>> 1 mod width`.
  *
  * The sketch guarantees est ≥ true and
  * est ≤ true + ε·N with prob 1−δ for width = ⌈e/ε⌉, depth = ⌈ln 1/δ⌉.
  */
case class CountMinAgg(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with ExpectsInputTypes {

  require(depth >= 1 && width >= 2, "CountMinAgg needs depth >= 1, width >= 2")

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = CountMinSketch.keyHash(v.asInstanceOf[UTF8String])
      var d = 0
      while (d < depth) {
        buf(d * width + CountMinSketch.bucket(h, d, width)) += 1L
        d += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong; i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(offset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CountMinAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): CountMinAgg =
    copy(child = c.head)
}

/** Point-estimate lookup against a CMS counter array: min over the
  * depth rows of the key's counter (codegen, no per-row allocation).
  */
case class CountMinEstimate(sketch: Expression, key: Expression, depth: Int, width: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ExpectsInputTypes {
  override def left: Expression = sketch
  override def right: Expression = key
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType, containsNull = false), StringType)
  override def dataType: DataType = LongType
  override protected def nullSafeEval(sk: Any, k: Any): Any =
    CountMinSketch.estimate(
      sk.asInstanceOf[ArrayData], k.asInstanceOf[UTF8String], depth, width)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, (sk, k) =>
      s"graft.functions.CountMinSketch.estimate($sk, $k, $depth, $width)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CountMinEstimate =
    copy(sketch = l, key = r)
}

object CountMinSketch {
  def keyHash(s: UTF8String): Long = {
    val b = s.getBytes
    HashOps.fnv1a64(b, 0, b.length)
  }

  def bucket(keyHash: Long, d: Int, width: Int): Int =
    ((HashOps.splitmix64(keyHash + d) >>> 1) % width).toInt

  def estimate(sketch: ArrayData, key: UTF8String, depth: Int, width: Int): Long = {
    val h = keyHash(key)
    var m = Long.MaxValue
    var d = 0
    while (d < depth) {
      val c = sketch.getLong(d * width + bucket(h, d, width))
      if (c < m) m = c
      d += 1
    }
    m
  }

  import org.apache.spark.sql.graftbridge.SqlBridge.{column, expression}
  def cmsAgg(key: Column, depth: Int = 4, width: Int = 256): Column =
    column(CountMinAgg(expression(key), depth, width).toAggregateExpression())
  def cmsEstimate(sketch: Column, key: Column, depth: Int = 4, width: Int = 256): Column =
    column(CountMinEstimate(expression(sketch), expression(key), depth, width))
}
