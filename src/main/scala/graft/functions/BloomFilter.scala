package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.types._

/** Bloom-filter runtime join pruning — the semi-join pattern that
  * matters at 100 TB: build a compact bit-set of the small side's
  * join keys (one aggregation, OR-mergeable across partials),
  * broadcast it, and discard non-matching probe rows AT THE SCAN
  * (map-only, before any shuffle). The exact join afterwards removes
  * the Bloom's false positives, so the result is identical to a
  * plain semi join — the filter only cuts the data volume that
  * reaches the shuffle (by ~selectivity, e.g. 99% for a 1% dim
  * filter). Spark's AQE applies the same idea automatically via
  * `spark.sql.optimizer.runtime.bloomFilter.enabled`; this explicit
  * operator makes the plan deterministic and engine-independent.
  *
  * Bit i of key x: `splitmix64(splitmix64(x) + i) >>> 1 mod m`.
  */
case class BloomAgg(
    child: Expression,
    mBits: Int,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with ImplicitCastInputTypes {

  require(mBits >= 64 && mBits % 64 == 0, "mBits must be a positive multiple of 64")
  require(k >= 1, "k >= 1")

  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](mBits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomOps.set(buf, v.asInstanceOf[Long], mBits, k)
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
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

  override def withNewMutableAggBufferOffset(offset: Int): BloomAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BloomAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): BloomAgg =
    copy(child = c.head)
}

/** Membership probe against a Bloom bit-word array (codegen). */
case class BloomMightContain(words: Expression, key: Expression, mBits: Int, k: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ImplicitCastInputTypes {
  override def left: Expression = words
  override def right: Expression = key
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType, containsNull = false), LongType)
  override def dataType: DataType = BooleanType
  override protected def nullSafeEval(w: Any, x: Any): Any =
    BloomOps.mightContain(w.asInstanceOf[ArrayData], x.asInstanceOf[Long], mBits, k)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, (w, x) =>
      s"graft.functions.BloomOps.mightContain($w, $x, $mBits, $k)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): BloomMightContain =
    copy(words = l, key = r)
}

object BloomOps {
  private def pos(key: Long, i: Int, mBits: Int): Int = {
    val h = HashOps.splitmix64(HashOps.splitmix64(key) + i)
    ((h >>> 1) % mBits).toInt
  }

  def set(words: Array[Long], key: Long, mBits: Int, k: Int): Unit = {
    var i = 0
    while (i < k) {
      val p = pos(key, i, mBits)
      words(p >>> 6) |= (1L << (p & 63))
      i += 1
    }
  }

  def mightContain(words: ArrayData, key: Long, mBits: Int, k: Int): Boolean = {
    var i = 0
    while (i < k) {
      val p = pos(key, i, mBits)
      if ((words.getLong(p >>> 6) & (1L << (p & 63))) == 0L) return false
      i += 1
    }
    true
  }

  import org.apache.spark.sql.graftbridge.SqlBridge.{column, expression}
  def bloomAgg(key: Column, mBits: Int = 1 << 16, k: Int = 4): Column =
    column(BloomAgg(expression(key), mBits, k).toAggregateExpression())
  def bloomMightContain(words: Column, key: Column, mBits: Int = 1 << 16, k: Int = 4): Column =
    column(BloomMightContain(expression(words), expression(key), mBits, k))

  /** Semi join with Bloom runtime pruning: result is EXACTLY
    * `big SEMI JOIN small ON bigKey = smallKey` — the Bloom probe
    * only pre-filters `big` map-side (false positives are removed by
    * the real join), so only ~matching rows reach the join's shuffle.
    *
    * The bit-set is aggregated EAGERLY (one job over `small`) and
    * embedded as a literal, exactly how Spark's own AQE runtime
    * bloom filter materializes at the driver: expressing the probe
    * as a broadcast cross join instead lets Catalyst reorder the
    * semi join BELOW the probe (measured — the full big side reached
    * the shuffle first), while a literal predicate is pinned to the
    * scan. Driver cost is mBits/8 bytes (8 KiB at the default).
    */
  def prunedSemiJoin(
      big: DataFrame, bigKey: Column,
      small: DataFrame, smallKey: Column,
      mBits: Int = 1 << 16, k: Int = 4): DataFrame = {
    val words: Array[Long] =
      small.agg(bloomAgg(smallKey, mBits, k)).head.getSeq[Long](0).toArray
    val pruned = big.filter(bloomMightContain(lit(words), bigKey, mBits, k))
    pruned.join(small, bigKey === smallKey, "left_semi")
  }
}
