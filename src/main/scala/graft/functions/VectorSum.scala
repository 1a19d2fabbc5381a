package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._


/** Integer-exact vector arithmetic for distributed centroid updates
  * (k-means / SemDeDup, SURVEY.md §2 L). Floating-point summation is
  * order-dependent, so a groupBy-avg of float embeddings is NOT
  * reproducible across partitionings (or engines). Quantizing each
  * component to a fixed-point long first makes the per-dimension sum
  * an INTEGER sum — commutative, associative, partition-order
  * invariant, and bit-exactly replicable by a SQL oracle.
  */
object VecOps {

  /** floor(v_i · scale) per component — fixed-point quantization of a
    * float vector. Exact for |v| ≤ 1 and scale = 2^20: the product is
    * an exact double (float mantissa shifted by a power of two) and
    * floor is exact, so Spark and DuckDB agree bit-for-bit.
    */
  def quantize(vec: ArrayData, scale: Double): ArrayData = {
    val n = vec.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = math.floor(vec.getFloat(i).toDouble * scale).toLong
      i += 1
    }
    ArrayData.toArrayData(out)
  }
}

/** Fixed-point quantization of an array<float> to array<long>
  * (codegen, one static call per row). `bits` is the binary scale:
  * q_i = floor(v_i · 2^bits).
  */
case class QuantizeVec(child: Expression, bits: Int)
    extends UnaryExpression with ExpectsInputTypes {
  private val scale: Double = (1L << bits).toDouble
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    VecOps.quantize(v.asInstanceOf[ArrayData], scale)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VecOps.quantize($c, ${scale}D)")
  override protected def withNewChildInternal(c: Expression): QuantizeVec =
    copy(child = c)
}

/** Element-wise sum of array<long> columns as a custom
  * `TypedImperativeAggregate`: state is ONE long array of the vector
  * dimensionality (64 longs for the test embeddings) regardless of
  * group size, partial aggregation combines map-side, and merges are
  * plain integer vector addition — so a k-means centroid update over
  * a 100 TB corpus shuffles only (cells × partitions) partial-sum
  * rows, never the vectors themselves. Integer addition is fully
  * commutative: the result is independent of row order and
  * partitioning, which is what lets a SQL oracle hash-match it.
  *
  * All input arrays in a group must share one length; a mismatch
  * throws rather than silently truncating.
  */
case class VectorSumLong(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  private def addInto(acc: Array[Long], v: ArrayData): Array[Long] =
    if (acc.isEmpty) v.toLongArray()
    else {
      require(acc.length == v.numElements(),
        s"VectorSumLong: dimension mismatch ${acc.length} vs ${v.numElements()}")
      var i = 0
      while (i < acc.length) { acc(i) += v.getLong(i); i += 1 }
      acc
    }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buf else addInto(buf, v.asInstanceOf[ArrayData])
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else {
      require(a.length == b.length,
        s"VectorSumLong: dimension mismatch ${a.length} vs ${b.length}")
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

  override def eval(buf: Array[Long]): Any = ArrayData.toArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.length)
    bb.putInt(buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val out = new Array[Long](n)
    var i = 0
    while (i < n) { out(i) = bb.getLong; i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(offset: Int): VectorSumLong =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): VectorSumLong =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): VectorSumLong =
    copy(child = c.head)
}

object VectorSum {
  import org.apache.spark.sql.graftbridge.SqlBridge.{column, expression}

  /** Fixed-point quantize: array<float> → array<long>, q_i = floor(v_i·2^bits). */
  def quantizeVec(vec: Column, bits: Int = 20): Column =
    column(QuantizeVec(expression(vec), bits))

  /** Element-wise long-vector sum aggregate (bounded state, mergeable). */
  def vecSumLong(vec: Column): Column =
    column(VectorSumLong(expression(vec)).toAggregateExpression())
}
