package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** K-minimum-values distinct-count sketch as a custom Catalyst
  * aggregate (`TypedImperativeAggregate`) — the bounded-memory
  * `approx_count_distinct` shape a 100 TB pipeline needs, but fully
  * DETERMINISTIC and engine-independent: the estimate is a pure
  * function of the k smallest SplitMix64 hashes of the distinct
  * values, so a SQL oracle can recompute it exactly (unlike HLL
  * whose register layout is implementation-defined).
  *
  * State is at most k longs per group (vs collect_set's unbounded
  * set); partial aggregation merges are a bounded set-union. The
  * estimator is the classic KMV/bottom-k: with u(k) the k-th smallest
  * hash mapped to [0, 2^64), est = (k-1) · 2^64 / u(k)
  * (Bar-Yossef et al., RANDOM 2002). Exact when fewer than k distinct
  * values were seen.
  */
/** Shared bottom-k buffer mechanics for the KMV aggregates: biased
  * SplitMix64 hashing, k-bounded TreeSet update/merge, and the
  * length-prefixed serialization.
  */
trait KmvAggregate
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
    with ImplicitCastInputTypes {

  def child: Expression
  def k: Int

  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  /** Biased hash: SplitMix64 shifted into signed range so natural
    * Long ordering equals unsigned hash ordering (wraparound add).
    */
  protected def biasedHash(v: Long): Long =
    HashOps.splitmix64(v) + Long.MinValue

  override def update(
      buf: java.util.TreeSet[java.lang.Long], input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      buf.add(biasedHash(v.asInstanceOf[Long]))
      if (buf.size > k) buf.pollLast()
    }
    buf
  }

  override def merge(
      a: java.util.TreeSet[java.lang.Long],
      b: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    a.addAll(b)
    while (a.size > k) a.pollLast()
    a
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    buf.forEach(v => bb.putLong(v))
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val s = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { s.add(bb.getLong); i += 1 }
    s
  }
}

case class KMinValues(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends KmvAggregate {

  require(k >= 2, "KMinValues needs k >= 2")

  override def dataType: DataType = DoubleType

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    if (buf.size < k) buf.size.toDouble
    else {
      // u(k) in [0, 2^64): un-bias by adding 2^63 in double space —
      // the SQL oracle performs the IDENTICAL double ops
      val kth = buf.last().longValue()
      ((k - 1).toDouble * 1.8446744073709552E19) /
        (kth.toDouble + 9.223372036854776E18)
    }

  override def withNewMutableAggBufferOffset(offset: Int): KMinValues =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KMinValues =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): KMinValues =
    copy(child = c.head)
}

/** The sketch ITSELF (ascending biased-hash array) instead of the
  * point estimate — the mergeable summary that enables distributed
  * set algebra: bottom-k sets of two cohorts union by merge+truncate,
  * estimate |A∪B| from the merged k-th hash, and estimate Jaccard /
  * |A∩B| from the fraction of merged-sketch members present in both
  * (Bar-Yossef et al., RANDOM 2002; Beyer et al., SIGMOD 2007). Two
  * 100 TB cohorts compare through 2·k longs.
  */
case class KMinValuesSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends KmvAggregate {

  require(k >= 2, "KMinValuesSketch needs k >= 2")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Long](buf.size)
    var i = 0
    val it = buf.iterator() // TreeSet iterates ascending
    while (it.hasNext) { arr(i) = it.next().longValue(); i += 1 }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(arr)
  }

  override def withNewMutableAggBufferOffset(offset: Int): KMinValuesSketch =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KMinValuesSketch =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): KMinValuesSketch =
    copy(child = c.head)
}

object KMinValues {
  import org.apache.spark.sql.graftbridge.SqlBridge.{column, expression}
  import org.apache.spark.sql.functions._

  def kmvDistinct(c: Column, k: Int = 64): Column =
    column(KMinValues(expression(c), k).toAggregateExpression())
  def kmvSketch(c: Column, k: Int = 64): Column =
    column(KMinValuesSketch(expression(c), k).toAggregateExpression())

  /** Merge a collected list of sketch arrays: union + truncate. The
    * bottom-k of a union IS the bottom-k of the union of bottom-k's,
    * so merged sketches are exactly the sketch of the merged data.
    */
  def mergeSketches(sketchList: Column, k: Int): Column =
    slice(array_sort(array_distinct(flatten(sketchList))), 1, k)

  /** The KMV estimate from a sketch array — IDENTICAL double ops to
    * [[KMinValues.eval]] (and to the SQL oracle): exact size below
    * k, else (k−1)·2^64 / u(k).
    */
  def estimateFromSketch(sketch: Column, k: Int): Column =
    when(size(sketch) < k, size(sketch).cast("double"))
      .otherwise(lit((k - 1).toDouble * 1.8446744073709552E19) /
        (element_at(sketch, k).cast("double") + lit(9.223372036854776E18)))
}
