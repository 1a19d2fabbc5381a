package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.catalyst.util.ArrayData

/** Custom Catalyst Expressions for the per-row hot loops Spark's
  * built-ins can't express (SURVEY.md §2 L/A/T). Each generates a
  * single static call into [[HashOps]] so it participates in
  * WholeStageCodegen (no UDF boxing/serialization, null handling via
  * the standard nullSafe scaffolding).
  */
case class SimHash64(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    HashOps.simhash64(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashOps.simhash64($c)")
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
}

case class RollingFingerprint(child: Expression, window: Int) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    HashOps.rollingMin(v.asInstanceOf[UTF8String], window)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashOps.rollingMin($c, $window)")
  override protected def withNewChildInternal(c: Expression): RollingFingerprint =
    copy(child = c)
}

case class MinHashSig(child: Expression, shingle: Int, perms: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    HashOps.minhashSig(v.asInstanceOf[UTF8String], shingle, perms)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashOps.minhashSig($c, $shingle, $perms)")
  override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
}

case class SigMatchFrac(left: Expression, right: Expression) extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    HashOps.sigMatchFrac(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.HashOps.sigMatchFrac($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SigMatchFrac =
    copy(left = l, right = r)
}

case class SrpBucket(child: Expression, planes: Int) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    HashOps.srpBucket(v.asInstanceOf[ArrayData], planes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashOps.srpBucket($c, $planes)")
  override protected def withNewChildInternal(c: Expression): SrpBucket = copy(child = c)
}

/** One-pass char stats `[n_chars, distinct_chars, Σc², n_printable]` —
  * the map-only replacement for a per-char explode + shuffle.
  */
/** Bucket index of a value against a per-row ascending boundary
  * array (count of boundaries strictly below the value, binary
  * search) — the placement step of two-phase exact percentiles.
  */
case class BucketIndex(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(DoubleType, ArrayType(DoubleType, containsNull = false))
  override def dataType: DataType = IntegerType
  override protected def nullSafeEval(v: Any, bs: Any): Any =
    HashOps.bucketIndex(v.asInstanceOf[Double],
      bs.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, bs) => s"graft.functions.HashOps.bucketIndex($v, $bs)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): BucketIndex = copy(left = l, right = r)
}

/** Marker-word hit count over word-character runs — the regex-free
  * equivalent of `size(regexp_extract_all(s, "\\b(w1|w2|…)\\b"))`.
  */
case class WordSetHits(child: Expression, markers: String)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    HashOps.wordSetHits(v.asInstanceOf[UTF8String], markers)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("markers", markers, "java.lang.String")
    defineCodeGen(ctx, ev, c => s"graft.functions.HashOps.wordSetHits($c, $ref)")
  }
  override protected def withNewChildInternal(c: Expression): WordSetHits = copy(child = c)
}

/** Exact char-n-gram set Jaccard of two strings — the verification
  * kernel that lets the candidate join shuffle raw text instead of
  * materialized gram arrays.
  */
case class NgramJaccardSim(left: Expression, right: Expression, n: Int)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    HashOps.ngramJaccardSim(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.HashOps.ngramJaccardSim($a, $b, $n)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): NgramJaccardSim = copy(left = l, right = r)
}

/** One-pass type/token stats `[n_tokens, n_types, n_hapax, Σc(c−1)]` —
  * replaces interpreted O(types×tokens) HOF lambdas.
  */
case class TypeTokenVec(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    HashOps.typeTokenVec(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashOps.typeTokenVec($c)")
  override protected def withNewChildInternal(c: Expression): TypeTokenVec = copy(child = c)
}

case class CharStatsVec(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    HashOps.charStatsVec(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashOps.charStatsVec($c)")
  override protected def withNewChildInternal(c: Expression): CharStatsVec = copy(child = c)
}

case class WordBigrams(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    HashOps.wordBigrams(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashOps.wordBigrams($c)")
  override protected def withNewChildInternal(c: Expression): WordBigrams = copy(child = c)
}

/** Occurrence-level word n-grams: all grams in token order, index =
  * position (no within-doc dedup, unlike [[WordNgrams]]).
  */
case class WordNgramsAll(child: Expression, n: Int) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    HashOps.wordNgramsAll(v.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashOps.wordNgramsAll($c, $n)")
  override protected def withNewChildInternal(c: Expression): WordNgramsAll = copy(child = c)
}

case class WordNgrams(child: Expression, n: Int) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    HashOps.wordNgrams(v.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashOps.wordNgrams($c, $n)")
  override protected def withNewChildInternal(c: Expression): WordNgrams = copy(child = c)
}

/** One greedy left-to-right BPE merge application over a symbol
  * array — the map-only inner step of distributed BPE training (the
  * pair to merge is a per-round constant, embedded as reference
  * objects so the kernel stays inside WholeStageCodegen).
  */
case class BpeMerge(child: Expression, a: String, b: String)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  private lazy val au = UTF8String.fromString(a)
  private lazy val bu = UTF8String.fromString(b)
  override protected def nullSafeEval(v: Any): Any =
    HashOps.bpeMergeApply(v.asInstanceOf[ArrayData], au, bu)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("bpeA", au, "org.apache.spark.unsafe.types.UTF8String")
    val bRef = ctx.addReferenceObj("bpeB", bu, "org.apache.spark.unsafe.types.UTF8String")
    defineCodeGen(ctx, ev, c => s"graft.functions.HashOps.bpeMergeApply($c, $aRef, $bRef)")
  }
  override protected def withNewChildInternal(c: Expression): BpeMerge = copy(child = c)
}

/** Probe-side segment candidate keys for the PassJoin-style fuzzy
  * join — one codegen'd call replacing a (2τ+1)²·(τ+1)-branch `when`
  * tree (see [[HashOps.segmentProbeKeys]]).
  */
case class SegmentProbeKeys(child: Expression, tau: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(new StructType()
    .add("L", IntegerType, nullable = false)
    .add("i", IntegerType, nullable = false)
    .add("seg", StringType, nullable = false), containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    HashOps.segmentProbeKeys(v.asInstanceOf[UTF8String], tau)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashOps.segmentProbeKeys($c, $tau)")
  override protected def withNewChildInternal(c: Expression): SegmentProbeKeys =
    copy(child = c)
}

case class CharNgrams(child: Expression, n: Int) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    HashOps.charNgrams(v.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashOps.charNgrams($c, $n)")
  override protected def withNewChildInternal(c: Expression): CharNgrams = copy(child = c)
}

/** Bucket-pair kernels: one static call per LSH bucket emitting the
  * qualifying pairs (see HashOps — avoids per-evaluation projection
  * regeneration that struct-building HOF lambdas trigger).
  */
case class MinhashBucketPairs(child: Expression, minEst: Double) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(new StructType()
    .add("doc_id", LongType).add("sig", ArrayType(LongType, containsNull = false))))
  override def dataType: DataType = ArrayType(new StructType()
    .add("id_a", LongType, nullable = false)
    .add("id_b", LongType, nullable = false)
    .add("jaccard_est", DoubleType, nullable = false), containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    HashOps.minhashPairs(v.asInstanceOf[ArrayData], minEst)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashOps.minhashPairs($c, $minEst)")
  override protected def withNewChildInternal(c: Expression): MinhashBucketPairs =
    copy(child = c)
}

case class SimhashBucketPairs(child: Expression, maxHam: Int) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(new StructType()
    .add("doc_id", LongType).add("sig", LongType)))
  override def dataType: DataType = ArrayType(new StructType()
    .add("id_a", LongType, nullable = false)
    .add("id_b", LongType, nullable = false)
    .add("hamming", LongType, nullable = false), containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    HashOps.simhashPairs(v.asInstanceOf[ArrayData], maxHam)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashOps.simhashPairs($c, $maxHam)")
  override protected def withNewChildInternal(c: Expression): SimhashBucketPairs =
    copy(child = c)
}

case class CosineBucketPairs(child: Expression, minCos: Double) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(new StructType()
    .add("vec_id", LongType).add("v", ArrayType(FloatType, containsNull = false))))
  override def dataType: DataType = ArrayType(new StructType()
    .add("id_a", LongType, nullable = false)
    .add("id_b", LongType, nullable = false)
    .add("cos", DoubleType, nullable = false), containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    HashOps.cosinePairs(v.asInstanceOf[ArrayData], minCos)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashOps.cosinePairs($c, $minCos)")
  override protected def withNewChildInternal(c: Expression): CosineBucketPairs =
    copy(child = c)
}

/** SplitMix64 finalizer of a long — the deterministic pseudo-random
  * order used for reproducible sampling (IVF centroid selection).
  */
/** FNV-1a 64 of a string's UTF-8 bytes (codegen, one static call). */
case class FnvText(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    HashOps.fnvText(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashOps.fnvText($c)")
  override protected def withNewChildInternal(c: Expression): FnvText = copy(child = c)
}

/** FNV-1a 64 of a binary payload (codegen) — the byte-level twin of
  * [[FnvText]] for multimodal columns.
  */
case class FnvBinary(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any = {
    val b = v.asInstanceOf[Array[Byte]]
    HashOps.fnv1a64(b, 0, b.length)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashOps.fnv1a64($c, 0, ($c).length)")
  override protected def withNewChildInternal(c: Expression): FnvBinary = copy(child = c)
}

case class Splitmix64(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    HashOps.splitmix64(v.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashOps.splitmix64($c)")
  override protected def withNewChildInternal(c: Expression): Splitmix64 = copy(child = c)
}

/** Map-only IVF cell assignment: nearest centroid (by [[HashOps
  * .cosine]], ties to larger cid — `max(struct(cos, cid))` semantics)
  * of a vector against a driver-materialized centroid set. The
  * centroid matrix rides along as a codegen reference object, so
  * corpus→cell assignment needs no join and no shuffle.
  */
case class NearestCentroid(child: Expression, cids: Array[Long], cents: Array[Array[Float]])
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    HashOps.nearestCentroid(v.asInstanceOf[ArrayData], cids, cents)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cidsRef = ctx.addReferenceObj("cids", cids, "long[]")
    val centsRef = ctx.addReferenceObj("cents", cents, "float[][]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashOps.nearestCentroid($c, $cidsRef, $centsRef)")
  }
  override protected def withNewChildInternal(c: Expression): NearestCentroid =
    copy(child = c)
}

/** Product-quantization encode against a driver-materialized codebook
  * (same eager-literal pattern as [[NearestCentroid]]): vector →
  * packed 4-bit codes, map-only.
  */
case class PqEncode(child: Expression, book: Array[Array[Float]], m: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    HashOps.pqEncode(v.asInstanceOf[ArrayData], book, m)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bookRef = ctx.addReferenceObj("book", book, "float[][]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashOps.pqEncode($c, $bookRef, $m)")
  }
  override protected def withNewChildInternal(c: Expression): PqEncode =
    copy(child = c)
}

/** ADC approximate dot of a query vector against packed PQ codes. */
case class PqAdc(left: Expression, right: Expression,
    book: Array[Array[Float]], m: Int)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(LongType, ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(code: Any, q: Any): Any =
    HashOps.pqAdc(code.asInstanceOf[Long], q.asInstanceOf[ArrayData], book, m)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bookRef = ctx.addReferenceObj("book", book, "float[][]")
    defineCodeGen(ctx, ev,
      (c, q) => s"graft.functions.HashOps.pqAdc($c, $q, $bookRef, $m)")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqAdc =
    copy(left = l, right = r)
}

case class CosineSim(left: Expression, right: Expression) extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    HashOps.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.HashOps.cosine($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
}

/** Column-level API for the custom expressions (Spark 4: Columns are
  * ColumnNode-backed; `ExpressionUtils` bridges to Catalyst).
  */
object F {
  import org.apache.spark.sql.graftbridge.SqlBridge.{column, expression}
  def simhash64(c: Column): Column = column(SimHash64(expression(c)))
  def charStatsVec(c: Column): Column = column(CharStatsVec(expression(c)))
  def typeTokenVec(c: Column): Column = column(TypeTokenVec(expression(c)))
  def ngramJaccardSim(a: Column, b: Column, n: Int): Column =
    column(NgramJaccardSim(expression(a), expression(b), n))
  def wordSetHits(c: Column, markers: String): Column =
    column(WordSetHits(expression(c), markers))
  def bucketIndex(v: Column, bounds: Column): Column =
    column(BucketIndex(expression(v), expression(bounds)))
  def rollingFingerprint(c: Column, window: Int = 16): Column =
    column(RollingFingerprint(expression(c), window))
  def minhashSig(c: Column, shingle: Int = 5, perms: Int = 64): Column =
    column(MinHashSig(expression(c), shingle, perms))
  def cosineSim(a: Column, b: Column): Column =
    column(CosineSim(expression(a), expression(b)))
  def splitmix64(c: Column): Column = column(Splitmix64(expression(c)))
  def fnvText(c: Column): Column = column(FnvText(expression(c)))
  def fnvBinary(c: Column): Column = column(FnvBinary(expression(c)))
  def sigMatchFrac(a: Column, b: Column): Column =
    column(SigMatchFrac(expression(a), expression(b)))
  def srpBucket(vec: Column, planes: Int): Column =
    column(SrpBucket(expression(vec), planes))
  def charNgrams(c: Column, n: Int): Column =
    column(CharNgrams(expression(c), n))
  def segmentProbeKeys(c: Column, tau: Int): Column =
    column(SegmentProbeKeys(expression(c), tau))
  def bpeMerge(c: Column, a: String, b: String): Column =
    column(BpeMerge(expression(c), a, b))
  def wordNgrams(c: Column, n: Int): Column =
    column(WordNgrams(expression(c), n))
  def wordNgramsAll(c: Column, n: Int): Column =
    column(WordNgramsAll(expression(c), n))
  def wordBigrams(c: Column): Column = column(WordBigrams(expression(c)))
  def minhashBucketPairs(items: Column, minEst: Double): Column =
    column(MinhashBucketPairs(expression(items), minEst))
  def simhashBucketPairs(items: Column, maxHam: Int): Column =
    column(SimhashBucketPairs(expression(items), maxHam))
  def cosineBucketPairs(items: Column, minCos: Double): Column =
    column(CosineBucketPairs(expression(items), minCos))
  def nearestCentroid(vec: Column, cids: Array[Long], cents: Array[Array[Float]]): Column =
    column(NearestCentroid(expression(vec), cids, cents))
  def pqEncode(vec: Column, book: Array[Array[Float]], m: Int): Column =
    column(PqEncode(expression(vec), book, m))
  def pqAdc(code: Column, q: Column, book: Array[Array[Float]], m: Int): Column =
    column(PqAdc(expression(code), expression(q), book, m))
}
