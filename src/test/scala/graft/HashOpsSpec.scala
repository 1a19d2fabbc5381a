package graft

import org.apache.spark.unsafe.types.UTF8String
import graft.functions.HashOps

class HashOpsSpec extends SparkSpec {

  private def u(s: String) = UTF8String.fromString(s)

  test("fnv1a64 matches the published test vector") {
    // FNV-1a("a") = 0xaf63dc4c8601ec8c (public reference vector)
    val b = "a".getBytes("UTF-8")
    assert(HashOps.fnv1a64(b, 0, 1) == 0xaf63dc4c8601ec8cL)
  }

  test("charStatsVec: hand-checked counts, incl. non-ASCII and astral chars") {
    // "aab c!" → 6 chars, 5 distinct (a,b,space,c,!), Σc² = 4+1+1+1+1 = 8,
    // all printable
    assert(HashOps.charStatsVec(u("aab c!")).toLongArray().toSeq ==
      Seq(6L, 5L, 8L, 6L))
    // astral plane: one 𝄞 (surrogate pair) counts as ONE code point,
    // not printable ASCII; é likewise non-printable-ASCII
    assert(HashOps.charStatsVec(u("x𝄞é")).toLongArray().toSeq ==
      Seq(3L, 3L, 3L, 1L))
    assert(HashOps.charStatsVec(u("")).toLongArray().toSeq ==
      Seq(0L, 0L, 0L, 0L))
  }

  test("wordSetHits equals \\b-bounded regex alternation counts on tricky inputs") {
    val markers = "the|and|of|to|in|is|that|for|with|as"
    val cases = Seq(
      "the cat and the dog", "them theand the-and", "to2 to_x to to",
      "", "   ", "of.of,of;of", "andandand and", "THE the The".toLowerCase)
    val re = ("\\b(" + markers + ")\\b").r
    cases.foreach { s =>
      val want = re.findAllIn(s).size.toLong
      assert(HashOps.wordSetHits(u(s), markers) == want, s"input '$s'")
    }
  }

  test("typeTokenVec: hand-checked token/type/hapax/simpson counts") {
    // "a b a  c" → tokens [a,b,a,c] (double space dropped): 4 tokens,
    // 3 types, 2 hapax (b, c), Σc(c−1) = 2·1 = 2
    assert(HashOps.typeTokenVec(u("a b a  c")).toLongArray().toSeq ==
      Seq(4L, 3L, 2L, 2L))
    assert(HashOps.typeTokenVec(u("x x x")).toLongArray().toSeq ==
      Seq(3L, 1L, 0L, 6L))
    assert(HashOps.typeTokenVec(u("   ")).toLongArray().toSeq ==
      Seq(0L, 0L, 0L, 0L))
  }

  test("simhash is deterministic and near for near texts") {
    val a = HashOps.simhash64(u("the quick brown fox jumps over the lazy dog"))
    val a2 = HashOps.simhash64(u("the quick brown fox jumps over the lazy dog"))
    val b = HashOps.simhash64(u("the quick brown fox jumps over the lazy dog today"))
    val far = HashOps.simhash64(u("zzz qqq entirely different words here xyzzy"))
    assert(a == a2)
    assert(java.lang.Long.bitCount(a ^ b) < java.lang.Long.bitCount(a ^ far))
  }

  test("minhash estimates jaccard roughly") {
    val s1 = "spark catalyst optimizer whole stage codegen shuffles partitions"
    val s2 = s1 + " suffix"
    val a = HashOps.minhashSig(u(s1), 5, 128).toLongArray()
    val b = HashOps.minhashSig(u(s2), 5, 128).toLongArray()
    val est = a.zip(b).count { case (x, y) => x == y }.toDouble / 128
    assert(est > 0.6, s"est=$est")
  }

  test("cosine on known vectors") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val a = new GenericArrayData(Array(1.0f, 0.0f))
    val b = new GenericArrayData(Array(0.0f, 1.0f))
    val c = new GenericArrayData(Array(2.0f, 0.0f))
    assert(math.abs(HashOps.cosine(a, b)) < 1e-12)
    assert(math.abs(HashOps.cosine(a, c) - 1.0) < 1e-12)
  }

  test("rolling fingerprint is deterministic and content-sensitive") {
    val a = HashOps.rollingMin(u("some document content for fingerprinting tests"), 16)
    val a2 = HashOps.rollingMin(u("some document content for fingerprinting tests"), 16)
    val b = HashOps.rollingMin(u("entirely other bytes"), 16)
    assert(a == a2)
    assert(a != b)
  }

  test("FirstAny: skips nulls, empty group is null, plans as ObjectHashAggregate") {
    import org.apache.spark.sql.functions._
    import graft.functions.FirstAny.firstAny
    import spark.implicits._
    val df = Seq(
      (1L, Option.empty[String]), (1L, Some("kept")), (1L, Some("later")),
      (2L, None), (2L, None),
      (3L, Some("solo"))).toDF("k", "v")
    val agg = df.groupBy($"k").agg(firstAny($"v").as("v"))
    val got = agg.as[(Long, Option[String])].collect().toMap
    // group 1: SOME non-null value of the group (any_value semantics —
    // the collapse callers group by a key the value is a function of,
    // where all candidates are equal; here we only pin non-nullness)
    assert(Set("kept", "later").contains(got(1L).get))
    assert(got(2L).isEmpty)        // all-null group -> null, no crash
    assert(got(3L).contains("solo"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), "not object-hash aggregated")
    assert(!plan.contains("SortAggregate"), "demoted to SortAggregate")
  }

  test("FirstAny: serialize/deserialize roundtrip (partial-agg spill path)") {
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
    import org.apache.spark.sql.types.StringType
    val fa = graft.functions.FirstAny(BoundReference(0, StringType, nullable = true))
    val buf = UTF8String.fromString("roundtrip ünïcode ✓")
    val bytes = fa.serialize(buf)
    assert(fa.deserialize(bytes) == buf)
    // null buffer <-> empty bytes
    assert(fa.serialize(null).isEmpty)
    assert(fa.deserialize(Array.emptyByteArray) == null)
    // array payloads roundtrip through the same UnsafeRow wrapping
    import org.apache.spark.sql.types.{ArrayType, LongType}
    import org.apache.spark.sql.catalyst.util.ArrayData
    val faArr = graft.functions.FirstAny(
      BoundReference(0, ArrayType(LongType, containsNull = false), nullable = true))
    val arr = ArrayData.toArrayData(Array(1L, -2L, Long.MaxValue))
    val got = faArr.deserialize(faArr.serialize(arr))
      .asInstanceOf[ArrayData].toLongArray.toSeq
    assert(got == Seq(1L, -2L, Long.MaxValue))
  }
}
