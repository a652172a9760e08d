package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._
import graft.core.Embeddings

/** Kernel property tests mirroring the reference's exhaustive tables for
  * get_top_k / chunking / magnitude (tests/test_util.py:142-507,
  * tests/test_embeddings.py).
  */
class KernelSpec extends SparkSpec {

  private def checkProp(p: Prop, minSuccessful: Int = 30): Unit = {
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(minSuccessful)
    val res = SCTest.check(params, p)
    assert(res.passed, res.status.toString)
  }

  test("top-k semantics: descending score, larger-id-first ties, clamped k") {
    import spark.implicits._
    val scores = Seq(0.4, 0.8, 0.2, 0.8) // ids 0..3, tie on 0.8
    val df = scores.zipWithIndex
      .map { case (s, i) => (i.toLong, s) }.toDF("id", "score")
    def topk(k: Int) = df.orderBy(desc("score"), desc("id")).limit(k)
      .select($"id").as[Long].collect().toSeq
    assert(topk(1) == Seq(3L)) // tie → larger id first
    assert(topk(4) == Seq(3L, 1L, 0L, 2L))
    assert(topk(10) == Seq(3L, 1L, 0L, 2L)) // k > n clamps
    assert(topk(0) == Seq.empty)
  }

  test("dot product property: matches local computation") {
    import spark.implicits._
    val gen = Gen.listOfN(8, Gen.choose(-1.0, 1.0))
    checkProp(forAll(gen, gen) { (a: List[Double], b: List[Double]) =>
      val expected = a.zip(b).map { case (x, y) => x * y }.sum
      val got = Seq((a.toArray, b.toArray)).toDF("a", "b")
        .select(dot(col("a"), col("b"))).head().getDouble(0)
      math.abs(expected - got) < 1e-9
    }, minSuccessful = 10)
  }

  test("magnitude check: accepts unit, rejects out-of-tolerance") {
    Embeddings.checkMagnitude(Seq(Array(1.0f, 0.001f, 0.0f))) // ok
    Embeddings.checkMagnitude(Seq(Array(0.707f, 0.707f, 0.0f))) // ok
    intercept[IllegalArgumentException] {
      Embeddings.checkMagnitude(Seq(Array(1.0f, 0.1f, 0.0f)))
    }
    intercept[IllegalArgumentException] {
      Embeddings.checkMagnitude(Seq(Array(0.99f, 0.0f, 0.0f)))
    }
  }

  test("chunked embedding batches (chunkify semantics, util.py:236-240)") {
    val p = Embeddings.MockProvider(4)
    // grouped(n) covers the exhaustive remainder table
    assert((1 to 7).grouped(3).map(_.size).toSeq == Seq(3, 3, 1))
    assert(Seq.empty[Int].grouped(3).toSeq == Seq.empty)
    val vecs = p.embed(Seq("a", "b"))
    assert(vecs.forall(v => v.length == 4 && v(0) == 1.0f && v(1) == 0.0f))
  }

  test("normalize yields unit vectors for any nonzero input") {
    import spark.implicits._
    val gen = Gen.listOfN(6, Gen.choose(-10.0, 10.0))
      .suchThat(l => l.exists(math.abs(_) > 0.1))
    checkProp(forAll(gen) { (a: List[Double]) =>
      val n = Seq(Tuple1(a.toArray)).toDF("a")
        .select(l2Norm(normalize(col("a")))).head().getDouble(0)
      math.abs(n - 1.0) < 1e-9
    }, minSuccessful = 10)
  }

  test("FloatVecDot: pack/unpack round-trip and codegen dot correctness") {
    import spark.implicits._
    import graft.functions.FloatVecDot
    val a = Array(1.0f, 3.5f, -2.25f, 0.5f)
    val b = Array(0.5f, -1.0f, 2.0f, 4.0f)
    assert(FloatVecDot.unpack(FloatVecDot.pack(a)).sameElements(a))
    assert(FloatVecDot.pack(Array(1.0f)).sameElements(
      Array[Byte](0x00, 0x00, 0x80.toByte, 0x3f))) // 1.0 LE (FIXTURES §6)
    assert(FloatVecDot.pack(Array.empty[Float]).isEmpty)
    val expected = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val got = Seq((FloatVecDot.pack(a), FloatVecDot.pack(b))).toDF("a", "b")
      .select(FloatVecDot.floatVecDot(col("a"), col("b"))).head().getDouble(0)
    assert(math.abs(got - expected) < 1e-9)
    // interpreted eval path agrees with codegen
    assert(math.abs(FloatVecDot.dot(FloatVecDot.pack(a), FloatVecDot.pack(b))
      - expected) < 1e-9)
  }

  test("VecKernels: simd and scalar agree; dot == dotPacked bit-for-bit") {
    import graft.functions.{FloatVecDot, VecKernels}
    val rnd = new scala.util.Random(11)
    // the forked test JVM adds the incubator module, so simd must be on
    assert(VecKernels.simdEnabled,
      "Panama module missing from the test JVM — build.sbt javaOptions regressed")
    // odd lengths exercise the remainder vector-loop and the scalar tail
    for (d <- Seq(0, 1, 3, 15, 16, 17, 31, 33, 100, 1536, 1543)) {
      val a = Array.fill(d)(rnd.nextFloat() * 2 - 1)
      val b = Array.fill(d)(rnd.nextFloat() * 2 - 1)
      val pa = FloatVecDot.pack(a)
      val pb = FloatVecDot.pack(b)
      val seq = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val viaBytes = VecKernels.dot(pa, pb)
      val viaPacked = VecKernels.dotPacked(pa, b)
      val scalar = VecKernels.dotScalar(pa, pb)
      val scalarPacked = VecKernels.dotPackedScalar(pa, b)
      // bytes×bytes, bytes×floats, and floats×floats are bit-identical
      // within each impl (same lane scheme)
      assert(viaBytes == viaPacked, s"simd lane scheme mismatch at d=$d")
      assert(viaBytes == VecKernels.dotFloats(a, b) || !VecKernels.simdEnabled,
        s"dotFloats lane scheme mismatch at d=$d")
      assert(scalar == scalarPacked, s"scalar scheme mismatch at d=$d")
      assert(scalar == VecKernels.dotFloatsScalar(a, b),
        s"scalar dotFloats mismatch at d=$d")
      // and both stay within reordering distance of the sequential sum
      assert(math.abs(viaBytes - seq) < 1e-9, s"simd drift at d=$d")
      assert(math.abs(scalar - seq) < 1e-9, s"scalar drift at d=$d")
      // offset form: row 1 of a two-row matrix [b | a], scored vs b,
      // is the same pair — must match the bytes×bytes kernel exactly
      assert(VecKernels.dotPackedAt(pb ++ pa, pb.length, b) == viaBytes,
        s"dotPackedAt offset mismatch at d=$d")
    }
    // mixed f64×f32 projection kernel: drift-bounded vs sequential,
    // offset form addresses the right row
    for (d <- Seq(0, 1, 15, 16, 17, 1536)) {
      val hp = Array.fill(2 * d)(rnd.nextGaussian())
      val v = Array.fill(d)(rnd.nextFloat() * 2 - 1)
      val seqRow1 = (0 until d).map(i => hp(d + i) * v(i).toDouble).sum
      assert(math.abs(VecKernels.dotDoubleFloatAt(hp, d, v) - seqRow1) < 1e-9,
        s"dotDoubleFloatAt drift at d=$d")
      assert(VecKernels.dotDoubleFloatAtScalar(hp, d, v) == seqRow1 ||
        math.abs(VecKernels.dotDoubleFloatAtScalar(hp, d, v) - seqRow1) < 1e-12,
        s"scalar dotDoubleFloatAt drift at d=$d")
    }
    // truncate-to-shorter semantics (both args, both impls)
    val x = FloatVecDot.pack(Array(1f, 2f, 3f))
    val y = FloatVecDot.pack(Array(4f, 5f))
    assert(VecKernels.dot(x, y) == 14.0 && VecKernels.dot(y, x) == 14.0)
    assert(VecKernels.dotScalar(x, y) == 14.0)
    assert(VecKernels.dotPacked(x, Array(4f, 5f)) == 14.0)
  }

  test("SortedOverlapCount: merge count equals array_intersect size") {
    import spark.implicits._
    import graft.functions.SortedOverlapCount.sortedOverlapCount
    import org.scalacheck.Gen
    import org.scalacheck.Prop.forAll
    val gen = Gen.listOf(Gen.oneOf("a", "b", "c", "dd", "e f", "", "zz"))
    checkProp(forAll(gen, gen) { (x: List[String], y: List[String]) =>
      val row = Seq((x.distinct.sorted.toArray, y.distinct.sorted.toArray))
        .toDF("a", "b")
        .select(
          sortedOverlapCount(col("a"), col("b")).as("m"),
          size(array_intersect(col("a"), col("b"))).as("ref"))
        .head()
      row.getInt(0) == row.getInt(1)
    }, minSuccessful = 30)
  }
}
