package graft.functions

import java.lang.invoke.MethodHandles
import java.nio.ByteOrder

/** The packed-f32 dot-product kernels every vector hot path scores
  * through ([[FloatVecDot]]'s codegen, the blocked knn-join kernels,
  * the IVF/PQ rerank paths).
  *
  * Two implementations, chosen once at classload:
  *
  *   - SIMD (Panama `jdk.incubator.vector`, present when the JVM runs
  *     with `--add-modules=jdk.incubator.vector` — build.sbt adds it):
  *     f32 lanes loaded straight from the little-endian blob, widened
  *     to f64, FMA'd into four independent accumulator chains.
  *     ~6 GFLOP/s/core at d=1536 on AVX-512 — ~6× the scalar loop.
  *   - Scalar fallback: VarHandle little-endian int loads (Scala 2.13
  *     compiles signature-polymorphic calls natively — ~2.8× the
  *     byte-assembly loop), sequential ascending accumulation.
  *
  * Accumulation is ALWAYS in f64. The SIMD path sums in lane-strided
  * order, the scalar path ascending — divergence between them is
  * ~1e-15 for unit vectors, far below the 6-dp rounding every
  * score-comparing surface applies (the DuckDB oracle independently
  * sums in its own order, so cross-engine comparisons already rely on
  * that rounding). Within one JVM the choice is fixed, and the
  * bytes×bytes and bytes×floats forms use the SAME lane scheme, so
  * kernels are bit-identical to each other wherever both appear.
  */
object VecKernels {

  private val INT_LE = MethodHandles.byteArrayViewVarHandle(
    classOf[Array[Int]], ByteOrder.LITTLE_ENDIAN)

  @inline private def f32(x: Array[Byte], i: Int): Float =
    java.lang.Float.intBitsToFloat(INT_LE.get(x, i): Int)

  /** True when the Panama vector module is loadable and functional in
    * this JVM (probed once; any linkage/availability failure falls
    * back to scalar for the process lifetime).
    */
  val simdEnabled: Boolean =
    try { VecSimd.selfTest(); true }
    catch { case _: Throwable => false }

  /** f32 dot of two packed little-endian blobs, f64 accumulate.
    * Truncates to the shorter vector (whole floats only).
    */
  def dot(a: Array[Byte], b: Array[Byte]): Double =
    if (simdEnabled) VecSimd.dot(a, b) else dotScalar(a, b)

  /** f32 dot of a packed blob against a pre-decoded float array —
    * value-identical to [[dot]] on the packed form of `q` (same f32
    * values, same lane scheme, same accumulation order).
    */
  def dotPacked(a: Array[Byte], q: Array[Float]): Double =
    if (simdEnabled) VecSimd.dotPacked(a, q) else dotPackedScalar(a, q)

  /** f32 dot of two decoded float arrays — same lane scheme as [[dot]]
    * on their packed forms. Truncates to the shorter array.
    */
  def dotFloats(a: Array[Float], b: Array[Float]): Double =
    if (simdEnabled) VecSimd.dotFloats(a, b) else dotFloatsScalar(a, b)

  /** f32 dot of `q` against the packed vector starting at byte offset
    * `off` in `a` (block-contiguous matrix scan shape). Reads exactly
    * `q.length` floats — caller guarantees they're in bounds.
    */
  def dotPackedAt(a: Array[Byte], off: Int, q: Array[Float]): Double =
    if (simdEnabled) VecSimd.dotPackedAt(a, off, q)
    else dotPackedAtScalar(a, off, q)

  /** f32 dot of `len` floats at offsets `ao`/`bo` of two float arrays
    * (strided matrix-block shape) — same lane scheme as the rest.
    * Caller guarantees bounds.
    */
  def dotFloatsAt(a: Array[Float], ao: Int, b: Array[Float], bo: Int,
      len: Int): Double =
    if (simdEnabled) VecSimd.dotFloatsAt(a, ao, b, bo, len)
    else dotFloatsAtScalar(a, ao, b, bo, len)

  /** f64 × f32 dot: `v.length` doubles starting at `off` in `hp`
    * against the float vector `v` (the sign-sketch hyperplane
    * projection shape). Sign-consumers only — the lane-strided sum
    * matches the other kernels' contract. Caller guarantees bounds.
    */
  def dotDoubleFloatAt(hp: Array[Double], off: Int, v: Array[Float]): Double =
    if (simdEnabled) VecSimd.dotDoubleFloatAt(hp, off, v)
    else dotDoubleFloatAtScalar(hp, off, v)

  private[graft] def dotScalar(a: Array[Byte], b: Array[Byte]): Double = {
    val n = math.min(a.length, b.length) & ~3
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += f32(a, i).toDouble * f32(b, i).toDouble
      i += 4
    }
    acc
  }

  private[graft] def dotPackedScalar(a: Array[Byte], q: Array[Float]): Double = {
    val n = math.min(a.length & ~3, q.length * 4)
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += f32(a, i).toDouble * q(i >> 2).toDouble
      i += 4
    }
    acc
  }

  private[graft] def dotFloatsScalar(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
    acc
  }

  private[graft] def dotPackedAtScalar(a: Array[Byte], off: Int, q: Array[Float]): Double = {
    var acc = 0.0
    var i = 0
    while (i < q.length) {
      acc += f32(a, off + i * 4).toDouble * q(i).toDouble
      i += 1
    }
    acc
  }

  private[graft] def dotFloatsAtScalar(a: Array[Float], ao: Int,
      b: Array[Float], bo: Int, len: Int): Double = {
    var acc = 0.0
    var i = 0
    while (i < len) { acc += a(ao + i).toDouble * b(bo + i).toDouble; i += 1 }
    acc
  }

  private[graft] def dotDoubleFloatAtScalar(hp: Array[Double], off: Int,
      v: Array[Float]): Double = {
    var acc = 0.0
    var i = 0
    while (i < v.length) { acc += hp(off + i) * v(i); i += 1 }
    acc
  }
}

/** Panama implementation — isolated in its own object so that loading
  * [[VecKernels]] on a JVM without the incubator module never touches
  * these classes except inside the guarded probe.
  */
private[functions] object VecSimd {
  import jdk.incubator.vector.{DoubleVector, FloatVector, VectorOperators, VectorSpecies}

  private val FSP: VectorSpecies[java.lang.Float] = FloatVector.SPECIES_PREFERRED
  private val DSP: VectorSpecies[java.lang.Double] = DoubleVector.SPECIES_PREFERRED
  private val BO = ByteOrder.LITTLE_ENDIAN

  private val INT_LE = MethodHandles.byteArrayViewVarHandle(
    classOf[Array[Int]], ByteOrder.LITTLE_ENDIAN)

  @inline private def f32(x: Array[Byte], i: Int): Float =
    java.lang.Float.intBitsToFloat(INT_LE.get(x, i): Int)

  def selfTest(): Unit = {
    val a = FloatVecDot.pack(Array(1f, 2f, 3f))
    require(math.abs(dot(a, a) - 14.0) < 1e-9, "VecSimd self-test failed")
  }

  def dot(a: Array[Byte], b: Array[Byte]): Double = {
    val n = math.min(a.length, b.length) & ~3
    var acc0 = DoubleVector.zero(DSP)
    var acc1 = DoubleVector.zero(DSP)
    var acc2 = DoubleVector.zero(DSP)
    var acc3 = DoubleVector.zero(DSP)
    var i = 0
    val step = FSP.vectorByteSize()
    while (i + 2 * step <= n) {
      val va = FloatVector.fromByteArray(FSP, a, i, BO)
      val vb = FloatVector.fromByteArray(FSP, b, i, BO)
      val vc = FloatVector.fromByteArray(FSP, a, i + step, BO)
      val vd = FloatVector.fromByteArray(FSP, b, i + step, BO)
      acc0 = va.convert(VectorOperators.F2D, 0).asInstanceOf[DoubleVector]
        .fma(vb.convert(VectorOperators.F2D, 0).asInstanceOf[DoubleVector], acc0)
      acc1 = va.convert(VectorOperators.F2D, 1).asInstanceOf[DoubleVector]
        .fma(vb.convert(VectorOperators.F2D, 1).asInstanceOf[DoubleVector], acc1)
      acc2 = vc.convert(VectorOperators.F2D, 0).asInstanceOf[DoubleVector]
        .fma(vd.convert(VectorOperators.F2D, 0).asInstanceOf[DoubleVector], acc2)
      acc3 = vc.convert(VectorOperators.F2D, 1).asInstanceOf[DoubleVector]
        .fma(vd.convert(VectorOperators.F2D, 1).asInstanceOf[DoubleVector], acc3)
      i += 2 * step
    }
    while (i + step <= n) {
      val va = FloatVector.fromByteArray(FSP, a, i, BO)
      val vb = FloatVector.fromByteArray(FSP, b, i, BO)
      acc0 = va.convert(VectorOperators.F2D, 0).asInstanceOf[DoubleVector]
        .fma(vb.convert(VectorOperators.F2D, 0).asInstanceOf[DoubleVector], acc0)
      acc1 = va.convert(VectorOperators.F2D, 1).asInstanceOf[DoubleVector]
        .fma(vb.convert(VectorOperators.F2D, 1).asInstanceOf[DoubleVector], acc1)
      i += step
    }
    var tail = 0.0
    while (i < n) {
      tail += f32(a, i).toDouble * f32(b, i).toDouble
      i += 4
    }
    acc0.add(acc1).add(acc2.add(acc3)).reduceLanes(VectorOperators.ADD) + tail
  }

  def dotPacked(a: Array[Byte], q: Array[Float]): Double = {
    val n = math.min(a.length & ~3, q.length * 4)
    var acc0 = DoubleVector.zero(DSP)
    var acc1 = DoubleVector.zero(DSP)
    var acc2 = DoubleVector.zero(DSP)
    var acc3 = DoubleVector.zero(DSP)
    var i = 0
    val step = FSP.vectorByteSize()
    val lanes = FSP.length()
    while (i + 2 * step <= n) {
      val va = FloatVector.fromByteArray(FSP, a, i, BO)
      val vb = FloatVector.fromArray(FSP, q, i >> 2)
      val vc = FloatVector.fromByteArray(FSP, a, i + step, BO)
      val vd = FloatVector.fromArray(FSP, q, (i >> 2) + lanes)
      acc0 = va.convert(VectorOperators.F2D, 0).asInstanceOf[DoubleVector]
        .fma(vb.convert(VectorOperators.F2D, 0).asInstanceOf[DoubleVector], acc0)
      acc1 = va.convert(VectorOperators.F2D, 1).asInstanceOf[DoubleVector]
        .fma(vb.convert(VectorOperators.F2D, 1).asInstanceOf[DoubleVector], acc1)
      acc2 = vc.convert(VectorOperators.F2D, 0).asInstanceOf[DoubleVector]
        .fma(vd.convert(VectorOperators.F2D, 0).asInstanceOf[DoubleVector], acc2)
      acc3 = vc.convert(VectorOperators.F2D, 1).asInstanceOf[DoubleVector]
        .fma(vd.convert(VectorOperators.F2D, 1).asInstanceOf[DoubleVector], acc3)
      i += 2 * step
    }
    while (i + step <= n) {
      val va = FloatVector.fromByteArray(FSP, a, i, BO)
      val vb = FloatVector.fromArray(FSP, q, i >> 2)
      acc0 = va.convert(VectorOperators.F2D, 0).asInstanceOf[DoubleVector]
        .fma(vb.convert(VectorOperators.F2D, 0).asInstanceOf[DoubleVector], acc0)
      acc1 = va.convert(VectorOperators.F2D, 1).asInstanceOf[DoubleVector]
        .fma(vb.convert(VectorOperators.F2D, 1).asInstanceOf[DoubleVector], acc1)
      i += step
    }
    var tail = 0.0
    while (i < n) {
      tail += f32(a, i).toDouble * q(i >> 2).toDouble
      i += 4
    }
    acc0.add(acc1).add(acc2.add(acc3)).reduceLanes(VectorOperators.ADD) + tail
  }

  def dotFloats(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var acc0 = DoubleVector.zero(DSP)
    var acc1 = DoubleVector.zero(DSP)
    var acc2 = DoubleVector.zero(DSP)
    var acc3 = DoubleVector.zero(DSP)
    var j = 0
    val lanes = FSP.length()
    while (j + 2 * lanes <= n) {
      val va = FloatVector.fromArray(FSP, a, j)
      val vb = FloatVector.fromArray(FSP, b, j)
      val vc = FloatVector.fromArray(FSP, a, j + lanes)
      val vd = FloatVector.fromArray(FSP, b, j + lanes)
      acc0 = va.convert(VectorOperators.F2D, 0).asInstanceOf[DoubleVector]
        .fma(vb.convert(VectorOperators.F2D, 0).asInstanceOf[DoubleVector], acc0)
      acc1 = va.convert(VectorOperators.F2D, 1).asInstanceOf[DoubleVector]
        .fma(vb.convert(VectorOperators.F2D, 1).asInstanceOf[DoubleVector], acc1)
      acc2 = vc.convert(VectorOperators.F2D, 0).asInstanceOf[DoubleVector]
        .fma(vd.convert(VectorOperators.F2D, 0).asInstanceOf[DoubleVector], acc2)
      acc3 = vc.convert(VectorOperators.F2D, 1).asInstanceOf[DoubleVector]
        .fma(vd.convert(VectorOperators.F2D, 1).asInstanceOf[DoubleVector], acc3)
      j += 2 * lanes
    }
    while (j + lanes <= n) {
      val va = FloatVector.fromArray(FSP, a, j)
      val vb = FloatVector.fromArray(FSP, b, j)
      acc0 = va.convert(VectorOperators.F2D, 0).asInstanceOf[DoubleVector]
        .fma(vb.convert(VectorOperators.F2D, 0).asInstanceOf[DoubleVector], acc0)
      acc1 = va.convert(VectorOperators.F2D, 1).asInstanceOf[DoubleVector]
        .fma(vb.convert(VectorOperators.F2D, 1).asInstanceOf[DoubleVector], acc1)
      j += lanes
    }
    var tail = 0.0
    while (j < n) { tail += a(j).toDouble * b(j).toDouble; j += 1 }
    acc0.add(acc1).add(acc2.add(acc3)).reduceLanes(VectorOperators.ADD) + tail
  }

  def dotFloatsAt(a: Array[Float], ao: Int, b: Array[Float], bo: Int,
      len: Int): Double = {
    var acc0 = DoubleVector.zero(DSP)
    var acc1 = DoubleVector.zero(DSP)
    var acc2 = DoubleVector.zero(DSP)
    var acc3 = DoubleVector.zero(DSP)
    var j = 0
    val lanes = FSP.length()
    while (j + 2 * lanes <= len) {
      val va = FloatVector.fromArray(FSP, a, ao + j)
      val vb = FloatVector.fromArray(FSP, b, bo + j)
      val vc = FloatVector.fromArray(FSP, a, ao + j + lanes)
      val vd = FloatVector.fromArray(FSP, b, bo + j + lanes)
      acc0 = va.convert(VectorOperators.F2D, 0).asInstanceOf[DoubleVector]
        .fma(vb.convert(VectorOperators.F2D, 0).asInstanceOf[DoubleVector], acc0)
      acc1 = va.convert(VectorOperators.F2D, 1).asInstanceOf[DoubleVector]
        .fma(vb.convert(VectorOperators.F2D, 1).asInstanceOf[DoubleVector], acc1)
      acc2 = vc.convert(VectorOperators.F2D, 0).asInstanceOf[DoubleVector]
        .fma(vd.convert(VectorOperators.F2D, 0).asInstanceOf[DoubleVector], acc2)
      acc3 = vc.convert(VectorOperators.F2D, 1).asInstanceOf[DoubleVector]
        .fma(vd.convert(VectorOperators.F2D, 1).asInstanceOf[DoubleVector], acc3)
      j += 2 * lanes
    }
    while (j + lanes <= len) {
      val va = FloatVector.fromArray(FSP, a, ao + j)
      val vb = FloatVector.fromArray(FSP, b, bo + j)
      acc0 = va.convert(VectorOperators.F2D, 0).asInstanceOf[DoubleVector]
        .fma(vb.convert(VectorOperators.F2D, 0).asInstanceOf[DoubleVector], acc0)
      acc1 = va.convert(VectorOperators.F2D, 1).asInstanceOf[DoubleVector]
        .fma(vb.convert(VectorOperators.F2D, 1).asInstanceOf[DoubleVector], acc1)
      j += lanes
    }
    var tail = 0.0
    while (j < len) {
      tail += a(ao + j).toDouble * b(bo + j).toDouble
      j += 1
    }
    acc0.add(acc1).add(acc2.add(acc3)).reduceLanes(VectorOperators.ADD) + tail
  }

  def dotDoubleFloatAt(hp: Array[Double], off: Int, v: Array[Float]): Double = {
    val n = v.length
    var acc0 = DoubleVector.zero(DSP)
    var acc1 = DoubleVector.zero(DSP)
    var acc2 = DoubleVector.zero(DSP)
    var acc3 = DoubleVector.zero(DSP)
    var j = 0
    val flanes = FSP.length()
    val dlanes = DSP.length()
    while (j + 2 * flanes <= n) {
      val va = FloatVector.fromArray(FSP, v, j)
      val vc = FloatVector.fromArray(FSP, v, j + flanes)
      acc0 = va.convert(VectorOperators.F2D, 0).asInstanceOf[DoubleVector]
        .fma(DoubleVector.fromArray(DSP, hp, off + j), acc0)
      acc1 = va.convert(VectorOperators.F2D, 1).asInstanceOf[DoubleVector]
        .fma(DoubleVector.fromArray(DSP, hp, off + j + dlanes), acc1)
      acc2 = vc.convert(VectorOperators.F2D, 0).asInstanceOf[DoubleVector]
        .fma(DoubleVector.fromArray(DSP, hp, off + j + flanes), acc2)
      acc3 = vc.convert(VectorOperators.F2D, 1).asInstanceOf[DoubleVector]
        .fma(DoubleVector.fromArray(DSP, hp, off + j + flanes + dlanes), acc3)
      j += 2 * flanes
    }
    while (j + flanes <= n) {
      val va = FloatVector.fromArray(FSP, v, j)
      acc0 = va.convert(VectorOperators.F2D, 0).asInstanceOf[DoubleVector]
        .fma(DoubleVector.fromArray(DSP, hp, off + j), acc0)
      acc1 = va.convert(VectorOperators.F2D, 1).asInstanceOf[DoubleVector]
        .fma(DoubleVector.fromArray(DSP, hp, off + j + dlanes), acc1)
      j += flanes
    }
    var tail = 0.0
    while (j < n) { tail += hp(off + j) * v(j).toDouble; j += 1 }
    acc0.add(acc1).add(acc2.add(acc3)).reduceLanes(VectorOperators.ADD) + tail
  }

  def dotPackedAt(a: Array[Byte], off: Int, q: Array[Float]): Double = {
    val n = q.length * 4
    var acc0 = DoubleVector.zero(DSP)
    var acc1 = DoubleVector.zero(DSP)
    var acc2 = DoubleVector.zero(DSP)
    var acc3 = DoubleVector.zero(DSP)
    var i = 0
    val step = FSP.vectorByteSize()
    val lanes = FSP.length()
    while (i + 2 * step <= n) {
      val va = FloatVector.fromByteArray(FSP, a, off + i, BO)
      val vb = FloatVector.fromArray(FSP, q, i >> 2)
      val vc = FloatVector.fromByteArray(FSP, a, off + i + step, BO)
      val vd = FloatVector.fromArray(FSP, q, (i >> 2) + lanes)
      acc0 = va.convert(VectorOperators.F2D, 0).asInstanceOf[DoubleVector]
        .fma(vb.convert(VectorOperators.F2D, 0).asInstanceOf[DoubleVector], acc0)
      acc1 = va.convert(VectorOperators.F2D, 1).asInstanceOf[DoubleVector]
        .fma(vb.convert(VectorOperators.F2D, 1).asInstanceOf[DoubleVector], acc1)
      acc2 = vc.convert(VectorOperators.F2D, 0).asInstanceOf[DoubleVector]
        .fma(vd.convert(VectorOperators.F2D, 0).asInstanceOf[DoubleVector], acc2)
      acc3 = vc.convert(VectorOperators.F2D, 1).asInstanceOf[DoubleVector]
        .fma(vd.convert(VectorOperators.F2D, 1).asInstanceOf[DoubleVector], acc3)
      i += 2 * step
    }
    while (i + step <= n) {
      val va = FloatVector.fromByteArray(FSP, a, off + i, BO)
      val vb = FloatVector.fromArray(FSP, q, i >> 2)
      acc0 = va.convert(VectorOperators.F2D, 0).asInstanceOf[DoubleVector]
        .fma(vb.convert(VectorOperators.F2D, 0).asInstanceOf[DoubleVector], acc0)
      acc1 = va.convert(VectorOperators.F2D, 1).asInstanceOf[DoubleVector]
        .fma(vb.convert(VectorOperators.F2D, 1).asInstanceOf[DoubleVector], acc1)
      i += step
    }
    var tail = 0.0
    while (i < n) {
      tail += f32(a, off + i).toDouble * q(i >> 2).toDouble
      i += 4
    }
    acc0.add(acc1).add(acc2.add(acc3)).reduceLanes(VectorOperators.ADD) + tail
  }
}
