package graft

import graft.functions.{FloatVecDot, VecKernels}

/** Dev micro-benchmark for the packed-f32 dot kernels (no Spark): the
  * production SIMD path vs the scalar fallback at d=1536, the shape
  * every knn-join/pairwise/retrieve hot path scores at.
  * Run: `sbt "runMain graft.ProfileDot"`.
  *
  * Measured on the round-6 box (AVX-512, 512-bit species):
  * scalar ~1.0→2.8 GFLOP/s (byte-assembly → VarHandle loads), SIMD
  * ~6 GFLOP/s — the knn-join pair kernels are scoring-dominated, so
  * this ratio carries through to their end-to-end times.
  */
object ProfileDot {

  private def timeSimd(blobs: Array[Array[Byte]], q: Array[Byte], reps: Int): Double = {
    var sink = 0.0; var r = 0
    while (r < reps) { sink += VecKernels.dot(blobs(r % blobs.length), q); r += 1 }
    val t0 = System.nanoTime(); r = 0
    while (r < reps) { sink += VecKernels.dot(blobs(r % blobs.length), q); r += 1 }
    if (sink == Double.MinValue) println("?")
    (System.nanoTime() - t0) / 1e9
  }

  private def timeScalar(blobs: Array[Array[Byte]], q: Array[Byte], reps: Int): Double = {
    var sink = 0.0; var r = 0
    while (r < reps) { sink += VecKernels.dotScalar(blobs(r % blobs.length), q); r += 1 }
    val t0 = System.nanoTime(); r = 0
    while (r < reps) { sink += VecKernels.dotScalar(blobs(r % blobs.length), q); r += 1 }
    if (sink == Double.MinValue) println("?")
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val d = 1536
    val rnd = new java.util.Random(7)
    val blobs = Array.fill(512) {
      val v = Array.fill(d)(rnd.nextFloat() * 2 - 1)
      FloatVecDot.pack(v)
    }
    val reps = 200000
    println(s"simdEnabled=${VecKernels.simdEnabled}")
    for (pass <- 1 to 2) {
      val ts = timeScalar(blobs, blobs(0), reps)
      val tv = timeSimd(blobs, blobs(0), reps)
      def gf(t: Double) = reps.toDouble * d * 2 / t / 1e9
      println(f"pass $pass: scalar ${gf(ts)}%6.2f GF/s | simd ${gf(tv)}%6.2f GF/s | speedup ${ts / tv}%4.1fx")
    }
    var worst = 0.0
    for (r <- blobs.indices) {
      worst = math.max(worst, math.abs(
        VecKernels.dot(blobs(r), blobs(0)) -
          VecKernels.dotScalar(blobs(r), blobs(0))))
    }
    println(s"max |simd - scalar| = $worst")
  }
}
