package graft.ops

/** Microbench (round 14, r13 verdict item 4): the PQ encode argmin
  * kernel, transposed dimension-major layout ([[VectorQuant.nearestCodeT]],
  * round 13) vs the codes-major SIMD form
  * ([[VectorQuant.nearestCodeFlat]], rounds 9–12), at exactly the
  * `svs_pq_encode_1m` shape — d = 1536, m = 96 subspaces of dsub = 16,
  * ncodes = 256 — so the r13 kernel swap finally has a recorded
  * before/after on one tree. Pure JVM compute, no Spark: the number
  * that transfers is ns/vector/kernel, and the bench point is this
  * loop times 1M vectors across 32 cores plus the scan.
  *
  * Reps are INTERLEAVED (T,F,T,F,…) so CPU-steal drift lands on both
  * kernels equally; report = min over reps (the least-disturbed pass),
  * plus an assignment-agreement count as a semantic cross-check.
  * Run: `sbt "runMain graft.ops.ProfilePqKernel [nVecs]"`.
  */
object ProfilePqKernel {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(20000)
    val d = 1536; val m = 96; val dsub = d / m; val k = 256
    val rnd = new java.util.Random(42)
    val books: Array[Array[Array[Float]]] =
      Array.fill(m)(Array.fill(k)(Array.fill(dsub)(rnd.nextGaussian().toFloat)))
    val vecs: Array[Array[Float]] =
      Array.fill(n)(Array.fill(d)(rnd.nextGaussian().toFloat))

    val flatsT = books.map(VectorQuant.flattenBookT)
    val flatsF = books.map(VectorQuant.flattenBook)
    val acc = new Array[Double](k)
    val outT = new Array[Int](n.toInt * m)
    val outF = new Array[Int](n.toInt * m)

    def passT(): Long = {
      val t0 = System.nanoTime()
      var r = 0
      while (r < n) {
        val v = vecs(r)
        var s = 0
        while (s < m) {
          val fl = flatsT(s)
          outT(r * m + s) =
            VectorQuant.nearestCodeT(fl._1, fl._2, dsub, v, s * dsub, acc)
          s += 1
        }
        r += 1
      }
      System.nanoTime() - t0
    }
    def passF(): Long = {
      val t0 = System.nanoTime()
      var r = 0
      while (r < n) {
        val v = vecs(r)
        var s = 0
        while (s < m) {
          val fl = flatsF(s)
          outF(r * m + s) =
            VectorQuant.nearestCodeFlat(fl._1, fl._2, dsub, v, s * dsub)
          s += 1
        }
        r += 1
      }
      System.nanoTime() - t0
    }

    // JIT warmup, both paths
    passT(); passF(); passT(); passF()
    val reps = 5
    val tsT = Array.fill(reps)(0L)
    val tsF = Array.fill(reps)(0L)
    var i = 0
    while (i < reps) { tsT(i) = passT(); tsF(i) = passF(); i += 1 }
    val agree = outT.zip(outF).count { case (a, b) => a == b }
    def ns(ts: Array[Long]): Double = ts.min.toDouble / n
    println(f"[pq-kernel] n=$n d=$d m=$m k=$k")
    println(f"[pq-kernel] transposed (nearestCodeT):  ${ns(tsT) / 1000}%.2f us/vec  (reps ${tsT.map(_ / 1e9).map(t => f"$t%.3f").mkString(", ")} s)")
    println(f"[pq-kernel] codes-major (nearestCodeFlat): ${ns(tsF) / 1000}%.2f us/vec  (reps ${tsF.map(_ / 1e9).map(t => f"$t%.3f").mkString(", ")} s)")
    println(f"[pq-kernel] speedup T vs F: ${ns(tsF) / ns(tsT)}%.2fx; assignment agreement: $agree/${n * m}")
  }
}
