package graft

import org.apache.spark.sql.SparkSession

/** Dev profiler for the r13 clustered-recall counterpart
  * (Bench.clusteredRecallPoint): validates the planted-structure
  * generator's margins and the residual IVF-PQ recall it is supposed
  * to demonstrate, at a configurable scale before the 1M official run
  * pays for it. Run: `sbt "runMain graft.ProfileClusteredRecall [groups]"`.
  *
  * FINDING (round 13, local[32]): within-group cos 0.982, cross-group
  * same-cluster 0.752, and the m=96 residual IVF-PQ path at nProbe 4 /
  * rerank 50 reaches recall@10 = 1.000 vs brute-force exact at BOTH
  * 100k and the full 1M — the macro-margin regime where 96-byte codes
  * separate ranks, vs the same path's 0.17-0.6 on the isotropic
  * corpus. Section cost at 1M after the two shape fixes: generate
  * 7.0 s, blocked exact truth 1.5 s (the naive crossJoin truth was
  * 58 s — it shipped 12 KB of vectors per pair row), probed-lists-only
  * train+encode+join 56 s — ~65 s total, vs ~144 s naive.
  *
  * The whole measurement pipeline is [[Bench.clusteredRecallCore]] —
  * SHARED with the official point (r13 review: a carried copy of the
  * truth/encode stages could silently drift from the parity claim
  * above, exactly like the generators the first cut already shared).
  * Only the per-stage timing hook and the margin sanity print live
  * here.
  */
object ProfileClusteredRecall {
  private final val Dim = 1536

  def main(args: Array[String]): Unit = {
    val groups = if (args.nonEmpty) args(0).toLong else 6250L
    val builder = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    Tables.sessionConfigs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // margin sanity: within-group vs cross-group-same-cluster cosines
    val c0 = Bench.syntheticVec(3000000000L)
    val g0 = Bench.syntheticVec(4000000000L)
    val gOther = Bench.syntheticVec(4000000000L + 256)
    val m0 = Bench.clusterMemberVec(c0, g0, 0L)
    val m1 = Bench.clusterMemberVec(c0, g0, 1L)
    val mOther = Bench.clusterMemberVec(c0, gOther, 5L)
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < Dim) { s += a(i).toDouble * b(i); i += 1 }; s
    }
    println(f"within-group cos      ${dot(m0, m1)}%.3f")
    println(f"cross-group (cluster) ${dot(m0, mOther)}%.3f")

    val recall = Bench.clusteredRecallCore(spark, groups,
      stage = (name, _) => body => {
        val t0 = System.nanoTime()
        body
        println(f"$name%-42s ${(System.nanoTime() - t0) / 1e9}%8.1f s")
      })
    println(f"recall_at_10_clustered ${recall}%.3f")
    spark.stop()
  }
}
