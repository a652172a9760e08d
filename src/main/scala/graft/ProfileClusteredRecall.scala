package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.FloatVecDot

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
  */
object ProfileClusteredRecall {
  private final val Dim = 1536

  // SHARED with the official run (r13 review): the profiler exists to
  // validate exactly the generators and margins Bench.clusteredRecallPoint
  // pays for, so it calls them rather than carrying copies that could
  // silently drift from the FINDING comment's parity claim
  private def vec(id: Long): Array[Float] = Bench.syntheticVec(id)

  private def member(cArr: Array[Float], gArr: Array[Float],
      seed: Long): Array[Float] = Bench.clusterMemberVec(cArr, gArr, seed)

  def main(args: Array[String]): Unit = {
    val groups = if (args.nonEmpty) args(0).toLong else 6250L
    val perGroup = 16
    val kClusters = 256
    val builder = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    Tables.sessionConfigs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.functions.FloatVecDot.floatVecDot

    def timed(name: String)(body: => Any): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.1f s")
    }

    val centers = Array.tabulate(kClusters)(c => vec(3000000000L + c))
    val centsArr = centers.zipWithIndex.map { case (v, i) => (i.toLong, v) }
    val bcC = spark.sparkContext.broadcast(centers)
    val corpus = spark.range(0, groups, 1,
        spark.sparkContext.defaultParallelism)
      .flatMap { g =>
        val cArr = bcC.value((g % kClusters).toInt)
        val gArr = vec(4000000000L + g)
        (0 until perGroup).iterator.map { m =>
          val id = g * perGroup + m
          (id, FloatVecDot.pack(member(cArr, gArr, id)))
        }
      }.toDF("id", "vec").persist(StorageLevel.MEMORY_AND_DISK)
    timed("generate+persist")(corpus.count())

    // margin sanity: within-group vs cross-group-same-cluster cosines
    val m0 = member(centers(0), vec(4000000000L), 0L)
    val m1 = member(centers(0), vec(4000000000L), 1L)
    val mOther = member(centers(0), vec(4000000000L + kClusters), 5L)
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < Dim) { s += a(i).toDouble * b(i); i += 1 }; s
    }
    println(f"within-group cos      ${dot(m0, m1)}%.3f")
    println(f"cross-group (cluster) ${dot(m0, mOther)}%.3f")

    val queries = (0 until 32).map { q =>
      val g = (q.toLong * 977L) % groups
      val cArr = centers((g % kClusters).toInt)
      val gArr = vec(4000000000L + g)
      (5000000L + q.toLong, FloatVecDot.pack(member(cArr, gArr, 7000000000L + g)))
    }.toDF("id", "vec")

    val qArr = (0 until 32).map { q =>
      val g = (q.toLong * 977L) % groups
      val cArr = centers((g % kClusters).toInt)
      val gArr = vec(4000000000L + g)
      (5000000L + q.toLong, member(cArr, gArr, 7000000000L + g))
    }.toArray
    var exact: Map[Long, Set[Long]] = Map.empty
    timed("exact truth (blocked)") {
      val bcQ = spark.sparkContext.broadcast(qArr)
      val partTops = corpus.select(col("id"), col("vec"))
        .as[(Long, Array[Byte])]
        .mapPartitions { it =>
          val qs = bcQ.value
          val topS = Array.fill(qs.length)(
            Array.fill(10)(Double.NegativeInfinity))
          val topI = Array.fill(qs.length)(new Array[Long](10))
          it.foreach { case (id, vb) =>
            val v = FloatVecDot.unpack(vb)
            var qi = 0
            while (qi < qs.length) {
              val s = graft.functions.VecKernels.dotFloats(v, qs(qi)._2)
              val ts = topS(qi)
              if (s > ts(9)) {
                val ti = topI(qi)
                var j = 9
                while (j > 0 && s > ts(j - 1)) {
                  ts(j) = ts(j - 1); ti(j) = ti(j - 1); j -= 1
                }
                ts(j) = s; ti(j) = id
              }
              qi += 1
            }
          }
          qs.indices.iterator.flatMap { qi =>
            (0 until 10).iterator
              .filter(topS(qi)(_) > Double.NegativeInfinity)
              .map(j => (qs(qi)._1, topI(qi)(j), topS(qi)(j)))
          }
        }.collect()
      exact = partTops.groupBy(_._1).map { case (q, rs) =>
        q -> rs.sortBy(r => (-r._3, r._2)).take(10).map(_._2).toSet
      }
    }

    var codes: DataFrame = null
    timed("residual pq train+encode (probed lists only)") {
      val probedCids = qArr.flatMap { case (_, qv) =>
        centsArr.map { case (cid, cv) =>
          (cid, graft.functions.VecKernels.dotFloats(qv, cv)) }
          .sortBy(-_._2).take(4).map(_._1)
      }.distinct.toSeq
      val res = graft.ops.VectorQuant.ivfResiduals(corpus, centsArr)
        .where(col("cid").isin(probedCids: _*))
      val books = graft.ops.VectorQuant.pqTrain(
        res.select(col("id"), col("rvec").as("vec")), m = 96,
        ncodes = 256, sampleMod = 100, iters = 2)
      codes = graft.ops.VectorQuant.ivfPqEncode(res, books)
        .persist(StorageLevel.MEMORY_AND_DISK)
      codes.count()
      val ap = graft.ops.VectorQuant.knnJoinIvfPq(queries, codes,
          centsArr, books, corpus, k = 10, nProbe = 4, rerank = 50)
        .select(col("qid"), col("cid")).collect()
        .groupBy(_.getLong(0))
        .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
      val per = exact.toSeq.map { case (q, ex) =>
        ap.get(q).map(_.intersect(ex).size.toDouble / ex.size).getOrElse(0.0) }
      println(f"recall_at_10_clustered ${per.sum / math.max(1, per.size)}%.3f")
    }
    codes.unpersist(true)
    corpus.unpersist(true)
    spark.stop()
  }
}
