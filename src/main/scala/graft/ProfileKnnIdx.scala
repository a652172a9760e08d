package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.FloatVecDot

/** Dev profiler: does pre-partitioning the persisted assignment on the
  * list id let the indexed knn join elide the candidate-side exchange
  * (the 6 GB-per-call shuffle), and what does that save at 1M × d1536?
  * Run: `sbt "runMain graft.ProfileKnnIdx"`.
  *
  * FINDING (round 6, local[32]): with the scalar dot kernel the
  * partitioned layout saved ~5% (129.0 s → 122.6 s) — scoring the
  * ~1.5e8 candidate pairs dominated. After the SIMD kernels
  * (graft.functions.VecKernels) the same run is 31.3 s → 23.3 s:
  * scoring shrank ~5× and the candidate exchange is now a visible
  * 26%, so the cid-bucketed layout (knnJoinIvfBucketed) is worth
  * taking alongside the kernel win.
  *
  * REVISED (round 7): measured end-to-end, the raw-blob bucketed
  * RELATIONAL join runs ~2.7× slower than the blocked kernel — its
  * per-pair 6 KB blob copy dwarfs the exchange it elides — so the
  * bucketed layout was retargeted at SMALL-payload code tables via
  * the custom co-partitioned plan (plans/AdcCodesJoin +
  * VectorQuant.knnJoinIvfPqBucketed). See SURVEY round-7 notes.
  */
object ProfileKnnIdx {
  private final val Dim = 1536

  private def vec(id: Long): Array[Float] = {
    val rnd = new java.util.Random(id * 6364136223846793005L + 1442695040888963407L)
    val v = new Array[Float](Dim)
    var s = 0.0
    var i = 0
    while (i < Dim) { val x = rnd.nextGaussian(); v(i) = x.toFloat; s += x * x; i += 1 }
    val inv = (1.0 / math.sqrt(s)).toFloat
    i = 0
    while (i < Dim) { v(i) *= inv; i += 1 }
    v
  }

  private def emb(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    spark.range(0, n, 1, spark.sparkContext.defaultParallelism)
      .map(id => (id, FloatVecDot.pack(vec(id))))
      .toDF("id", "vec")
  }

  def main(args: Array[String]): Unit = {
    val builder = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.driver.memory", "96g")
      .config("spark.ui.enabled", "false")
    Tables.sessionConfigs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed(name: String)(body: => Any): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"$name%-34s ${(System.nanoTime() - t0) / 1e9}%8.1f s")
    }

    val corpus = emb(spark, 1000000L).persist(StorageLevel.MEMORY_AND_DISK)
    corpus.count()
    val queries = emb(spark, 10000L).persist(StorageLevel.MEMORY_AND_DISK)
    queries.count()
    val seeds = (0 until 256).map(i => (i.toLong, vec(5000000L + i)))
    val cents = {
      import spark.implicits._
      seeds.map { case (cid, v) => (cid, FloatVecDot.pack(v)) }.toDF("cid", "cvec")
    }

    val assignedTbl = graft.ops.SimilaritySearch
      .ivfAssignPacked(corpus, cents).alias("a")
    val preRaw = assignedTbl
      .join(corpus.alias("e"), col("a.vec_id") === col("e.id"))
      .select(col("a.cid").as("ccid"),
        col("a.vec_id").as("cand_id"), col("e.vec").as("cv"))

    // variant A: persisted as-is (what the bench measures today)
    val flat = preRaw.persist(StorageLevel.MEMORY_AND_DISK)
    flat.count()
    timed("indexed join, unpartitioned") {
      graft.ops.SimilaritySearch.knnJoinIvfAssigned(
        queries, flat, cents, k = 10, nProbe = 4)
        .write.format("noop").mode("overwrite").save()
    }
    flat.unpersist()

    // variant B: persisted PRE-PARTITIONED on the list id — the layout
    // a deployment stores; the join key matches, so the candidate side
    // should not re-exchange
    val parted = preRaw.repartition(col("ccid"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    parted.count()
    val plan = graft.ops.SimilaritySearch.knnJoinIvfAssigned(
      queries, parted, cents, k = 10, nProbe = 4)
    timed("indexed join, ccid-partitioned") {
      plan.write.format("noop").mode("overwrite").save()
    }
    val formatted = plan.queryExecution.executedPlan.toString
    println("exchanges in plan: " +
      "Exchange".r.findAllIn(formatted).length)
    parted.unpersist()
    spark.stop()
  }
}
