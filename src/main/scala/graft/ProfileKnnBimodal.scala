package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.FloatVecDot

/** Dev profiler: chase the 10k-probe plain knn join's BIMODAL-high
  * mode. Across r10/r11 full bench runs the identical call measured
  * 15.9–30 s in some runs and 69.9–110.6 s in others, always with
  * cpu_run ≈ 0.95 and residency 1.0 — so the slow mode is neither
  * spill nor descheduling-visible contention; it burns real task CPU.
  * Hypotheses: (a) hypervisor-level slowdown invisible to thread
  * accounting, (b) JVM aging (GC pressure / code-cache) after the
  * ladder phase, (c) something about the 10k probe side itself.
  *
  * This driver isolates (b)/(c): same corpus, alternating 2k and 10k
  * legs, per-rep wall + Σtask cpu/run + GC-bean deltas.
  * Run: `sbt "runMain graft.ProfileKnnBimodal"`.
  *
  * FINDING (r11, local[32]): the high mode reproduces IN ISOLATION and
  * alternates with the fast mode inside one JVM — same call, minutes
  * apart: 10k legs 17.1/17.1/17.8 s (fast) vs 47.8/37.9/32.3 s (slow),
  * 2k legs 9.7–10.8 vs 17.0–18.9 s, GC delta ≤ 0.2 s every rep, and
  * the SLOW reps burn 2.5× more task-thread CPU for identical work
  * (932 vs 360 cpu-seconds). Identical work + more thread-CPU + no GC
  * = the guest's cycles themselves got slower: hypervisor CPU steal
  * (/proc/stat's steal counter shows ~5 h stolen over 14 h uptime on
  * this VM, arriving in waves). Not JVM aging, not code cache, not
  * allocation — so no JVM tuning helps; median-of-reps in the bench
  * (longRepS 150) plus the interleaved ladder are the right
  * mitigations, and cpu_run ≈ 1 with an inflated wall is this VM's
  * steal signature (thread CPU time counts stolen-while-scheduled
  * cycles as used).
  */
object ProfileKnnBimodal {
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
      .config("spark.ui.enabled", "false")
    Tables.sessionConfigs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val cpuNs = new java.util.concurrent.atomic.AtomicLong(0L)
    val runMs = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = e.taskMetrics
          if (m != null) { cpuNs.addAndGet(m.executorCpuTime); runMs.addAndGet(m.executorRunTime) }
        }
      })
    def gcMs: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }

    val corpus = emb(spark, 1000000L).persist(StorageLevel.MEMORY_AND_DISK)
    corpus.count()
    val cents = corpus.where(col("id") < 256)
      .select(col("id").as("cid"), col("vec").as("cvec"))
    val q2k = emb(spark, 2000).persist(StorageLevel.MEMORY_AND_DISK); q2k.count()
    val q10k = emb(spark, 10000).persist(StorageLevel.MEMORY_AND_DISK); q10k.count()

    // JIT warmup
    graft.ops.SimilaritySearch.knnJoinIvfPacked(q2k, q2k, cents, k = 10, nProbe = 4)
      .write.format("noop").mode("overwrite").save()

    def leg(tag: String, q: DataFrame): Unit = {
      val (c0, r0, g0) = (cpuNs.get(), runMs.get(), gcMs)
      val t0 = System.nanoTime()
      graft.ops.SimilaritySearch.knnJoinIvfPacked(q, corpus, cents, k = 10, nProbe = 4)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      val dc = (cpuNs.get() - c0) / 1e6
      val dr = runMs.get() - r0
      println(f"$tag wall=$wall%.1fs taskCpu=${dc / 1000.0}%.1fs cpu/run=${
        if (dr > 0) dc.toDouble / dr else -1.0}%.2f gc=${(gcMs - g0) / 1000.0}%.1fs")
    }
    (1 to 6).foreach { i => leg(s"rep$i 2k ", q2k); leg(s"rep$i 10k", q10k) }
    spark.stop()
  }
}
