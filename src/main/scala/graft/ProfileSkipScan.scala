package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiler for the data-skipping bench block (the
  * svs_zorder_write/skip_scan/full_scan composition) in isolation —
  * same shape as [[ProfileKnnIdx]]: run, print timings, exit. Usage:
  *   sbt "runMain graft.ProfileSkipScan [nRows]"
  */
object ProfileSkipScan {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val builder = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
    Tables.sessionConfigs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val zdir = "/tmp/graft_profile_zorder"
    KbStoreCleanup.delete(zdir)
    val zdf = spark.range(n).select(col("id"),
      pmod(hash(col("id")), lit(1024)).cast("long").as("x"),
      pmod(hash(col("id") + 7L), lit(1024)).cast("long").as("y"),
      concat_ws("", (0 until 8).map(i =>
        md5(concat(col("id"), lit(i)))): _*).as("payload"))
    println(f"write: ${timed {
      graft.ops.Layout.writeZordered(zdf, zdir,
        graft.ops.Layout.zValue(10, col("x"), col("y")), numFiles = 64)
    }}%.3f s")
    val stats = graft.ops.Layout.parquetFileStats(spark, zdir, Seq("x", "y"))
      .cache()
    println(f"stats build: ${timed { stats.count() }}%.3f s")
    val kept = graft.ops.Layout.pruneFiles(spark, zdir, stats, "x", 0, 127)
    println(s"kept ${kept.size}/64 files")
    val udir = "/tmp/graft_profile_unordered"
    KbStoreCleanup.delete(udir)
    println(f"unordered write: ${timed {
      zdf.repartition(64).write.mode("overwrite").parquet(udir)
    }}%.3f s")
    (1 to 3).foreach { i =>
      println(f"skip      $i: ${timed {
        graft.ops.Layout.skippingScan(spark, zdir, stats, "x", 0, 127)
          .agg(count(lit(1)), sum(length(col("payload")))).collect()
      }}%.3f s")
      println(f"full      $i: ${timed {
        spark.read.parquet(zdir).where(col("x").between(0, 127))
          .agg(count(lit(1)), sum(length(col("payload")))).collect()
      }}%.3f s")
      println(f"unordered $i: ${timed {
        spark.read.parquet(udir).where(col("x").between(0, 127))
          .agg(count(lit(1)), sum(length(col("payload")))).collect()
      }}%.3f s")
    }
    KbStoreCleanup.delete(zdir)
    KbStoreCleanup.delete(udir)
    spark.stop()
  }
}
