package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiling main for the minhash pipeline stages. */
object ProfileD2 {
  def main(args: Array[String]): Unit = {
    val builder = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    Tables.sessionConfigs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs rows=$n")
    }

    val docs = Tables.t(spark, "/root/testdata/sf0.01", "documents")
    val sh = graft.ops.Dedup.shingles(docs, 3).cache()
    timed("shingles+cache")(sh.count())
    val sigs = graft.ops.Dedup.minhashSignatures(sh, 8)
    timed("signatures")(sigs.count())
    timed("signatures again")(sigs.count())
    val cands = graft.ops.Dedup.lshCandidates(sigs, 2)
    timed("candidates")(cands.count())
    val verified = graft.ops.Dedup.jaccardVerify(cands, sh)
      .where(col("jaccard") >= 0.8)
    timed("verify")(verified.count())
    timed("full pipeline")(
      graft.ops.Dedup.minhashNearDups(docs).count())
    spark.stop()
  }
}
