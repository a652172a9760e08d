package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiler: stage decomposition of the prefix-filtered jaccard
  * join (d4). Run: `sbt "runMain graft.ProfileD4"`.
  */
object ProfileD4 {
  def main(args: Array[String]): Unit = {
    val builder = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    Tables.sessionConfigs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.t(spark, "/root/testdata/sf0.1", "documents")
    def timed(name: String)(body: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = body
      println(f"$name%-24s ${(System.nanoTime() - t0) / 1e9}%8.3f s  ($r)")
    }
    val threshold = 0.5
    val sh = graft.ops.Dedup.shingles(docs, 3).cache()
    timed("sh cache")(sh.count())
    val posts = sh.select(col("doc_id"), explode(col("shingles")).as("sh"))
    timed("posts")(posts.count())
    val df = posts.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    timed("df")(df.count())
    val ranked = posts.join(df, "sh")
      .groupBy(col("doc_id"))
      .agg(array_sort(collect_list(struct(col("df"), col("sh"))))
        .getField("sh").as("ordered"))
      .select(col("doc_id"),
        slice(col("ordered"), lit(1),
          (size(col("ordered")) -
            ceil(lit(threshold) * size(col("ordered"))).cast("int") + 1)
        ).as("prefix"))
    timed("ranked")(ranked.count())
    val pre = ranked.select(col("doc_id"), explode(col("prefix")).as("sh"))
    timed("pre")(pre.count())
    val cands = pre.alias("a")
      .join(pre.alias("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc1"), col("b.doc_id").as("doc2"))
      .distinct()
    timed("cands")(cands.count())
    timed("verify")(graft.ops.Dedup.jaccardVerify(cands, sh).count())
    timed("full d4")(
      graft.ops.Dedup.jaccardSimilarityJoin(docs, 3, threshold).count())
    spark.stop()
  }
}
