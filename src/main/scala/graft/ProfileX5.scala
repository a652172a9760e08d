package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiler: which stage of the shingle-posting pipelines (x5/d4)
  * burns the time at sf0.1? Run: `sbt "runMain graft.ProfileX5"`.
  */
object ProfileX5 {
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
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  ($r)")
    }
    timed("docs.count")(docs.count())
    println("docs partitions: " + docs.rdd.getNumPartitions)
    val sh = graft.ops.Dedup.shingles(docs, 3)
    println("optimized plan:\n" + sh.queryExecution.optimizedPlan.toString.take(900))
    timed("shingles.count")(sh.count())
    timed("shingles.count again")(sh.count())
    val posts = sh.select(col("doc_id"), explode(col("shingles")).as("sh"))
    timed("posts.count")(posts.count())
    val df = posts.groupBy(col("sh")).agg(countDistinct(col("doc_id")).as("ndocs"))
    timed("df.count")(df.count())
    timed("join+agg")(
      posts.join(df, "sh").groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n")).count())
    timed("full x5")(
      graft.ops.Dedup.dupNgramFraction(docs, 3).count())

    // codegen'd alternative: explode indices, project shingles without
    // any lambda, dedupe via distinct
    val toks2 = docs.select(col("doc_id"), split(col("text"), " ").as("toks"))
    val posts2 = toks2
      .select(col("doc_id"), col("toks"),
        explode(when(size(col("toks")) >= 3,
          sequence(lit(0), size(col("toks")) - 3))
          .otherwise(array().cast("array<int>"))).as("i"))
      .select(col("doc_id"), concat_ws(" ",
        element_at(col("toks"), col("i") + 1),
        element_at(col("toks"), col("i") + 2),
        element_at(col("toks"), col("i") + 3)).as("sh"))
    timed("posts2 codegen count")(posts2.count())
    timed("posts2 distinct count")(posts2.distinct().count())
    timed("posts2 collect_set")(
      posts2.groupBy(col("doc_id"))
        .agg(collect_set(col("sh")).as("shingles")).count())
    spark.stop()
  }
}
