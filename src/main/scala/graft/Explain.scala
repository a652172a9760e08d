package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit main: prints the formatted physical plan of selected
  * queries and greps for the properties that matter at 100 TB —
  * parquet filter pushdown (`PushedFilters`), pruned `ReadSchema`,
  * broadcast joins for small dims, and `TakeOrderedAndProject` for
  * top-k. Run: `sbt "runMain graft.Explain [query ...]"`.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val builder = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
    Tables.sessionConfigs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val names = if (args.nonEmpty) args.toSeq
      else Seq("p8_prune_project", "t1_topk", "v1_retrieve_topk",
        "j2_join_agg_topk", "j3_pairwise_topk", "d4_ngram_jaccard")
    names.foreach { name =>
      println(s"\n========== $name ==========")
      val plan = SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
      println(plan)
      val checks = Seq(
        "PushedFilters" -> plan.contains("PushedFilters: ["),
        "TakeOrderedAndProject" -> plan.contains("TakeOrderedAndProject"),
        "BroadcastHashJoin" -> plan.contains("BroadcastHashJoin"),
        "WholeStageCodegen" -> plan.contains("WholeStageCodegen"))
      println("--- markers: " + checks.collect {
        case (k, true) => k
      }.mkString(", "))
    }
    spark.stop()
  }
}
