package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated test tables (TESTDATA.md). */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Session configs every graft SparkSession needs. `events.parquet`
    * carries TIMESTAMP(NANOS) which Spark only reads as long via the
    * legacy flag; we convert back to a microsecond timestamp in [[t]],
    * matching DuckDB's ns→us truncation.
    */
  val sessionConfigs: Map[String, String] = Map(
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.session.timeZone" -> "UTC")

  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // `ts div 1000`: integer division — epoch-nanos (~1.7e18) would lose
    // precision through double division (floor(ts/1000) is wrong by ±1us).
    val typed = if (name == "events")
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
    // The corpus tables at test SFs are single-digit-MB parquet files
    // that bin-pack into ONE scan task, serializing every downstream
    // operator (the interpreted shingle/minhash pipelines most of all).
    // A real deployment's scan has one task per split; spreading the
    // small local file to the session's parallelism restores the
    // execution shape the operators are designed for. (A ~3MB shuffle
    // — negligible, and irrelevant at real scale where splits abound.)
    if (name == "documents" || name == "embeddings")
      typed.repartition(spark.sparkContext.defaultParallelism)
    else typed
  }
}
