package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** JSONL corpus interchange — the de-facto LLM training-data format
  * (one JSON document per line, usually gzip/zstd-compressed shards).
  * The reference's only ingest formats are CSV (S9, its notebook) and
  * its own SQLite file; a 100 TB pipeline ingests JSONL shards, and the
  * failure mode that matters at that scale is a handful of malformed
  * lines in shard 40,000 failing the whole job — so the read here is a
  * parse-and-quarantine stage, not a bare `spark.read.json`.
  *
  * Schema is REQUIRED everywhere: inference is an extra full pass over
  * the corpus and drifts as shards evolve; an explicit schema also
  * makes the scan prune columns (`ReadSchema` pushdown) like parquet.
  */
object Jsonl {

  /** Parse a JSONL path under an explicit schema, splitting the result
    * into (good, quarantined):
    *
    *   - a syntactically malformed line parses to all-null fields with
    *     the raw line captured in `_corrupt_record` (Spark PERMISSIVE
    *     mode) → quarantined with reason `malformed`;
    *   - a well-formed object missing any of `requiredCols` (absent
    *     key or JSON null) → quarantined with reason
    *     `missing:<first missing col>`;
    *   - everything else → good (without the bookkeeping columns).
    *
    * Both sides come from ONE scan (the split is two filters over the
    * same parsed frame — Spark caches nothing here, but a caller
    * landing both sides can persist the parsed frame first). The
    * quarantine carries the raw line for malformed rows so a repair
    * job can re-parse without re-reading the corpus.
    */
  def readWithQuarantine(spark: SparkSession, path: String,
      schema: StructType, requiredCols: Seq[String])
      : (DataFrame, DataFrame) = {
    require(requiredCols.forall(schema.fieldNames.contains),
      s"requiredCols ${requiredCols.mkString(",")} must all be in the schema")
    val corrupt = "_corrupt_record"
    require(!schema.fieldNames.contains(corrupt),
      s"schema must not already contain $corrupt")
    val parsed = spark.read
      .schema(schema.add(corrupt, StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corrupt)
      .json(path)
    val missingReason = requiredCols.foldRight(lit(null).cast(StringType)) {
      (c, acc) => when(col(c).isNull, lit(s"missing:$c")).otherwise(acc)
    }
    val reason = when(col(corrupt).isNotNull, lit("malformed"))
      .otherwise(missingReason)
    val tagged = parsed.withColumn("_reason", reason)
    val good = tagged.where(col("_reason").isNull)
      .select(schema.fieldNames.map(col(_)): _*)
    val quarantined = tagged.where(col("_reason").isNotNull)
      .select(col("_reason").as("reason") +:
        col(corrupt).as("raw") +:
        schema.fieldNames.map(col(_)): _*)
    (good, quarantined)
  }

  /** Write a frame as (optionally compressed) JSONL shards —
    * `df.write.json` IS line-delimited JSON; this pins the mode and
    * codec so round-trips are symmetric with [[readWithQuarantine]].
    */
  def write(df: DataFrame, path: String,
      compression: String = "gzip"): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("compression", compression)
      .json(path)
}
