package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** CSV corpus ingest — the reference's only external ingest format
  * (`examples/dad_jokes/Build Dad Jokes KB.ipynb` cell 5:
  * `pd.read_csv` → `.str.strip()` → `.unique()`), re-expressed as a
  * distributed parse-and-quarantine stage like [[Jsonl]]: at 100 TB a
  * handful of malformed rows in shard 40,000 must quarantine, not fail
  * the job (`spark.read.csv` FAILFAST) or silently null out
  * (PERMISSIVE without inspection).
  *
  * Schema is REQUIRED (same rationale as [[Jsonl]]): inference costs an
  * extra full pass and drifts across shards; an explicit schema keeps
  * the scan pruned and the parse deterministic.
  */
object Csv {

  /** Parse a headerless CSV path under an explicit schema, splitting
    * into (good, quarantined):
    *
    *   - a syntactically malformed line (wrong arity, unparseable
    *     field for its type) parses to null fields with the raw line
    *     captured in `_corrupt_record` (PERMISSIVE mode) → quarantined
    *     with reason `malformed`;
    *   - a well-formed row with a null in any of `requiredCols` →
    *     quarantined with reason `missing:<first missing col>`;
    *   - everything else → good (without the bookkeeping columns).
    *
    * Quoting follows RFC 4180 (`"` quotes, doubled-`"` escape — the
    * `escape` option is pinned so embedded quotes round-trip with
    * [[write]]). Both sides come from ONE scan (two filters over the
    * same parsed frame).
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
      .option("header", "false")
      .option("quote", "\"")
      .option("escape", "\"")
      .csv(path)
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

  /** The reference's ingest normalization: strip the text column and
    * drop exact duplicates (`.str.strip()` → `.unique()`,
    * `Build Dad Jokes KB.ipynb` cell 5) — plus the empty-after-strip
    * drop any real pipeline wants. `distinct` is a hash shuffle on the
    * row, map-side combinable; no window, no skew pivot.
    */
  def ingestDistinct(df: DataFrame, textCol: String): DataFrame =
    df.withColumn(textCol, trim(col(textCol)))
      .where(col(textCol) =!= "")
      .distinct()

  /** RFC-4180 CSV write (headerless, `"` quote, doubled-`"` escape) —
    * symmetric with [[readWithQuarantine]] so round-trips are
    * lossless. */
  def write(df: DataFrame, path: String,
      compression: String = "none"): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("header", "false")
      .option("quote", "\"")
      .option("escape", "\"")
      .option("compression", compression)
      .csv(path)
}
