package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Time-series joins Spark has no built-in operator for — both
  * re-expressed so the theta condition never reaches the join machinery
  * (a naive `a.join(b, cond)` with a time inequality is a
  * BroadcastNestedLoop at best, a cartesian at worst; neither survives
  * 100×). The reference engine has no temporal joins at all; these are
  * scale extensions in the spirit of its event pipeline
  * (`/root/reference/src/svs/kb.py` has only point lookups).
  *
  *  - [[asofJoin]]: latest right row at-or-before each left row, per
  *    key. Implemented as the sorted-merge as-of, declaratively: union
  *    both sides, one Window carry-forward per key — ONE shuffle on the
  *    key, no range expansion, no per-row subquery. (Skewed hot keys
  *    cost a bigger per-key sort; salt upstream if one key dominates.)
  *
  *  - [[rangeJoinBucketed]]: all right rows within
  *    `[leftTs - before, leftTs + after]` per key. Time is quantized
  *    into `(before + after)`-wide buckets; the left side explodes into
  *    the ≤2 buckets its window can touch and the join becomes a plain
  *    equi-join on (key, bucket) plus a residual filter — candidates
  *    are bounded per bucket, not per key, and each true pair is
  *    produced exactly once (the right row lives in exactly one
  *    bucket).
  */
object TimeJoins {

  private def tagged(df: DataFrame, key: String, ts: String, tag: Int,
      own: StructType, other: StructType, ownFirst: Boolean): DataFrame = {
    val ownCol = struct(df.columns.map(col): _*).as(if (ownFirst) "__l" else "__r")
    val nul = lit(null).cast(other).as(if (ownFirst) "__r" else "__l")
    val (a, b) = if (ownFirst) (ownCol, nul) else (nul, ownCol)
    df.select(col(key).as("__k"), col(ts).cast("long").as("__t"),
      lit(tag).as("__tag"), a, b)
  }

  /** Left as-of join: every left row, plus the latest right row (same
    * `key`) with `rightTs <= leftTs`, or nulls when none precedes it.
    * Right columns come back prefixed with `rightPrefix`. Both ts
    * columns must be numeric (e.g. epoch micros). Among right rows with
    * identical (key, ts) the winner is unspecified — disambiguate the
    * timestamp upstream if that matters.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String,
      rightPrefix: String = "r_"): DataFrame = {
    val lType = StructType(left.schema)
    val rType = StructType(right.schema)
    // right rows sort before left rows at equal timestamps (tag 0 < 1),
    // so the match condition is inclusive: rightTs <= leftTs
    val l = tagged(left, key, leftTs, tag = 1, lType, rType, ownFirst = true)
    val r = tagged(right, key, rightTs, tag = 0, rType, lType, ownFirst = false)
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val lcols = left.columns.map(c => col(s"__l.$c").as(c))
    val rcols = right.columns.map(c => col(s"__m.$c").as(s"$rightPrefix$c"))
    l.unionByName(r)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__tag") === 1)
      .select(lcols ++ rcols: _*)
  }

  /** Inner range join: (left row, right row) pairs with the same `key`
    * and `rightTs` in `[leftTs - before, leftTs + after]` (bounds
    * inclusive, micros or any numeric unit). Right columns prefixed.
    */
  def rangeJoinBucketed(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, before: Long, after: Long,
      rightPrefix: String = "r_"): DataFrame = {
    require(before >= 0 && after >= 0, "before/after must be non-negative")
    val width = math.max(1L, before + after)
    val lcols = left.columns.map(c => col(c))
    val rcols = right.columns.map(c => col(c).as(s"$rightPrefix$c"))
    val lb = left.select(lcols :+ col(key).as("__k") :+
        col(leftTs).cast("long").as("__lt"): _*)
      .withColumn("__b", explode(sequence(
        expr(s"(__lt - ${before}L) div ${width}L"),
        expr(s"(__lt + ${after}L) div ${width}L"))))
    val rb = right.select(rcols :+ col(key).as("__rk") :+
        col(rightTs).cast("long").as("__rt"): _*)
      .withColumn("__rb", expr(s"__rt div ${width}L"))
    lb.join(rb, col("__k") === col("__rk") && col("__b") === col("__rb"))
      .where(col("__rt") >= col("__lt") - before &&
        col("__rt") <= col("__lt") + after)
      .drop("__k", "__lt", "__b", "__rk", "__rt", "__rb")
  }

  /** Per-key exponentially-weighted moving average over an ordered
    * event stream: ewma₁ = x₁, ewmaₜ = α·xₜ + (1−α)·ewmaₜ₋₁ (events
    * ordered by (ts, event_id) within each key) — the classic smoothed
    * baseline that backs drift/anomaly monitors (e5's z-score flags
    * use a global window mean; this is its sequential-memory
    * counterpart).
    *
    * Scale shape: a recurrence is inherently serial PER KEY, so the
    * honest distributed form is one `mapGroups` pass per key — keys
    * process in parallel, each key's events sort in that task. State
    * is the key's event list: bounded by events-per-key, the same
    * contract as any per-entity sequence op (sessionize). A key with
    * unbounded history wants the streaming formulation instead:
    * [[graft.streaming.StreamingIngest.streamingEwma]] carries the
    * recurrence in `GroupState` (O(horizon) per key, batch-parity
    * spec-pinned).
    *
    * Input: (key LONG, event_id LONG, ts LONG, value DOUBLE) as column
    * names given; output (key, event_id, rn, ewma) — ewma unrounded
    * (callers round with the engine's round() for oracle hashing).
    */
  def ewma(events: DataFrame, alpha: Double, keyCol: String = "user_id",
      idCol: String = "event_id", tsCol: String = "ts",
      valCol: String = "value"): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha $alpha")
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col(keyCol).cast("long"), col(idCol).cast("long"),
        col(tsCol).cast("long"), col(valCol).cast("double"))
      .as[(Long, Long, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (key, it) =>
        val evs = it.toArray.sortBy(e => (e._3, e._2))
        var acc = 0.0
        evs.iterator.zipWithIndex.map { case ((_, id, _, x), i) =>
          acc = if (i == 0) x else alpha * x + (1.0 - alpha) * acc
          (key, id, (i + 1).toLong, acc)
        }
      }
      .toDF(keyCol, idCol, "rn", "ewma")
  }
}
