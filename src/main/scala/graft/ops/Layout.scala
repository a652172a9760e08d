package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical-layout operators: Z-order (Morton) clustering for
  * multi-dimensional data-skipping. A 100 TB table laid out in file
  * ranges of an interleaved key lets range predicates on ANY of the
  * interleaved dimensions prune files (parquet min/max stats carry the
  * dimension columns themselves), where a plain sort prunes only its
  * leading column — the standard lakehouse OPTIMIZE ZORDER story.
  */
object Layout {

  /** Morton (Z-order) value: bit j of interleaved column k lands at
    * output bit `j·K + k` (K = number of columns). Inputs must be
    * non-negative; each contributes its low `bits` bits (callers mask
    * or scale first — locality lives in the low bits). Pure shift-add
    * arithmetic, portable to any SQL engine, stays in codegen.
    */
  def zValue(bits: Int, cols: Column*): Column = {
    require(bits >= 1 && bits * cols.size <= 62,
      s"need 1 <= bits*K <= 62: bits=$bits K=${cols.size}")
    val k = cols.size
    val terms = for {
      (c, ki) <- cols.zipWithIndex
      j <- 0 until bits
    } yield (shiftright(c.cast("long"), j).bitwiseAND(lit(1L)) *
      lit(1L << (j * k + ki)))
    terms.reduce(_ + _)
  }

  /** Write `df` clustered by the Z-value of `zCol` into `numFiles`
    * range-partitioned, internally-sorted files: each output file owns
    * a disjoint z-range, so the engine's min/max stats prune whole
    * files for predicates on any interleaved dimension.
    *
    * Scale shape: one range-exchange (sampled boundaries) + in-partition
    * sort — the same cost as any global sort, paid once at layout time.
    */
  def writeZordered(df: DataFrame, path: String, zCol: Column,
      numFiles: Int): Unit =
    df.withColumn("__z", zCol)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
