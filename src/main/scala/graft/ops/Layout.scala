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

  /** Z-value over ARBITRARY numeric columns: each column is scaled into
    * [0, 2^bits) by uniform bucketing over its observed (min, max) —
    * one tiny global aggregate — then bit-interleaved with [[zValue]].
    * This is what lets unbounded ids/keys z-cluster (the raw-low-bits
    * contract of [[zValue]] only suits already-bounded values): file
    * min/max stats on the RAW columns stay tight because bucket order
    * preserves value order. Uniform buckets (vs quantiles) keep the
    * mapping a codegen'd width_bucket; heavy skew costs cluster balance,
    * not correctness.
    *
    * Returns `df` with the interleaved key appended as `zName`.
    */
  def withZColumn(df: DataFrame, bits: Int, cols: Seq[String],
      zName: String = "__z"): DataFrame = {
    require(cols.nonEmpty, "need at least one z column")
    val aggs = cols.flatMap(c => Seq(
      min(col(c).cast("double")).as(s"min_$c"),
      max(col(c).cast("double")).as(s"max_$c")))
    val row = df.agg(aggs.head, aggs.tail: _*).head
    val n = 1 << bits
    val scaled = cols.zipWithIndex.map { case (c, i) =>
      // empty table / all-null column: aggregate is null — one bucket
      if (row.isNullAt(2 * i) || row.isNullAt(2 * i + 1)) lit(0L)
      else {
      val (lo, hi) = (row.getDouble(2 * i), row.getDouble(2 * i + 1))
      if (hi <= lo) lit(0L) // constant column: one bucket
      else least(lit(n.toLong - 1),
        greatest(lit(0L),
          (width_bucket(col(c).cast("double"), lit(lo), lit(hi), lit(n))
            - 1).cast("long")))
      }
    }
    df.withColumn(zName, zValue(bits, scaled: _*))
  }

  /** Per-FILE min/max statistics of numeric columns, read from parquet
    * FOOTERS only — no row data is touched. This is the data-skipping
    * manifest of the lakehouse playbook (Delta/Iceberg file stats): at
    * 100 TB the footers are ~10⁻⁵ of the bytes, the manifest is a tiny
    * table computed once per layout and persisted, and file-level
    * pruning happens against IT before any scan task launches.
    *
    * Distributed: the file list fans out over executors, each task
    * opens footers and folds row-group stats to file grain. The live
    * Hadoop conf is shipped as plain entries so remote filesystems
    * (hdfs/s3a) resolve on executors exactly as on the driver.
    *
    * @return (file, column, vmin, vmax, nulls, rows) — one row per
    *         (file, requested column); columns whose chunks carry no
    *         usable numeric stats yield no row (so pruning treats the
    *         file as unskippable for that column — safe).
    */
  def parquetFileStats(spark: org.apache.spark.sql.SparkSession,
      dir: String, statsCols: Seq[String]): DataFrame = {
    import scala.jdk.CollectionConverters._
    import org.apache.hadoop.fs.Path
    import spark.implicits._
    val hconf = spark.sparkContext.hadoopConfiguration
    val files = listParquetFiles(spark, dir)
    val confKv = hconf.iterator().asScala.map(e => (e.getKey, e.getValue))
      .toArray
    val wanted = statsCols.toArray
    spark.sparkContext
      .parallelize(files, math.max(1, math.min(files.size, 64)))
      .flatMap { p =>
        val conf = new org.apache.hadoop.conf.Configuration(false)
        confKv.foreach { case (k, v) => conf.set(k, v) }
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(new Path(p), conf)
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try {
          val blocks = reader.getFooter.getBlocks.asScala.toSeq
          wanted.flatMap { c =>
            val chunks = blocks.flatMap(_.getColumns.asScala
              .find(_.getPath.toDotString == c))
            val stats = chunks.map(_.getStatistics)
            val rows = blocks.map(_.getRowCount).sum
            if (stats.isEmpty || stats.exists(s =>
                s == null || !s.hasNonNullValue)) Nil
            else {
              val mins = stats.map(s =>
                numericStat(s.genericGetMin.asInstanceOf[AnyRef]))
              val maxs = stats.map(s =>
                numericStat(s.genericGetMax.asInstanceOf[AnyRef]))
              if (mins.exists(_.isEmpty) || maxs.exists(_.isEmpty)) Nil
              else Seq((p, c, mins.flatten.min, maxs.flatten.max,
                stats.map(_.getNumNulls).sum, rows))
            }
          }
        } finally reader.close()
      }
      .toDF("file", "column", "vmin", "vmax", "nulls", "rows")
  }

  private def numericStat(v: AnyRef): Option[Double] = v match {
    case n: java.lang.Integer => Some(n.doubleValue)
    case n: java.lang.Long    => Some(n.doubleValue)
    case n: java.lang.Float   => Some(n.doubleValue)
    case n: java.lang.Double  => Some(n.doubleValue)
    case _                    => None // binary/bool stats can't range-prune
  }

  private def listParquetFiles(spark: org.apache.spark.sql.SparkSession,
      dir: String): Seq[String] = {
    import org.apache.hadoop.fs.Path
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.toString).sorted.toSeq
  }

  /** The file subset of `dir` that can contain rows with
    * `column ∈ [lo, hi]`, judged against a [[parquetFileStats]]
    * manifest: a file is pruned only when its stats PROVE emptiness
    * (vmax < lo or vmin > hi). Files absent from the manifest (no
    * usable stats) are conservatively kept.
    */
  def pruneFiles(spark: org.apache.spark.sql.SparkSession, dir: String,
      stats: DataFrame, column: String, lo: Double, hi: Double): Seq[String] = {
    val all = listParquetFiles(spark, dir)
    val skippable = stats
      .where(col("column") === column &&
        (col("vmax") < lo || col("vmin") > hi))
      .select("file").collect().map(_.getString(0)).toSet
    all.filterNot(skippable)
  }

  /** Data-skipping scan: read only the files [[pruneFiles]] keeps, then
    * apply the row-level predicate (file skipping is coarse — survivors
    * still carry out-of-range rows). Semantically identical to a full
    * scan + filter; a LayoutSpec case asserts both the parity and that
    * z-ordered layouts actually shed files on single-dimension ranges.
    */
  def skippingScan(spark: org.apache.spark.sql.SparkSession, dir: String,
      stats: DataFrame, column: String, lo: Double, hi: Double): DataFrame = {
    val kept = pruneFiles(spark, dir, stats, column, lo, hi)
    if (kept.isEmpty) {
      spark.read.parquet(dir).where(lit(false))
    } else {
      spark.read.parquet(kept: _*)
        .where(col(column) >= lo && col(column) <= hi)
    }
  }
}
