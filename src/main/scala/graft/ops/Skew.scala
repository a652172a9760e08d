package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY §4: salting for hot keys).
  *
  * At 100 TB a handful of hot keys (one dominant language, one
  * near-universal shingle) can pin a whole aggregation on one reducer.
  * Salted two-phase aggregation spreads each key over `salts` reducers
  * and recombines — the manual form of what AQE's skew-join handling
  * does for joins, applicable to aggregations where AQE does not reach.
  */
object Skew {

  /** Two-phase salted count/sum aggregation:
    * groupBy(key, salt) partial → groupBy(key) final. Exactly equal to
    * the direct aggregation for any decomposable aggregate.
    *
    * @param aggs (partialAgg, finalAgg) column pairs sharing an alias,
    *             e.g. `count(lit(1))` then `sum(col)`.
    */
  def saltedAgg(df: DataFrame, key: Column, salts: Int,
      partial: Seq[(Column, String)],
      finalAgg: Seq[String => Column]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
    val phase1 = salted
      .groupBy(key.as("__key"), col("__salt"))
      .agg(partial.head._1.as(partial.head._2),
        partial.tail.map { case (c, n) => c.as(n) }: _*)
    phase1.groupBy(col("__key"))
      .agg(finalAgg.head(partial.head._2).as(partial.head._2),
        finalAgg.tail.zip(partial.tail.map(_._2))
          .map { case (f, n) => f(n).as(n) }: _*)
      .withColumnRenamed("__key", "key")
  }

  /** Convenience: salted count-distinct-free count + sum. */
  def saltedCountSum(df: DataFrame, key: Column, value: Column,
      salts: Int = 16): DataFrame =
    saltedAgg(df, key, salts,
      partial = Seq(count(lit(1)) -> "n", sum(value) -> "total"),
      finalAgg = Seq(n => sum(col(n)), n => sum(col(n))))
}
