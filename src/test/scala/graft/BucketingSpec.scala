package graft

import org.apache.spark.sql.functions._

/** Scale-path evidence: bucketed tables co-locate equi-joins so the
  * join runs with NO shuffle exchange — the design KbStore-style tables
  * would use on a real cluster (SURVEY §4: partitioning by hot keys).
  */
class BucketingSpec extends SparkSpec {

  test("bucketed join plans without Exchange on either side") {
    val o = Tables.t(spark, sf("0.001"), "orders")
    val l = Tables.t(spark, sf("0.001"), "lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("b_orders")
    l.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("b_lineitem")

    val joined = spark.sql(
      """SELECT /*+ MERGE(o) */ o.o_orderkey, count(*) AS n
        |FROM b_orders o JOIN b_lineitem l ON o.o_orderkey = l.l_orderkey
        |GROUP BY o.o_orderkey""".stripMargin)
    val plan = joined.queryExecution.executedPlan.toString()
    assert(plan.contains("SortMergeJoin"), plan.take(2000))
    // bucketing replaces the pre-join shuffles: no hashpartitioning
    // exchange feeding the join inputs
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(plan).size
    assert(exchanges == 0, s"expected no join-input shuffles, plan:\n$plan")
    assert(joined.count() > 0)
  }
}
