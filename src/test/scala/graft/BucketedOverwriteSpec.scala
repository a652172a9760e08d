package graft

import org.apache.spark.sql.functions._

/** Pins the two Spark capabilities the store's SHARDED bucketed-codes
  * mirror is built on (KbStore.bucketPqCodes with parts > 0):
  *   1. a partitioned + bucketed datasource table accepts a DYNAMIC
  *      partition overwrite (only the shards present in the written
  *      data are replaced) — the O(changed-shards) refresh path;
  *   2. the partitioned table's scan still satisfies clustering on
  *      the bucket column without an exchange (Spark groups each
  *      bucket's files across partition dirs into one task) — the
  *      property AdcCodesJoin's requiredChildDistribution consumes.
  * If a Spark upgrade breaks either, this fails before the store does.
  */
class BucketedOverwriteSpec extends SparkSpec {

  test("dynamic partition overwrite into a partitioned+bucketed table") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS scratch_pb")
    val df = (0L until 1000L).map(i => (i % 16, i, s"code$i"))
      .toDF("cid", "id", "code")
      .withColumn("pp", pmod(col("cid"), lit(4)))
    df.write.mode("overwrite")
      .partitionBy("pp")
      .bucketBy(8, "cid")
      .format("parquet")
      .saveAsTable("scratch_pb")
    assert(spark.table("scratch_pb").count() == 1000)

    // overwrite ONLY pp=1 with modified rows
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      val repl = (0L until 1000L).filter(i => (i % 16) % 4 == 1)
        .map(i => (i % 16, i, s"NEW$i"))
        .toDF("cid", "id", "code")
        .withColumn("pp", pmod(col("cid"), lit(4)))
      repl.write.mode("overwrite")
        .format("parquet")
        .insertInto("scratch_pb")
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    val t = spark.table("scratch_pb")
    assert(t.count() == 1000, "other partitions must survive")
    assert(t.where(col("code").startsWith("NEW")).count() == 250)

    // the inserted files must be REALLY bucketed, not just accepted: a
    // bucket-trusting no-shuffle aggregation sees each cid in exactly
    // one task, so any silently-unbucketed insert would surface as
    // duplicate groups here (not merely as a slow plan)
    val prevAqe0 = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val grouped = spark.table("scratch_pb")
        .groupBy("cid").agg(count(lit(1)).as("n")).collect()
      assert(grouped.length == 16,
        s"each cid must form exactly one group: ${grouped.length}")
      assert(grouped.forall(r =>
        r.getLong(1) == (0L until 1000L).count(_ % 16 == r.getLong(0))),
        "per-cid counts must match the generator")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe0)

    // the scan must still report bucketing: HashPartitioning(cid, 8)
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    try {
      // a groupBy on cid over a bucketed table should need NO exchange
      val plan = spark.table("scratch_pb")
        .groupBy("cid").agg(count(lit(1)))
        .queryExecution.executedPlan
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
      val shuffles = plan.collect { case _: ShuffleExchangeExec => 1 }.size
      assert(shuffles == 0,
        s"bucketed scan must satisfy the cid clustering without exchange:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    spark.sql("DROP TABLE IF EXISTS scratch_pb")
  }
}
