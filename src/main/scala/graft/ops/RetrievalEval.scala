package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Offline retrieval-quality evaluation — the measurement step a
  * retrieval/embedding training pipeline runs after every index or
  * model change (the reference has retrieval but no way to score it).
  * Standard TREC-style ranking metrics per query, over plain
  * DataFrames:
  *
  *   - recall@k: relevant retrieved in the top-k / total relevant
  *   - MRR@k: 1 / rank of the first relevant result (0 if none)
  *   - nDCG@k: Σ (2^grade − 1)/log2(rank+1), normalized by the ideal
  *     ordering of that query's own judged grades (Järvelin &
  *     Kekäläinen 2002)
  *
  * Scale shape: one equi-join of the k-bounded results against the
  * judgments, per-query aggregations, and one window over the
  * judgments (partitioned by query, to compute the ideal DCG) — every
  * shuffle is keyed by `qid`; nothing is corpus-sized unless the
  * judgment file is.
  */
object RetrievalEval {

  /** Per-query metrics. `results` carries `(qid, cid, rk)` with rk
    * 1-based (ties already broken — the contract every retrieval op
    * here meets); `qrels` carries `(qid, cid, grade)` with grade > 0
    * meaning relevant. Queries present in `qrels` but missing from
    * `results` score 0 on all three metrics; queries with no judgments
    * are dropped (their metrics are undefined).
    */
  def metrics(results: DataFrame, qrels: DataFrame, k: Int): DataFrame = {
    val r = results.where(col("rk") <= k)
      .select(col("qid"), col("cid"), col("rk"))
    val judged = r.join(qrels, Seq("qid", "cid"), "inner")
    val perQ = judged.groupBy(col("qid")).agg(
      sum(when(col("grade") > 0, 1L).otherwise(0L)).as("hits"),
      min(when(col("grade") > 0, col("rk"))).as("first_rel"),
      sum(when(col("grade") > 0,
          (pow(lit(2.0), col("grade")) - 1.0) / log2(col("rk") + 1))
        .otherwise(0.0)).as("dcg"))
    val totals = qrels.where(col("grade") > 0)
      .groupBy(col("qid")).agg(count(lit(1)).as("n_rel"))
    val wIdeal = Window.partitionBy(col("qid"))
      .orderBy(desc("grade"), col("cid"))
    val idcg = qrels.where(col("grade") > 0)
      .withColumn("irk", row_number().over(wIdeal))
      .where(col("irk") <= k)
      .groupBy(col("qid"))
      .agg(sum((pow(lit(2.0), col("grade")) - 1.0) / log2(col("irk") + 1))
        .as("idcg"))
    totals.join(idcg, Seq("qid"), "inner")
      .join(perQ, Seq("qid"), "left")
      .select(col("qid"),
        round(coalesce(col("hits"), lit(0L)) / col("n_rel"), 6).as("recall"),
        round(coalesce(lit(1.0) / col("first_rel"), lit(0.0)), 6).as("mrr"),
        round(coalesce(col("dcg"), lit(0.0)) / col("idcg"), 6).as("ndcg"))
  }
}
