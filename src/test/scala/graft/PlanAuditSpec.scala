package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.execution.window.WindowExec

/** Physical-plan regression gate (r7): the x23 lesson was that a
  * scale-killer SHAPE (a single-partition global window) can hide
  * behind a green oracle row and only surface as a timed-out driver
  * bench. This spec pins the plan shape of the structurally riskiest
  * queries so the next one fails `sbt test` instead.
  *
  * Three audited properties, in order of severity:
  *   - NO WindowExec with an empty partitionSpec, in ANY audited query
  *     — a global-ORDER-BY window funnels the whole table through one
  *     task (the final presentation `orderBy` of an oracle query is a
  *     Sort/TakeOrdered, not a Window, and stays allowed);
  *   - NO CartesianProductExec — broadcast-singleton cross joins plan
  *     as BroadcastNestedLoopJoin and stay allowed; a real cartesian
  *     product means a join lost its equi-keys;
  *   - a per-query SHUFFLE-COUNT ceiling — a refactor that doubles a
  *     query's exchanges changes its scale behavior even when the
  *     answer stays right. Ceilings are the audited r7 counts; lower
  *     is always fine.
  *
  * Plans are compiled with AQE off (AQE rewrites would hide the static
  * exchange count) and never executed — the audit is shape, not time.
  */
class PlanAuditSpec extends SparkSpec {

  private case class Shape(shuffles: Int, globalWindows: Int,
      cartesians: Int)

  private def audit(name: String): Shape = {
    val fn = SparkEntry.queries(name)
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = fn(spark, sf("0.001")).queryExecution.executedPlan
      Shape(
        plan.collect { case _: ShuffleExchangeExec => 1 }.size,
        plan.collect { case w: WindowExec if w.partitionSpec.isEmpty => 1 }.size,
        plan.collect { case _: CartesianProductExec => 1 }.size)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  /** Shuffle-count ceilings for the bench's most expensive part-1
    * queries plus every shape-risky family (windows, self-joins,
    * explodes, z-order, iterative drivers). Values are the audited
    * r7/r8 counts; lower is always fine.
    */
  private val budgets: Map[String, Int] = Map(
    "v1_retrieve_topk" -> 4,
    "j3_pairwise_topk" -> 1,
    "j3b_pairwise_blocked" -> 0,
    // r10: per-row UDF rewrite — the exchanges left are the loader's
    // round-robin spread of the single-file table and the final ORDER
    // BY's range partitioning; a reappearing n-gram shuffle fails here
    "x11_repetition" -> 2,
    "x23_zorder" -> 1,
    "x5_dup_ngram_fraction" -> 5,
    "d2_minhash_lsh" -> 4,
    "d13_substring_dedup" -> 9,
    "b1_bm25_topk" -> 5,
    "w1_window_lag" -> 2,
    "w2_topk_per_group" -> 2,
    "w3_running_distinct" -> 3,
    "e3_sliding_count" -> 2,
    "q18_large_volume" -> 2,
    "u3_distinct" -> 3,
    "x26_cms_registers" -> 3,
    "x28_grouped_hll" -> 3,
    // r8 additions: the remaining top-cost part-1 queries
    "x22_classifier" -> 7,
    "x15_bpe_merges" -> 1,
    "x19_bpe_encode" -> 2,
    "d4_ngram_jaccard" -> 8,
    "g3_pagerank" -> 4,
    "g4_triangles" -> 6,
    "d9_contamination" -> 8,
    "d6_semantic_dedup" -> 6,
    "d15_semdedup" -> 7,
    "d3b_simhash_banded" -> 4,
    "x14_ngram_ppl" -> 10,
    "x21_dsir_weights" -> 13,
    "c1_clusters" -> 4,
    "b3_hybrid_rrf" -> 8,
    "q2_min_cost_supplier" -> 6)

  test("no audited query plans a single-partition window, a cartesian " +
      "product, or more shuffles than its pinned ceiling") {
    val shapes = budgets.keys.toSeq.sorted.map(n => n -> audit(n))
    val report = shapes.map { case (n, s) =>
      s"$n: shuffles=${s.shuffles} globalWindows=${s.globalWindows} " +
        s"cartesians=${s.cartesians} (ceiling ${budgets(n)})"
    }.mkString("\n")
    val bad = shapes.filter { case (n, s) =>
      s.globalWindows > 0 || s.cartesians > 0 || s.shuffles > budgets(n)
    }
    assert(bad.isEmpty, s"plan-shape regressions:\n$report")
  }

  test("EVERY query in the inventory compiles free of single-partition " +
      "windows and cartesian products (r8: global gate, all queries)") {
    // the two severity-one properties extended to the full inventory:
    // any query — not just the pinned-ceiling set — that picks up a
    // global-ORDER-BY window or loses its join keys fails here before
    // it can cost a driver bench. Compile-only at sf0.001 (iterative
    // queries run their tiny driver loops while building the frame;
    // that is seconds at this SF and buys the audit full coverage).
    val shapes = SparkEntry.queries.keys.toSeq.sorted.map(n => n -> audit(n))
    val bad = shapes.filter { case (_, s) =>
      s.globalWindows > 0 || s.cartesians > 0 }
    val report = bad.map { case (n, s) =>
      s"$n: globalWindows=${s.globalWindows} cartesians=${s.cartesians}"
    }.mkString("\n")
    assert(bad.isEmpty, s"scale-killer plan shapes:\n$report")
    assert(shapes.size == SparkEntry.queries.size)
  }
}
