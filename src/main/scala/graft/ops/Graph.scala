package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph algorithms over the engine's edge-list representation
  * (SURVEY §2.9 exports vertices/edges as DataFrames; these operators
  * consume exactly that shape). The reference stops at exporting to
  * NetworkX (`kb.py:681-722`) — centrality there is driver-side and
  * single-machine; here the iteration itself is distributed.
  */
object GraphOps {

  /** PageRank (Page et al. 1999) over a directed edge list
    * (src LONG, dst LONG), with dangling-node mass redistributed
    * uniformly each step — the textbook power iteration:
    *
    *   r'(v) = (1-d)/N + d · ( Σ_{u→v} r(u)/outdeg(u)  +  D/N )
    *
    * where D = Σ r(u) over nodes with no out-edges. A FIXED iteration
    * count keeps the operator deterministic and oracle-checkable
    * (convergence deltas are FP-order-sensitive; an iteration count is
    * not).
    *
    * Scale shape: edges are deduplicated once and repartitioned by
    * `src`, and every per-iteration join (rank⋈outdeg, share⋈edges)
    * keys on that same column, so the 100 TB edge table shuffles ONCE
    * at setup and each iteration reuses the layout; the only
    * per-iteration shuffle is the `groupBy(dst)` contribution sum,
    * which is map-side partial. The dangling term is a scalar
    * aggregate action per iteration (a driver-side double, not a data
    * collect). `localCheckpoint` truncates the growing lineage so the
    * plan stays O(1) per iteration instead of O(iters) at replan time.
    *
    * @return (id LONG, rank DOUBLE), Σ rank = 1 up to FP noise
    */
  def pageRank(edges: DataFrame, iters: Int,
      damping: Double = 0.85): DataFrame = {
    require(iters >= 0, s"iters $iters")
    val e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .distinct()
      .repartition(col("src"))
      .persist()
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .distinct().persist()
    val n = nodes.count()
    val outdeg = e.groupBy(col("src"))
      .agg(count(lit(1)).as("outdeg")).persist()
    var ranks = nodes.select(col("id"), (lit(1.0) / n).as("rank"))
      .localCheckpoint()
    var it = 0
    while (it < iters) {
      // mass sitting on dangling nodes (no out-edges) this step
      val dangling = ranks
        .join(outdeg, ranks("id") === outdeg("src"), "left_anti")
        .agg(coalesce(sum(col("rank")), lit(0.0)))
        .collect()(0).getDouble(0)
      val share = ranks.join(outdeg, ranks("id") === outdeg("src"))
        .select(col("id"), (col("rank") / col("outdeg")).as("share"))
      val contribs = share.join(e, share("id") === e("src"))
        .groupBy(col("dst")).agg(sum(col("share")).as("contrib"))
      val next = nodes.join(contribs, nodes("id") === contribs("dst"), "left")
        .select(nodes("id"),
          (lit((1.0 - damping) / n) + lit(damping) *
            (coalesce(col("contrib"), lit(0.0)) + lit(dangling / n)))
            .as("rank"))
        .localCheckpoint()
      ranks.unpersist()
      ranks = next
      it += 1
    }
    e.unpersist(); outdeg.unpersist(); nodes.unpersist()
    ranks
  }
}
