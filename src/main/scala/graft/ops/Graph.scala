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
    * which is map-side partial. The dangling term is a one-row
    * aggregate broadcast-crossed into the same iteration DAG (round
    * 14: it was previously a driver `collect()` per iteration — an
    * extra scheduled job and a driver round-trip each step, the
    * "driver loop in the query path" shape guide §5 bans; same sum,
    * same IEEE division, one fewer action per iteration).
    * `localCheckpoint` truncates the growing lineage so the plan
    * stays O(1) per iteration instead of O(iters) at replan time.
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
      // mass sitting on dangling nodes (no out-edges) this step — a
      // one-row aggregate, broadcast-crossed into the iteration's DAG
      // below instead of collect()ed to the driver
      val dangling = ranks
        .join(outdeg, ranks("id") === outdeg("src"), "left_anti")
        .agg(coalesce(sum(col("rank")), lit(0.0)).as("dangling"))
      val share = ranks.join(outdeg, ranks("id") === outdeg("src"))
        .select(col("id"), (col("rank") / col("outdeg")).as("share"))
      val contribs = share.join(e, share("id") === e("src"))
        .groupBy(col("dst")).agg(sum(col("share")).as("contrib"))
      val next = nodes.join(contribs, nodes("id") === contribs("dst"), "left")
        .crossJoin(broadcast(dangling))
        .select(nodes("id"),
          (lit((1.0 - damping) / n) + lit(damping) *
            (coalesce(col("contrib"), lit(0.0)) + col("dangling") / n))
            .as("rank"))
        .localCheckpoint()
      ranks.unpersist()
      ranks = next
      it += 1
    }
    e.unpersist(); outdeg.unpersist(); nodes.unpersist()
    ranks
  }

  /** Per-node triangle counts over an UNDIRECTED edge list, by
    * degree-ordered wedge closing (Cohen's MapReduce formulation,
    * MapReduce/Hadoop triangle counting; also Suri & Vassilvitskii
    * WWW'11): orient each edge from its (degree, id)-smaller endpoint
    * to the larger, enumerate wedges only from ORIENTED out-neighbor
    * pairs, and close them against the undirected edge set. The
    * orientation bounds every out-degree by O(√m), so wedge volume is
    * O(m^1.5) worst-case instead of Σ deg² — the difference between a
    * skewed 100 TB graph completing and its hub nodes exploding (a
    * celebrity node with 10⁸ followers contributes ZERO wedges from
    * its in-side).
    *
    * Shuffle shape: degree computation (one map-side-combinable agg),
    * the wedge self-join keyed on the wedge apex, the closing
    * equi-join keyed on (lo, hi), and the final per-node explode+agg.
    * No cartesian anywhere; every join is an equi-join.
    *
    * Input rows may list an edge in either or both directions;
    * self-loops are dropped. @return (id, triangles) — nodes in no
    * triangle report 0.
    */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val und = edges
      .select(least(col("src"), col("dst")).cast("long").as("lo"),
        greatest(col("src"), col("dst")).cast("long").as("hi"))
      .where(col("lo") =!= col("hi"))
      .distinct()
      .persist()
    val deg = und.select(col("lo").as("id"))
      .union(und.select(col("hi").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
      .persist()
    // orient lo→hi when (deg,id) of lo < (deg,id) of hi, else hi→lo
    val dLo = deg.select(col("id").as("lo"), col("deg").as("dlo"))
    val dHi = deg.select(col("id").as("hi"), col("deg").as("dhi"))
    val oriented = und.join(dLo, "lo").join(dHi, "hi")
      .select(
        when(col("dlo") < col("dhi") ||
          (col("dlo") === col("dhi") && col("lo") < col("hi")),
          col("lo")).otherwise(col("hi")).as("u"),
        when(col("dlo") < col("dhi") ||
          (col("dlo") === col("dhi") && col("lo") < col("hi")),
          col("hi")).otherwise(col("lo")).as("v"))
      .persist()
    val w1 = oriented.select(col("u"), col("v").as("a"))
    val w2 = oriented.select(col("u"), col("v").as("b"))
    val wedges = w1.join(w2, "u").where(col("a") < col("b"))
    val triangles = wedges.join(und,
        least(col("a"), col("b")) === col("lo") &&
        greatest(col("a"), col("b")) === col("hi"))
      .select(col("u"), col("a"), col("b"))
    val perNode = triangles
      .select(explode(array(col("u"), col("a"), col("b"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("triangles"))
    // materialize before releasing the cached inputs (they are each
    // read 2-3 times above; localCheckpoint keeps the result eager so
    // the unpersists don't trigger recomputation at the caller's action)
    val out = deg.select(col("id"))
      .join(perNode, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("triangles"), lit(0L)).as("triangles"))
      .localCheckpoint()
    und.unpersist(); deg.unpersist(); oriented.unpersist()
    out
  }
}
