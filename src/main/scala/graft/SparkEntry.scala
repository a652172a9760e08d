package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in `queries` maps one operator of SURVEY.md §2 (or a scale
  * extension, §7.5) to a Spark DataFrame pipeline; `oracleSql` carries the
  * DuckDB-equivalent SQL the driver hash-compares against.
  *
  * Conventions for oracle determinism:
  *   - every query ends with a total ORDER BY (all tie-breaking keys);
  *   - floating-point outputs are rounded (4-6 decimals) in BOTH engines;
  *   - vector math is done in double precision in BOTH engines;
  *   - column names are identical in both (aliased everywhere).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * This is the reference's `KB.retrieve` shape (SURVEY §3.1).
    */
  def entry(spark: SparkSession): DataFrame =
    queries("v1_retrieve_topk")(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------------
  // helpers
  // ---------------------------------------------------------------------
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.t(s, dir, name)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    coreQueries ++ relationalQueries

  private def coreQueries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // --- §2.1 scans -----------------------------------------------------
    // S4 full-table scan (kb.py:724-774): plain projection scan.
    "s4_scan" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "region").select($"r_regionkey", $"r_name")
        .orderBy($"r_regionkey")
    }),

    // S5 embedding-matrix scan + A4 dim probe (kb.py:573-618): row count +
    // uniform-dimensionality assertion, expressed as one aggregate.
    "s5_emb_scan_dims" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "embeddings")
        .agg(
          count(lit(1)).as("n_vecs"),
          countDistinct(size($"embedding")).as("n_dims"),
          min(size($"embedding")).as("dim"))
    }),

    // --- §2.2 projections / filters ------------------------------------
    // P1 point lookup by id (fetch_doc, kb.py:416-473).
    "p1_point_lookup" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .filter($"doc_id" === 42L)
        .select($"doc_id", $"lang", $"source", $"n_chars")
    }),

    // P2/P3 indexed filter (children-of / level): equality filter returning
    // id-ordered rows (tests pin id order — tests/test_kb.py:302-319).
    "p2_filter_eq" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .filter($"o_custkey" === 7L)
        .select($"o_orderkey", $"o_custkey", $"o_orderstatus", $"o_totalprice")
        .orderBy($"o_orderkey")
    }),

    // P6 disjunctive predicate (incident-edge scan, kb.py:371-379).
    "p6_disjunctive" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .filter($"user_id" === 11L || $"event_type" === "signup")
        .select($"event_id", $"user_id", $"event_type")
        .orderBy($"event_id")
    }),

    // P8 pruned projection + range predicate: only 2 columns read, filter
    // pushed to parquet (include_embedding=False analog, kb.py:465-473).
    "p8_prune_project" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .filter($"l_shipdate" >= lit("1999-01-01").cast("timestamp") &&
                $"l_discount" > 0.07)
        .select($"l_orderkey", $"l_linenumber", $"l_extendedprice")
        .orderBy($"l_orderkey", $"l_linenumber")
    }),

    // --- §2.4 aggregations ----------------------------------------------
    // A1-A3 counts (count_docs/count_edges/count_keys).
    "a1_counts" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem").agg(
        count(lit(1)).as("n_rows"),
        countDistinct($"l_orderkey").as("n_orders"),
        round(sum($"l_quantity"), 4).as("sum_qty"),
        round(min($"l_extendedprice"), 4).as("min_price"),
        round(max($"l_extendedprice"), 4).as("max_price"))
    }),

    // A5 vector L2-norm magnitude check (embeddings/util.py:26-41,
    // tolerance kb.py:58): count of out-of-spec vectors must be 0.
    "a5_norm_check" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "embeddings")
        .select(l2Norm(asDouble($"embedding")).as("nrm"))
        .agg(
          count(lit(1)).as("n"),
          sum(when(abs($"nrm" - 1.0) > 0.001, 1L).otherwise(0L)).as("n_bad"),
          round(min($"nrm"), 4).as("min_norm"),
          round(max($"nrm"), 4).as("max_norm"))
    }),

    // TPC-H Q1 shape: grouped aggregation with map-side partial agg.
    "a7_group_agg" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .filter($"l_shipdate" <= lit("2000-09-02").cast("timestamp"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          round(sum($"l_quantity"), 4).as("sum_qty"),
          round(sum($"l_extendedprice"), 4).as("sum_base_price"),
          round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 4).as("sum_disc_price"),
          round(avg($"l_quantity"), 6).as("avg_qty"),
          round(avg($"l_discount"), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    }),

    // --- §2.3 joins ------------------------------------------------------
    // J1 docs ⋈ embeddings 1:1 equi-join (kb.py:441-456) — broadcast the
    // dimension-probe side; here documents⋈embeddings on id.
    "j1_doc_emb_join" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      val emb = t(s, dir, "embeddings")
      docs.join(emb, docs("doc_id") === emb("vec_id"), "inner")
        .select($"doc_id", $"lang", $"label",
          round(l2Norm(asDouble($"embedding")), 4).as("nrm"))
        .filter($"label" === 3)
        .orderBy($"doc_id")
    }),

    // TPC-H Q3 shape: 3-way join + group + top-k by aggregate.
    "j2_join_agg_topk" -> ((s, dir) => {
      import s.implicits._
      val c = t(s, dir, "customer").filter($"c_mktsegment" === "BUILDING")
      val o = t(s, dir, "orders").filter($"o_orderstatus" === "O")
      val l = t(s, dir, "lineitem")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy($"o_orderkey")
        .agg(round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 4).as("revenue"),
             count(lit(1)).as("n_lines"))
        .orderBy(desc("revenue"), $"o_orderkey")
        .limit(20)
    }),

    // --- §2.5 sorts / top-k ----------------------------------------------
    // T1 top-k selection (util.py:190-203): orderBy+limit →
    // TakeOrderedAndProject (per-partition bounded heap + merge), with the
    // reference's pinned tie order made explicit via secondary keys.
    "t1_topk" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .select($"l_orderkey", $"l_linenumber", $"l_extendedprice")
        .orderBy(desc("l_extendedprice"), desc("l_orderkey"), desc("l_linenumber"))
        .limit(100)
    }),

    // --- retrieval (§3.1 flagship) --------------------------------------
    // T3/J2: score every vector against a query vector (dot product on
    // unit-norm vectors = cosine, kb.py:55-58), top-k, then join back to
    // documents for the result rows (kb.py:1608-1640).
    "v1_retrieve_topk" -> ((s, dir) => {
      import s.implicits._
      val emb = t(s, dir, "embeddings")
      val docs = t(s, dir, "documents")
      val qv = emb.filter($"vec_id" === 0L)
        .select(asDouble($"embedding").as("qv"))
      val scored = emb
        .crossJoin(broadcast(qv))
        .select($"vec_id",
          round(dot(asDouble($"embedding"), $"qv"), 6).as("score"))
        .orderBy(desc("score"), $"vec_id")
        .limit(10)
      scored.join(docs, scored("vec_id") === docs("doc_id"))
        .select($"vec_id", $"score", $"lang", $"n_chars")
        .orderBy(desc("score"), $"vec_id")
    })
  )

  private def relationalQueries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // --- §2.3 J3 / §2.5 T2: pairwise similarity self-join + top-k pairs
    // (document_top_pairwise_scores, kb.py:1642-1671; upper triangle i<j,
    // util.py:206-233). Exact all-pairs here; the LSH scale path is the
    // d*_ dedup/ANN family.
    "j3_pairwise_topk" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "embeddings")
        .select($"vec_id".as("id"), asDouble($"embedding").as("v"))
      val a = e.as("a"); val b = e.as("b")
      a.join(b, $"a.id" < $"b.id")
        .select($"a.id".as("id1"), $"b.id".as("id2"),
          round(dot($"a.v", $"b.v"), 6).as("score"))
        .orderBy(desc("score"), $"id1", $"id2")
        .limit(25)
    }),

    // --- §2.3 J4: existence semi-join (delete-guard shape, kb.py:360-370).
    "j4_semi_join" -> ((s, dir) => {
      import s.implicits._
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter($"o_orderstatus" === "P")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select($"c_custkey", $"c_name")
        .orderBy($"c_custkey")
    }),

    // anti-join (bulk-delete rewrite shape, SURVEY §2.8 M3).
    "j5_anti_join" -> ((s, dir) => {
      import s.implicits._
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select($"c_custkey", $"c_acctbal")
        .orderBy($"c_custkey")
    }),

    // --- §2.6 set ops.
    "u1_intersect" -> ((s, dir) => {
      import s.implicits._
      val c = t(s, dir, "customer")
      c.filter($"c_mktsegment" === "BUILDING").select($"c_nationkey")
        .intersect(
          c.filter($"c_mktsegment" === "MACHINERY").select($"c_nationkey"))
        .orderBy($"c_nationkey")
    }),

    "u2_except" -> ((s, dir) => {
      import s.implicits._
      val n = t(s, dir, "nation")
      n.select($"n_regionkey")
        .except(
          t(s, dir, "customer").filter($"c_acctbal" < 0)
            .join(n, col("c_nationkey") === n("n_nationkey"))
            .select($"n_regionkey"))
        .orderBy($"n_regionkey")
    }),

    // --- §2.2 P7: existence aggregate (directedness probe, kb.py:685-695).
    "p7_exists_probe" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "events").agg(
        (sum(when($"event_type" === "purchase", 1L).otherwise(0L)) > 0L)
          .as("any_purchase"),
        (sum(when($"event_type" === "refund", 1L).otherwise(0L)) > 0L)
          .as("any_refund"))
    }),

    // --- windowed analytics (scale extension; §2.5 order semantics).
    // Per-user event sequencing: row_number + inter-event gap via lag.
    "w1_window_lag" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      t(s, dir, "events")
        .filter($"user_id" < 25L)
        .withColumn("rn", row_number().over(w))
        .withColumn("gap_us",
          coalesce(unix_micros($"ts") - lag(unix_micros($"ts"), 1).over(w), lit(0L)))
        .select($"event_id", $"user_id", $"rn", $"gap_us")
        .orderBy($"user_id", $"rn")
    }),

    // --- §2.8 M6: KV upsert keep-last semantics as a batch operator
    // (INSERT ON CONFLICT DO UPDATE, kb.py:165-173): last event per user.
    "kv1_keep_last" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"user_id")
        .orderBy(desc("ts"), desc("event_id"))
      t(s, dir, "events")
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"user_id", $"event_id", round($"value", 4).as("last_value"))
        .orderBy($"user_id")
    }),

    // --- grouping sets (scale extension beyond reference's flat aggs).
    "r1_rollup" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .rollup($"l_returnflag", $"l_linestatus")
        .agg(round(sum($"l_quantity"), 4).as("sum_qty"),
             count(lit(1)).as("n"))
        .select(coalesce($"l_returnflag", lit("ALL")).as("rf"),
          coalesce($"l_linestatus", lit("ALL")).as("ls"),
          $"sum_qty", $"n")
        .orderBy($"rf", $"ls")
    }),

    // --- time-bucketed aggregation (batch twin of the streaming windowed
    // agg, SURVEY §7.6): hourly per-type event rollup.
    "e1_time_bucket" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .groupBy(date_format(date_trunc("hour", $"ts"), "yyyy-MM-dd HH:mm:ss")
          .as("hour"), $"event_type")
        .agg(count(lit(1)).as("n"), round(sum($"value"), 4).as("sum_value"))
        .orderBy($"hour", $"event_type")
    }),

    // --- §2.9 G2: DFS pre-order traversal over a synthetic forest
    // (parent(i) = i/10): iterative level joins materialize id-paths,
    // pre-order = lexicographic path order (kb.py:1580-1593 semantics).
    "g2_dfs_preorder" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val docs = t(s, dir, "documents")
        .select($"doc_id".as("id"), floor($"doc_id" / 10).cast("long").as("parent_id"))
      val paths = graft.ops.Hierarchy.withPaths(
        docs, "id", "parent_id", col("id") === 0L)
      paths
        .withColumn("preorder",
          row_number().over(Window.orderBy($"path")))
        .select($"id".as("doc_id"), $"depth", $"preorder",
          concat_ws("/", $"path").as("path_str"))
        .orderBy($"preorder")
    })
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = coreOracle ++ relationalOracle

  private def relationalOracle: Map[String, String] = Map(
    "j3_pairwise_topk" ->
      """SELECT a.vec_id AS id1, b.vec_id AS id2,
         round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS score
         FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         ORDER BY score DESC, id1, id2
         LIMIT 25""",

    "j4_semi_join" ->
      """SELECT c_custkey, c_name FROM customer c
         WHERE EXISTS (SELECT 1 FROM orders o
                       WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
         ORDER BY c_custkey""",

    "j5_anti_join" ->
      """SELECT c_custkey, c_acctbal FROM customer c
         WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
         ORDER BY c_custkey""",

    "u1_intersect" ->
      """SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
         INTERSECT
         SELECT c_nationkey FROM customer WHERE c_mktsegment = 'MACHINERY'
         ORDER BY c_nationkey""",

    "u2_except" ->
      """SELECT n_regionkey FROM nation
         EXCEPT
         SELECT n.n_regionkey FROM customer c
         JOIN nation n ON c.c_nationkey = n.n_nationkey
         WHERE c.c_acctbal < 0
         ORDER BY n_regionkey""",

    "p7_exists_probe" ->
      """SELECT (sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) > 0) AS any_purchase,
                (sum(CASE WHEN event_type = 'refund' THEN 1 ELSE 0 END) > 0) AS any_refund
         FROM events""",

    "w1_window_lag" ->
      """WITH e AS (
           SELECT event_id, user_id, ts,
                  epoch_ns(ts) // 1000 AS us
           FROM events WHERE user_id < 25)
         SELECT event_id, user_id,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
         coalesce(us - lag(us, 1)
           OVER (PARTITION BY user_id ORDER BY ts, event_id), 0) AS gap_us
         FROM e
         ORDER BY user_id, rn""",

    "kv1_keep_last" ->
      """SELECT user_id, event_id, round(value, 4) AS last_value FROM (
           SELECT user_id, event_id, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
           FROM events) WHERE rn = 1
         ORDER BY user_id""",

    "r1_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
                coalesce(l_linestatus, 'ALL') AS ls,
                round(sum(l_quantity), 4) AS sum_qty,
                count(*) AS n
         FROM lineitem
         GROUP BY ROLLUP(l_returnflag, l_linestatus)
         ORDER BY rf, ls""",

    "e1_time_bucket" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
                event_type, count(*) AS n, round(sum(value), 4) AS sum_value
         FROM events
         GROUP BY 1, 2
         ORDER BY hour, event_type""",

    "g2_dfs_preorder" ->
      """WITH RECURSIVE tree(doc_id, path) AS (
           SELECT doc_id, [doc_id] FROM documents WHERE doc_id = 0
           UNION ALL
           SELECT d.doc_id, list_append(t.path, d.doc_id)
           FROM documents d JOIN tree t
             ON CAST(floor(d.doc_id / 10) AS BIGINT) = t.doc_id
           WHERE d.doc_id > 0)
         SELECT doc_id, len(path) AS depth,
                row_number() OVER (ORDER BY path) AS preorder,
                array_to_string(path, '/') AS path_str
         FROM tree
         ORDER BY preorder"""
  )

  private def coreOracle: Map[String, String] = Map(
    "s4_scan" ->
      """SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey""",

    "s5_emb_scan_dims" ->
      """SELECT count(*) AS n_vecs,
         count(DISTINCT len(embedding)) AS n_dims,
         min(len(embedding)) AS dim
         FROM embeddings""",

    "p1_point_lookup" ->
      """SELECT doc_id, lang, source, n_chars FROM documents WHERE doc_id = 42""",

    "p2_filter_eq" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
         FROM orders WHERE o_custkey = 7 ORDER BY o_orderkey""",

    "p6_disjunctive" ->
      """SELECT event_id, user_id, event_type FROM events
         WHERE user_id = 11 OR event_type = 'signup' ORDER BY event_id""",

    "p8_prune_project" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1999-01-01' AND l_discount > 0.07
         ORDER BY l_orderkey, l_linenumber""",

    "a1_counts" ->
      """SELECT count(*) AS n_rows,
         count(DISTINCT l_orderkey) AS n_orders,
         round(sum(l_quantity), 4) AS sum_qty,
         round(min(l_extendedprice), 4) AS min_price,
         round(max(l_extendedprice), 4) AS max_price
         FROM lineitem""",

    "a5_norm_check" ->
      """WITH n AS (
           SELECT sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
           FROM embeddings)
         SELECT count(*) AS n,
                sum(CASE WHEN abs(nrm - 1.0) > 0.001 THEN 1 ELSE 0 END) AS n_bad,
                round(min(nrm), 4) AS min_norm,
                round(max(nrm), 4) AS max_norm
         FROM n""",

    "a7_group_agg" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity), 4) AS sum_qty,
         round(sum(l_extendedprice), 4) AS sum_base_price,
         round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS sum_disc_price,
         round(avg(l_quantity), 6) AS avg_qty,
         round(avg(l_discount), 6) AS avg_disc,
         count(*) AS count_order
         FROM lineitem
         WHERE l_shipdate <= TIMESTAMP '2000-09-02'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",

    "j1_doc_emb_join" ->
      """SELECT d.doc_id, d.lang, e.label,
         round(sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])), 4) AS nrm
         FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
         WHERE e.label = 3
         ORDER BY d.doc_id""",

    "j2_join_agg_topk" ->
      """SELECT o.o_orderkey,
         round(sum(l.l_extendedprice * (1.0 - l.l_discount)), 4) AS revenue,
         count(*) AS n_lines
         FROM lineitem l
         JOIN orders o ON l.l_orderkey = o.o_orderkey
         JOIN customer c ON o.o_custkey = c.c_custkey
         WHERE c.c_mktsegment = 'BUILDING' AND o.o_orderstatus = 'O'
         GROUP BY o.o_orderkey
         ORDER BY revenue DESC, o.o_orderkey
         LIMIT 20""",

    "t1_topk" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
         ORDER BY l_extendedprice DESC, l_orderkey DESC, l_linenumber DESC
         LIMIT 100""",

    "v1_retrieve_topk" ->
      """WITH q AS (
           SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
         scored AS (
           SELECT e.vec_id,
                  round(list_dot_product(e.embedding::DOUBLE[], q.qv), 6) AS score
           FROM embeddings e, q
           ORDER BY score DESC, e.vec_id
           LIMIT 10)
         SELECT s.vec_id, s.score, d.lang, d.n_chars
         FROM scored s JOIN documents d ON s.vec_id = d.doc_id
         ORDER BY s.score DESC, s.vec_id"""
  )
}
