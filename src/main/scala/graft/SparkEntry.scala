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
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

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

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
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
