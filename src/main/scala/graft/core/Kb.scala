package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.Embeddings.EmbeddingProvider
import graft.core.Model.{Doc, Retrieval}

/** User-facing facade reproducing the reference's `KB` API surface
  * (SURVEY.md Appendix A; `/root/reference/src/svs/kb.py:1407-1799`).
  * One synchronous API — Spark jobs are the async substrate, so the
  * reference's KB/AsyncKB duplication collapses into this single class.
  *
  * Construction mirrors `KB(path, embedding_func, force_fresh_db)`
  * (`kb.py:1410-1435`): the provider's params are persisted in the store
  * meta on create and validated on re-open (`kb.py:896-922` — a
  * mismatched provider warns rather than fails, same as the reference).
  */
final class Kb private (
    val store: KbStore,
    val provider: EmbeddingProvider) {

  private val checked = Embeddings.withMagnitudeCheck(provider)

  // ---- reads ----
  /** `len(kb)` (`kb.py:1797-1799`). */
  def length: Long = store.len

  /** `kb.retrieve(query, n)` (`kb.py:1608`). */
  def retrieve(query: String, n: Int): Seq[Retrieval] =
    store.retrieve(query, n, checked)

  /** `kb.document_top_pairwise_scores(n)` (`kb.py:1642`). */
  def documentTopPairwiseScores(n: Int): Seq[(Double, Doc, Doc)] =
    store.topPairwiseScores(n)

  // ---- bulk scopes (`kb.py:1486-1795`) ----
  /** `with kb.bulk_add_docs() as add_doc:` */
  def bulkAddDocs(body: KbStore.DocAdder => Unit): Seq[Long] =
    store.bulkAddDocs(checked)(body)

  /** `with kb.bulk_del_docs() as del_doc:` */
  def bulkDelDocs(ids: Seq[Long]): Unit = store.bulkDelDocs(ids)

  /** Scale face of bulk delete: ids as a DataFrame, set semantics. */
  def bulkDelDocsDistributed(ids: org.apache.spark.sql.DataFrame): Unit =
    store.bulkDelDocsDistributed(ids)

  // ---- persistent ANN index (scale extension; no reference analog) ----
  def buildAnnIndex(nlist: Int = 64, iters: Int = 2): Unit =
    store.buildAnnIndex(nlist, iters)
  def refreshAnnIndex(): Unit = store.refreshAnnIndex()
  def annIndexState: KbStore.AnnState = store.annIndexState
  def annRetrieve(query: String, n: Int, nProbe: Int = 8): Seq[Retrieval] =
    store.annRetrieve(query, n, checked, nProbe)
  def knnJoin(queries: org.apache.spark.sql.DataFrame, k: Int,
      nProbe: Int = 8): org.apache.spark.sql.DataFrame =
    store.knnJoin(queries, k, nProbe)

  // ---- persistent int8 compressed tier (scale extension) ----
  def buildSqIndex(): Unit = store.buildSqIndex()
  def refreshSqIndex(): Unit = store.refreshSqIndex()
  def sqIndexState: KbStore.AnnState = store.sqIndexState
  def sqRetrieve(query: String, n: Int, rerank: Int = 100): Seq[Retrieval] =
    store.sqRetrieve(query, n, checked, rerank)

  // ---- persistent IVF-PQ tier (scale extension, round 6) ----
  def buildPqIndex(nlist: Int = 64, m: Int = 8, ncodes: Int = 256,
      iters: Int = 2, bucketCodes: Boolean = false,
      buckets: Int = 32): Unit =
    store.buildPqIndex(nlist, m, ncodes, iters,
      bucketCodes = bucketCodes, buckets = buckets)
  def refreshPqIndex(): Unit = store.refreshPqIndex()
  def pqIndexState: KbStore.AnnState = store.pqIndexState
  /** Materialize the cid-bucketed codes mirror so [[pqKnnJoin]] takes
    * the exchange-free AdcCodesJoin path; `parts` > 0 shards it for
    * O(changed-shards) refresh maintenance. */
  def bucketPqCodes(buckets: Int = 32, parts: Int = 64): Unit =
    store.bucketPqCodes(buckets, parts)
  /** Batch compressed k-NN join through the IVF-PQ tier (ADC prefilter
    * + exact re-rank); codes-side exchange-free when the bucketed
    * mirror is current. */
  def pqKnnJoin(queries: org.apache.spark.sql.DataFrame, k: Int,
      nProbe: Int = 8, rerank: Int = 100): org.apache.spark.sql.DataFrame =
    store.pqKnnJoin(queries, k, nProbe, rerank)
  def pqRetrieve(query: String, n: Int, nProbe: Int = 8,
      rerank: Int = 100): Seq[Retrieval] =
    store.pqRetrieve(query, n, checked, nProbe, rerank)

  // ---- persistent lexical (BM25) tier (scale extension) ----
  def buildTextIndex(unicode: Boolean = false): Unit =
    store.buildTextIndex(unicode)
  def refreshTextIndex(): Unit = store.refreshTextIndex()
  def textIndexState: KbStore.AnnState = store.textIndexState
  def bm25Retrieve(query: String, n: Int): Seq[(Double, Doc)] =
    store.bm25Retrieve(query, n)

  /** Store-integrated hybrid retrieval: reciprocal-rank fusion (RRF,
    * Cormack et al. 2009) of the lexical tier's BM25 list and the
    * vector retrieve, computed driver-side over the two k-bounded
    * lists. rrf(d) = Σ 1/(c + rank); a doc missing from one list
    * contributes 0 from it. Component ranks use each tier's own tie
    * order (BM25: score desc / id asc; vector: the reference order);
    * fused ties break on ascending doc id; scores round to 6 dp like
    * [[graft.ops.TextRetrieval.rrfFuse]]. Requires a CURRENT text
    * index (bm25Retrieve refuses otherwise).
    */
  def hybridRetrieve(query: String, n: Int, k: Int = 50,
      c: Int = 60): Seq[(Double, Doc)] = {
    if (n <= 0) return Seq.empty
    val lex = store.bm25Retrieve(query, k)
    val vec = store.retrieve(query, k, checked)
    val rLex = lex.zipWithIndex.map { case ((_, d), i) => d.id -> (i + 1) }.toMap
    val rVec = vec.zipWithIndex.map { case (r, i) => r.doc.id -> (i + 1) }.toMap
    val docsById = (lex.map(x => x._2.id -> x._2) ++
      vec.map(r => r.doc.id -> r.doc)).toMap
    docsById.keys.toSeq
      .map { id =>
        val s = rLex.get(id).map(r => 1.0 / (c + r)).getOrElse(0.0) +
          rVec.get(id).map(r => 1.0 / (c + r)).getOrElse(0.0)
        (BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble, id)
      }
      .sortBy { case (s, id) => (-s, id) }
      .take(n)
      .map { case (s, id) => (s, docsById(id)) }
  }

  /** `with kb.bulk_query_docs() as q:` (`types.py:156-192`). */
  def bulkQueryDocs[A](body: Kb.DocQuerier => A): A =
    body(new Kb.DocQuerier(store))

  /** `with kb.bulk_graph_update() as g:` (`types.py:195-224`). */
  def bulkGraphUpdate[A](body: Kb.GraphUpdater => A): A =
    body(new Kb.GraphUpdater(store))

  /** `with kb.bulk_keyval_update() as kv:` (`types.py:227-262`). */
  def bulkKeyvalUpdate[A](body: Kb.KeyvalUpdater => A): A =
    body(new Kb.KeyvalUpdater(store))

  /** `kb.close(vacuum, also_gzip)` (`kb.py:1437-1464`): gzip maps to a
    * gzip-codec compaction of the current version (S6 — Parquet
    * compresses natively, so this is a codec rewrite, not a file gzip).
    */
  def close(vacuum: Boolean = false, alsoGzip: Boolean = false): Unit = {
    if (alsoGzip) store.compact("gzip")
    store.close(vacuumFirst = vacuum)
  }
}

object Kb {

  /** Open or create, like `KB(path_or_url, embedding_func, force_fresh_db)`. */
  def apply(spark: SparkSession, path: String, provider: EmbeddingProvider,
      forceFresh: Boolean = false): Kb = {
    val exists = java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$path/_meta.json")) && !forceFresh
    val store =
      if (exists) {
        val st = KbStore.open(spark, path)
        val stored = st.meta.embedding_params
        if (stored.nonEmpty && stored != provider.params)
          System.err.println(
            s"[graft] warning: stored embedding params $stored differ " +
              s"from provided ${provider.params}; using provided " +
              "(reference kb.py:916-922 semantics)")
        st
      } else KbStore.create(spark, path, provider.params, forceFresh)
    new Kb(store, provider)
  }

  /** Re-open WITHOUT a provider: rehydrate it from the persisted params,
    * like `_db_check`'s `make_embeddings_func(db_eparams)` branch
    * (`kb.py:909-912`); error when the store has none (`kb.py:919-922`).
    * The transport seam exists because this environment has no egress —
    * a rehydrated openai/ollama config is fully constructed and only
    * fails at the first actual HTTP call unless a transport is injected.
    */
  def open(spark: SparkSession, path: String,
      transport: Embeddings.HttpTransport = Embeddings.NoEgressTransport): Kb = {
    val store = KbStore.open(spark, path)
    val stored = store.meta.embedding_params
    if (stored.isEmpty)
      throw new RuntimeException(
        "No embedding function. You did not pass one and there is not one " +
          "in the database (reference kb.py:919-922 semantics).")
    new Kb(store, Embeddings.fromParams(stored, transport))
  }

  /** Scoped query handle (count/query_doc/query_children/query_level/
    * dfs_traversal/update_doc_meta).
    */
  final class DocQuerier private[core] (store: KbStore) {
    def count: Long = store.countDocs
    def queryDoc(id: Long): Doc = store.fetchDoc(id)
    def queryDocWithEmbedding(id: Long): (Doc, Option[Array[Float]]) =
      store.fetchDocWithEmbedding(id)
    def queryChildren(id: Long): Seq[Doc] = store.fetchChildren(id)
    def queryLevel(level: Int): Seq[Doc] = store.fetchDocsAtLevel(level)
    def dfsTraversal(): Seq[Doc] = store.dfsTraversal()
    def updateDocMeta(id: Long, meta: Option[String]): Unit =
      store.updateDocMeta(id, meta)
    /** `set_doc_embedding(doc_id, embedding, skip_check_old)` (`kb.py:526`). */
    def setDocEmbedding(id: Long, embedding: Option[Array[Float]],
        skipCheckOld: Boolean = false): Unit =
      store.setDocEmbedding(id, embedding, skipCheckOld)
  }

  /** Scoped graph handle (count_edges/add_edge/add_directed_edge/
    * del_edge/build graph export).
    */
  final class GraphUpdater private[core] (store: KbStore) {
    def countEdges: Long = store.countEdges
    def addEdge(src: Long, dst: Long, rel: Long,
        weight: Option[Double] = None): Long =
      store.addEdge(src, dst, rel, weight, directed = false)
    def addDirectedEdge(src: Long, dst: Long, rel: Long,
        weight: Option[Double] = None): Long =
      store.addEdge(src, dst, rel, weight, directed = true)
    def delEdge(id: Long): Unit = store.delEdge(id)
    /** `build_networkx_graph(multigraph)` analog: (anyDirected, edges DF —
      * back-edge-expanded; simple-collapsed when `multigraph = false`).
      */
    def buildGraph(multigraph: Boolean = true): (Boolean, DataFrame) =
      store.exportGraph(multigraph)
  }

  /** Scoped keyval handle (has/get/set/remove/count/items). */
  final class KeyvalUpdater private[core] (store: KbStore) {
    def has(key: String): Boolean = store.hasKey(key)
    def get(key: String): Any = store.getKey(key)
    def get(key: String, default: Any): Any = store.getKeyOr(key, default)
    /** `get(key, ExceptionClass)` raise protocol (`kb.py:1746-1756`). */
    def getOrRaise(key: String, raiseAs: Class[_ <: Throwable]): Any =
      store.getKeyRaising(key, raiseAs)
    def set(key: String, value: Any): Unit = store.setKey(key, value)
    def remove(key: String): Unit = store.delKey(key)
    def count: Long = store.countKeys
    def items: Seq[(String, Any)] = store.items
  }
}
