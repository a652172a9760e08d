package graft.core

/** Typed data model mirroring the reference's record shapes
  * (`/root/reference/src/svs/types.py:23-34`, table DDL `kb.py:66-113`),
  * Spark-typed per SURVEY.md §1.2.
  */
object Model {

  /** A document node (`kb.py:85-92`). `embedding` is modeled as the pair
    * (embId, hasEmbedding) instead of the reference's union type
    * (`types.py:28`).
    */
  final case class Doc(
      id: Long,
      parent_id: Option[Long],
      level: Int,
      text: String,
      emb_id: Option[Long],
      meta: Option[String])

  /** A float32 vector row (`kb.py:80-83`). */
  final case class Emb(id: Long, vec: Array[Float])

  /** A typed graph edge (`kb.py:98-111`): endpoints and the relationship
    * are all doc ids (edges are documents — `examples/graph.py:21-23`).
    */
  final case class Edge(
      id: Long,
      src: Long,
      dst: Long,
      rel: Long,
      weight: Option[Double],
      directed: Boolean)

  /** SQLite-`ANY`-typed key/value entry (`kb.py:68-78`): exactly one of
    * the four value slots is set, preserving int/real/text/blob identity
    * (`tests/test_kb.py:56-60,138-143`).
    */
  final case class KV(
      key: String,
      i: Option[Long] = None,
      d: Option[Double] = None,
      s: Option[String] = None,
      b: Option[Array[Byte]] = None) {
    require(Seq(i, d, s, b).count(_.isDefined) == 1,
      s"KV '$key' must carry exactly one typed value")
    def value: Any = i.orElse(d).orElse(s).orElse(b).get
  }

  object KV {
    def of(key: String, v: Any): KV = v match {
      case x: Int => KV(key, i = Some(x.toLong))
      case x: Long => KV(key, i = Some(x))
      case x: Float => KV(key, d = Some(x.toDouble))
      case x: Double => KV(key, d = Some(x))
      case x: String => KV(key, s = Some(x))
      case x: Array[Byte] => KV(key, b = Some(x))
      case other => throw new IllegalArgumentException(
        s"unsupported KV value type: ${other.getClass}")
    }
  }

  /** A retrieval hit (`types.py:32-34`). */
  final case class Retrieval(score: Double, doc: Doc)

  /** Store metadata — the engine's analog of the internal keyval table
    * (`kb.py:841-853`, `kb.py:896-922`): schema version, creation time,
    * persisted embedding-function params, id high-water marks, and the
    * current committed table version.
    */
  /** `table_versions` is the commit manifest: each table name points at
    * its current version directory. Unchanged tables keep their pointer
    * across commits — carrying a table forward is a manifest re-point,
    * never a data copy (O(1) per commit regardless of table size).
    */
  /** `table_bases` / `table_deltas` extend the manifest with
    * merge-on-read segment chains (round 6): a table with deltas reads
    * as base ⊖ del-keys ⊕ add-rows applied in version order, so a
    * point mutation stages O(batch) bytes instead of rewriting the
    * table. Tables absent from both maps are plain single-directory
    * tables; a full rewrite (compact, rebuild, chain-limit overflow)
    * clears the chain. `table_versions` still points at the NEWEST
    * segment, keeping the index-family staleness arithmetic and the
    * CAS untouched.
    */
  final case class KbMeta(
      schema_version: Int,
      created_datetime: String,
      embedding_params: Map[String, String],
      max_doc_id: Long,
      max_edge_id: Long,
      version: Long,
      table_versions: Map[String, Long],
      table_bases: Map[String, Long] = Map.empty,
      table_deltas: Map[String, Seq[Long]] = Map.empty,
      /** Index-build parameters that the QUERY side must replay exactly
        * (e.g. `text_unicode`: the lexical tier's tokenizer choice —
        * query tokenization must match the build's or retrieval
        * silently misses postings).
        */
      index_params: Map[String, String] = Map.empty)
}
