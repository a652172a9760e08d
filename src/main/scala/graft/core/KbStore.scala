package graft.core

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.core.Model._
import graft.core.Embeddings.EmbeddingProvider
import graft.functions.VectorFunctions._

/** A knowledge-base store: one directory of versioned Parquet tables plus
  * an atomically-swapped `_meta.json` — the Spark-native re-expression of
  * the reference's single SQLite file (`/root/reference/src/svs/kb.py:66-113`).
  *
  * Transaction model (reference M10, `kb.py:794-829`): every bulk scope
  * stages its output tables under the next version directory
  * (`docs/v<N+1>/…`), then commits by atomically replacing `_meta.json`
  * (which names the committed version). An exception inside the scope
  * deletes the staged directories and leaves the meta untouched — readers
  * never observe a partial write. This is the same
  * write-temp-then-publish discipline a distributed commit protocol uses,
  * so the design carries to object stores unchanged.
  *
  * Caching (reference `_EmbeddingsMatrix`, `kb.py:856-893`): the
  * embeddings Dataset is persisted on first use and unpersisted by any
  * mutation — the "first query slow, later queries fast" contract
  * (`README.md:135`) maps directly onto lazy Spark caching.
  *
  * Single-writer semantics, like the reference's one-connection
  * discipline (`kb.py:116-137`).
  */
final class KbStore private (
    val spark: SparkSession,
    val path: String) {

  import spark.implicits._

  @volatile private var metaCache: KbMeta = KbStore.readMeta(path)

  /** Test seam (no-op in production): runs between a commit's staging
    * and its manifest publish, so a spec can inject a racing writer
    * deterministically and exercise the publish-conflict retry. */
  private[graft] var prePublishHook: () => Unit = () => ()
  private var cachedEmb: Option[Dataset[Emb]] = None
  private var cachedIdx: Option[graft.ops.VectorIndex] = None

  def meta: KbMeta = metaCache

  // ------------------------------------------------------------------
  // table access
  // ------------------------------------------------------------------
  private def tableDir(name: String, version: Long): String =
    s"$path/$name/v$version"

  /** Merge-on-read: the base segment with each delta's tombstones
    * anti-joined and add-rows unioned, in version order. Order matters —
    * a key may be tombstoned and later re-added (keyval upserts, the
    * reference's emb-id reuse after delete), which a single global
    * anti-join would get wrong. Each tombstone set is a point-mutation
    * batch, so the anti-joins are broadcast-hash probes in practice
    * (AQE decides from file stats); the chain is bounded by
    * [[KbStore.DeltaChainLimit]] and collapsed by compact().
    */
  private def read(name: String): DataFrame = readWithMeta(metaCache, name)

  private def readWithMeta(m: KbMeta, name: String): DataFrame = {
    val base = spark.read.parquet(
      tableDir(name, m.table_bases.getOrElse(name, m.table_versions(name))))
    m.table_deltas.getOrElse(name, Nil).foldLeft(base) { (acc, v) =>
      val dir = tableDir(name, v)
      val keys = KbStore.DeltaKeys(name)
      val afterDel =
        if (KbStore.hasParquetFiles(s"$dir/del"))
          acc.join(spark.read.parquet(s"$dir/del"), keys, "left_anti")
        else acc
      if (KbStore.hasParquetFiles(s"$dir/add"))
        afterDel.union(spark.read.parquet(s"$dir/add")
          .select(afterDel.columns.map(col(_)): _*))
      else afterDel
    }
  }

  def docs: Dataset[Doc] = read("docs").as[Doc]
  def edges: Dataset[Edge] = read("edges").as[Edge]
  def keyval: Dataset[KV] = read("keyval").as[KV]

  /** Cached embeddings — the analog of the reference's in-RAM matrix
    * (`kb.py:573-618`); invalidated by every mutation.
    */
  def embeddings: Dataset[Emb] = synchronized {
    cachedEmb match {
      case Some(ds) => ds
      case None =>
        val ds = read("embeddings").as[Emb]
          .persist(StorageLevel.MEMORY_AND_DISK)
        cachedEmb = Some(ds)
        ds
    }
  }

  /** Chain-resolved table access for specs (parity twins need the same
    * merged view the store itself queries).
    */
  private[graft] def readTableForSpec(name: String): DataFrame = read(name)

  private def invalidate(): Unit = synchronized {
    cachedEmb.foreach(_.unpersist())
    cachedEmb = None
    cachedIdx.foreach(_.unpersist())
    cachedIdx = None
  }

  /** The batch-built retrieval index (reference `_EmbeddingsMatrix`,
    * `kb.py:856-893`): lazily built on first retrieve, invalidated by
    * every mutation. None when the store has no embeddings.
    */
  def index(): Option[graft.ops.VectorIndex] = synchronized {
    cachedIdx.orElse {
      embeddings.limit(1).collect().headOption.map { probe =>
        val idx = graft.ops.VectorIndex.fromArrays(
          embeddings.toDF().select($"id", $"vec"), probe.vec.length)
          .materialize()
        cachedIdx = Some(idx)
        idx
      }
    }
  }

  // ------------------------------------------------------------------
  // commit machinery
  // ------------------------------------------------------------------
  /** Stage the given tables as version+1 and atomically publish via the
    * meta manifest. Tables not in `updated` keep their existing version
    * pointer — carry-forward moves zero bytes (the property that makes
    * point-mutations affordable when one table is 100 TB and another is
    * a 5-row keyval).
    */
  /** Manifest CAS with disjoint-footprint adoption (r7) — the
    * multi-writer relaxation of the single-writer contract: if another
    * writer published since this store snapshotted the manifest, the
    * commit may still proceed PROVIDED the interloper's footprint is
    * provably disjoint from ours, by adopting the interloper's head as
    * the new base snapshot. Disjoint means:
    *
    *   - no table whose pointer/base/delta-chain the interloper moved
    *     is in our write set (`touched`), AND
    *   - no manifest field the interloper changed (id high-water marks,
    *     embedding/index params, schema version) is also changed by our
    *     `newMeta` — checked by applying `newMeta` to the interloper's
    *     head and diffing fieldwise, so a keyval writer (identity on
    *     max_doc_id) retries across a doc-add writer's bump, while two
    *     doc-add writers (both setting max_doc_id) still conflict.
    *
    * Anything else throws ConcurrentModificationException, as before.
    * Check BEFORE staging: version N+1 staging dirs are deterministic,
    * so a stale writer that proceeded would overwrite the other
    * writer's just-published v<N+1> tables — failing (or adopting)
    * here costs nothing. The check-then-write window during staging
    * remains documented best-effort, not a true filesystem CAS.
    *
    * Correctness caveat, ENFORCED (r8): adoption re-applies OUR patch
    * plans (computed under the old snapshot) against the new head.
    * That is sound only when every table those plans READ was not
    * moved by the interloper. Most mutations read exactly their write
    * set (read-your-writes), but e.g. an index refresh reads the
    * embeddings table while writing only the codes table — `readSet`
    * carries those extra reads into the overlap check, so a commit
    * whose inputs the interloper moved rejects instead of silently
    * committing stale derived rows.
    */
  private def casOrAdopt(touched: Set[String],
      newMeta: KbMeta => KbMeta,
      readSet: Set[String] = Set.empty): KbMeta = synchronized {
    val cur = metaCache
    val onDisk = KbStore.readMeta(path)
    if (onDisk.version == cur.version) return cur
    def metaFieldDiff(a: KbMeta, b: KbMeta): Set[String] = {
      val d = Set.newBuilder[String]
      if (a.schema_version != b.schema_version) d += "schema_version"
      if (a.embedding_params != b.embedding_params) d += "embedding_params"
      if (a.max_doc_id != b.max_doc_id) d += "max_doc_id"
      if (a.max_edge_id != b.max_edge_id) d += "max_edge_id"
      if (a.index_params != b.index_params) d += "index_params"
      d.result()
    }
    val movedTables =
      (onDisk.table_versions.keySet ++ cur.table_versions.keySet).filter {
        t => onDisk.table_versions.get(t) != cur.table_versions.get(t) ||
          onDisk.table_bases.get(t) != cur.table_bases.get(t) ||
          onDisk.table_deltas.get(t) != cur.table_deltas.get(t)
      }
    val tableOverlap = movedTables.intersect(touched ++ readSet)
    val fieldOverlap = metaFieldDiff(cur, onDisk)
      .intersect(metaFieldDiff(onDisk, newMeta(onDisk)))
    if (onDisk.version < cur.version || tableOverlap.nonEmpty ||
        fieldOverlap.nonEmpty)
      throw new java.util.ConcurrentModificationException(
        s"store $path: manifest version moved ${cur.version} -> " +
          s"${onDisk.version} since this writer's snapshot and the " +
          s"concurrent writer's footprint overlaps ours (tables: " +
          s"${tableOverlap.mkString(",")}; fields: " +
          s"${fieldOverlap.mkString(",")}) — not retryable")
    // disjoint: adopt the interloper's head and commit on top of it
    metaCache = onDisk
    invalidate()
    onDisk
  }

  private def commit(updated: Map[String, DataFrame],
      newMeta: KbMeta => KbMeta, codec: String = "snappy",
      preserveIndex: Boolean = false,
      partitionBy: Map[String, Seq[String]] = Map.empty,
      readSet: Set[String] = Set.empty): Unit = {
    // bounded CAS retry (r8): if ANOTHER disjoint writer published
    // between our adoption and our manifest swap, the publish-time
    // version check raises PublishConflict and the whole
    // adopt→stage→publish cycle re-runs against the new head — so N
    // interleaved disjoint writers all land. Overlapping footprints
    // still throw ConcurrentModificationException from casOrAdopt on
    // the FIRST attempt (loud, not retried), and retries are capped.
    var attempt = 0
    var done = false
    while (!done) {
      val cur = casOrAdopt(updated.keySet, newMeta, readSet)
      val next = cur.version + 1
      try {
        updated.foreach { case (name, df) =>
          val w = df.write.mode(SaveMode.Overwrite)
            .option("compression", codec)
          partitionBy.get(name).filter(_.nonEmpty)
            .fold(w)(cols => w.partitionBy(cols: _*))
            .parquet(tableDir(name, next))
        }
        var pointers = cur.table_versions ++ updated.keys.map(_ -> next)
        // a full rewrite replaces the whole table at the new version, so
        // any merge-on-read segment chain it had is obsolete
        var bases = cur.table_bases -- updated.keys
        var deltaChains = cur.table_deltas -- updated.keys
        // a new embeddings version invalidates a batch-built ANN index:
        // REPLACED vectors drop its pointers entirely (the dirs are
        // reclaimed by the next vacuum); add/delete-only mutations pass
        // `preserveIndex` and merely leave it STALE (older version than
        // embeddings) — existing assignments stay valid and
        // refreshAnnIndex() catches the index up incrementally
        if (updated.contains("embeddings") &&
            !updated.contains(KbStore.IvfAssignTable) && !preserveIndex) {
          pointers = pointers -- KbStore.VectorIndexTables
          bases = bases -- KbStore.VectorIndexTables
          deltaChains = deltaChains -- KbStore.VectorIndexTables
        }
        val m = newMeta(cur).copy(version = next, table_versions = pointers,
          table_bases = bases, table_deltas = deltaChains)
        prePublishHook()
        KbStore.writeMetaAtomic(path, m, expectVersion = Some(cur.version))
        metaCache = m
        invalidate()
        done = true
      } catch {
        case e: Throwable =>
          // rollback: remove staged dirs, meta still points at `cur`
          updated.keys.foreach { name =>
            KbStore.deleteRecursively(Paths.get(tableDir(name, next)))
          }
          e match {
            case _: KbStore.PublishConflict
                if attempt < KbStore.CasMaxRetries => attempt += 1
            case _: KbStore.PublishConflict =>
              throw new java.util.ConcurrentModificationException(
                s"store $path: manifest publish raced " +
                  s"${KbStore.CasMaxRetries + 1} consecutive times — giving up")
            case _ => throw e
          }
      }
    }
  }

  /** O(batch) sibling of [[commit]] (round 6, the 100 TB mutation
    * story): stage only this mutation's tombstone keys and add-rows
    * under `v<N+1>/{del,add}` and publish the extended segment chain —
    * a 1-doc add to a 100 TB table writes one tiny file, never the
    * table. Readers resolve the chain via [[read]]'s ordered fold.
    *
    * When a table's chain would exceed [[KbStore.DeltaChainLimit]],
    * that table's chain is MINOR-compacted (LSM-style) into one merged
    * delta at the new version: `del` = the union of the chain's
    * tombstone keys (plus the incoming patch's), `add` = the chain
    * folded over an EMPTY base (adds minus later tombstones) — both
    * computable from the segments alone, so the BASE is never read or
    * rewritten and write volume stays O(accumulated changes), never
    * O(table). (Correct because mutations never add a key that exists
    * un-tombstoned: adds allocate fresh high-water ids and updates
    * tombstone before re-adding.) Read fan-in thus stays bounded
    * without anyone calling compact(); compact() remains the explicit
    * MAJOR compaction that folds chains into a fresh base. Same CAS,
    * same atomic manifest publish, same rollback discipline as a full
    * commit.
    */
  private def commitDelta(patches0: Map[String, KbStore.TablePatch],
      newMeta: KbMeta => KbMeta,
      preserveIndex: Boolean = true,
      statsDelta: Option[() => KbStore.StatsDelta] = None,
      readSet: Set[String] = Set.empty): Unit = {
    // same CAS + disjoint-footprint adoption + bounded publish-retry
    // as the full commit; the stats-card fold below runs AFTER
    // adoption (inside the retry loop), so two disjoint writers'
    // deltas both accumulate onto the card
    var attempt = 0
    var done = false
    while (!done) {
    val cur = casOrAdopt(patches0.keySet, newMeta, readSet)
    val next = cur.version + 1
    // dataset-card maintenance: when the stats table exists and this
    // mutation touches user data, fold the caller-supplied delta into
    // the card IN the same atomic publish (the thunk runs only here, so
    // untracked paths cost nothing). A data mutation WITHOUT a delta
    // drops the stats pointer instead — a card that silently stops
    // moving is worse than no card.
    val statsLive = cur.table_versions.contains(KbStore.StatsTable)
    val touchesData = patches0.keys.exists(KbStore.DataTables.contains)
    val (patches, dropStats) =
      if (statsLive && touchesData) statsDelta match {
        case Some(thunk) =>
          val d = thunk()
          val card = readStatsCard()
          val rows = Seq(
            ("n_docs", card.getOrElse("n_docs", 0L) + d.docs),
            ("n_embeddings", card.getOrElse("n_embeddings", 0L) + d.embeddings),
            ("n_edges", card.getOrElse("n_edges", 0L) + d.edges),
            ("n_keys", card.getOrElse("n_keys", 0L) + d.keys),
            ("n_chars", card.getOrElse("n_chars", 0L) + d.chars))
          (patches0 + (KbStore.StatsTable -> KbStore.TablePatch(
            del = Some(rows.map(_._1).toDF("metric")),
            add = Some(rows.toDF("metric", "value")))), false)
        case None => (patches0, true)
      } else (patches0, false)
    try {
      // tables whose chain is full get a MINOR compaction (chain merged
      // into one delta, base untouched); the rest stage plain segments
      val (overflow, asDelta) = patches.partition { case (name, _) =>
        cur.table_deltas.getOrElse(name, Nil).size >= KbStore.DeltaChainLimit
      }
      overflow.foreach { case (name, patch) =>
        val keys = KbStore.DeltaKeys(name)
        val chain = cur.table_deltas(name)
        // merged tombstones: every key any chain segment (or the
        // incoming patch) removed — keys of base rows that must not
        // surface plus re-add bookkeeping handled by the merged add
        val chainDels = chain.flatMap { v =>
          val d = s"${tableDir(name, v)}/del"
          if (KbStore.hasParquetFiles(d))
            Some(spark.read.parquet(d).select(keys.map(col(_)): _*))
          else None
        } ++ patch.del.map(_.select(keys.map(col(_)): _*))
        // merged adds: the chain (plus incoming patch) folded over an
        // empty base — adds that a later segment tombstoned drop out
        val schema = spark.read.parquet(
          tableDir(name, cur.table_bases.getOrElse(name,
            cur.table_versions(name)))).limit(0)
        var merged = schema
        chain.foreach { v =>
          val dir = tableDir(name, v)
          if (KbStore.hasParquetFiles(s"$dir/del"))
            merged = merged.join(
              spark.read.parquet(s"$dir/del"), keys, "left_anti")
          if (KbStore.hasParquetFiles(s"$dir/add"))
            merged = merged.union(spark.read.parquet(s"$dir/add")
              .select(merged.columns.map(col(_)): _*))
        }
        patch.del.foreach(d => merged = merged.join(d, keys, "left_anti"))
        patch.add.foreach(a =>
          merged = merged.union(a.select(merged.columns.map(col(_)): _*)))
        val delOut = chainDels.reduceOption(_ union _).map(_.distinct())
        delOut.foreach(_.write.mode(SaveMode.Overwrite)
          .option("compression", "snappy")
          .parquet(s"${tableDir(name, next)}/del"))
        val w = merged.write.mode(SaveMode.Overwrite)
          .option("compression", "snappy")
        KbStore.DeltaPartitioning.get(name)
          .fold(w)(cols => w.partitionBy(cols: _*))
          .parquet(s"${tableDir(name, next)}/add")
      }
      asDelta.foreach { case (name, patch) =>
        patch.del.foreach(_.select(KbStore.DeltaKeys(name).map(col(_)): _*)
          .write.mode(SaveMode.Overwrite).option("compression", "snappy")
          .parquet(s"${tableDir(name, next)}/del"))
        patch.add.foreach { a =>
          val w = a.write.mode(SaveMode.Overwrite).option("compression", "snappy")
          KbStore.DeltaPartitioning.get(name)
            .fold(w)(cols => w.partitionBy(cols: _*))
            .parquet(s"${tableDir(name, next)}/add")
        }
      }
      var pointers = cur.table_versions ++ patches.keys.map(_ -> next)
      var bases = cur.table_bases
      var deltaChains = cur.table_deltas
      if (dropStats) {
        pointers -= KbStore.StatsTable
        bases -= KbStore.StatsTable
        deltaChains -= KbStore.StatsTable
      }
      // minor-compacted tables keep their base; the chain collapses to
      // the one merged segment just staged
      overflow.keys.foreach { name =>
        deltaChains += name -> Seq(next)
      }
      asDelta.keys.foreach { name =>
        if (!bases.contains(name))
          bases += name -> cur.table_versions(name)
        deltaChains += name ->
          (deltaChains.getOrElse(name, Seq.empty[Long]) :+ next)
      }
      // same invalidation clause as the full commit: an embeddings
      // patch without preserveIndex is a vector REPLACEMENT — the
      // vector-derived families' pointers (and chains) drop
      if (patches.contains("embeddings") && !preserveIndex) {
        pointers = pointers -- KbStore.VectorIndexTables
        bases = bases -- KbStore.VectorIndexTables
        deltaChains = deltaChains -- KbStore.VectorIndexTables
      }
      val m = newMeta(cur).copy(version = next, table_versions = pointers,
        table_bases = bases, table_deltas = deltaChains)
      prePublishHook()
      KbStore.writeMetaAtomic(path, m, expectVersion = Some(cur.version))
      metaCache = m
      invalidate()
      done = true
    } catch {
      case e: Throwable =>
        patches.keys.foreach { name =>
          KbStore.deleteRecursively(Paths.get(tableDir(name, next)))
        }
        e match {
          case _: KbStore.PublishConflict
              if attempt < KbStore.CasMaxRetries => attempt += 1
          case _: KbStore.PublishConflict =>
            throw new java.util.ConcurrentModificationException(
              s"store $path: manifest publish raced " +
                s"${KbStore.CasMaxRetries + 1} consecutive times — giving up")
          case _ => throw e
        }
    }
    }
  }

  // ------------------------------------------------------------------
  // reads (SURVEY §2.2, §2.4)
  // ------------------------------------------------------------------
  def countDocs: Long = docs.count()
  def countEdges: Long = edges.count()
  def countKeys: Long = keyval.count()
  def len: Long = countDocs

  // ------------------------------------------------------------------
  // dataset card (incrementally-maintained corpus stats)
  // ------------------------------------------------------------------
  private def readStatsCard(): Map[String, Long] =
    read(KbStore.StatsTable).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  private def computeStatsCard(): Map[String, Long] = Map(
    "n_docs" -> docs.count(),
    "n_embeddings" -> embeddings.count(),
    "n_edges" -> edges.count(),
    "n_keys" -> keyval.count(),
    "n_chars" -> docs.toDF()
      .agg(coalesce(sum(length($"text")), lit(0L)))
      .collect()(0).getLong(0))

  /** Seed (or reseed) the incrementally-maintained stats table from a
    * full pass over the data tables. After this, every tracked mutation
    * folds its own delta into the card inside the same atomic commit —
    * [[datasetCard]] stays O(5 rows) to read no matter how large the
    * store grows. A future untracked data mutation drops the card
    * (visible as a fallback full recompute) rather than serving stale
    * numbers.
    */
  def buildStats(): Unit = {
    val card = computeStatsCard()
    commit(Map(KbStore.StatsTable ->
      card.toSeq.sortBy(_._1).toDF("metric", "value")), identity)
  }

  /** The corpus dataset card: row counts per table + total text chars.
    * O(1) from the maintained stats table when present; a full
    * recompute otherwise.
    */
  def datasetCard: Map[String, Long] =
    if (metaCache.table_versions.contains(KbStore.StatsTable))
      readStatsCard()
    else computeStatsCard()

  /** P1 fetch_doc (`kb.py:416-473`); NoSuchElementException on miss. */
  def fetchDoc(id: Long): Doc =
    docs.filter($"id" === id).collect().headOption.getOrElse(
      throw new NoSuchElementException(s"doc $id"))

  /** P1 with embedding joined in (include_embedding=True). */
  def fetchDocWithEmbedding(id: Long): (Doc, Option[Array[Float]]) = {
    val d = fetchDoc(id)
    val v = d.emb_id.flatMap { e =>
      embeddings.filter($"id" === e).collect().headOption.map(_.vec)
    }
    (d, v)
  }

  /** P2 children in id order (`kb.py:475-491`). */
  def fetchChildren(id: Long): Seq[Doc] =
    docs.filter($"parent_id" === id).orderBy($"id").collect().toSeq

  /** P3 docs at level in id order (`kb.py:493-509`). */
  def fetchDocsAtLevel(level: Int): Seq[Doc] =
    docs.filter($"level" === level).orderBy($"id").collect().toSeq

  /** P4 inverse embedding lookup (`kb.py:511-524`). */
  def fetchDocWithEmbId(embId: Long): Doc =
    docs.filter($"emb_id" === embId).collect().headOption.getOrElse(
      throw new NoSuchElementException(s"emb $embId"))

  // ------------------------------------------------------------------
  // doc mutations (SURVEY §2.8 M1-M5)
  // ------------------------------------------------------------------
  /** Bulk add scope (M2, `kb.py:1486-1524`): queue docs via the passed
    * adder, embed in batches of 200 on scope exit, commit once.
    * Returns assigned ids (dense, 1-based, insertion order).
    */
  def bulkAddDocs(provider: EmbeddingProvider)(
      body: KbStore.DocAdder => Unit): Seq[Long] = {
    val adder = new KbStore.DocAdder(this)
    body(adder)
    val newDocs = adder.result
    if (newDocs.isEmpty) return Seq.empty

    val curMeta = metaCache
    var nextDocId = curMeta.max_doc_id
    var nextEmbId = curMeta.max_doc_id // emb ids share the doc counter space

    // resolve levels: parents either pre-existing or earlier in this batch
    val knownLevels = mutable.Map[Long, Int]()
    val parentIds = newDocs.flatMap(_.parentId).distinct
    if (parentIds.nonEmpty) {
      docs.filter($"id".isin(parentIds: _*))
        .select($"id", $"level").collect()
        .foreach(r => knownLevels(r.getLong(0)) = r.getInt(1))
    }

    val staged = newDocs.map { nd =>
      nextDocId += 1
      val level = nd.parentId match {
        case None => 0
        case Some(p) => knownLevels.getOrElse(p,
          throw new IllegalArgumentException(s"parent $p does not exist")) + 1
      }
      knownLevels(nextDocId) = level
      (nextDocId, nd, level)
    }

    // batched embedding backfill (chunk=200, reference kb.py:52)
    val toEmbed = staged.filter(!_._2.noEmbedding)
    val vecs = toEmbed.grouped(EmbeddingProvider.BatchSize).flatMap { chunk =>
      Embeddings.checkMagnitude(provider.embed(chunk.map(_._2.text)))
    }.toSeq
    val embRows = toEmbed.zip(vecs).map { case ((_, _, _), v) =>
      nextEmbId += 1
      Emb(nextEmbId, v)
    }
    val embIdByDocId = toEmbed.map(_._1).zip(embRows.map(_.id)).toMap

    val docRows = staged.map { case (id, nd, level) =>
      Doc(id, nd.parentId, level, nd.text, embIdByDocId.get(id), nd.meta)
    }

    commitDelta(
      Map(
        "docs" -> KbStore.TablePatch(
          add = Some(spark.createDataset(docRows).toDF())),
        "embeddings" -> KbStore.TablePatch(
          add = Some(spark.createDataset(embRows).toDF()))),
      m => m.copy(max_doc_id = math.max(nextDocId, nextEmbId)),
      statsDelta = Some(() => KbStore.StatsDelta(
        docs = docRows.size, embeddings = embRows.size,
        chars = docRows.iterator.map(_.text.length.toLong).sum)))
    staged.map(_._1)
  }

  /** Distributed bulk add — the 100 TB face of M2 (SURVEY §3.2 plan):
    * `newDocs` is a DataFrame with `(text STRING, parent_id LONG?,
    * meta STRING?)` of arbitrary size. Ids are assigned densely from the
    * persisted high-water mark via `zipWithIndex` (deterministic,
    * partition-ordered — no `monotonically_increasing_id` gaps); levels
    * are derived with one join against existing docs (parents must
    * pre-exist here — intra-batch hierarchies are the driver-side
    * scope's job); embedding happens inside `mapPartitions` in provider
    * batches of 200 (connection reuse per partition); one atomic commit
    * appends both tables.
    */
  /** Optional `ingestMarker` = (key, value): persist this keyval row in
    * the SAME atomic commit as the added docs — the idempotence token a
    * replayed streaming micro-batch checks before re-applying (a marker
    * written in a separate commit could be lost between the add and the
    * marker, which is exactly the window replays hit).
    */
  def bulkAddDocsDistributed(newDocs: DataFrame,
      provider: EmbeddingProvider,
      ingestMarker: Option[(String, Long)] = None): Long = {
    val n0 = metaCache.max_doc_id
    val withMeta =
      if (newDocs.columns.contains("meta")) newDocs
      else newDocs.withColumn("meta", lit(null).cast("string"))
    val withParent =
      if (withMeta.columns.contains("parent_id")) withMeta
      else withMeta.withColumn("parent_id", lit(null).cast("long"))

    // pre-embedded path (the semantic ingest screen's commit leg): a
    // `vec ARRAY<FLOAT>` column carries provider output the caller
    // already paid for — the screen embeds BEFORE screening, so
    // re-calling the provider for the survivors would double the
    // provider bill. Magnitude-checked like every other embedding
    // entry point; absent the column, the provider is called as before.
    // The path engages ONLY on the exact ArrayType(FloatType) schema
    // the screen produces: a `vec` column of any other type (e.g. the
    // packed-BINARY corpus convention) is ignored like every other
    // extra column, as it was before this path existed — not crashed
    // on, not silently committed.
    val hasVec = withParent.schema.fields.exists(f =>
      f.name == "vec" && (f.dataType match {
        case org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType, _) => true
        case _ => false
      }))
    import spark.implicits._
    // dense id assignment from the high-water mark. Persisted: the
    // id-bearing frame feeds the parent check, both table writes, and
    // the added-count — without a persist each of those re-runs
    // zipWithIndex over the (arbitrarily large) input
    val ids = (if (hasVec) {
      withParent
        .select(col("text"), col("parent_id").cast("long"), col("meta"),
          col("vec"))
        .rdd.zipWithIndex()
        .map { case (r, i) =>
          (n0 + 1 + i, Option(r.get(1)).map(_.asInstanceOf[Long]),
            r.getString(0), Option(r.getString(2)), r.getSeq[Float](3))
        }.toDF("id", "parent_id", "text", "meta", "vec")
    } else {
      withParent
        .select(col("text"), col("parent_id").cast("long"), col("meta"))
        .rdd.zipWithIndex()
        .map { case (r, i) =>
          (n0 + 1 + i, Option(r.get(1)).map(_.asInstanceOf[Long]),
            r.getString(0), Option(r.getString(2)))
        }.toDF("id", "parent_id", "text", "meta")
    }).persist(StorageLevel.MEMORY_AND_DISK)

    // ONE stats pass over the cached id frame: row count, char volume
    // (the dataset-card delta) and whether any row carries a parent —
    // previously three separate jobs (count, chars agg, the
    // missing-parent isEmpty), each a full dispatch per micro-batch
    val stats = ids.agg(count(lit(1)), coalesce(sum(length($"text")),
      lit(0L)), count($"parent_id")).collect()(0)
    val added = stats.getLong(0)
    val charsAdded = stats.getLong(1)
    val anyParents = stats.getLong(2) > 0L

    // level derivation: one broadcast-or-shuffle join against existing
    // docs; missing parents fail the job before anything is committed.
    // A batch with NO parent_ids (the common root-docs ingest shape)
    // skips the join — and with it the per-batch scan of the docs
    // table, which at 100 TB is the difference between O(batch) and
    // O(corpus) per micro-batch commit
    val levelled = if (!anyParents) {
      val cols = Seq($"id", $"parent_id", $"text", $"meta",
        lit(0).as("level")) ++ (if (hasVec) Seq($"vec") else Nil)
      ids.select(cols: _*)
    } else {
      val parents = docs.toDF().select($"id".as("pid"), $"level".as("plevel"))
      val levelCols = Seq($"id", $"parent_id", $"text", $"meta",
        when($"parent_id".isNull, 0).otherwise($"plevel" + 1).as("level")) ++
        (if (hasVec) Seq($"vec") else Nil)
      val lv = ids.join(parents, ids("parent_id") === col("pid"), "left")
        .select(levelCols: _*)
      val missing = lv.filter($"parent_id".isNotNull && $"level".isNull)
      if (!missing.isEmpty)
        throw new IllegalArgumentException(
          "some parent_ids do not exist in the store")
      lv
    }

    // batched embedding inside mapPartitions (chunk=200, kb.py:52);
    // emb ids share the doc id (1:1 for the distributed path)
    val prov = provider
    val embRows =
      if (hasVec)
        levelled.select($"id", $"vec").as[(Long, Array[Float])]
          .mapPartitions { it =>
            it.grouped(EmbeddingProvider.BatchSize).flatMap { chunk =>
              val vecs = Embeddings.checkMagnitude(chunk.map(_._2))
              chunk.map(_._1).zip(vecs).map { case (id, v) => Emb(id, v) }
            }
          }
      else
        levelled.select($"id", $"text").as[(Long, String)]
          .mapPartitions { it =>
            it.grouped(EmbeddingProvider.BatchSize).flatMap { chunk =>
              val vecs = Embeddings.checkMagnitude(prov.embed(chunk.map(_._2)))
              chunk.map(_._1).zip(vecs).map { case (id, v) => Emb(id, v) }
            }
          }

    val docRows = levelled.select($"id", $"parent_id",
      $"level".cast("int").as("level"), $"text", $"id".as("emb_id"), $"meta")
    // small batches (the streaming micro-batch shape) collapse to one
    // output file per segment: the source frame inherits the session's
    // parallelism, so without this a 500-doc commit writes ~32 tiny
    // files per table whose chain every subsequent read must fold —
    // file-count hygiene per guide §6, worth nothing at bulk-load
    // sizes (left untouched) and a lot at high commit frequency.
    // docRows coalesce (no exchange — building a doc row is trivial);
    // embRows REPARTITION (r13 verdict item 10): a coalesce(1) here
    // collapsed the embedding mapPartitions into one task, serializing
    // up to ~11 provider chunk calls that a remote provider wants in
    // parallel — the repartition's exchange keeps the embed stage at
    // source parallelism and single-tasks only the file write, at the
    // cost of shuffling one micro-batch of vectors (~12 MB at 2048 ×
    // d1536, local)
    val onePart = (df: DataFrame) =>
      if (added <= 2048) df.coalesce(1) else df
    val onePartShuffled = (df: DataFrame) =>
      if (added <= 2048) df.repartition(1) else df
    val patches = Map(
      "docs" -> KbStore.TablePatch(add = Some(onePart(docRows))),
      "embeddings" -> KbStore.TablePatch(
        add = Some(onePartShuffled(embRows.toDF())))) ++
      ingestMarker.map { case (mk, mv) =>
        "keyval" -> KbStore.TablePatch(
          del = Some(Seq(mk).toDF("key")),
          add = Some(spark.createDataset(Seq(KV.of(mk, mv))).toDF()))
      }
    try {
      commitDelta(patches, m => m.copy(max_doc_id = n0 + added),
        statsDelta = Some(() => KbStore.StatsDelta(
          docs = added, embeddings = added,
          keys = ingestMarker.map(m =>
            if (hasKey(m._1)) 0L else 1L).getOrElse(0L),
          // char volume precomputed in the single stats pass above —
          // the thunk no longer dispatches its own aggregation job
          chars = charsAdded)))
    } finally ids.unpersist(blocking = false)
    added
  }

  /** Bulk delete (M3, `kb.py:360-414`): per-id parent guard honoring
    * in-batch deletion order, cascade to incident edges (including edges
    * whose relationship is the doc) and the embedding row.
    */
  def bulkDelDocs(ids: Seq[Long]): Unit = {
    if (ids.isEmpty) return
    // guard: child links among docs whose parent is being deleted
    val childLinks = docs.filter($"parent_id".isin(ids: _*))
      .select($"id", $"parent_id").as[(Long, Long)].collect()
    val pos = ids.zipWithIndex.toMap
    ids.zipWithIndex.foreach { case (d, p) =>
      childLinks.filter(_._2 == d).foreach { case (child, _) =>
        if (!pos.get(child).exists(_ < p))
          throw new IllegalStateException(
            s"cannot delete doc $d: it is a parent of $child")
      }
    }
    val existing = docs.filter($"id".isin(ids: _*))
      .select($"id", $"emb_id", length($"text").cast("long")).collect()
    if (existing.length != ids.distinct.length)
      throw new NoSuchElementException(
        s"some ids do not exist: ${ids.diff(existing.map(_.getLong(0)).toSeq)}")

    val embIds = existing.flatMap(r =>
      if (r.isNullAt(1)) None else Some(r.getLong(1))).toSet
    val delChars = existing.iterator
      .map(r => if (r.isNullAt(2)) 0L else r.getLong(2)).sum
    // tombstones only: the doc ids, their embedding rows, and the ids of
    // cascading edges (an O(edges) scan finds them, but the WRITE is
    // O(matches) — the delta-commit contract)
    val edgeIds = edges.filter(
        $"src".isin(ids: _*) || $"dst".isin(ids: _*) || $"rel".isin(ids: _*))
      .select($"id").toDF()
    commitDelta(
      Map(
        "docs" -> KbStore.TablePatch(del = Some(ids.distinct.toDF("id"))),
        "edges" -> KbStore.TablePatch(del = Some(edgeIds))) ++
        (if (embIds.isEmpty) Map.empty else Map("embeddings" ->
          KbStore.TablePatch(del = Some(embIds.toSeq.toDF("id"))))),
      identity,
      statsDelta = Some(() => KbStore.StatsDelta(
        docs = -ids.distinct.size.toLong,
        embeddings = -embIds.size.toLong,
        edges = -edgeIds.count(),
        chars = -delChars)))
  }

  /** M3 at 100 TB: delete an arbitrary-size id set supplied as a
    * DataFrame with one `id LONG` column. Set semantics — the whole set
    * leaves atomically, so a parent may be deleted together with its
    * children in one call (the driver-side [[bulkDelDocs]] instead
    * honors in-batch order, a contract that cannot distribute). Deleting
    * a parent whose child survives fails, as does a non-existent id.
    * Every check is an equi semi/anti join; nothing is collected to the
    * driver.
    */
  def bulkDelDocsDistributed(ids: DataFrame): Unit = {
    val del = ids.select(col("id").cast("long").as("del_id"))
      .distinct().persist(StorageLevel.MEMORY_AND_DISK)
    try {
      if (!del.join(docs.toDF(), del("del_id") === col("id"), "left_anti")
          .isEmpty)
        throw new NoSuchElementException("some ids do not exist")
      val survivors = docs.toDF()
        .join(del, col("id") === del("del_id"), "left_anti")
      if (!survivors.join(del,
          survivors("parent_id") === del("del_id"), "left_semi").isEmpty)
        throw new IllegalStateException(
          "cannot delete docs that are parents of surviving docs")
      val embIds = docs.toDF()
        .join(del, col("id") === del("del_id"), "left_semi")
        .filter(col("emb_id").isNotNull)
        .select(col("emb_id").as("id"))
      // cascade: any edge touching a deleted id in any role goes — three
      // equi semi-joins collect the victim ids (instead of one non-equi
      // condition, which would nested-loop); only those ids are written
      val edgeIds = Seq("src", "dst", "rel").map { c =>
        val e = edges.toDF()
        e.join(del, e(c) === del("del_id"), "left_semi").select(col("id"))
      }.reduce(_ union _).distinct()
      commitDelta(
        Map(
          "docs" -> KbStore.TablePatch(
            del = Some(del.select(col("del_id").as("id")))),
          "embeddings" -> KbStore.TablePatch(del = Some(embIds)),
          "edges" -> KbStore.TablePatch(del = Some(edgeIds))),
        identity,
        statsDelta = Some(() => KbStore.StatsDelta(
          docs = -del.count(),
          embeddings = -embIds.count(),
          edges = -edgeIds.count(),
          chars = -docs.toDF()
            .join(del, col("id") === del("del_id"), "left_semi")
            .agg(coalesce(sum(length(col("text"))), lit(0L)))
            .collect()(0).getLong(0))))
    } finally del.unpersist(blocking = false)
  }

  /** M5 set_doc_embedding (`kb.py:526-571`): replace, set, or clear one
    * document's embedding. Without `skipCheckOld` the old embedding row is
    * deleted first (KeyError → NoSuchElementException if the doc is
    * missing); with it the old row is left alone — the caller already
    * handled it (the reference's bulk backfill path, `kb.py:1059`).
    * The new embedding id is max(current ids) + 1 — the same observable
    * id sequence as the reference's sqlite rowid assignment
    * (`tests/test_kb.py:408-430` pins the reuse-after-delete behavior).
    */
  def setDocEmbedding(docId: Long, embedding: Option[Array[Float]],
      skipCheckOld: Boolean = false): Unit = {
    // the reference's UPDATE raises when rowcount != 1 (kb.py:569-571)
    val docRow = docs.filter($"id" === docId).collect().headOption
      .getOrElse(throw new NoSuchElementException(s"doc $docId"))
    // without skipCheckOld the old embedding row is tombstoned; with it
    // the caller already handled the old row (bulk backfill, kb.py:1059)
    val delEmbId = if (skipCheckOld) None else docRow.emb_id
    val newEmbId = embedding.map { v =>
      val eff = delEmbId.map(e => embeddings.filter($"id" =!= e))
        .getOrElse(embeddings)
      val maxId = eff.toDF().agg(max($"id")).collect().head
      (if (maxId.isNullAt(0)) 0L else maxId.getLong(0)) + 1L
    }
    val embPatch = KbStore.TablePatch(
      del = delEmbId.map(e => Seq(e).toDF("id")),
      add = embedding.map(v =>
        spark.createDataset(Seq(Emb(newEmbId.get, v))).toDF()))
    // a one-row doc patch (tombstone + re-add with the new emb_id) plus
    // the embedding delta; vector REPLACEMENT still drops the
    // vector-derived index families (preserveIndex = false)
    commitDelta(
      Map(
        "docs" -> KbStore.TablePatch(
          del = Some(Seq(docId).toDF("id")),
          add = Some(spark.createDataset(
            Seq(docRow.copy(emb_id = newEmbId))).toDF())),
        "embeddings" -> embPatch),
      m => m.copy(max_doc_id =
        math.max(m.max_doc_id, newEmbId.getOrElse(0L))),
      preserveIndex = false,
      statsDelta = Some(() => KbStore.StatsDelta(
        embeddings = newEmbId.size.toLong - delEmbId.size.toLong)))
  }

  /** M4 update_doc_meta (`kb.py:347-358`). */
  def updateDocMeta(id: Long, newMeta: Option[String]): Unit = {
    val docRow = docs.filter($"id" === id).collect().headOption
      .getOrElse(throw new NoSuchElementException(s"doc $id"))
    commitDelta(
      Map("docs" -> KbStore.TablePatch(
        del = Some(Seq(id).toDF("id")),
        add = Some(spark.createDataset(
          Seq(docRow.copy(meta = newMeta))).toDF()))),
      identity,
      statsDelta = Some(() => KbStore.StatsDelta()))
  }

  /** TEST DOOR (RefreshFastPathSpec): tombstone doc `id` and re-add it
    * with `newText` in one delta commit — the id-reuse-with-CHANGED-
    * text shape no public mutation currently produces (adds allocate
    * fresh high-water ids; [[updateDocMeta]] / [[setDocEmbedding]]
    * re-add the SAME text). The refresh routes must agree on it anyway
    * (the segment route re-indexes it by construction; the full-diff
    * fallback re-indexes it via [[fullDiffWithReadds]]), and any
    * future public mutation of this shape inherits that pinned
    * contract. Leaves the text/dedup families STALE like every doc
    * mutation. */
  private[graft] def replaceDocTextForSpec(id: Long, newText: String): Unit = {
    val docRow = docs.filter($"id" === id).collect().headOption
      .getOrElse(throw new NoSuchElementException(s"doc $id"))
    commitDelta(
      Map("docs" -> KbStore.TablePatch(
        del = Some(Seq(id).toDF("id")),
        add = Some(spark.createDataset(
          Seq(docRow.copy(text = newText))).toDF()))),
      identity,
      statsDelta = Some(() => KbStore.StatsDelta(
        chars = newText.length.toLong - docRow.text.length.toLong)))
  }

  // ------------------------------------------------------------------
  // edge mutations (M8/M9, `kb.py:634-679`)
  // ------------------------------------------------------------------
  def addEdges(newEdges: Seq[(Long, Long, Long, Option[Double], Boolean)]): Seq[Long] = {
    if (newEdges.isEmpty) return Seq.empty
    val dupInBatch = newEdges.map(e => (e._1, e._2, e._3))
      .groupBy(identity).collectFirst { case (k, v) if v.size > 1 => k }
    dupInBatch.foreach(k => throw new IllegalStateException(
      s"duplicate edge in batch: $k"))
    // (src, dst, rel) uniqueness without materializing the edges table on
    // the driver: semi-join the stored edges against the (tiny, broadcast)
    // new-key set. At 10^9 stored edges this is a broadcast-hash probe on
    // the executors — the old collect().find() was a driver OOM waiting.
    val keyDf = spark.createDataset(
      newEdges.map(e => (e._1, e._2, e._3))).toDF("src", "dst", "rel")
    val clash = edges.toDF()
      .join(broadcast(keyDf), Seq("src", "dst", "rel"), "left_semi")
      .select($"src", $"dst", $"rel").as[(Long, Long, Long)]
      .limit(1).collect().headOption
    clash.foreach(k => throw new IllegalStateException(
      s"edge already exists: $k"))
    var next = metaCache.max_edge_id
    val rows = newEdges.map { case (s, d, r, w, dir) =>
      next += 1
      Edge(next, s, d, r, w, dir)
    }
    commitDelta(
      Map("edges" -> KbStore.TablePatch(
        add = Some(spark.createDataset(rows).toDF()))),
      m => m.copy(max_edge_id = next),
      statsDelta = Some(() => KbStore.StatsDelta(edges = rows.size)))
    rows.map(_.id)
  }

  def addEdge(src: Long, dst: Long, rel: Long,
      weight: Option[Double] = None, directed: Boolean = false): Long =
    addEdges(Seq((src, dst, rel, weight, directed))).head

  def delEdge(id: Long): Unit = {
    if (edges.filter($"id" === id).isEmpty)
      throw new NoSuchElementException(s"edge $id")
    commitDelta(Map("edges" ->
      KbStore.TablePatch(del = Some(Seq(id).toDF("id")))), identity,
      statsDelta = Some(() => KbStore.StatsDelta(edges = -1L)))
  }

  /** G1 directedness probe + export (`kb.py:681-722`): returns the edges
    * DataFrame; when any edge is directed, undirected edges are expanded
    * with their back-edges so a directed-graph consumer sees symmetric
    * connectivity.
    *
    * `multigraph = false` collapses parallel edges with networkx
    * simple-graph semantics — repeated `add_edge` overwrites, so the
    * LAST-inserted edge (max id) wins per key; the key is the directed
    * (src, dst) pair for directed graphs and the unordered pair for
    * undirected ones (`tests/test_kb.py:626-728` pins both).
    */
  def exportGraph(multigraph: Boolean = true): (Boolean, DataFrame) = {
    val anyDirected = !edges.filter($"directed").isEmpty
    val e = edges.toDF()
    val expanded = if (anyDirected) {
      e.union(e.filter(!$"directed").select($"id", $"dst".as("src"),
        $"src".as("dst"), $"rel", $"weight", $"directed"))
    } else e
    val out = if (multigraph) expanded
    else {
      import org.apache.spark.sql.expressions.Window
      val k1 = if (anyDirected) $"src" else least($"src", $"dst")
      val k2 = if (anyDirected) $"dst" else greatest($"src", $"dst")
      val w = Window.partitionBy(k1, k2).orderBy($"id".desc)
      expanded.withColumn("rn", row_number().over(w))
        .filter($"rn" === 1).drop("rn")
    }
    (anyDirected, out)
  }

  // ------------------------------------------------------------------
  // keyval (M6/M7 + protocol `kb.py:1746-1756`)
  // ------------------------------------------------------------------
  def setKey(key: String, value: Any): Unit = {
    val row = KV.of(key, value)
    commitDelta(
      Map("keyval" -> KbStore.TablePatch(
        del = Some(Seq(key).toDF("key")),
        add = Some(spark.createDataset(Seq(row)).toDF()))),
      identity,
      statsDelta = Some(() => KbStore.StatsDelta(
        keys = if (hasKey(key)) 0L else 1L)))
  }

  def hasKey(key: String): Boolean =
    !keyval.filter($"key" === key).isEmpty

  def getKey(key: String): Any =
    keyval.filter($"key" === key).collect().headOption
      .getOrElse(throw new NoSuchElementException(s"key $key")).value

  def getKeyOr(key: String, default: Any): Any =
    keyval.filter($"key" === key).collect().headOption
      .map(_.value).getOrElse(default)

  /** `get(key, ExceptionClass)` raise protocol (`kb.py:1746-1756`): a
    * missing key re-raises the lookup error itself when the class IS a
    * lookup error, otherwise raises a fresh instance of the given class.
    */
  def getKeyRaising(key: String, raiseAs: Class[_ <: Throwable]): Any =
    keyval.filter($"key" === key).collect().headOption.map(_.value)
      .getOrElse {
        if (classOf[NoSuchElementException].isAssignableFrom(raiseAs))
          throw new NoSuchElementException(s"key $key")
        throw raiseAs.getDeclaredConstructor().newInstance()
      }

  def delKey(key: String): Unit = {
    if (!hasKey(key)) throw new NoSuchElementException(s"key $key")
    commitDelta(Map("keyval" ->
      KbStore.TablePatch(del = Some(Seq(key).toDF("key")))), identity,
      statsDelta = Some(() => KbStore.StatsDelta(keys = -1L)))
  }

  def items: Seq[(String, Any)] =
    keyval.orderBy($"key").collect().toSeq.map(kv => kv.key -> kv.value)

  // ------------------------------------------------------------------
  // retrieval (§3.1) + pairwise (§3.3)
  // ------------------------------------------------------------------
  /** The flagship read (`kb.py:1608-1640`): embed the query, score all
    * cached vectors with a dot product (cosine via the unit-norm
    * invariant), top-n with the reference's tie order (larger id first,
    * `util.py:190-203`), join docs back.
    */
  def retrieve(query: String, n: Int,
      provider: EmbeddingProvider): Seq[Retrieval] = {
    if (n <= 0) return Seq.empty
    val qv = Embeddings.checkMagnitude(provider.embed(Seq(query))).head
    index() match {
      case None => Seq.empty
      case Some(idx) =>
        val hits = idx.topK(qv, n) // (emb_id, score), reference tie order
        if (hits.isEmpty) return Seq.empty
        val embIds = hits.map(_._1)
        val docByEmb = docs.filter($"emb_id".isin(embIds: _*))
          .collect().map(d => d.emb_id.get -> d).toMap
        hits.map { case (embId, score) =>
          Retrieval(score, docByEmb(embId))
        }
    }
  }

  /** §3.3 document_top_pairwise_scores (`kb.py:1642-1671`): exact
    * top-n pairs — without ever materializing the n×n matrix the
    * reference builds (`kb.py:1650`). Cardinality switch (SURVEY §7.3):
    * up to [[KbStore.PairwiseExactLimit]] vectors the blocked-grid EXACT
    * operator runs (per-cell bounded heaps, global merge); beyond that —
    * where exact all-pairs is infeasible on any engine — the sign-sketch
    * candidates + exact re-rank path takes over (disclosed approximation,
    * [[graft.ops.PairwiseTopK]] notes).
    */
  def topPairwiseScores(n: Int): Seq[(Double, Doc, Doc)] = {
    val total = embeddings.count()
    if (total < 2 || n <= 0) return Seq.empty
    val dim = embeddings.limit(1).collect().head.vec.length
    val packed = embeddings.toDF()
      .select($"id", graft.functions.FloatVecPack.floatVecPack($"vec").as("vec"))
    val blocks = math.max(1, math.min(32, total / 4096)).toInt
    val pairs =
      if (total <= KbStore.PairwiseExactLimit)
        graft.ops.PairwiseTopK.blockedTopKPairs(
          packed, dim, n, blocks, refTie = true)
      else
        graft.ops.PairwiseTopK.sketchTopKPairs(
          packed, dim, n, refTie = true)
    // build doc lookups for the few ids involved
    val rows = pairs.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val ids = rows.flatMap(r => Seq(r._1, r._2)).distinct
    val docByEmb = docs.filter($"emb_id".isin(ids: _*)).collect()
      .map(d => d.emb_id.get -> d).toMap
    rows.toSeq.map { case (i1, i2, s) => (s, docByEmb(i1), docByEmb(i2)) }
  }

  // ------------------------------------------------------------------
  // persistent batch-built ANN index (SURVEY §7.5 — "Spark builds the
  // vector index in batch"; no reference counterpart, its only index is
  // the in-RAM matrix)
  // ------------------------------------------------------------------
  /** Index lifecycle: `None` — never built or invalidated by vector
    * replacement (rebuild required); `Stale` — docs were added/deleted
    * since the build, existing assignments still valid
    * ([[refreshAnnIndex]] catches up incrementally); `Current` —
    * serves queries. Freshness is pure manifest arithmetic: the index
    * is current iff its table version is at least the embeddings
    * table's version.
    */
  def annIndexState: KbStore.AnnState = {
    val tv = metaCache.table_versions
    if (!tv.contains(KbStore.IvfAssignTable)) KbStore.AnnNone
    else if (tv(KbStore.IvfAssignTable) >= tv("embeddings")) KbStore.AnnCurrent
    else KbStore.AnnStale
  }

  /** Whether a CURRENT ANN index exists (a stale one never serves). */
  def hasAnnIndex: Boolean = annIndexState == KbStore.AnnCurrent

  /** Net rows added to / keys removed from `table` strictly after
    * manifest version `since`, derived from the delta-segment chain
    * alone — O(changed) IO with NO full-table scan and NO anti-join
    * over the corpus. The segment route is exact iff the table's base
    * pointer is unchanged since `since` and the head's chain extends
    * `since`'s chain (the [[tableChangelog]] criterion); anything else
    * (a compaction, a full rewrite, a vacuumed history file) returns
    * None and the caller falls back to the full keyed diff.
    *
    * This is what makes the per-batch index refreshes of a
    * continuously ingesting store O(batch): before round 13 every
    * refresh anti-joined the FULL data table against the FULL index
    * table just to find the handful of changed ids — at 100 TB that
    * is two corpus scans plus two corpus-sized exchanges per
    * micro-batch; the segment route reads exactly the delta files the
    * index missed.
    *
    * WATERMARK INVARIANT (r13 advice): every caller passes
    * `tv(indexTable)` as `since`, treating the index table's manifest
    * version as a COVERAGE watermark over the data table. That is
    * valid because every index-table writer (build*, refresh*) commits
    * in the same manifest transaction that reads the data table's
    * current head — an index row set at version V has, by
    * construction, folded every data segment ≤ V. A future writer
    * that bumps an index table's version WITHOUT covering the data
    * table (e.g. a metadata-only rewrite of the postings layout) would
    * silently skip rows here; such a writer must either keep the index
    * version below the data table's or use a full rebuild path.
    */
  private def changedSince(table: String, since: Long)
      : Option[(DataFrame, DataFrame)] = {
    // measurement-only kill switch (round 14 evidence debt): lets the
    // profiling mains time the refresh paths with the segment route
    // DISABLED (forcing every refresh onto the full keyed diff) so the
    // O(corpus) → O(batch) claim has a recorded before/after on one
    // tree. Never set outside a measurement run.
    val r =
      if (sys.props.get("graft.kb.forceFullRefreshDiff").contains("true") ||
          sys.env.get("GRAFT_KB_FORCE_FULL_REFRESH_DIFF").contains("true"))
        None
      else changedSinceImpl(table, since)
    // engagement probe (r13 verdict item 3): RefreshFastPathSpec's
    // parity tests are vacuous if the fast path silently stops
    // engaging (route parity with the fallback is then parity with
    // itself) — the spec asserts this flag after each refresh
    lastRefreshRoute = Some(if (r.isDefined) "segment" else "full")
    r
  }

  /** Which route the most recent [[changedSince]] call resolved to:
    * Some("segment") = delta-chain fast path proved exact,
    * Some("full") = caller fell back to the full keyed diff,
    * None = no refresh has derived changed ids yet. Test probe. */
  private[graft] var lastRefreshRoute: Option[String] = None

  private def changedSinceImpl(table: String, since: Long)
      : Option[(DataFrame, DataFrame)] = {
    val head = metaCache
    if (!head.table_versions.contains(table)) return None
    val old =
      if (since == head.version) head
      else scala.util.Try(metaAt(since)).getOrElse(return None)
    if (!old.table_versions.contains(table)) return None
    def basePtr(m: KbMeta): Long =
      m.table_bases.getOrElse(table, m.table_versions(table))
    val oldChain = old.table_deltas.getOrElse(table, Seq.empty[Long])
    val headChain = head.table_deltas.getOrElse(table, Seq.empty[Long])
    if (basePtr(old) != basePtr(head) || !headChain.startsWith(oldChain))
      return None
    val appended = headChain.drop(oldChain.size)
    // plan-depth cap (r13 verdict item 6): the fold below builds one
    // left_anti + union operator pair PER segment, so Catalyst
    // analysis cost grows with the window length. The head chain is
    // already bounded by DeltaChainLimit's minor compaction (which
    // also breaks the startsWith proof and lands here as None), but
    // the cap is stated explicitly so raising the chain limit can
    // never hand the analyzer an unbounded plan: past it the full
    // keyed diff is cheaper than the plan itself.
    if (appended.size > KbStore.DeltaChainLimit) return None
    val keys = KbStore.DeltaKeys(table)
    val schema = read(table).limit(0)
    var adds = schema
    var dels = schema.select(keys.map(col(_)): _*)
    // fold in publish order: a segment's tombstones apply to earlier
    // segments' adds (removed-then-added, the read-side contract), so
    // a row added then deleted inside the window nets out of `adds`
    appended.foreach { v =>
      val dir = tableDir(table, v)
      if (KbStore.hasParquetFiles(s"$dir/del")) {
        val d = spark.read.parquet(s"$dir/del").select(keys.map(col(_)): _*)
        adds = adds.join(d, keys, "left_anti")
        dels = dels.unionByName(d)
      }
      if (KbStore.hasParquetFiles(s"$dir/add"))
        adds = adds.unionByName(spark.read.parquet(s"$dir/add")
          .select(schema.columns.map(col(_)): _*))
    }
    Some((adds, dels.distinct()))
  }

  /** Distinct keys of `table` rows tombstoned by any del segment in
    * the CURRENT head chain — the candidates for deleted-then-re-added
    * ids. Reads only the chain's (small) del files, never the base;
    * None when the chain holds no tombstones. */
  private def tombstonedKeysInChain(table: String): Option[DataFrame] = {
    val chain = metaCache.table_deltas.getOrElse(table, Seq.empty[Long])
    val keys = KbStore.DeltaKeys(table)
    val dels = chain.flatMap { v =>
      val dir = tableDir(table, v)
      if (KbStore.hasParquetFiles(s"$dir/del"))
        Some(spark.read.parquet(s"$dir/del").select(keys.map(col(_)): _*))
      else None
    }
    dels.reduceOption(_.unionByName(_)).map(_.distinct())
  }

  /** The refresh fallbacks' full keyed diff, made re-add-aware (r13
    * verdict item 5): `live` is the data table projected to the index
    * key column `key` (plus payload columns), `storedKeys` the index
    * family's current key set. The plain diff —
    * new = live ∖ stored, gone = stored ∖ live — leaves the index's
    * STALE row in place for a key that was deleted and re-added
    * between the index version and now (it is in both sides), while
    * the segment route tombstones and re-indexes it; the two routes
    * then disagree and which one runs depends on compaction history.
    * Here any live key that also appears in the head chain's del
    * segments is re-indexed too (tombstone + fresh add in the same
    * patch — the updates-tombstone-before-re-adding shape the
    * read-side fold is built for). After a compaction the del history
    * is gone and only the post-compaction window is visible; for the
    * elided window the store-level invariants carry the proof instead:
    * doc/edge adds allocate fresh high-water ids, the only key-reusing
    * doc mutations (updateDocMeta, setDocEmbedding's doc patch) re-add
    * the SAME text so a surviving index row is never wrong, and
    * embeddings VECTOR REPLACEMENT drops the vector families outright
    * (preserveIndex = false) rather than leaving them stale.
    *
    * Returns (rows of `live` the index must (re-)ingest, keys whose
    * index rows must tombstone) — the two sides of each union are
    * disjoint by construction, so no distinct is needed. */
  private def fullDiffWithReadds(live: DataFrame, storedKeys: DataFrame,
      key: String, dataTable: String): (DataFrame, DataFrame) = {
    val liveKeys = live.select(col(key))
    val newBase = live.join(storedKeys, Seq(key), "left_anti")
    val goneBase = storedKeys.join(liveKeys, Seq(key), "left_anti")
    tombstonedKeysInChain(dataTable) match {
      case None => (newBase, goneBase)
      case Some(delKeys) =>
        val rk = delKeys.toDF(key) // chain keys carry the DATA table's
                                   // key name (e.g. "id") — rename
        val reIdx = live.join(rk, Seq(key), "left_semi")
          .join(storedKeys, Seq(key), "left_semi")
        (newBase.unionByName(reIdx),
          goneBase.unionByName(reIdx.select(col(key))))
    }
  }

  /** Catch a stale index up with the batch it missed: assignments of
    * deleted ids drop (semi join against the live embeddings), new ids
    * are assigned to the STORED centroids with the packed kernel, and
    * the merged inverted-list table commits — O(changed docs) work plus
    * one pass over the old assignment, no re-clustering. The "update
    * the index in batch" half of the index story; no-op when current,
    * error when no index survives (vector replacement requires
    * [[buildAnnIndex]]).
    *
    * Since round 13 the changed ids come from [[changedSince]]'s
    * segment route when the manifests prove it exact — O(batch) IO,
    * no corpus scan — with the original full anti-join pair as the
    * fallback.
    */
  def refreshAnnIndex(): Unit = annIndexState match {
    case KbStore.AnnCurrent => ()
    case KbStore.AnnNone => throw new IllegalStateException(
      "no ANN index to refresh — call buildAnnIndex()")
    case KbStore.AnnStale =>
      import spark.implicits._
      import graft.functions.FloatVecDot
      import graft.functions.FloatVecPack.floatVecPack
      // delta commit: tombstone assignments of deleted ids, append
      // assignments of new ids — write volume O(changed), not O(index).
      // Changed ids via the segment route when provable (O(batch) IO);
      // full anti-join pair otherwise.
      val (newEmb, removed) =
        changedSince("embeddings",
            metaCache.table_versions(KbStore.IvfAssignTable)) match {
          case Some((adds, dels)) =>
            (adds.select($"id".as("vec_id"), $"vec".as("embedding")),
              dels.select($"id".as("vec_id")))
          case None =>
            val emb = embeddings.toDF()
              .select($"id".as("vec_id"), $"vec".as("embedding"))
            val old = read(KbStore.IvfAssignTable)
            fullDiffWithReadds(emb, old.select($"vec_id"), "vec_id",
              "embeddings")
        }
      val packedCents = read(KbStore.IvfCentroidsTable).collect()
        .map { r =>
          (r.getLong(0),
            FloatVecDot.pack(r.getSeq[Double](1).map(_.toFloat).toArray))
        }.toSeq.toDF("cid", "cvec")
      val added = graft.ops.SimilaritySearch.ivfAssignPacked(
        newEmb.select($"vec_id".as("id"), floatVecPack($"embedding").as("vec")),
        packedCents)
      commitDelta(Map(KbStore.IvfAssignTable ->
        KbStore.TablePatch(del = Some(removed), add = Some(added))), identity,
        readSet = Set("embeddings", KbStore.IvfCentroidsTable))
  }

  /** Build (or rebuild) the persistent IVF index as store tables:
    * centroids seeded deterministically (smallest md5-of-id corpus
    * vectors), refined with spherical k-means, every embedding assigned
    * to its inverted list by the zero-shuffle broadcast argmax. The two
    * tables commit atomically like any other table and version with the
    * manifest; a later embeddings commit invalidates them.
    */
  def buildAnnIndex(nlist: Int = 64, iters: Int = 2,
      packedPathAbove: Long = 100000L): Unit = {
    import spark.implicits._
    val emb = embeddings.toDF()
      .select($"id".as("vec_id"), $"vec".as("embedding"))
    val total = emb.count()
    require(total > 0, "cannot build an ANN index over an empty store")
    val k = math.max(1, math.min(nlist.toLong, total).toInt)
    var cleanup: () => Unit = () => ()
    val (centsDf, assign) =
      if (total <= packedPathAbove) {
        // declarative array path: fine while every k-means pass is cheap
        val seeds = emb
          .select($"vec_id", $"embedding",
            md5(concat(lit("ivf:"), $"vec_id")).as("h"))
          .orderBy($"h").limit(k).collect()
        val cents0 = seeds.zipWithIndex.map { case (r, i) =>
          (i.toLong, r.getSeq[Float](1).map(_.toDouble))
        }.toSeq.toDF("cid", "cvec")
        val cents = graft.ops.SimilaritySearch
          .kmeansCentroids(emb, cents0, iters)
        (cents,
          graft.ops.SimilaritySearch.ivfAssign(emb, cents)
            .select($"vec_id", $"cid"))
      } else {
        // packed path: the per-partition primitive kernels that hold at
        // 1M × d1536 (see SimilaritySearch ivfAssignPacked /
        // kmeansCentroidsPacked)
        import graft.functions.FloatVecDot
        import graft.functions.FloatVecPack.floatVecPack
        val packed = emb
          .select($"vec_id".as("id"), floatVecPack($"embedding").as("vec"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        cleanup = () => { packed.unpersist(blocking = false); () }
        val seeds = packed
          .select($"id", $"vec", md5(concat(lit("ivf:"), $"id")).as("h"))
          .orderBy($"h").limit(k).collect()
          .zipWithIndex.map { case (r, i) =>
            (i.toLong, FloatVecDot.unpack(r.getAs[Array[Byte]](1)))
          }
        val cents = graft.ops.SimilaritySearch
          .kmeansCentroidsPacked(packed, seeds, iters)
        val centsPackedDf = cents.toSeq
          .map { case (cid, v) => (cid, FloatVecDot.pack(v)) }
          .toDF("cid", "cvec")
        val centsStored = cents.toSeq
          .map { case (cid, v) => (cid, v.map(_.toDouble).toSeq) }
          .toDF("cid", "cvec")
        (centsStored,
          graft.ops.SimilaritySearch.ivfAssignPacked(packed, centsPackedDf))
      }
    try {
      commit(
        Map(KbStore.IvfCentroidsTable -> centsDf,
          KbStore.IvfAssignTable -> assign),
        identity, readSet = Set("embeddings"))
    } finally cleanup()
  }

  /** ANN retrieval through the persistent index: embed the query, probe
    * the `nProbe` closest inverted lists, score only their members, join
    * docs back. `nProbe = nlist` degenerates to exact retrieval.
    * Refuses when no current index exists (build or rebuild first) —
    * silently-stale answers are worse than an error.
    *
    * Probe path (round 6): centroid selection is a driver-side loop
    * over the (tiny, nlist-row) centroid table; candidate scoring goes
    * through packed vectors + the codegen'd [[graft.functions
    * .FloatVecDot]] kernel — the shape [[sqRetrieve]] uses — instead of
    * the interpreted higher-order array expressions of
    * [[graft.ops.SimilaritySearch.ivfTopK]] (which stays as the
    * oracle-parity twin; both accumulate double(f32)·double(f32)
    * sequentially, so results are bit-identical — a spec asserts it).
    */
  def annRetrieve(query: String, n: Int, provider: EmbeddingProvider,
      nProbe: Int = 8): Seq[Retrieval] = {
    require(hasAnnIndex, annIndexState match {
      case KbStore.AnnStale =>
        "ANN index is stale: call refreshAnnIndex() to catch it up"
      case _ => "no ANN index: call buildAnnIndex()"
    })
    if (n <= 0) return Seq.empty
    import spark.implicits._
    import graft.functions.FloatVecDot
    import graft.functions.FloatVecDot.floatVecDot
    import graft.functions.FloatVecPack.floatVecPack
    val qv = Embeddings.checkMagnitude(provider.embed(Seq(query))).head
    val probed = ivfProbeCids(qv, nProbe)
    if (probed.isEmpty) return Seq.empty
    val packed = embeddings.toDF()
      .select($"id".as("vec_id"), floatVecPack($"vec").as("pv"))
    val hits = read(KbStore.IvfAssignTable)
      .where($"cid".isin(probed: _*))
      .join(packed, "vec_id")
      .select($"vec_id",
        round(floatVecDot($"pv", lit(FloatVecDot.pack(qv))), 6).as("score"))
      .where(!isnan($"score")) // NaN would sort above every real score
      .orderBy(desc("score"), $"vec_id")
      .limit(n)
      .as[(Long, Double)].collect()
    if (hits.isEmpty) return Seq.empty
    val docByEmb = docs.filter($"emb_id".isin(hits.map(_._1): _*))
      .collect().map(d => d.emb_id.get -> d).toMap
    hits.toSeq.map { case (embId, score) => Retrieval(score, docByEmb(embId)) }
  }

  /** Probe selection against the persisted centroid table: same
    * sequential double fold and (score desc, cid asc) tie order as
    * ivfTopK's probe subquery. `+ 0.0` canonicalizes -0.0 to +0.0:
    * Scala's total Double order ranks -0.0 < 0.0, while the SQL twin
    * treats them as equal and tie-breaks on cid — parity requires the
    * same here.
    */
  private def ivfProbeCids(qv: Array[Float], nProbe: Int): Seq[Long] =
    read(KbStore.IvfCentroidsTable).collect()
      .map { r =>
        val cv = r.getSeq[Double](1).toArray
        var acc = 0.0
        var i = 0
        while (i < cv.length && i < qv.length) {
          acc += cv(i) * qv(i).toDouble; i += 1
        }
        (r.getLong(0), acc + 0.0)
      }
      .sortBy { case (cid, s) => (-s, cid) }
      .take(nProbe).map(_._1).toSeq

  /** [[annRetrieve]] under a document predicate — filtered vector
    * search through the persisted IVF family (the reference's callers
    * post-filter retrieve() results in Python; a filtered corpus query
    * belongs INSIDE the probe so the dot kernel never runs on excluded
    * rows). `pred` is a Column over the docs table's columns (level,
    * parent_id, meta JSON via get_json_object, …); docs matching it
    * are semi-joined onto the probed inverted lists BEFORE scoring, so
    * per-call cost is probe ranking + selectivity × probed-list size.
    * Approximate exactly like [[annRetrieve]] (unprobed lists are
    * unseen); `nProbe = nlist` is exact — equivalence with
    * post-filtering the full-probe retrieval is spec-pinned.
    */
  def annRetrieveFiltered(query: String, n: Int,
      provider: EmbeddingProvider,
      pred: org.apache.spark.sql.Column, nProbe: Int = 8): Seq[Retrieval] = {
    require(hasAnnIndex, annIndexState match {
      case KbStore.AnnStale =>
        "ANN index is stale: call refreshAnnIndex() to catch it up"
      case _ => "no ANN index: call buildAnnIndex()"
    })
    if (n <= 0) return Seq.empty
    import spark.implicits._
    import graft.functions.FloatVecDot
    import graft.functions.FloatVecDot.floatVecDot
    import graft.functions.FloatVecPack.floatVecPack
    val qv = Embeddings.checkMagnitude(provider.embed(Seq(query))).head
    val probed = ivfProbeCids(qv, nProbe)
    if (probed.isEmpty) return Seq.empty
    val allowed = docs.toDF().where(pred)
      .where($"emb_id".isNotNull)
      .select($"emb_id".as("vec_id"))
    val packed = embeddings.toDF()
      .select($"id".as("vec_id"), floatVecPack($"vec").as("pv"))
    val hits = read(KbStore.IvfAssignTable)
      .where($"cid".isin(probed: _*))
      .join(allowed, "vec_id") // predicate before the dot kernel
      .join(packed, "vec_id")
      .select($"vec_id",
        round(floatVecDot($"pv", lit(FloatVecDot.pack(qv))), 6).as("score"))
      .where(!isnan($"score"))
      .orderBy(desc("score"), $"vec_id")
      .limit(n)
      .as[(Long, Double)].collect()
    if (hits.isEmpty) return Seq.empty
    val docByEmb = docs.filter($"emb_id".isin(hits.map(_._1): _*))
      .collect().map(d => d.emb_id.get -> d).toMap
    hits.toSeq.map { case (embId, score) => Retrieval(score, docByEmb(embId)) }
  }

  /** Batch k-NN JOIN against the persisted ANN index: every row of
    * `queries` (`id LONG, vec ARRAY<FLOAT>` unit-norm) gets its top-k
    * neighbors among the store's embedded documents, probing the
    * STORED assignment table — per-call cost is probe ranking +
    * candidate scoring + bounded heaps; the corpus-wide assignment
    * pass is index maintenance, amortized across calls (the
    * deployment shape `svs_knn_join_indexed_1m` measures by hand).
    * `nProbe >= nlist` degenerates to the exact join. Output:
    * (qid, vec_id, score, rk), score rounded to 6 decimals, ties
    * (score desc, vec_id asc).
    */
  def knnJoin(queries: DataFrame, k: Int, nProbe: Int = 8): DataFrame = {
    require(hasAnnIndex, annIndexState match {
      case KbStore.AnnStale =>
        "ANN index is stale: call refreshAnnIndex() to catch it up"
      case _ => "no ANN index: call buildAnnIndex()"
    })
    import spark.implicits._
    import graft.functions.FloatVecPack.floatVecPack
    val centsDf = read(KbStore.IvfCentroidsTable)
      .select(col("cid"),
        floatVecPack(col("cvec").cast("array<float>")).as("cvec"))
    val packedEmb = embeddings.toDF()
      .select($"id".as("cand_id"), floatVecPack($"vec").as("cv"))
    val assigned = read(KbStore.IvfAssignTable)
      .join(packedEmb, col("vec_id") === col("cand_id"))
      .select(col("cid").as("ccid"), col("cand_id"), col("cv"))
    val packedQ = queries.select(col("id"),
      floatVecPack(col("vec")).as("vec"))
    graft.ops.SimilaritySearch.knnJoinIvfAssigned(
        packedQ, assigned, centsDf, k, nProbe)
      .withColumnRenamed("cid", "vec_id")
  }

  // ------------------------------------------------------------------
  // persistent int8 compressed tier (SURVEY §7.5 round 5): the same
  // manifest lifecycle as the ANN index, over 4×-smaller scalar-
  // quantized codes — the scan tier that keeps a 100 TB corpus in 1/4
  // the memory, re-ranked exactly against the raw vectors
  // ------------------------------------------------------------------
  /** Compressed-tier lifecycle, same manifest arithmetic as
    * [[annIndexState]]: current iff the codes table's version is at
    * least the embeddings table's.
    */
  def sqIndexState: KbStore.AnnState = {
    val tv = metaCache.table_versions
    if (!tv.contains(KbStore.SqCodesTable)) KbStore.AnnNone
    else if (tv(KbStore.SqCodesTable) >= tv("embeddings")) KbStore.AnnCurrent
    else KbStore.AnnStale
  }

  def hasSqIndex: Boolean = sqIndexState == KbStore.AnnCurrent

  /** Quantize every embedding to int8 codes + per-vector scale and
    * commit the codes table (one narrow encode pass; commits atomically
    * and versions with the manifest like any table).
    */
  def buildSqIndex(): Unit = {
    import spark.implicits._
    import graft.functions.FloatVecPack.floatVecPack
    require(embeddings.toDF().limit(1).count() > 0,
      "cannot build a compressed tier over an empty store")
    val packed = embeddings.toDF()
      .select($"id", floatVecPack($"vec").as("vec"))
    commit(Map(KbStore.SqCodesTable ->
      graft.ops.VectorQuant.sqEncodePacked(packed)
        .withColumnRenamed("id", "vec_id")), identity,
      readSet = Set("embeddings"))
  }

  /** Incremental catch-up, mirroring [[refreshAnnIndex]]: deleted ids
    * tombstone, new ids encode fresh and append — since round 6's
    * delta commits both the ENCODE work and the WRITE volume are
    * O(changed docs).
    */
  def refreshSqIndex(): Unit = sqIndexState match {
    case KbStore.AnnCurrent => ()
    case KbStore.AnnNone => throw new IllegalStateException(
      "no compressed tier to refresh — call buildSqIndex()")
    case KbStore.AnnStale =>
      import spark.implicits._
      import graft.functions.FloatVecPack.floatVecPack
      // changed ids via the segment route when provable (O(batch) IO,
      // no corpus anti-join); full keyed diff otherwise
      val (newEmb, removed) =
        changedSince("embeddings",
            metaCache.table_versions(KbStore.SqCodesTable)) match {
          case Some((adds, dels)) =>
            (adds.select($"id".as("vec_id"), $"vec"),
              dels.select($"id".as("vec_id")))
          case None =>
            val emb = embeddings.toDF().select($"id".as("vec_id"), $"vec")
            val old = read(KbStore.SqCodesTable)
            fullDiffWithReadds(emb, old.select($"vec_id"), "vec_id",
              "embeddings")
        }
      val added = graft.ops.VectorQuant.sqEncodePacked(
          newEmb.select($"vec_id".as("id"), floatVecPack($"vec").as("vec")))
        .withColumnRenamed("id", "vec_id")
      // ENCODE work was already O(changed); the delta commit makes the
      // WRITE O(changed) too (the r5 verdict's remaining disclosure)
      commitDelta(Map(KbStore.SqCodesTable ->
        KbStore.TablePatch(del = Some(removed), add = Some(added))), identity,
        readSet = Set("embeddings"))
  }

  /** Retrieval through the compressed tier: the int8 codegen'd scan
    * ranks the whole corpus in 1/4 the bytes, the top `rerank`
    * candidates re-rank exactly against the raw vectors (broadcast
    * semi-join — the full-precision corpus is only touched for the
    * candidates). `rerank >= corpus size` degenerates to exact
    * retrieval. Refuses when not current, like [[annRetrieve]].
    */
  def sqRetrieve(query: String, n: Int, provider: EmbeddingProvider,
      rerank: Int = 100): Seq[Retrieval] = {
    require(hasSqIndex, sqIndexState match {
      case KbStore.AnnStale =>
        "compressed tier is stale: call refreshSqIndex() to catch it up"
      case _ => "no compressed tier: call buildSqIndex()"
    })
    if (n <= 0) return Seq.empty
    import spark.implicits._
    import graft.functions.{FloatVecDot, Int8VecDot}
    import graft.functions.FloatVecDot.floatVecDot
    import graft.functions.FloatVecPack.floatVecPack
    val qv = Embeddings.checkMagnitude(provider.embed(Seq(query))).head
    val (qCode, qScale) = Int8VecDot.quantize(qv)
    val candIds = graft.ops.VectorQuant.sqTopKPacked(
        read(KbStore.SqCodesTable).withColumnRenamed("vec_id", "id"),
        qCode, qScale, math.max(n, rerank))
      .select($"vec_id")
    val packed = embeddings.toDF()
      .select($"id", floatVecPack($"vec").as("vec"))
    val hits = packed
      .join(broadcast(candIds), packed("id") === candIds("vec_id"))
      .select($"id",
        round(floatVecDot($"vec", lit(FloatVecDot.pack(qv))), 6).as("score"))
      // a stored vector with NaN components passes checkMagnitude (NaN
      // comparisons are all false) yet scores NaN here, and NaN sorts
      // ABOVE every real double descending — drop it from the ranking,
      // matching VectorQuant.exactRerank
      .where(!isnan($"score"))
      .orderBy(desc("score"), $"id")
      .limit(n)
      .as[(Long, Double)].collect()
    if (hits.isEmpty) return Seq.empty
    val docByEmb = docs.filter($"emb_id".isin(hits.map(_._1): _*))
      .collect().map(d => d.emb_id.get -> d).toMap
    hits.toSeq.map { case (embId, score) => Retrieval(score, docByEmb(embId)) }
  }

  // ------------------------------------------------------------------
  // persistent IVF-PQ index (round 6): coarse inverted lists + PQ on
  // residuals as a FOURTH manifest-managed family — the 64×-compressed
  // tier for corpora whose raw vectors (and even int8 codes) no longer
  // fit the memory budget (Jégou et al. 2011)
  // ------------------------------------------------------------------
  /** Same manifest arithmetic as the other vector families: current
    * iff the codes table's version is at least the embeddings table's.
    */
  def pqIndexState: KbStore.AnnState = {
    val tv = metaCache.table_versions
    if (!tv.contains(KbStore.IvfPqCodesTable)) KbStore.AnnNone
    else if (tv(KbStore.IvfPqCodesTable) >= tv("embeddings")) KbStore.AnnCurrent
    else KbStore.AnnStale
  }

  def hasPqIndex: Boolean = pqIndexState == KbStore.AnnCurrent

  /** Build (or rebuild) the IVF-PQ tier: deterministic-seeded packed
    * k-means for the coarse centroids, residual codebook training, and
    * per-vector (cid, code) rows — three tables committed atomically.
    * `m` must divide the embedding dimension. `bucketCodes = true`
    * additionally materializes the cid-bucketed mirror
    * ([[bucketPqCodes]]) so [[pqKnnJoin]] gets the exchange-free
    * AdcCodesJoin path from the first call.
    */
  def buildPqIndex(nlist: Int = 64, m: Int = 8, ncodes: Int = 256,
      iters: Int = 2, sampleMod: Int = 1,
      bucketCodes: Boolean = false, buckets: Int = 32): Unit = {
    import spark.implicits._
    import graft.functions.FloatVecDot
    import graft.functions.FloatVecPack.floatVecPack
    val packed = embeddings.toDF()
      .select($"id", floatVecPack($"vec").as("vec"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val total = packed.count()
      require(total > 0, "cannot build an IVF-PQ index over an empty store")
      val k = math.max(1, math.min(nlist.toLong, total).toInt)
      val seeds = packed
        .select($"id", $"vec", md5(concat(lit("ivfpq:"), $"id")).as("h"))
        .orderBy($"h").limit(k).collect()
        .zipWithIndex.map { case (r, i) =>
          (i.toLong, FloatVecDot.unpack(r.getAs[Array[Byte]](1)))
        }
      val cents = graft.ops.SimilaritySearch
        .kmeansCentroidsPacked(packed, seeds, iters)
      val res = graft.ops.VectorQuant.ivfResiduals(packed, cents.toArray)
        .persist(StorageLevel.MEMORY_AND_DISK)
      try {
        val books = graft.ops.VectorQuant.pqTrain(
          res.select($"id", $"rvec".as("vec")), m, ncodes, sampleMod, iters)
        val codes = graft.ops.VectorQuant.ivfPqEncode(res, books)
          .withColumnRenamed("id", "vec_id")
        val centsDf = cents.toSeq
          .map { case (cid, v) => (cid, v.map(_.toDouble).toSeq) }
          .toDF("cid", "cvec")
        val booksDf = books.zipWithIndex.flatMap { case (sub, s) =>
          sub.zipWithIndex.map { case (cv, c) =>
            (s, c, cv.map(_.toDouble).toSeq) }
        }.toSeq.toDF("s", "c", "v")
        commit(
          Map(KbStore.IvfPqCentroidsTable -> centsDf,
            KbStore.IvfPqBooksTable -> booksDf,
            KbStore.IvfPqCodesTable -> codes),
          identity, readSet = Set("embeddings"))
      } finally res.unpersist(blocking = false)
    } finally packed.unpersist(blocking = false)
    if (bucketCodes) bucketPqCodes(buckets)
  }

  private def loadPqCents(): Array[(Long, Array[Float])] =
    read(KbStore.IvfPqCentroidsTable).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).map(_.toFloat).toArray))
      .sortBy(_._1)

  private def loadPqBooks(): graft.ops.VectorQuant.Codebooks = {
    val rows = read(KbStore.IvfPqBooksTable).collect()
      .map(r => (r.getInt(0), r.getInt(1),
        r.getSeq[Double](2).map(_.toFloat).toArray))
    val m = rows.map(_._1).max + 1
    Array.tabulate(m)(s => rows.filter(_._1 == s).sortBy(_._2).map(_._3))
  }

  /** Incremental catch-up like the other families: tombstone codes of
    * deleted ids, residual-assign + encode new ids against the STORED
    * centroids and codebooks — encode AND write are O(changed docs).
    */
  def refreshPqIndex(): Unit = pqIndexState match {
    case KbStore.AnnCurrent => ()
    case KbStore.AnnNone => throw new IllegalStateException(
      "no IVF-PQ index to refresh — call buildPqIndex()")
    case KbStore.AnnStale =>
      import spark.implicits._
      import graft.functions.FloatVecPack.floatVecPack
      val old = read(KbStore.IvfPqCodesTable)
      // changed ids via the segment route when provable (O(batch) IO,
      // no corpus anti-join); full keyed diff otherwise. `old` is
      // still needed below for the sharded mirror's cid lookup, but in
      // the fast path it is scanned once behind a broadcast join, not
      // anti-joined against the corpus.
      val (newEmb, removed) =
        changedSince("embeddings",
            metaCache.table_versions(KbStore.IvfPqCodesTable)) match {
          case Some((adds, dels)) =>
            (adds.select($"id", floatVecPack($"vec").as("vec")),
              dels.select($"id".as("vec_id")))
          case None =>
            val emb = embeddings.toDF().select($"id".as("vec_id"), $"vec")
            val (nw, rm) = fullDiffWithReadds(emb, old.select($"vec_id"),
              "vec_id", "embeddings")
            (nw.select($"vec_id".as("id"), floatVecPack($"vec").as("vec")),
              rm)
        }
      val added = graft.ops.VectorQuant.ivfPqEncode(
          graft.ops.VectorQuant.ivfResiduals(newEmb, loadPqCents()),
          loadPqBooks())
        .withColumnRenamed("id", "vec_id")
      // mirror maintenance prep (before the commit moves the head):
      // the shards a sharded mirror must rewrite are those containing
      // any added or removed row's list id — `old` stays pinned to the
      // pre-commit version paths, so this is computable either side of
      // the commit, but the intent reads cleanest here
      val marker = readBucketMarker()
      val changedPps: Seq[Long] = marker match {
        case Some((_, _, parts, _)) if parts > 0 =>
          added.select($"cid")
            .union(old.join(removed, Seq("vec_id")).select($"cid"))
            .select(pmod($"cid", lit(parts.toLong)).as("pp"))
            .distinct().as[Long].collect().toSeq
        case _ => Nil
      }
      val preCodesVersion =
        metaCache.table_versions.get(KbStore.IvfPqCodesTable)
      commitDelta(Map(KbStore.IvfPqCodesTable ->
        KbStore.TablePatch(del = Some(removed), add = Some(added))), identity,
        readSet = Set("embeddings", KbStore.IvfPqCentroidsTable,
          KbStore.IvfPqBooksTable))
      // keep the bucketed mirror current when one was materialized. A
      // SHARDED mirror (parts > 0) rewrites only the changed shards —
      // O(changed lists), the same order as the delta commit itself —
      // unless more than half the shards moved, where the full rewrite
      // is the same volume with less bookkeeping. The sharded fast path
      // additionally requires the marker to have named exactly the
      // PRE-commit codes version: a mirror that had already missed an
      // update (crash between commitDelta and the marker write, or a
      // rebuild without bucketCodes) has unchanged shards that are
      // older than this delta — promoting it after rewriting only this
      // delta's shards would serve those stale rows as current. Such a
      // mirror gets the full rebuild instead, preserving its layout
      // (parts = 0 stays unpartitioned — writeCodesBucketed handles
      // it). While this runs the marker still names the pre-commit
      // version, so a concurrent pqKnnJoin falls back to the plain
      // kernel rather than reading a half-maintained mirror; the
      // marker flips only at the end.
      marker.foreach { case (tbl, b, parts, mv) =>
        if (parts > 0 && preCodesVersion.contains(mv) &&
            changedPps.size <= parts / 2 &&
            ensureMirrorRegistered(tbl, b, parts)) {
          graft.ops.VectorQuant.overwriteCodeShards(
            read(KbStore.IvfPqCodesTable).withColumnRenamed("vec_id", "id"),
            tbl, parts, changedPps)
          writeBucketMarker(tbl, b, parts,
            metaCache.table_versions(KbStore.IvfPqCodesTable))
        } else bucketPqCodes(b, parts)
      }
  }

  /** Retrieval through the IVF-PQ tier: ADC over the probed lists'
    * 1-byte-per-subspace codes, exact re-rank of the top `rerank`
    * candidates against the raw vectors, docs joined back.
    * `nProbe = nlist` with `rerank >= corpus` degenerates to exact
    * retrieval. Refuses when not current, like the other tiers.
    */
  def pqRetrieve(query: String, n: Int, provider: EmbeddingProvider,
      nProbe: Int = 8, rerank: Int = 100): Seq[Retrieval] = {
    require(hasPqIndex, pqIndexState match {
      case KbStore.AnnStale =>
        "IVF-PQ index is stale: call refreshPqIndex() to catch it up"
      case _ => "no IVF-PQ index: call buildPqIndex()"
    })
    if (n <= 0) return Seq.empty
    import spark.implicits._
    import graft.functions.FloatVecPack.floatVecPack
    val qv = Embeddings.checkMagnitude(provider.embed(Seq(query))).head
    val codes = read(KbStore.IvfPqCodesTable)
      .withColumnRenamed("vec_id", "id")
    val packed = embeddings.toDF()
      .select($"id", floatVecPack($"vec").as("vec"))
    val hits = graft.ops.VectorQuant.ivfPqTopKRefined(
        codes, packed, loadPqCents(), loadPqBooks(), qv,
        n, nProbe, math.max(n, rerank))
      .as[(Long, Double)].collect()
    if (hits.isEmpty) return Seq.empty
    val docByEmb = docs.filter($"emb_id".isin(hits.map(_._1): _*))
      .collect().map(d => d.emb_id.get -> d).toMap
    hits.toSeq.map { case (embId, score) => Retrieval(score, docByEmb(embId)) }
  }

  // ------------------------------------------------------------------
  // cid-bucketed codes mirror (round 8): a DERIVED catalog-table layout
  // of ivfpq_codes whose HashPartitioning(cid) the custom
  // plans/AdcCodesJoin operator accepts exchange-free — so store-level
  // compressed knn joins shuffle only the probe rows per call. The
  // manifest-managed ivfpq_codes table stays the source of truth; the
  // mirror carries the codes version it reflects in a sidecar marker
  // and is never served stale (version mismatch falls back to the
  // plain-kernel join).
  // ------------------------------------------------------------------
  private def bucketedCodesTableName: String = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(path.getBytes("UTF-8"))
    "graft_pq_codes_" + md.take(6).map("%02x".format(_)).mkString
  }

  private def bucketMarkerPath = Paths.get(s"$path/_pq_codes_bucketed.json")

  /** The mirror's parquet files live INSIDE the store directory (an
    * EXTERNAL table), not the session warehouse: the layout is store
    * state, paid for once per index build, and must survive the
    * session that happened to materialize it. (Vacuum's orphan sweep
    * ignores this dir — it is neither an index-table name nor a
    * v<N>-versioned layout — and reclaims it explicitly with the
    * marker when the mirror goes stale.) */
  private def bucketedCodesDataPath = s"$path/_pq_codes_data"

  private def writeBucketMarker(table: String, buckets: Int, parts: Int,
      codesVersion: Long): Unit = {
    val tmp = Paths.get(bucketMarkerPath.toString + ".tmp")
    Files.writeString(tmp,
      s"""{"table": "$table", "buckets": $buckets, "parts": $parts, "codes_version": $codesVersion}""")
    Files.move(tmp, bucketMarkerPath, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** (table, buckets, parts, codes_version) of the materialized mirror,
    * if any. `parts` > 0 means the mirror is additionally
    * directory-sharded by `pmod(cid, parts)` and maintains
    * incrementally. */
  private def readBucketMarker(): Option[(String, Int, Int, Long)] = {
    if (!Files.exists(bucketMarkerPath)) return None
    val s = Files.readString(bucketMarkerPath)
    val re = """"table"\s*:\s*"([^"]+)".*"buckets"\s*:\s*(\d+).*"parts"\s*:\s*(\d+).*"codes_version"\s*:\s*(\d+)""".r
    re.findFirstMatchIn(s).map(m =>
      (m.group(1), m.group(2).toInt, m.group(3).toInt, m.group(4).toLong))
  }

  /** Materialize (or refresh) the bucketed mirror of the current codes
    * table. O(codes) — a layout rewrite, 96 B/vector, so ~1.5 TB at a
    * 100 TB raw corpus: the cost a deployment pays once per index
    * build/refresh to make every subsequent [[pqKnnJoin]] call
    * codes-exchange-free. Requires a current IVF-PQ tier.
    */
  def bucketPqCodes(buckets: Int = 32, parts: Int = 64): Unit = {
    require(pqIndexState == KbStore.AnnCurrent, pqIndexState match {
      case KbStore.AnnStale =>
        "IVF-PQ index is stale: call refreshPqIndex() before bucketing"
      case _ => "no IVF-PQ index: call buildPqIndex()"
    })
    val tbl = bucketedCodesTableName
    // A compact that found a stale marker drops the CATALOG entry but
    // leaves the external _pq_codes_data files for vacuum (a reader may
    // overlap a compact). A rebuild into that orphaned non-empty
    // location would be a CTAS into a non-empty external dir — throws
    // under Spark's default allowNonEmptyLocationInCTAS=false, and with
    // the legacy flag set would silently mix the stale files into the
    // new mirror. Clear the orphans first: the rebuild replaces the
    // mirror's files under the pre-existing overwrite contract, so this
    // adds no reader hazard a catalog-tracked rebuild doesn't have.
    if (!spark.catalog.tableExists(tbl))
      try KbStore.deleteRecursively(Paths.get(bucketedCodesDataPath))
      catch { case _: java.io.IOException => () }
    val codes = read(KbStore.IvfPqCodesTable).withColumnRenamed("vec_id", "id")
    graft.ops.VectorQuant.writeCodesBucketed(codes, tbl, buckets, parts,
      location = Some(bucketedCodesDataPath))
    writeBucketMarker(tbl, buckets, parts,
      metaCache.table_versions(KbStore.IvfPqCodesTable))
  }

  /** Catalog registration survives sessions by re-declaration, not by
    * rewrite: when the marker names the current codes version but this
    * session's (in-memory) catalog has never heard of the table — a
    * fresh session opening a store whose mirror a PRIOR session built —
    * the existing external files are re-registered as a bucketed table
    * (CREATE TABLE ... CLUSTERED BY, plus partition recovery for a
    * sharded layout). O(metadata), not O(codes): "pay the layout once
    * per build" holds across sessions. Returns whether the table is
    * usable afterwards.
    */
  private def ensureMirrorRegistered(tbl: String, buckets: Int,
      parts: Int): Boolean = {
    if (spark.catalog.tableExists(tbl)) return true
    val dir = Paths.get(bucketedCodesDataPath)
    if (!Files.isDirectory(dir)) return false // pre-external-layout marker
    try {
      val ppCol = if (parts > 0) ", pp BIGINT" else ""
      val partBy = if (parts > 0) "PARTITIONED BY (pp) " else ""
      spark.sql(
        s"CREATE TABLE $tbl (cid BIGINT, id BIGINT, code BINARY$ppCol) " +
          s"USING parquet $partBy" +
          s"CLUSTERED BY (cid) INTO $buckets BUCKETS " +
          s"LOCATION '${dir.toUri}'")
      if (parts > 0) spark.sql(s"MSCK REPAIR TABLE $tbl")
      true
    } catch { case e: Exception =>
      // two sessions racing the CREATE TABLE: the loser's exception does
      // not mean the table is unusable — the winner just registered it.
      // Re-check before conceding, so the loser serves the bucketed path
      // instead of silently falling back to the plain kernel. But
      // table-exists alone is NOT usable for a partitioned layout: if
      // our own MSCK threw after CREATE succeeded, or the racing winner
      // created the table and hasn't finished ITS repair yet, the
      // external table has zero registered partitions and the bucketed
      // path would silently serve empty results — the one failure mode
      // worse than the slow fallback. MSCK REPAIR is idempotent, so the
      // re-check path runs it unconditionally and only vouches for the
      // table if the repair lands too.
      val nowExists =
        try spark.catalog.tableExists(tbl) catch { case _: Exception => false }
      val usable = nowExists && (parts == 0 ||
        (try { spark.sql(s"MSCK REPAIR TABLE $tbl"); true }
         catch { case _: Exception => false }))
      if (!usable)
        Console.err.println(
          s"[graft] bucketed-mirror re-registration of $tbl failed: $e")
      usable
    }
  }

  /** The mirror table name iff it exists (or can be re-registered from
    * its external files) and reflects exactly the current codes
    * version — anything else (never built, store mutated since) is
    * None and callers fall back. */
  private def currentBucketedCodesTable: Option[String] =
    readBucketMarker().flatMap { case (tbl, b, parts, v) =>
      if (metaCache.table_versions.get(KbStore.IvfPqCodesTable).contains(v)
          && ensureMirrorRegistered(tbl, b, parts)) Some(tbl)
      else None
    }

  /** Batch compressed k-NN JOIN against the persisted IVF-PQ tier:
    * every row of `queries` (`id LONG, vec ARRAY<FLOAT>` unit-norm)
    * gets its top-k neighbors, ADC-prefiltered through the 96-byte
    * codes and exactly re-ranked against the raw vectors — the
    * compressed twin of [[knnJoin]]. When the bucketed mirror is
    * current ([[bucketPqCodes]]), the join routes through the custom
    * AdcCodesJoin operator and the codes side enters the kernel
    * WITHOUT an exchange; otherwise the plain tagged-union kernel
    * runs on the manifest codes table. Results are identical either
    * way (OpsSpec pins parity; the k3 oracle pins the kernel).
    * Output: (qid, vec_id, score, rk), score rounded to 6 decimals.
    */
  def pqKnnJoin(queries: DataFrame, k: Int, nProbe: Int = 8,
      rerank: Int = 100): DataFrame = {
    require(hasPqIndex, pqIndexState match {
      case KbStore.AnnStale =>
        "IVF-PQ index is stale: call refreshPqIndex() to catch it up"
      case _ => "no IVF-PQ index: call buildPqIndex()"
    })
    import spark.implicits._
    import graft.functions.FloatVecPack.floatVecPack
    val cents = loadPqCents()
    val books = loadPqBooks()
    val packedQ = queries.select(col("id"), floatVecPack(col("vec")).as("vec"))
    val packedEmb = embeddings.toDF()
      .select($"id", floatVecPack($"vec").as("vec"))
    val sel = math.max(k, rerank)
    val joined = currentBucketedCodesTable match {
      case Some(tbl) =>
        graft.ops.VectorQuant.knnJoinIvfPqBucketed(packedQ, tbl, cents,
          books, packedEmb, k, nProbe, sel)
      case None =>
        val codes = read(KbStore.IvfPqCodesTable)
          .withColumnRenamed("vec_id", "id")
        graft.ops.VectorQuant.knnJoinIvfPq(packedQ, codes, cents,
          books, packedEmb, k, nProbe, sel)
    }
    joined.withColumnRenamed("cid", "vec_id")
  }

  // ------------------------------------------------------------------
  // persistent lexical (BM25) index: postings + doc lengths as a third
  // manifest-managed index family — full-text retrieval over the KB
  // ------------------------------------------------------------------
  /** Lexical-tier lifecycle: same manifest arithmetic, keyed on the
    * DOCS table (text, not vectors, is what it indexes).
    */
  def textIndexState: KbStore.AnnState = {
    val tv = metaCache.table_versions
    if (!tv.contains(KbStore.TextPostingsTable)) KbStore.AnnNone
    else if (tv(KbStore.TextPostingsTable) >= tv("docs")) KbStore.AnnCurrent
    else KbStore.AnnStale
  }

  def hasTextIndex: Boolean = textIndexState == KbStore.AnnCurrent

  /** Tokenize every document into `(doc_id, term, tf)` postings plus
    * `(doc_id, dl)` lengths and commit both atomically — document
    * frequency and corpus stats re-derive from these at query time, so
    * the two tables alone refresh incrementally by doc id. At
    * deployment scale the postings table is the one to bucket by
    * `term`.
    *
    * `unicode = true` tokenizes with the letter/digit-run tokenizer
    * (real punctuated corpora); the choice persists in the manifest so
    * retrieval and refresh ALWAYS tokenize the way the index was built.
    */
  def buildTextIndex(unicode: Boolean = false): Unit = {
    import spark.implicits._
    require(docs.limit(1).count() > 0,
      "cannot build a text index over an empty store")
    val (postings, docLens) = graft.ops.TextRetrieval.buildIndex(
      docs.toDF().select($"id".as("doc_id"), $"text"), unicode = unicode)
    // postings persist PARTITIONED by a term-hash bucket: a query's
    // terms map to ≤|terms| buckets, so the retrieval scan is physical
    // partition pruning (1/64th of the postings per term), not a full
    // scan with a filter
    try commit(
      Map(KbStore.TextPostingsTable -> KbStore.withTermBucket(postings),
        KbStore.TextDocLensTable -> docLens),
      m => m.copy(index_params =
        m.index_params + ("text_unicode" -> unicode.toString)),
      partitionBy = Map(KbStore.TextPostingsTable -> Seq("bucket")),
      readSet = Set("docs"))
    finally postings.unpersist(blocking = false) // buildIndex caches
  }

  /** The lexical tier's persisted tokenizer choice. */
  private def textIndexUnicode: Boolean =
    metaCache.index_params.get("text_unicode").contains("true")

  /** Incremental catch-up by doc id: postings/lengths of deleted docs
    * tombstone, new docs tokenize fresh and append — TOKENIZE work and
    * (since round 6's delta commits) WRITE volume are both O(changed
    * docs). Text is immutable per doc id in this store (updates touch
    * meta only), so surviving postings are never wrong, just possibly
    * incomplete.
    */
  def refreshTextIndex(): Unit = textIndexState match {
    case KbStore.AnnCurrent => ()
    case KbStore.AnnNone => throw new IllegalStateException(
      "no text index to refresh — call buildTextIndex()")
    case KbStore.AnnStale =>
      import spark.implicits._
      // changed ids via the segment route when provable (O(batch) IO,
      // no corpus anti-join); full keyed diff otherwise
      val (newDocs, goneIds) =
        changedSince("docs",
            metaCache.table_versions(KbStore.TextPostingsTable)) match {
          case Some((adds, dels)) =>
            (adds.select($"id".as("doc_id"), $"text"),
              dels.select($"id".as("doc_id")))
          case None =>
            val live = docs.toDF().select($"id".as("doc_id"), $"text")
            val oldLens = read(KbStore.TextDocLensTable)
            fullDiffWithReadds(live, oldLens.select($"doc_id"), "doc_id",
              "docs")
        }
      // tokenize the catch-up batch exactly as the original build did
      val (addPost, addLens) =
        graft.ops.TextRetrieval.buildIndex(newDocs, unicode = textIndexUnicode)
      // one tombstone set (the doc ids that left) covers both tables —
      // postings and lengths are keyed by doc_id; TOKENIZE work is
      // O(changed docs) and now the WRITE is too. New postings bucket
      // identically to the stored ones and the add segment persists
      // partitioned by bucket, so retrieval's partition pruning spans
      // base and deltas alike.
      try commitDelta(Map(
        KbStore.TextPostingsTable -> KbStore.TablePatch(
          del = Some(goneIds),
          add = Some(KbStore.withTermBucket(addPost))),
        KbStore.TextDocLensTable -> KbStore.TablePatch(
          del = Some(goneIds), add = Some(addLens))),
        identity, readSet = Set("docs"))
      finally addPost.unpersist(blocking = false) // buildIndex caches
  }

  /** BM25 retrieval through the persistent postings: scores only the
    * query terms' posting rows (document frequencies and corpus stats
    * re-derive from the stored tables — a term-pruned scan and one tiny
    * aggregate), then joins the doc rows back. Tokenization of the
    * query matches the index build's.
    */
  def bm25Retrieve(query: String, n: Int): Seq[(Double, Doc)] = {
    require(hasTextIndex, textIndexState match {
      case KbStore.AnnStale =>
        "text index is stale: call refreshTextIndex() to catch it up"
      case _ => "no text index: call buildTextIndex()"
    })
    if (n <= 0) return Seq.empty
    import spark.implicits._
    // tokenize the query with the tokenizer the index was BUILT with
    // (persisted in the manifest) — a mismatch silently misses postings
    val terms = graft.ops.TextRetrieval.tokenizeQuery(query, textIndexUnicode)
    if (terms.isEmpty) return Seq.empty
    // bucket pruning BEFORE the term filter: the scan touches only the
    // query terms' partitions (PartitionFilters in the plan), then the
    // exact term filter applies within them
    val qBuckets = terms.map(KbStore.termBucketOf).distinct
    val postings = read(KbStore.TextPostingsTable)
      .where($"bucket".isin(qBuckets: _*))
    val hits = graft.ops.TextRetrieval.bm25TopKIndexed(
        postings, read(KbStore.TextDocLensTable),
        terms, n)
      .as[(Long, Double)].collect()
    if (hits.isEmpty) return Seq.empty
    val byId = docs.filter($"id".isin(hits.map(_._1): _*))
      .collect().map(d => d.id -> d).toMap
    hits.toSeq.map { case (id, score) => (score, byId(id)) }
  }

  /** RM3 retrieval through the persistent postings — the
    * pseudo-relevance-feedback expansion rung above [[bm25Retrieve]]
    * (consumer #8 of the index lifecycle). Every postings scan stays
    * pruned: the feedback pass reads only the query terms' bucket
    * partitions, the relevance model reads only the broadcast feedback
    * docs' rows, and the weighted rescore reads only the EXPANDED term
    * set's buckets (the weight table is tiny — ≤ |query| + fbTerms
    * rows — so its buckets are known driver-side before the scan).
    */
  def rm3Retrieve(query: String, n: Int, fbDocs: Int = 10,
      fbTerms: Int = 10, alpha: Double = 0.5): Seq[(Double, Doc)] = {
    require(hasTextIndex, textIndexState match {
      case KbStore.AnnStale =>
        "text index is stale: call refreshTextIndex() to catch it up"
      case _ => "no text index: call buildTextIndex()"
    })
    if (n <= 0) return Seq.empty
    import spark.implicits._
    val terms = graft.ops.TextRetrieval.tokenizeQuery(query, textIndexUnicode)
    if (terms.isEmpty) return Seq.empty
    val docLens = read(KbStore.TextDocLensTable)
    val allPost = read(KbStore.TextPostingsTable)
    val qBuckets = terms.map(KbStore.termBucketOf).distinct
    val weights = graft.ops.TextRetrieval.rm3TermWeights(
        allPost, docLens, terms, fbDocs, fbTerms, alpha,
        fbPostings = Some(allPost.where($"bucket".isin(qBuckets: _*))))
      .as[(String, Double)].collect()
    if (weights.isEmpty) return Seq.empty
    val wBuckets = weights.map(t => KbStore.termBucketOf(t._1)).distinct
    val hits = graft.ops.TextRetrieval.bm25TopKWeighted(
        allPost.where($"bucket".isin(wBuckets.toSeq: _*)), docLens,
        weights.toSeq.toDF("term", "w"), n)
      .as[(Long, Double)].collect()
    if (hits.isEmpty) return Seq.empty
    val byId = docs.filter($"id".isin(hits.map(_._1): _*))
      .collect().map(d => d.id -> d).toMap
    hits.toSeq.map { case (id, score) => (score, byId(id)) }
  }

  // ------------------------------------------------------------------
  // persistent dedup-signature index: MinHash LSH band keys as a FIFTH
  // manifest-managed index family — cross-snapshot incremental dedup.
  // A 100 TB deployment deduplicates NEW INGEST against the archive;
  // re-mining archive×archive per batch is O(corpus) every time. With
  // the archive's band keys persisted (same stale/refresh/vacuum
  // lifecycle as the ANN/SQ/PQ/text families), banding a new batch is
  // O(batch + matched bands): one equi-join of the batch's bands
  // against the stored table.
  // ------------------------------------------------------------------
  /** Dedup-tier lifecycle: keyed on the DOCS table like the lexical
    * family (signatures derive from text, and text is immutable per
    * doc id here — surviving bands are never wrong, just possibly
    * incomplete).
    */
  def dedupIndexState: KbStore.AnnState = {
    val tv = metaCache.table_versions
    if (!tv.contains(KbStore.DedupBandsTable)) KbStore.AnnNone
    else if (tv(KbStore.DedupBandsTable) >= tv("docs")) KbStore.AnnCurrent
    else KbStore.AnnStale
  }

  def hasDedupIndex: Boolean = dedupIndexState == KbStore.AnnCurrent

  /** The persisted band table `(doc_id, band, key)` — band = -1 rows
    * are coverage sentinels for docs too short to shingle. */
  def dedupBands: DataFrame = read(KbStore.DedupBandsTable)

  /** The persisted MinHash parameters — refresh and query-time banding
    * MUST hash exactly the way the index was built. */
  private def dedupParams: (Int, Int, Int, Boolean) = {
    val p = metaCache.index_params
    (p.getOrElse("dedup_k", "3").toInt,
      p.getOrElse("dedup_num_hashes", "8").toInt,
      p.getOrElse("dedup_rows_per_band", "2").toInt,
      p.get("dedup_unicode").contains("true"))
  }

  /** (doc_id, band, key) rows for a doc batch, plus one sentinel row
    * (band = -1) for each doc too short to shingle — the sentinel is
    * what lets [[refreshDedupIndex]] tell "processed, no bands" from
    * "never seen" without a second bookkeeping table. Query paths
    * filter `band >= 0`.
    */
  private def dedupBandsFor(d: DataFrame, k: Int, numHashes: Int,
      rowsPerBand: Int, unicode: Boolean): DataFrame = {
    val bands = graft.ops.Dedup.bandKeys(
      graft.ops.Dedup.minhashSignatures(
        graft.ops.Dedup.shingles(d, k, unicode = unicode), numHashes),
      rowsPerBand)
      .select(col("doc_id"), col("band").cast("long").as("band"),
        col("key"))
    val sentinel = d.select(col("doc_id"))
      .join(bands.select(col("doc_id")).distinct(),
        Seq("doc_id"), "left_anti")
      .select(col("doc_id"), lit(-1L).as("band"), lit("").as("key"))
    bands.unionByName(sentinel)
  }

  /** Build the dedup signature index over every stored document and
    * persist the MinHash parameters in the manifest (like the text
    * tier's tokenizer choice), so refresh and [[dedupCandidates]]
    * always band the way the index was built.
    */
  def buildDedupIndex(k: Int = 3, numHashes: Int = 8,
      rowsPerBand: Int = 2, unicode: Boolean = false): Unit = {
    import spark.implicits._
    require(docs.limit(1).count() > 0,
      "cannot build a dedup index over an empty store")
    val bands = dedupBandsFor(
      docs.toDF().select($"id".as("doc_id"), $"text"),
      k, numHashes, rowsPerBand, unicode)
    commit(
      Map(KbStore.DedupBandsTable -> bands),
      m => m.copy(index_params = m.index_params ++ Map(
        "dedup_k" -> k.toString,
        "dedup_num_hashes" -> numHashes.toString,
        "dedup_rows_per_band" -> rowsPerBand.toString,
        "dedup_unicode" -> unicode.toString)),
      readSet = Set("docs"))
  }

  /** Incremental catch-up by doc id, mirroring [[refreshTextIndex]]:
    * bands of departed docs tombstone, new docs shingle+sign fresh and
    * append — SIGNATURE work and WRITE volume are both O(changed docs).
    */
  def refreshDedupIndex(): Unit = dedupIndexState match {
    case KbStore.AnnCurrent => ()
    case KbStore.AnnNone => throw new IllegalStateException(
      "no dedup index to refresh — call buildDedupIndex()")
    case KbStore.AnnStale =>
      import spark.implicits._
      val (k, nh, rpb, uni) = dedupParams
      // changed ids via the segment route when provable (O(batch) IO,
      // no corpus anti-join); full keyed diff otherwise
      val (newDocs, goneIds) =
        changedSince("docs",
            metaCache.table_versions(KbStore.DedupBandsTable)) match {
          case Some((adds, dels)) =>
            (adds.select($"id".as("doc_id"), $"text"),
              dels.select($"id".as("doc_id")))
          case None =>
            val live = docs.toDF().select($"id".as("doc_id"), $"text")
            val stored = read(KbStore.DedupBandsTable)
              .select($"doc_id").distinct()
            fullDiffWithReadds(live, stored, "doc_id", "docs")
        }
      commitDelta(Map(
        KbStore.DedupBandsTable -> KbStore.TablePatch(
          del = Some(goneIds),
          add = Some(dedupBandsFor(newDocs, k, nh, rpb, uni)))),
        identity, readSet = Set("docs"))
  }

  /** Screen a PRE-INGEST batch `(doc_id, text)` against the archive
    * (and against itself): returns the verified near-dup pairs
    * `(doc1, doc2, jaccard)` with at least one side in the batch —
    * [[graft.ops.Dedup.minhashNearDupsIncremental]] with the archive
    * side served by the persisted band index instead of a recompute.
    * Work: band the batch (O(batch)), one equi-join against the stored
    * bands, exact-Jaccard verify shingling ONLY the matched archive
    * docs. Batch ids must be disjoint from stored doc ids (they are
    * provisional — the caller hasn't added the docs yet; offset or
    * negate them if needed).
    *
    * Plan shape at scale: the batch's band keys are tiny (4 rows/doc),
    * so the (band, key) join BROADCASTS the batch side — the stored
    * bands table is scanned once and never crosses an exchange, and
    * the candidate subtree behind it is exchange-reused across its
    * three consumers. Per-screen cost is therefore one scan of the
    * bands table (~50 B/doc — ~0.5% of corpus bytes); deployments
    * screening very small batches at high frequency can cut that scan
    * too by partitioning the family by a key-hash bucket (the
    * text-postings trick) — pruning wins once batch keys ≪ buckets.
    */
  def dedupCandidates(batch: DataFrame,
      threshold: Double = 0.8): DataFrame =
    dedupCandidatesWithCleanup(batch, threshold)._1

  /** [[dedupCandidates]] plus a cleanup handle that unpersists the
    * internal candidate cache once the result is consumed — required
    * by unbounded per-batch callers (the streaming dedup screen), so
    * the session CacheManager doesn't accumulate one orphaned entry
    * per micro-batch. One-shot callers can use [[dedupCandidates]].
    */
  private[graft] def dedupCandidatesWithCleanup(batch: DataFrame,
      threshold: Double = 0.8): (DataFrame, () => Unit) = {
    require(hasDedupIndex, dedupIndexState match {
      case KbStore.AnnStale =>
        "dedup index is stale: call refreshDedupIndex() to catch it up"
      case _ => "no dedup index: call buildDedupIndex()"
    })
    import spark.implicits._
    val (k, nh, rpb, uni) = dedupParams
    val shB = graft.ops.Dedup.shingles(batch, k, unicode = uni)
    val bandsB = graft.ops.Dedup.bandKeys(
      graft.ops.Dedup.minhashSignatures(shB, nh), rpb)
    val bandsA = read(KbStore.DedupBandsTable).where($"band" >= 0L)
      .select($"doc_id", $"band", $"key")
    val archive = docs.toDF().select($"id".as("doc_id"), $"text")
    graft.ops.Dedup.incrementalFromBandsWithCleanup(archive, bandsA,
      shB, bandsB, k, threshold, uni)
  }

  /** Screen a pre-ingest doc batch against the archive (and itself,
    * keep-first) through the persisted dedup family: returns the
    * SURVIVORS — the batch rows whose verified Jaccard vs an archived
    * doc or an earlier row of the same batch stays below `threshold` —
    * with the batch's full schema intact (meta, parent_id ride
    * through), plus a cleanup handle that unpersists the screen's
    * internal caches once the survivors are consumed. A merely-stale
    * dedup index is refreshed in place first (idempotent, O(changed
    * docs)); a missing one fails loudly. Shared by the streaming
    * dedup-on-ingest path and [[bulkAddDocsScreened]].
    */
  private[graft] def screenBatch(batch: DataFrame,
      threshold: Double): (DataFrame, Long, () => Unit) = {
    val pid = "__graft_screen_id"
    require(!batch.columns.contains(pid),
      s"screenBatch appends a $pid column; the batch already has one " +
        "(re-screening an exported screen result? drop it first)")
    if (dedupIndexState == KbStore.AnnStale) refreshDedupIndex()
    // provisional ids disjoint from (and ABOVE) the store's dense id
    // space, order-stable so keep-first is well-defined — appended as
    // a COLUMN so the batch's other columns survive the screen
    val base = metaCache.max_doc_id + 1L
    val provisional = spark.createDataFrame(
      batch.rdd.zipWithIndex().map { case (r, i) =>
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (base + i))
      },
      batch.schema.add(pid,
        org.apache.spark.sql.types.LongType, nullable = false))
      .persist()
    // every path below — including a count() that dies mid-job on the
    // streaming hot loop — must unpersist what it persisted, or each
    // failed micro-batch attempt leaks one CacheManager entry forever
    // (the very leak the WithCleanup plumbing exists to prevent)
    try {
      val total = provisional.count() // also the SCREENED row count
      val (pairs, cleanupPairs) = dedupCandidatesWithCleanup(
        provisional.select(col(pid).as("doc_id"), col("text")), threshold)
      try {
        // pairs are doc1 < doc2 and every pair touches the batch, whose
        // ids all sit ABOVE the archive's — so doc2 is always the batch
        // doc (vs an archived partner) or the LATER batch arrival
        // (batch-internal dup): dropping the doc2 side keeps the
        // archive and the first arrival
        val dropIds = pairs.select(col("doc2").as(pid)).distinct()
        val kept = provisional
          .join(dropIds, Seq(pid), "left_anti")
          .drop(pid).persist()
        try kept.count() // materialize before the sources unpersist
        catch { case t: Throwable =>
          kept.unpersist(blocking = false); throw t }
        (kept, total, () => { kept.unpersist(blocking = false); () })
      } finally cleanupPairs()
    } finally provisional.unpersist(blocking = false)
  }

  /** Screened bulk load — the BATCH twin of the streaming
    * dedup-on-ingest mode (backfilling a new dump against the
    * archive): near-dups of archived docs (and batch-internal dups,
    * keep-first) are dropped BEFORE the embedding provider is called,
    * the survivors commit through [[bulkAddDocsDistributed]], and the
    * dedup family is refreshed so the NEXT batch screens against this
    * one's survivors. Returns (added, dropped).
    */
  def bulkAddDocsScreened(newDocs: DataFrame,
      provider: EmbeddingProvider,
      threshold: Double = 0.8): (Long, Long) = {
    // the screened total comes from screenBatch's OWN materialization —
    // a separate newDocs.count() here would evaluate the (un-persisted)
    // input lineage a second full time, and on a nondeterministic
    // source the two passes could disagree and corrupt the arithmetic
    val (kept, total, cleanup) = screenBatch(newDocs, threshold)
    try {
      val survivors = kept.count() // cached by screenBatch — O(metadata)
      if (survivors > 0) {
        bulkAddDocsDistributed(kept, provider)
        refreshDedupIndex()
      }
      (survivors, total - survivors)
    } finally cleanup()
  }

  /** Embedding-space screen core (r12 verdict item 2 — the SemDeDup
    * complement of [[dedupCandidates]], and the ANN family's sixth
    * consumer): for a pre-embedded batch `(vec_id, embedding
    * ARRAY<FLOAT>)` whose ids sit ABOVE the archive's, return one row
    * per batch doc that should be DROPPED — near-dup of an ARCHIVE
    * vector (cosine ≥ `cosThreshold`) or of an EARLIER batch doc
    * (keep-first) — as `(vec_id, best_match, n_matches, max_cos)`.
    *
    * The archive side is pruned through the persisted IVF family
    * BEFORE any kernel work: the batch's vectors probe their `nProbe`
    * nearest stored centroids, the assignment table is scanned once
    * against the broadcast probed-cid set, and the resulting id set
    * (8 B/id) broadcasts into a semi join against `embeddings` — so
    * the exact-cosine verify touches only the probed fraction of the
    * corpus (O(batch × nProbe/nlist × corpus) kernel work, the
    * SemDeDup cluster-bounding applied at the ingest boundary), and
    * neither archive table crosses an exchange. `nProbe >= nlist`
    * degenerates to the EXACT screen — identical to
    * [[graft.ops.Dedup.semanticScreen]] over the full archive (the
    * oracle/spec anchor, the k3 pattern); partial probes trade recall
    * exactly as IVF retrieval does. A merely-stale ANN family is
    * refreshed in place first (O(changed docs)); a missing one fails
    * loudly — silent screen misses are worse than an error.
    */
  private[graft] def semanticDropHits(batchVec: DataFrame,
      cosThreshold: Double, nProbe: Int = 8): DataFrame = {
    if (annIndexState == KbStore.AnnStale) refreshAnnIndex()
    require(hasAnnIndex,
      "no ANN index: call buildAnnIndex() before semantic screening")
    import graft.functions.FloatVecPack.floatVecPack
    val centRows = read(KbStore.IvfCentroidsTable).collect()
    val nlist = centRows.length
    val arch = embeddings.toDF()
      .select($"id".as("vec_id"), $"vec".as("embedding"))
    val archive =
      if (nProbe >= nlist) arch // full probe = exact (oracle anchor)
      else {
        val cents = centRows.map(r => (r.getLong(0),
          r.getSeq[Double](1).map(_.toFloat).toArray)).sortBy(_._1)
        val packedQ = batchVec.select(col("vec_id").as("id"),
          floatVecPack(col("embedding")).as("vec"))
        val probed = graft.ops.SimilaritySearch
          .probeRanks(packedQ, cents, nProbe)
          .select(col("cid")).distinct()
        val prunedIds = read(KbStore.IvfAssignTable)
          .join(broadcast(probed), Seq("cid")).select($"vec_id")
        arch.join(broadcast(prunedIds), Seq("vec_id"), "left_semi")
      }
    val vsArchive = graft.ops.Dedup.semanticHits(
      archive, batchVec, cosThreshold)
    val internal = graft.ops.Dedup.semanticHits(
        batchVec, batchVec, cosThreshold)
      .where(col("tid") < col("qid"))
    graft.ops.Dedup.aggContaminationHits(vsArchive.unionByName(internal))
  }

  /** Embedding-space twin of [[screenBatch]]: screen a pre-ingest doc
    * batch against the archive (and itself, keep-first) for
    * SEMANTIC near-dups through the persisted ANN family. The batch
    * is embedded ONCE (provider batches of 200) before screening, and
    * the survivors are returned WITH their `vec` column so the commit
    * leg ([[bulkAddDocsDistributed]]'s pre-embedded path) never calls
    * the provider again — a doc dropped here still paid its provider
    * call (embedding-space screening can't precede embedding), but it
    * never bloats the corpus or needs a retroactive delete. Returns
    * (survivors incl. vec, screened-count, cleanup). Shared by the
    * streaming semantic dedup-on-ingest mode and
    * [[bulkAddDocsScreenedSemantic]].
    *
    * Caveat (r13 review): the once-per-doc provider bill holds as long
    * as the survivors' cached blocks survive until the commit — a lost
    * executor (impossible in local mode, possible on a cluster)
    * recomputes lost partitions from lineage, which re-runs the embed
    * stage for them. A replayed embed re-bills but cannot corrupt:
    * the streaming source pins each micro-batch's rows, the screen is
    * deterministic in them, and the magnitude check still guards the
    * commit. Cluster deployments that must hard-bound the provider
    * bill should checkpoint the survivors before committing.
    */
  private[graft] def screenBatchSemantic(batch: DataFrame,
      cosThreshold: Double, provider: EmbeddingProvider,
      nProbe: Int = 8): (DataFrame, Long, () => Unit) = {
    val pid = "__graft_screen_id"
    require(!batch.columns.contains(pid),
      s"screenBatchSemantic appends a $pid column; the batch already " +
        "has one (re-screening an exported screen result? drop it first)")
    require(!batch.columns.contains("vec"),
      "screenBatchSemantic embeds the batch itself; drop the existing " +
        "vec column (or commit via bulkAddDocsDistributed directly)")
    if (annIndexState == KbStore.AnnStale) refreshAnnIndex()
    require(hasAnnIndex,
      "no ANN index: call buildAnnIndex() before semantic screening")
    val base = metaCache.max_doc_id + 1L
    val provisional = spark.createDataFrame(
      batch.rdd.zipWithIndex().map { case (r, i) =>
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (base + i))
      },
      batch.schema.add(pid,
        org.apache.spark.sql.types.LongType, nullable = false))
      .persist()
    try {
      val total = provisional.count() // also the SCREENED row count
      val prov = provider
      val embedded = provisional.select(col(pid), col("text"))
        .as[(Long, String)]
        .mapPartitions { it =>
          it.grouped(EmbeddingProvider.BatchSize).flatMap { chunk =>
            val vecs = Embeddings.checkMagnitude(prov.embed(chunk.map(_._2)))
            chunk.map(_._1).zip(vecs)
          }
        }.toDF(pid, "vec").persist()
      try {
        embedded.count()
        val batchVec = embedded.select(col(pid).as("vec_id"),
          col("vec").as("embedding"))
        val dropIds = semanticDropHits(batchVec, cosThreshold, nProbe)
          .select(col("vec_id").as(pid)).distinct()
        val kept = provisional
          .join(embedded, Seq(pid))
          .join(dropIds, Seq(pid), "left_anti")
          .drop(pid).persist()
        try kept.count() // materialize before the sources unpersist
        catch { case t: Throwable =>
          kept.unpersist(blocking = false); throw t }
        (kept, total, () => { kept.unpersist(blocking = false); () })
      } finally embedded.unpersist(blocking = false)
    } finally provisional.unpersist(blocking = false)
  }

  /** Semantically screened bulk load — the batch twin of the streaming
    * semantic dedup-on-ingest mode: paraphrase-level near-dups of
    * archived docs (and batch-internal, keep-first) are dropped before
    * commit, with an optional LEXICAL pre-screen (`lexicalThreshold`)
    * so MinHash-visible dups never even pay the provider call — the
    * standard two-stage curation order (cheap lexical first, semantic
    * on the survivors; Abbas et al. 2023). Survivors commit with
    * their screen-time embeddings (no second provider pass) and both
    * screen families are refreshed so the NEXT batch screens against
    * this one's survivors. Returns (added, dropped).
    */
  def bulkAddDocsScreenedSemantic(newDocs: DataFrame,
      provider: EmbeddingProvider, cosThreshold: Double = 0.9,
      nProbe: Int = 8,
      lexicalThreshold: Option[Double] = None): (Long, Long) = {
    val (lexKept, lexTotal, lexCleanup) = lexicalThreshold match {
      case Some(t) => screenBatch(newDocs, t)
      case None => (newDocs, -1L, () => ())
    }
    try {
      val (kept, semTotal, cleanup) =
        screenBatchSemantic(lexKept, cosThreshold, provider, nProbe)
      try {
        val survivors = kept.count() // cached by the screen — O(metadata)
        if (survivors > 0) {
          bulkAddDocsDistributed(kept, provider)
          if (lexicalThreshold.isDefined &&
              dedupIndexState == KbStore.AnnStale)
            refreshDedupIndex()
          refreshAnnIndex()
        }
        val total = if (lexTotal >= 0) lexTotal else semTotal
        (survivors, total - survivors)
      } finally cleanup()
    } finally lexCleanup()
  }

  /** G2 dfs_traversal (`kb.py:1580-1593`): pre-order via materialized
    * id-paths (lexicographic path order == DFS pre-order).
    */
  def dfsTraversal(): Seq[Doc] = {
    val paths = graft.ops.Hierarchy.withPaths(
      docs.toDF(), "id", "parent_id", col("parent_id").isNull)
    // preorder assigned by distributed range-sort (no global Window, no
    // second full-table collect); the single collect here is the API
    // contract — the reference returns a materialized list (kb.py:1580)
    val ranked = graft.ops.Hierarchy.withPreorder(paths)
      .select(col("id").as("rid"), col("preorder"))
    docs.toDF().join(ranked, col("id") === col("rid"))
      .orderBy(col("preorder"))
      .drop("rid", "preorder")
      .as[Doc].collect().toSeq
  }

  /** Corpus re-embed / provider migration (SURVEY §7.5; the reference's
    * `Re-embed Dad Jokes with Ollama.ipynb` workflow): recompute every
    * stored document's embedding under a new provider in partition
    * batches, swap the embeddings table atomically, persist the new
    * provider params.
    */
  def reembedAll(provider: EmbeddingProvider): Unit = {
    val prov = provider
    val newEmb = docs.filter($"emb_id".isNotNull)
      .select($"emb_id", $"text").as[(Long, String)]
      .mapPartitions { it =>
        it.grouped(EmbeddingProvider.BatchSize).flatMap { chunk =>
          val vecs = Embeddings.checkMagnitude(prov.embed(chunk.map(_._2)))
          chunk.map(_._1).zip(vecs).map { case (id, v) => Emb(id, v) }
        }
      }
    commit(
      Map("embeddings" -> newEmb.toDF()),
      m => m.copy(embedding_params = provider.params))
  }

  // ------------------------------------------------------------------
  // maintenance (S7/S8)
  // ------------------------------------------------------------------
  /** S6 gzip sink analog (`kb.py:1456-1464`): rewrite the current
    * version with the given parquet codec (compaction + recompression —
    * Parquet compresses natively so "gzip the file" becomes a codec
    * rewrite). `numFiles = 1` mirrors the reference's single-file
    * output; raise it when a table is large enough that one writer (and
    * one downstream scan task) would serialize everything.
    */
  def compact(codec: String = "gzip", numFiles: Int = 1): Unit =
    compactWithLayout(codec, numFiles, Map.empty)

  /** MAJOR compaction with physical layout (the lakehouse OPTIMIZE
    * ZORDER, store-integrated): like [[compact]], but the named table
    * is rewritten clustered by the Z-value of `zCols` — unbounded
    * values scaled by [[graft.ops.Layout.withZColumn]]'s uniform
    * bucketing, range-partitioned into `numFiles` internally-sorted
    * files — so parquet min/max stats (and a
    * [[graft.ops.Layout.parquetFileStats]] manifest, if the deployment
    * keeps one) prune scans on ANY of the interleaved columns. Goes
    * through the SAME commit path as every mutation: manifest CAS,
    * atomic publish, chain folding, stale-family hold-back, postings
    * partition layout — a layout rewrite is just a commit whose data
    * is unchanged (spec asserts read-back parity and per-file z-range
    * disjointness).
    */
  def compactZordered(table: String, zCols: Seq[String], bits: Int = 8,
      numFiles: Int = 8, codec: String = "snappy"): Unit = {
    require(metaCache.table_versions.contains(table) ||
      KbStore.TableNames.contains(table), s"unknown table $table")
    compactWithLayout(codec, numFiles = 1, Map(table -> { df =>
      graft.ops.Layout.withZColumn(df, bits, zCols)
        .repartitionByRange(numFiles, col("__z"))
        .sortWithinPartitions(col("__z"))
        .drop("__z")
    }))
  }

  private def compactWithLayout(codec: String, numFiles: Int,
      layout: Map[String, DataFrame => DataFrame]): Unit = {
    // a STALE index family must not ride along: rewriting it at the new
    // version would equalize its version with embeddings' and silently
    // promote it to Current while it still misses the docs added since
    // its build. Excluded PER FAMILY (an ANN index can be stale while
    // the compressed tier is current, and vice versa): stale families
    // keep their old pointers (still stale after the bump) and their
    // refresh then compacts them naturally.
    val staleIdx: Set[String] =
      (if (annIndexState == KbStore.AnnStale) KbStore.AnnIndexTables
       else Seq.empty[String]).toSet ++
        (if (sqIndexState == KbStore.AnnStale) Set(KbStore.SqCodesTable)
         else Set.empty[String]) ++
        (if (pqIndexState == KbStore.AnnStale) KbStore.IvfPqTables.toSet
         else Set.empty[String]) ++
        (if (textIndexState == KbStore.AnnStale) KbStore.TextIndexTables.toSet
         else Set.empty[String]) ++
        (if (dedupIndexState == KbStore.AnnStale)
           KbStore.DedupIndexTables.toSet
         else Set.empty[String])
    val names = metaCache.table_versions.keys.filterNot(staleIdx.contains)
    // captured BEFORE the commit moves the head: the marker bump below
    // is only sound for a mirror that was current going in
    val preCodesVersion =
      metaCache.table_versions.get(KbStore.IvfPqCodesTable)
    // preserveIndex: this rewrite includes `embeddings` but replaces no
    // vectors, so commit's invalidation clause must not strip the stale
    // index's pointers (that would flip AnnStale -> AnnNone and let the
    // next vacuum delete the index dirs instead of refreshing them).
    // The postings table keeps its term-bucket partition layout through
    // the rewrite — without it a routine compact would silently demote
    // bm25Retrieve's partition pruning to a full scan.
    commit(
      names.map { name =>
        name -> layout.getOrElse(name,
          (df: DataFrame) => df.coalesce(math.max(1, numFiles)))
          .apply(read(name))
      }.toMap,
      identity, codec, preserveIndex = true,
      partitionBy = Map(KbStore.TextPostingsTable -> Seq("bucket")))
    // a compacted (current) pq family moved the codes VERSION but not
    // its rows (a compact is a same-content rewrite), so a mirror that
    // reflected the PRE-compact version is still byte-correct — just
    // bump its marker to the new version instead of rewriting O(codes);
    // without this a routine compact would silently demote pqKnnJoin to
    // the plain-kernel path. A marker naming any OTHER version was
    // stale before the compact (e.g. a buildPqIndex() rebuild with
    // bucketCodes = false) — promoting it here would make pqKnnJoin
    // serve the old mirror's codes as current, so drop the marker and
    // let callers fall back (or rebuild) instead.
    if (pqIndexState == KbStore.AnnCurrent)
      readBucketMarker().foreach { case (tbl, b, parts, v) =>
        metaCache.table_versions.get(KbStore.IvfPqCodesTable).foreach { nv =>
          if (preCodesVersion.contains(v)) {
            if (nv != v) writeBucketMarker(tbl, b, parts, nv)
          } else {
            // stale marker: drop the marker + catalog entry so pqKnnJoin
            // can never resolve the dead mirror, but LEAVE the external
            // _pq_codes_data files for vacuum to reclaim — compact is a
            // routine operation a reader may overlap, and a reader that
            // resolved the (then-stale) mirror before this compact may
            // still be mid-scan over those parquet files. Vacuum (an
            // explicitly reader-free operation) sweeps the now-orphaned
            // data dir: its mirror reclaim covers the marker-less case.
            // Best-effort throughout: the compact commit already
            // succeeded, and a cleanup IOException must not undo that.
            try spark.sql(s"DROP TABLE IF EXISTS $tbl")
            catch { case _: Exception => () }
            try Files.deleteIfExists(bucketMarkerPath)
            catch { case _: java.io.IOException => () }
          }
        }
      }
  }

  /** Drop old table versions (VACUUM, `kb.py:831-834`). Retention is
    * manifest-history based (round 6): the last `retain` superseded
    * manifests (`_meta.v<N>.json`) stay readable — every segment dir
    * any of them references survives — so a reader that resolved a
    * prior manifest can still finish its scan even when that state was
    * a merge-on-read chain spanning many version dirs. `retain = 0`
    * reclaims everything but the currently committed state (safe in
    * the reference, whose readers share the one SQLite connection;
    * here it requires no concurrent readers). Staged directories from
    * versions NEWER than the manifest (a crashed, never-published
    * commit) are always reclaimed, and history files beyond `retain`
    * are pruned.
    */
  def vacuum(retain: Int = 1): Unit = {
    val curMeta = metaCache
    val backups = KbStore.listMetaBackups(path) // version-desc
    val keptBackups = backups.filter(_._1 < curMeta.version)
      .take(math.max(0, retain))
    val metas = curMeta +: keptBackups.flatMap { case (_, p) =>
      try Some(KbStore.parseMeta(Files.readString(p)))
      catch { case _: Exception => None } // unreadable history: skip
    }
    def liveFor(name: String): Set[Long] = metas.flatMap { m =>
      m.table_versions.get(name).toSeq ++ m.table_bases.get(name).toSeq ++
        m.table_deltas.getOrElse(name, Nil)
    }.toSet
    // orphaned table directories (e.g. an ANN index invalidated by an
    // embeddings commit) have no manifest pointer at all — reclaim them.
    // Only dirs this store demonstrably owns are touched: known index
    // table names, or dirs laid out exclusively as v<N> version subdirs.
    // Anything else under the root (a streaming checkpoint, a user's
    // backup/scratch dir) is not ours to delete.
    // "known" spans retained history too: a family dropped since a
    // retained manifest (an invalidated ANN index) is still that
    // reader's data, not an orphan
    val known = metas.flatMap(_.table_versions.keySet).toSet
    // an unreadable root skips the orphan sweep (nothing to reclaim that
    // we can see) rather than aborting vacuum before the per-table sweep
    val rootListing =
      try Files.list(Paths.get(path))
      catch { case _: java.io.IOException |
                   _: java.io.UncheckedIOException =>
        java.util.stream.Stream.empty[Path]() }
    try {
      rootListing.forEach { p =>
        val name = p.getFileName.toString
        // filesystem races (a dir vanishing between list and probe, an
        // unreadable dir) skip that entry, never abort the whole sweep
        val ours = Files.isDirectory(p) && !known.contains(name) &&
          (KbStore.IndexTables.contains(name) ||
            (try KbStore.isVersionedTableDir(p)
             catch { case _: java.io.IOException |
                          _: java.io.UncheckedIOException => false }))
        if (ours)
          try KbStore.deleteRecursively(p)
          catch { case _: java.io.IOException |
                       _: java.io.UncheckedIOException => () }
      }
    } finally rootListing.close()
    known.foreach { name =>
      // a table state is alive at EVERY version dir its chain references
      // (base + deltas + head), across the current manifest and each
      // retained prior manifest
      val live = liveFor(name)
      val dir = Paths.get(s"$path/$name")
      if (Files.isDirectory(dir)) {
        // digits-only parse ("v+3" is NOT store layout — leave foreign
        // dirs alone even inside a table dir); an IO race during the
        // listing skips this table's sweep, never aborts vacuum
        val versions = try {
          val listed = Files.list(dir)
          try {
            val b = Seq.newBuilder[(Long, Path)]
            listed.forEach { p =>
              val n = p.getFileName.toString
              if (n.startsWith("v") && n.length > 1 &&
                  n.drop(1).forall(_.isDigit))
                n.drop(1).toLongOption.foreach(v => b += (v -> p))
            }
            b.result()
          } finally listed.close()
        } catch {
          case _: java.io.IOException | _: java.io.UncheckedIOException =>
            Seq.empty[(Long, Path)]
        }
        // upgrade window: a store whose superseded manifests predate
        // the history-file mechanism has fewer backups than `retain`
        // asks for — fall back to the old per-table heuristic (keep
        // the newest non-live version dirs below the current head) for
        // the shortfall, so retain>=1 never silently degrades to 0
        val shortfall = math.max(0, retain) - keptBackups.size
        val keepHeuristic =
          if (shortfall <= 0) Set.empty[Long]
          else metaCache.table_versions.get(name) match {
            case None => Set.empty[Long]
            case Some(head) => versions.map(_._1)
              .filter(v => v < head && !live(v))
              .sorted.takeRight(shortfall).toSet
          }
        versions.foreach { case (v, p) =>
          if (!live(v) && !keepHeuristic(v))
            try KbStore.deleteRecursively(p)
            catch { case _: java.io.IOException |
                         _: java.io.UncheckedIOException => () }
        }
      }
    }
    // prune history files beyond the retention window (and any backup
    // at/after the current version — stale leftovers of a rolled-back
    // writer can't happen, but being precise here costs one contains())
    backups.filterNot(keptBackups.contains).foreach { case (_, p) =>
      try Files.deleteIfExists(p)
      catch { case _: java.io.IOException => () }
    }
    // the bucketed codes MIRROR is derived state: once the pq family it
    // reflects is gone (invalidated + reclaimed above) or has moved past
    // the marker's version, the catalog table is dead weight — drop it
    // with the marker (a current mirror is left alone). Best-effort,
    // like the rest of the sweep.
    readBucketMarker() match {
      case Some((tbl, _, _, v)) =>
        val liveCodes = metaCache.table_versions
          .get(KbStore.IvfPqCodesTable).contains(v)
        if (!liveCodes) {
          try spark.sql(s"DROP TABLE IF EXISTS $tbl")
          catch { case _: Exception => () }
          // the table is EXTERNAL (files under the store dir survive the
          // DROP) — reclaim the data files too
          try KbStore.deleteRecursively(Paths.get(bucketedCodesDataPath))
          catch { case _: java.io.IOException |
                       _: java.io.UncheckedIOException => () }
          try Files.deleteIfExists(bucketMarkerPath)
          catch { case _: java.io.IOException => () }
        }
      case None =>
        // marker-less data dir: a compact dropped a stale mirror's
        // marker + catalog entry but (deliberately — in-flight readers)
        // left the external files. Vacuum runs reader-free, so the
        // orphaned bytes reclaim here.
        try KbStore.deleteRecursively(Paths.get(bucketedCodesDataPath))
        catch { case _: java.io.IOException |
                     _: java.io.UncheckedIOException => () }
    }
  }

  // ------------------------------------------------------------------
  // time travel & change feed (round 6 — the lakehouse read contract
  // the merge-on-read manifests make cheap: a 100 TB downstream
  // consumer re-reads O(changed) bytes per sync, not the corpus)
  // ------------------------------------------------------------------

  /** Manifest snapshot at `version`: the live manifest, or a retained
    * `_meta.v<version>.json` history file. Availability equals vacuum
    * retention — a pruned version throws rather than silently serving
    * the wrong snapshot.
    */
  def metaAt(version: Long): KbMeta = {
    val cur = metaCache
    if (version == cur.version) cur
    else KbStore.listMetaBackups(path).find(_._1 == version) match {
      case Some((_, p)) => KbStore.parseMeta(Files.readString(p))
      case None => throw new IllegalStateException(
        s"store $path has no manifest v$version (current ${cur.version}; " +
          "history files are pruned by vacuum retention — raise `retain` " +
          "to keep more versions readable)")
    }
  }

  /** Versions readable right now (current + retained history), desc. */
  def snapshotVersions: Seq[Long] =
    (metaCache.version +: KbStore.listMetaBackups(path).map(_._1))
      .distinct.sortBy(v => -v)

  /** Time-travel read: the table exactly as manifest `version` saw it
    * (its base + its segment chain) — immutable segment dirs make this
    * a plain chain fold, no copy-on-write bookkeeping.
    */
  def readTableAt(name: String, version: Long): DataFrame = {
    val m = metaAt(version)
    require(m.table_versions.contains(name),
      s"table $name does not exist at version $version")
    readWithMeta(m, name)
  }

  /** Ordered per-table change feed over manifest steps in
    * `(fromVersion, toVersion]` — the incremental-consumption contract:
    * a downstream job that processed version N syncs to head by
    * applying each step's `removedKeys` (anti-join) then `added`
    * (union), without rescanning the table
    * ([[StoreScaleSpec]] pins the replay identity).
    *
    * Cost per step: a commit that EXTENDED the segment chain emits its
    * staged segments verbatim — O(batch) IO, the overwhelmingly common
    * mutation shape. A step that rewrote the base (explicit
    * [[compact]], a chain-limit minor compaction, a full-rewrite path
    * like [[reembedAll]], an index-family build) falls back to a keyed
    * snapshot diff of the two manifest views — exact (a pure layout
    * rewrite diffs to zero changes) but O(table) compute; consumers
    * that need guaranteed O(changed) syncs should drain the feed
    * before compacting. Updates surface as remove+add of the same key,
    * in that order.
    */
  def tableChangelog(name: String, fromVersion: Long,
      toVersion: Long = -1L): Seq[KbStore.TableChanges] = {
    val to = if (toVersion < 0L) metaCache.version else toVersion
    require(fromVersion <= to,
      s"fromVersion $fromVersion is past toVersion $to")
    val keys = KbStore.DeltaKeys(name)
    val metas = (fromVersion to to).map(metaAt)
    def basePtr(m: KbMeta): Option[Long] = m.table_versions.get(name)
      .map(head => m.table_bases.getOrElse(name, head))
    metas.sliding(2).flatMap {
      case Seq(prev, next) =>
        val prevChain = prev.table_deltas.getOrElse(name, Nil)
        val nextChain = next.table_deltas.getOrElse(name, Nil)
        val untouched =
          prev.table_versions.get(name) == next.table_versions.get(name) &&
            prevChain == nextChain
        if (untouched) None
        else if (basePtr(prev).isDefined && basePtr(prev) == basePtr(next) &&
            nextChain.startsWith(prevChain)) {
          // chain extension: the appended segments ARE the change
          val appended = nextChain.drop(prevChain.size)
          val schema = readWithMeta(next, name).limit(0)
          val adds = appended.flatMap { v =>
            val d = s"${tableDir(name, v)}/add"
            if (KbStore.hasParquetFiles(d))
              Some(spark.read.parquet(d)
                .select(schema.columns.map(col(_)): _*))
            else None
          }.reduceOption(_ union _).getOrElse(schema)
          val dels = appended.flatMap { v =>
            val d = s"${tableDir(name, v)}/del"
            if (KbStore.hasParquetFiles(d))
              Some(spark.read.parquet(d).select(keys.map(col(_)): _*))
            else None
          }.reduceOption(_ union _)
            .getOrElse(schema.select(keys.map(col(_)): _*))
          Some(KbStore.TableChanges(next.version, adds, dels))
        } else {
          // base moved (compact / minor merge / full rewrite / family
          // build or drop): exact keyed snapshot diff
          val a = if (basePtr(prev).isDefined) readWithMeta(prev, name)
            else readWithMeta(next, name).limit(0)
          val b = if (basePtr(next).isDefined) readWithMeta(next, name)
            else a.limit(0)
          Some(KbStore.TableChanges(next.version,
            b.except(a), a.except(b).select(keys.map(col(_)): _*)))
        }
      case _ => None // single manifest: empty range
    }.toSeq
  }

  def close(vacuumFirst: Boolean = false): Unit = {
    // closing ends this writer's session — full reclamation is safe
    if (vacuumFirst) vacuum(retain = 0)
    invalidate()
  }
}

object KbStore {
  val TableNames: Seq[String] = Seq("docs", "embeddings", "edges", "keyval")
  val SchemaVersion = 1

  /** Optional batch-built ANN index tables (manifest-managed like the
    * base tables, but droppable: a vector-replacing commit invalidates
    * them; add/delete-only commits just leave them stale).
    */
  val IvfCentroidsTable = "ivf_centroids"
  val IvfAssignTable = "ivf_assign"
  /** int8 compressed-tier codes (round 5) — same droppable lifecycle. */
  val SqCodesTable = "sq_codes"
  /** IVF-PQ family (round 6): coarse centroids + residual PQ codebooks
    * + per-vector codes — the 64×-compressed tier, same droppable
    * lifecycle as the other vector-derived families.
    */
  val IvfPqCentroidsTable = "ivfpq_centroids"
  val IvfPqBooksTable = "ivfpq_books"
  val IvfPqCodesTable = "ivfpq_codes"
  val IvfPqTables: Seq[String] =
    Seq(IvfPqCentroidsTable, IvfPqBooksTable, IvfPqCodesTable)
  /** Lexical (BM25) tier: postings + doc lengths, keyed on `docs`. */
  val TextPostingsTable = "text_postings"
  val TextDocLensTable = "text_doclens"
  /** Dedup-signature tier (round 12): MinHash LSH band keys per doc,
    * keyed on `docs` like the lexical family — cross-snapshot
    * incremental dedup bands new ingest against this table instead of
    * re-mining the archive. */
  val DedupBandsTable = "dedup_bands"
  /** Postings partition fan-out; a query's terms prune to ≤|terms|
    * of these partitions.
    */
  val TextBuckets = 64

  /** Driver-side twin of [[withTermBucket]]'s column expression (CRC32
    * over UTF-8 bytes — the same zlib polynomial in `java.util.zip` and
    * Spark's `crc32`), so retrieval can compute a term's partition
    * without touching the cluster.
    */
  def termBucketOf(term: String): Int = {
    val c = new java.util.zip.CRC32()
    val b = term.getBytes("UTF-8")
    c.update(b, 0, b.length)
    (c.getValue % TextBuckets).toInt
  }

  /** Add the term-hash partition column to a postings DataFrame. */
  def withTermBucket(postings: DataFrame): DataFrame =
    postings.withColumn("bucket",
      (crc32(col("term").cast("binary")) % TextBuckets).cast("int"))

  /** The ANN index family (invalidated/refreshed together). */
  val AnnIndexTables: Seq[String] = Seq(IvfCentroidsTable, IvfAssignTable)
  /** Vector-derived families — dropped when a vector is REPLACED. */
  val VectorIndexTables: Seq[String] =
    (AnnIndexTables :+ SqCodesTable) ++ IvfPqTables
  /** The text family survives vector replacement (it indexes text). */
  val TextIndexTables: Seq[String] = Seq(TextPostingsTable, TextDocLensTable)
  /** The dedup-signature family — text-derived like the lexical tier,
    * so it likewise survives vector replacement. */
  val DedupIndexTables: Seq[String] = Seq(DedupBandsTable)
  /** Every index-family table (vacuum ownership, compact bookkeeping). */
  val IndexTables: Seq[String] =
    VectorIndexTables ++ TextIndexTables ++ DedupIndexTables

  sealed trait AnnState
  case object AnnNone extends AnnState
  case object AnnStale extends AnnState
  case object AnnCurrent extends AnnState

  // ---------------- merge-on-read segment chains (round 6) ----------
  /** One mutation's effect on one table: tombstone keys to remove and
    * rows to append, applied in that order.
    */
  final case class TablePatch(del: Option[DataFrame] = None,
      add: Option[DataFrame] = None)

  /** One step of [[KbStore.tableChangelog]]: the manifest version that
    * published the change, the rows it added (full table schema), and
    * the keys it removed ([[DeltaKeys]] columns). Apply removed-then-
    * added to roll a snapshot forward one step.
    */
  final case class TableChanges(version: Long, added: DataFrame,
      removedKeys: DataFrame)

  /** Incrementally-maintained dataset-card table (opt-in via
    * [[KbStore.buildStats]]): 5 metric rows, replaced through the same
    * delta-commit path as any table. */
  val StatsTable = "stats"

  /** The user-data tables whose mutations must move the stats card. */
  val DataTables: Set[String] = Set("docs", "embeddings", "edges", "keyval")

  /** One mutation's effect on the dataset card — signed row/char
    * deltas, supplied BY the mutation path (which already knows them
    * from its own guards) so the generic commit never has to re-run a
    * patch's pipeline (an embeddings add may embed through a remote
    * provider; counting it generically would embed twice).
    */
  final case class StatsDelta(docs: Long = 0L, embeddings: Long = 0L,
      edges: Long = 0L, keys: Long = 0L, chars: Long = 0L)

  /** Tombstone key columns per table — what a `del` segment stores and
    * what the read-side anti-join probes. Doc/edge ids are high-water
    * assigned and keyval keys resolve by fold order, so key semantics
    * are exact under the ordered merge.
    */
  val DeltaKeys: Map[String, Seq[String]] = Map(
    "docs" -> Seq("id"), "embeddings" -> Seq("id"),
    "edges" -> Seq("id"), "keyval" -> Seq("key"),
    StatsTable -> Seq("metric"),
    IvfAssignTable -> Seq("vec_id"), SqCodesTable -> Seq("vec_id"),
    IvfPqCodesTable -> Seq("vec_id"),
    TextPostingsTable -> Seq("doc_id"), TextDocLensTable -> Seq("doc_id"),
    DedupBandsTable -> Seq("doc_id"))

  /** Physical layout add-segments (and chain-overflow rewrites) must
    * preserve — the postings' term-bucket partitioning is what makes
    * bm25Retrieve's scan prune.
    */
  val DeltaPartitioning: Map[String, Seq[String]] = Map(
    TextPostingsTable -> Seq("bucket"))

  /** Read fan-in bound: at this many stacked deltas the next delta
    * commit materializes the table instead (amortized write volume
    * O(batch + table/limit)).
    */
  val DeltaChainLimit: Int = 32

  /** Whether a staged segment side exists with at least one parquet
    * file — an empty partitioned write leaves only _SUCCESS, and a
    * mutation may have no del (pure add) or no add (pure delete).
    *
    * Memoized: read() probes both sides of every chain segment each
    * time a table DataFrame is built, and segment dirs are immutable
    * once published (they change only by deletion — [[deleteRecursively]]
    * evicts the affected keys), so repeated walks (LIST round-trips on
    * an object store) would be pure waste on the store's hottest path.
    */
  private val segSideCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  private[core] def hasParquetFiles(dir: String): Boolean = {
    val cached = segSideCache.get(dir)
    if (cached != null) return cached.booleanValue()
    val p = Paths.get(dir)
    val r =
      if (!Files.isDirectory(p)) false
      else {
        val walk = Files.walk(p)
        try walk.anyMatch(f => f.getFileName.toString.endsWith(".parquet"))
        finally walk.close()
      }
    segSideCache.put(dir, java.lang.Boolean.valueOf(r))
    r
  }

  /** Above this many vectors `topPairwiseScores` switches from the exact
    * blocked grid (flops grow as n²) to sketch candidates + exact re-rank.
    */
  val PairwiseExactLimit: Long = 200000L

  /** Queued new-doc request inside a bulk-add scope. */
  final case class NewDoc(text: String, parentId: Option[Long],
      meta: Option[String], noEmbedding: Boolean)

  /** The adder handle passed to `bulkAddDocs` bodies (unusable outside
    * the scope — `kb.py:1500`).
    */
  final class DocAdder private[core] (store: KbStore) {
    private val buf = mutable.ArrayBuffer[NewDoc]()
    private var closed = false
    def add(text: String, parentId: Option[Long] = None,
        meta: Option[String] = None, noEmbedding: Boolean = false): Unit = {
      require(!closed, "add_doc called outside its bulk scope")
      buf += NewDoc(text, parentId, meta, noEmbedding)
    }
    private[core] def result: Seq[NewDoc] = { closed = true; buf.toSeq }
  }

  /** Create a fresh store (S1/S8: `kb.py:777-792`, force-fresh
    * `kb.py:1428-1430`).
    */
  def create(spark: SparkSession, path: String,
      embeddingParams: Map[String, String],
      forceFresh: Boolean = false): KbStore = {
    val p = Paths.get(path)
    if (forceFresh) deleteRecursively(p)
    require(!Files.exists(Paths.get(metaPath(path))),
      s"store already exists at $path")
    Files.createDirectories(p)
    import spark.implicits._
    spark.createDataset(Seq.empty[Doc]).write
      .mode(SaveMode.Overwrite).parquet(s"$path/docs/v0")
    spark.createDataset(Seq.empty[Emb]).write
      .mode(SaveMode.Overwrite).parquet(s"$path/embeddings/v0")
    spark.createDataset(Seq.empty[Edge]).write
      .mode(SaveMode.Overwrite).parquet(s"$path/edges/v0")
    spark.createDataset(Seq.empty[KV]).write
      .mode(SaveMode.Overwrite).parquet(s"$path/keyval/v0")
    val meta = KbMeta(SchemaVersion,
      java.time.Instant.now().toString, embeddingParams, 0L, 0L, 0L,
      TableNames.map(_ -> 0L).toMap)
    writeMetaAtomic(path, meta)
    new KbStore(spark, path)
  }

  /** One schema-migration step: rewrite a version-`from` store in place
    * to version `from + 1` (tables and/or meta), returning the updated
    * meta to persist. The reference reserves this slot without filling
    * it ("this is where migrations will go", `kb.py:841-853`).
    */
  trait Migration {
    def from: Int
    def apply(spark: SparkSession, path: String, meta: KbMeta): KbMeta
  }

  /** Registered upgrade chain, keyed by source version. Empty today —
    * v1 is the only schema — but `open` walks it so a future v2 ships
    * as one entry here instead of a breaking `require`.
    */
  private val migrations = mutable.Map[Int, Migration]()

  def registerMigration(m: Migration): Unit =
    migrations.synchronized { migrations(m.from) = m }

  /** Open an existing store, validating the schema version and applying
    * any registered migration chain from older versions
    * (`kb.py:841-853`).
    */
  def open(spark: SparkSession, path: String): KbStore = {
    var m = readMeta(path)
    require(m.schema_version <= SchemaVersion,
      s"store schema_version ${m.schema_version} is newer than this " +
        s"library's $SchemaVersion — upgrade the library")
    while (m.schema_version < SchemaVersion) {
      val step = migrations.synchronized(migrations.get(m.schema_version))
        .getOrElse(throw new IllegalStateException(
          s"no migration registered from schema_version ${m.schema_version}"))
      val next = step(spark, path, m)
      require(next.schema_version == m.schema_version + 1,
        s"migration from ${m.schema_version} must advance exactly one version")
      writeMetaAtomic(path, next)
      m = next
    }
    new KbStore(spark, path)
  }

  // ---------------- meta JSON (hand-rolled: zero extra deps) ----------
  private def metaPath(path: String) = s"$path/_meta.json"

  /** Superseded manifests are kept as `_meta.v<N>.json` history files:
    * vacuum's retention keeps every segment the last `retain` prior
    * manifests reference, which is the only chain-aware way to protect
    * an in-flight reader — a merge-on-read state is a SET of version
    * dirs (base + deltas), not one dir, so "keep the previous version
    * directory" stopped being a meaningful unit of retention.
    */
  private[core] def listMetaBackups(path: String): Seq[(Long, Path)] = {
    val re = "_meta\\.v(\\d+)\\.json".r
    val listing =
      try Files.list(Paths.get(path))
      catch { case _: java.io.IOException |
                   _: java.io.UncheckedIOException =>
        java.util.stream.Stream.empty[Path]() }
    try {
      val b = Seq.newBuilder[(Long, Path)]
      listing.forEach { p =>
        p.getFileName.toString match {
          case re(v) => b += (v.toLong -> p)
          case _ => ()
        }
      }
      b.result().sortBy(-_._1)
    } finally listing.close()
  }

  /** Retry cap for the commit paths' publish-conflict loop. */
  private[core] final val CasMaxRetries = 3

  /** Thrown by [[writeMetaAtomic]] when the on-disk manifest moved
    * between a writer's adoption and its publish — retryable (the
    * commit paths re-run adopt→stage→publish, bounded by
    * [[CasMaxRetries]]), unlike the overlap CME which is not. */
  private[core] final class PublishConflict(msg: String)
    extends RuntimeException(msg)

  private[core] def writeMetaAtomic(path: String, m: KbMeta,
      expectVersion: Option[Long] = None): Unit = {
    // preserve the manifest being replaced as a history file BEFORE the
    // swap — a crash between the two writes leaves both intact
    val curPath = Paths.get(metaPath(path))
    // publish-time version check (r8): `expectVersion` is the base the
    // committer adopted; any other on-disk version means a writer
    // landed inside our stage window. Check-then-move is best-effort
    // (no filesystem CAS), but it shrinks the documented race from
    // the whole staging span to microseconds.
    expectVersion.foreach { ev =>
      if (Files.exists(curPath)) {
        val cv = "\"version\"\\s*:\\s*(\\d+)".r
          .findFirstMatchIn(Files.readString(curPath)).map(_.group(1).toLong)
        if (!cv.contains(ev))
          throw new PublishConflict(
            s"store $path: manifest moved to v${cv.getOrElse(-1L)} while " +
              s"staging against v$ev")
      }
    }
    if (Files.exists(curPath)) {
      try {
        val old = Files.readString(curPath)
        "\"version\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(old).foreach { mm =>
          if (mm.group(1).toLong != m.version) {
            // tmp + atomic move, like the manifest itself: a torn
            // backup would later parse-fail inside vacuum and silently
            // void the retention that protects an in-flight reader
            val dst = Paths.get(s"$path/_meta.v${mm.group(1)}.json")
            val tmp = Paths.get(dst.toString + ".tmp")
            Files.writeString(tmp, old)
            Files.move(tmp, dst, StandardCopyOption.ATOMIC_MOVE,
              StandardCopyOption.REPLACE_EXISTING)
          }
        }
      } catch { case _: java.io.IOException => () } // advisory history
    }
    writeMetaFile(path, m)
  }

  private def writeMetaFile(path: String, m: KbMeta): Unit = {
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val params = m.embedding_params.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ", ", "}")
    val tables = m.table_versions.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${q(k)}: $v" }.mkString("{", ", ", "}")
    val bases = m.table_bases.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${q(k)}: $v" }.mkString("{", ", ", "}")
    val deltas = m.table_deltas.toSeq.sortBy(_._1)
      .map { case (k, vs) => s"${q(k)}: ${vs.mkString("[", ", ", "]")}" }
      .mkString("{", ", ", "}")
    val idxParams = m.index_params.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ", ", "}")
    val json =
      s"""{
         |  "schema_version": ${m.schema_version},
         |  "created_datetime": ${q(m.created_datetime)},
         |  "embedding_params": $params,
         |  "max_doc_id": ${m.max_doc_id},
         |  "max_edge_id": ${m.max_edge_id},
         |  "version": ${m.version},
         |  "table_versions": $tables,
         |  "table_bases": $bases,
         |  "table_deltas": $deltas,
         |  "index_params": $idxParams
         |}""".stripMargin
    val tmp = Paths.get(metaPath(path) + ".tmp")
    Files.writeString(tmp, json)
    Files.move(tmp, Paths.get(metaPath(path)),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  private[core] def readMeta(path: String): KbMeta =
    parseMeta(Files.readString(Paths.get(metaPath(path))))

  private[core] def parseMeta(json: String): KbMeta = {
    def longField(name: String): Long =
      ("\"" + name + "\"\\s*:\\s*(-?\\d+)").r.findFirstMatchIn(json)
        .map(_.group(1).toLong)
        .getOrElse(throw new IllegalStateException(s"meta missing $name"))
    def strField(name: String): String =
      ("\"" + name + "\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"").r
        .findFirstMatchIn(json).map(m => unescape(m.group(1)))
        .getOrElse(throw new IllegalStateException(s"meta missing $name"))
    val params = ("\"embedding_params\"\\s*:\\s*\\{([^}]*)\\}").r
      .findFirstMatchIn(json).map(_.group(1)).getOrElse("")
    val kvRe = "\"((?:[^\"\\\\]|\\\\.)*)\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"".r
    val paramMap = kvRe.findAllMatchIn(params)
      .map(m => unescape(m.group(1)) -> unescape(m.group(2))).toMap
    val tables = ("\"table_versions\"\\s*:\\s*\\{([^}]*)\\}").r
      .findFirstMatchIn(json).map(_.group(1)).getOrElse("")
    val numRe = "\"((?:[^\"\\\\]|\\\\.)*)\"\\s*:\\s*(\\d+)".r
    val tableMap = numRe.findAllMatchIn(tables)
      .map(m => unescape(m.group(1)) -> m.group(2).toLong).toMap
    // segment-chain maps (round 6); absent in pre-r6 manifests → empty
    val basesStr = ("\"table_bases\"\\s*:\\s*\\{([^}]*)\\}").r
      .findFirstMatchIn(json).map(_.group(1)).getOrElse("")
    val baseMap = numRe.findAllMatchIn(basesStr)
      .map(m => unescape(m.group(1)) -> m.group(2).toLong).toMap
    val deltasStr = ("\"table_deltas\"\\s*:\\s*\\{([^}]*)\\}").r
      .findFirstMatchIn(json).map(_.group(1)).getOrElse("")
    val listRe = "\"((?:[^\"\\\\]|\\\\.)*)\"\\s*:\\s*\\[([^\\]]*)\\]".r
    val deltaMap = listRe.findAllMatchIn(deltasStr).map { m =>
      unescape(m.group(1)) ->
        m.group(2).split(",").map(_.trim).filter(_.nonEmpty)
          .map(_.toLong).toSeq
    }.filter(_._2.nonEmpty).toMap
    val idxStr = ("\"index_params\"\\s*:\\s*\\{([^}]*)\\}").r
      .findFirstMatchIn(json).map(_.group(1)).getOrElse("")
    val idxMap = kvRe.findAllMatchIn(idxStr)
      .map(m => unescape(m.group(1)) -> unescape(m.group(2))).toMap
    val version = longField("version")
    KbMeta(longField("schema_version").toInt, strField("created_datetime"),
      paramMap, longField("max_doc_id"), longField("max_edge_id"),
      version,
      if (tableMap.nonEmpty) tableMap
      else TableNames.map(_ -> version).toMap,
      baseMap, deltaMap, idxMap)
  }

  private def unescape(s: String): String =
    s.replace("\\\"", "\"").replace("\\\\", "\\")

  // ---------------- fs helpers ----------------
  /** A NON-EMPTY directory whose immediate children are all `v<N>`
    * (digits-only — `v+3`/`v-1` are NOT store layout) version
    * subdirectories — the layout this store (and only this store)
    * writes for a table. Vacuum's orphan sweep uses it to avoid
    * deleting foreign dirs placed under the store root. An EMPTY
    * directory is deliberately NOT claimed: it might be a foreign
    * tool's freshly-mkdir'd dir about to be populated (reclaiming it
    * would race that writer), so the rare empty dir an interrupted
    * commit mkdir leaves behind is an accepted, bounded leak.
    */
  private[core] def isVersionedTableDir(dir: Path): Boolean = {
    val listing = Files.list(dir)
    try {
      var any = false
      val it = listing.iterator()
      while (it.hasNext) {
        val c = it.next()
        val n = c.getFileName.toString
        if (!Files.isDirectory(c) || !n.startsWith("v") ||
            n.length < 2 || !n.drop(1).forall(_.isDigit)) return false
        any = true
      }
      any
    } finally listing.close()
  }

  private[core] def deleteRecursively(p: Path): Unit = {
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
    }
    // deletion is the one event that can change a segment-side probe
    // (rollback re-staging the same v<N>, forceFresh reusing a path)
    val prefix = p.toString
    segSideCache.keySet.removeIf(k => k.startsWith(prefix))
  }

}
