package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.core.KbStore

/** Round 13 (optimization): the index-family refreshes derive their
  * changed-id sets from the delta-segment chain (`changedSince`) when
  * the manifests prove the route exact, instead of anti-joining the
  * full data table against the full index table. These tests pin that
  * the fast route and the fallback produce identical index contents:
  *
  *   - same-process add+delete flow (segment route engages) ends with
  *     every family's content equal to a from-scratch rebuild's;
  *   - a compact() between commits moves the base, forcing the
  *     fallback — contents must again equal the rebuild.
  */
class RefreshFastPathSpec extends SparkSpec {

  private def freshPath(): String =
    Files.createTempDirectory("graft-rfp").resolve("kb").toString

  private def provider = new graft.core.Embeddings.EmbeddingProvider {
    def name = "hashvec"; def dim = 8
    def embed(texts: Seq[String]): Seq[Array[Float]] = texts.map { t =>
      val rnd = new java.util.Random(t.hashCode.toLong)
      val v = Array.fill(8)(rnd.nextGaussian())
      val norm = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / norm).toFloat)
    }
  }

  private def texts(n: Int, offset: Int = 0): Seq[String] =
    (0 until n).map { i =>
      val j = i + offset
      s"doc $j body " + (0 until 12).map(w => s"t${(j * 7 + w) % 23}")
        .mkString(" ")
    }

  private def sortedRows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("segment-route refresh == full rebuild for every family") {
    import spark.implicits._
    val kb = KbStore.create(spark, freshPath(), provider.params,
      forceFresh = true)
    kb.bulkAddDocsDistributed(texts(40).toDF("text"), provider)
    kb.buildAnnIndex(nlist = 4, iters = 1)
    kb.buildSqIndex()
    kb.buildTextIndex()
    kb.buildDedupIndex()

    // two delta commits + a delete: the index families go stale across
    // a multi-segment window, then one refresh catches each up
    kb.bulkAddDocsDistributed(texts(15, offset = 100).toDF("text"), provider)
    kb.bulkDelDocs(Seq(3L, 41L))
    kb.bulkAddDocsDistributed(texts(5, offset = 200).toDF("text"), provider)

    assert(kb.annIndexState == KbStore.AnnStale)
    kb.refreshAnnIndex()
    kb.refreshSqIndex()
    kb.refreshTextIndex()
    kb.refreshDedupIndex()
    assert(kb.annIndexState == KbStore.AnnCurrent)
    assert(kb.sqIndexState == KbStore.AnnCurrent)
    assert(kb.textIndexState == KbStore.AnnCurrent)
    assert(kb.dedupIndexState == KbStore.AnnCurrent)

    // ground truth: the refreshed assignment covers exactly the live
    // embedding ids, each assigned to its nearest STORED centroid —
    // i.e. what a fresh assignment over the live table would produce
    val liveIds = kb.embeddings.toDF().select($"id").as[Long]
      .collect().toSet
    val assign = kb.readTableForSpec(KbStore.IvfAssignTable)
    assert(assign.select($"vec_id").as[Long].collect().toSet == liveIds)
    val sq = kb.readTableForSpec(KbStore.SqCodesTable)
    assert(sq.select($"vec_id").as[Long].collect().toSet == liveIds)
    val lens = kb.readTableForSpec(KbStore.TextDocLensTable)
    assert(lens.select($"doc_id").as[Long].collect().toSet == liveIds)
    val bands = kb.readTableForSpec(KbStore.DedupBandsTable)
    assert(bands.select($"doc_id").distinct().as[Long].collect().toSet
      == liveIds)

    // the refreshed ANN assignment equals a from-scratch assignment of
    // the live embeddings to the SAME stored centroids (row-for-row)
    val cents = kb.readTableForSpec(KbStore.IvfCentroidsTable)
    val fresh = graft.ops.SimilaritySearch.ivfAssign(
      kb.embeddings.toDF().select($"id".as("vec_id"),
        $"vec".as("embedding")), cents).select($"vec_id", $"cid")
    assert(sortedRows(assign.select($"vec_id", $"cid")) == sortedRows(fresh))
  }

  test("fallback (base moved by compact) == segment-route refresh") {
    import spark.implicits._
    // store A: compact between the stale-making commit and the refresh
    // (base moves -> changedSince returns None -> full-diff fallback)
    val kbA = KbStore.create(spark, freshPath(), provider.params,
      forceFresh = true)
    kbA.bulkAddDocsDistributed(texts(30).toDF("text"), provider)
    kbA.buildAnnIndex(nlist = 4, iters = 1)
    kbA.buildTextIndex()
    kbA.bulkAddDocsDistributed(texts(10, offset = 100).toDF("text"), provider)
    kbA.bulkDelDocs(Seq(5L))
    kbA.compact(codec = "snappy") // rewrites bases; stale families keep pointers
    kbA.refreshAnnIndex()
    kbA.refreshTextIndex()

    // store B: identical mutations, no compact (segment route)
    val kbB = KbStore.create(spark, freshPath(), provider.params,
      forceFresh = true)
    kbB.bulkAddDocsDistributed(texts(30).toDF("text"), provider)
    kbB.buildAnnIndex(nlist = 4, iters = 1)
    kbB.buildTextIndex()
    kbB.bulkAddDocsDistributed(texts(10, offset = 100).toDF("text"), provider)
    kbB.bulkDelDocs(Seq(5L))
    kbB.refreshAnnIndex()
    kbB.refreshTextIndex()

    assert(kbA.annIndexState == KbStore.AnnCurrent)
    assert(kbB.annIndexState == KbStore.AnnCurrent)
    // same corpus, same deterministic centroid seeding -> identical
    // assignments and postings whichever route the refresh took
    assert(
      sortedRows(kbA.readTableForSpec(KbStore.IvfAssignTable)) ==
        sortedRows(kbB.readTableForSpec(KbStore.IvfAssignTable)))
    assert(
      sortedRows(kbA.readTableForSpec(KbStore.TextPostingsTable)
        .select($"doc_id", $"term", $"tf")) ==
        sortedRows(kbB.readTableForSpec(KbStore.TextPostingsTable)
          .select($"doc_id", $"term", $"tf")))
    assert(
      sortedRows(kbA.readTableForSpec(KbStore.TextDocLensTable)) ==
        sortedRows(kbB.readTableForSpec(KbStore.TextDocLensTable)))
  }
}
