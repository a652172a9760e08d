package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.core.{KbStore, SourceCache}
import graft.core.Embeddings.MockProvider

/** Distributed bulk add (the scale index-build path) + source cache. */
class ScaleAddSpec extends SparkSpec {

  test("distributed bulk add: 10k docs, dense ids, embed backfill, retrieve") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft-scale").resolve("kb").toString
    val kb = KbStore.create(spark, path, Map("provider" -> "mock"))
    val p = MockProvider(8)

    // seed two parents via the driver-side scope
    kb.bulkAddDocs(p) { a => a.add("root a"); a.add("root b") }

    val newDocs = spark.range(0, 10000)
      .select(concat(lit("doc "), col("id")).as("text"),
        when(col("id") % 2 === 0, 1L).otherwise(2L).as("parent_id"))
    val added = kb.bulkAddDocsDistributed(newDocs, p)
    assert(added == 10000L)
    assert(kb.len == 10002L)

    // dense ids continue from the high-water mark; levels derived
    val d = kb.docs
    assert(d.agg(max($"id")).head().getLong(0) == 10002L)
    assert(d.filter($"level" === 1).count() == 10000L)
    // every added doc got an embedding
    assert(kb.embeddings.count() == 10002L)
    // retrieval still works over the enlarged store
    assert(kb.retrieve("anything", 5, p).size == 5)

    // missing parent fails before commit
    val bad = spark.range(0, 3)
      .select(lit("x").as("text"), lit(99999L).as("parent_id"))
    intercept[IllegalArgumentException] {
      kb.bulkAddDocsDistributed(bad, p)
    }
    assert(kb.len == 10002L)
    kb.close()
  }

  test("source cache: sha256-keyed fetch + gz freshness (S2/S3)") {
    val dir = Files.createTempDirectory("graft-src")
    val cache = dir.resolve("cache").toString
    val f = dir.resolve("data.txt")
    Files.writeString(f, "hello graft")

    val fetched = SourceCache.fetch(f.toUri.toString, cache)
    assert(Files.readString(fetched) == "hello graft")
    // cache hit: same path, content survives source deletion
    Files.delete(f)
    val again = SourceCache.fetch(f.toUri.toString, cache)
    assert(again == fetched && Files.readString(again) == "hello graft")

    // gz decompression with mtime freshness
    val gz = dir.resolve("payload.txt.gz")
    val os = new java.util.zip.GZIPOutputStream(
      new java.io.FileOutputStream(gz.toFile))
    os.write("compressed contents".getBytes("UTF-8")); os.close()
    val out = SourceCache.resolveUncompressed(gz)
    assert(out.getFileName.toString == "payload.txt")
    assert(Files.readString(out) == "compressed contents")
    // untouched gz → second resolve reuses the inflated file
    val m1 = Files.getLastModifiedTime(out)
    assert(SourceCache.resolveUncompressed(gz) == out)
    assert(Files.getLastModifiedTime(out) == m1)
  }

  test("source cache: injected transport, single-flight, no-egress default") {
    val cache = Files.createTempDirectory("graft-cache2").toString

    // the default fetcher refuses remote schemes in this environment
    intercept[IllegalArgumentException] {
      SourceCache.fetch("https://example.com/data.txt", cache)
    }

    // injected transport: downloads exactly once, cache hit after
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    val fake = new SourceCache.UrlFetcher {
      def download(url: String, tmp: java.nio.file.Path): Unit = {
        calls.incrementAndGet()
        Files.writeString(tmp, s"body-of:$url")
      }
    }
    val url = "https://example.com/corpus.txt"
    // 8 concurrent fetches of the same URL populate once (single-flight)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val futs = (1 to 8).map { _ =>
        pool.submit(new java.util.concurrent.Callable[java.nio.file.Path] {
          def call() = SourceCache.fetch(url, cache, fake)
        })
      }
      val paths = futs.map(_.get()).distinct
      assert(paths.size == 1)
      assert(Files.readString(paths.head) == s"body-of:$url")
    } finally pool.shutdown()
    assert(calls.get() == 1)
    assert(SourceCache.fetch(url, cache, fake) != null && calls.get() == 1)
  }
}
