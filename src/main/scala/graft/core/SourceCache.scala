package graft.core

import java.io.{BufferedInputStream, FileInputStream, FileOutputStream}
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.security.MessageDigest
import java.util.zip.GZIPInputStream

/** Source-fetch utilities (SURVEY §2.1 S2/S3): a sha256-keyed local
  * cache with atomic `.tmp`+rename population, and transparent `.gz`
  * decompression with mtime freshness — reproducing
  * `/root/reference/src/svs/util.py:96-187`. This environment is
  * zero-egress, so the fetcher handles `file://` URLs and local paths;
  * an HTTP transport slots into [[fetch]] behind the same cache.
  */
object SourceCache {

  def sha256Hex(s: String): String =
    MessageDigest.getInstance("SHA-256").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Transport behind [[fetch]]'s cache: stream `url` into `tmp`
    * (`file_cached_wget`'s aiohttp GET, `util.py:129-135`). The default
    * handles `file://` and bare local paths; HTTP is injected where the
    * environment has egress.
    */
  trait UrlFetcher extends Serializable {
    def download(url: String, tmp: Path): Unit
  }

  object LocalFetcher extends UrlFetcher {
    def download(url: String, tmp: Path): Unit = {
      val src = if (url.startsWith("file://")) Paths.get(new java.net.URI(url))
        else if (!url.contains("://")) Paths.get(url)
        else throw new IllegalArgumentException(
          s"no network egress available for $url — inject a UrlFetcher")
      require(Files.exists(src), s"unsupported or missing source: $url")
      Files.copy(src, tmp, StandardCopyOption.REPLACE_EXISTING)
    }
  }

  // Single-flight per URL: the reference serializes *all* fetches behind
  // one asyncio lock (`util.py:30-93`, noted there as heavy-handed); we
  // lock per-URL so distinct URLs download concurrently while concurrent
  // fetches of the same URL still populate the cache exactly once.
  private val inflight = new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private def ext(url: String): String = {
    val name = url.substring(url.lastIndexOf('/') + 1)
    val i = name.indexOf('.')
    if (i < 0) "" else name.substring(i)
  }

  /** Fetch a URL into `cacheDir/<sha256(url)><ext>` (atomic populate;
    * cache hit returns without re-fetching) — `file_cached_wget`,
    * `util.py:96-136`.
    */
  def fetch(url: String, cacheDir: String = ".remote_cache",
            fetcher: UrlFetcher = LocalFetcher): Path = {
    val dir = Paths.get(cacheDir)
    Files.createDirectories(dir)
    val target = dir.resolve(sha256Hex(url) + ext(url))
    if (Files.exists(target)) return target
    val lock = inflight.computeIfAbsent(url, _ => new Object)
    lock.synchronized {
      if (Files.exists(target)) return target // populated while we waited
      val tmp = dir.resolve(target.getFileName.toString + ".tmp")
      try {
        fetcher.download(url, tmp)
        Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
      } catch {
        case e: Throwable => Files.deleteIfExists(tmp); throw e
      }
    }
    inflight.remove(url)
    target
  }

  /** Resolve a possibly-`.gz` local file to its uncompressed form,
    * re-inflating only when the compressed file is newer
    * (`resolve_to_local_uncompressed_file`, `util.py:155-187`).
    */
  def resolveUncompressed(path: Path): Path = {
    val name = path.getFileName.toString
    if (!name.endsWith(".gz")) return path
    val out = path.resolveSibling(name.dropRight(3))
    val stale = !Files.exists(out) ||
      Files.getLastModifiedTime(out).compareTo(
        Files.getLastModifiedTime(path)) < 0
    if (stale) {
      val tmp = path.resolveSibling(out.getFileName.toString + ".tmp")
      val in = new GZIPInputStream(
        new BufferedInputStream(new FileInputStream(path.toFile)))
      try {
        val os = new FileOutputStream(tmp.toFile)
        try in.transferTo(os) finally os.close()
      } finally in.close()
      Files.move(tmp, out, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    }
    out
  }

  /** Fetch + decompress in one step (the reference's open-from-URL path,
    * `kb.py:930`).
    */
  def resolve(url: String, cacheDir: String = ".remote_cache",
              fetcher: UrlFetcher = LocalFetcher): Path =
    resolveUncompressed(fetch(url, cacheDir, fetcher))
}
