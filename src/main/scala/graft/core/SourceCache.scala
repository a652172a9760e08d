package graft.core

import java.io.{BufferedInputStream, FileInputStream, FileOutputStream}
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.security.MessageDigest
import java.util.zip.GZIPInputStream

/** Source-fetch utilities (SURVEY §2.1 S2/S3): a sha256-keyed local
  * cache with atomic `.tmp`+rename population, and transparent `.gz`
  * decompression with mtime freshness — reproducing
  * `/root/reference/src/svs/util.py:96-187`. The default [[HttpFetcher]]
  * performs real `http(s)` GETs via the JDK HttpClient (loopback-tested
  * in ScaleAddSpec) and handles `file://` URLs and local paths too.
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
          s"network egress disabled for $url — inject a UrlFetcher")
      require(Files.exists(src), s"unsupported or missing source: $url")
      Files.copy(src, tmp, StandardCopyOption.REPLACE_EXISTING)
    }
  }

  /** The real fetcher: `http(s)` URLs stream straight to the tmp file
    * via the JDK HttpClient (the reference's aiohttp GET,
    * `util.py:129-135` — non-200 raises and populates nothing);
    * everything else delegates to [[LocalFetcher]], so this is a strict
    * superset and the default for [[fetch]].
    */
  object HttpFetcher extends UrlFetcher {
    import java.net.http.{HttpClient, HttpRequest, HttpResponse}
    private lazy val client: HttpClient = HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(30))
      .followRedirects(HttpClient.Redirect.NORMAL).build()
    def download(url: String, tmp: Path): Unit =
      download(url, tmp, java.time.Duration.ofMinutes(5))

    /** Visible timeout for tests; production path uses the 5-minute
      * default above (matching JdkHttpTransport's request timeout).
      */
    private[graft] def download(url: String, tmp: Path,
        requestTimeout: java.time.Duration): Unit = {
      if (!url.startsWith("http://") && !url.startsWith("https://"))
        return LocalFetcher.download(url, tmp)
      // request timeout (not just connect): a server that accepts the
      // connection but never responds must not hold the per-URL
      // single-flight lock forever
      val req = HttpRequest.newBuilder(java.net.URI.create(url))
        .timeout(requestTimeout).GET().build()
      // TRUNCATE_EXISTING: a stale tmp left by a killed JVM must not
      // keep its tail beyond a shorter fresh response
      val resp = client.send(req, HttpResponse.BodyHandlers.ofFile(tmp,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.TRUNCATE_EXISTING,
        java.nio.file.StandardOpenOption.WRITE))
      if (resp.statusCode() != 200) {
        Files.deleteIfExists(tmp)
        throw new java.io.IOException(
          s"GET $url failed with status ${resp.statusCode()}")
      }
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
            fetcher: UrlFetcher = HttpFetcher): Path = {
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
              fetcher: UrlFetcher = HttpFetcher): Path =
    resolveUncompressed(fetch(url, cacheDir, fetcher))
}
