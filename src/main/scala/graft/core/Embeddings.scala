package graft.core

/** Embedding providers — the reference's single extension point
  * (`/root/reference/src/svs/types.py:12`,
  * `src/svs/embeddings/__init__.py:19-31`).
  *
  * Providers are plain serializable Scala objects applied with
  * `mapPartitions` in batches of [[EmbeddingProvider.BatchSize]]
  * (reference chunk constant `kb.py:52`), so a remote-API provider can
  * amortize connection setup per partition. No network providers are
  * wired in this environment (zero egress); OpenAI/Ollama-style providers
  * plug in behind the same trait.
  */
object Embeddings {

  trait EmbeddingProvider extends Serializable {
    def name: String
    def params: Map[String, String] = Map("provider" -> name)
    def dim: Int
    /** Embed a batch of texts. Must return unit-norm vectors. */
    def embed(texts: Seq[String]): Seq[Array[Float]]
  }

  object EmbeddingProvider {
    /** Micro-batch size for provider calls (reference `kb.py:52`). */
    val BatchSize = 200
    /** Magnitude tolerance (reference `kb.py:58`). */
    val Tolerance = 0.001
  }

  /** Reject batches containing non-unit vectors, exactly like
    * `wrap_embeddings_func_check_magnitude`
    * (`embeddings/util.py:26-41`).
    */
  def checkMagnitude(vecs: Seq[Array[Float]],
      tol: Double = EmbeddingProvider.Tolerance): Seq[Array[Float]] = {
    vecs.foreach { v =>
      val mag = math.sqrt(v.foldLeft(0.0)((a, x) => a + x.toDouble * x))
      if (math.abs(mag - 1.0) > tol)
        throw new IllegalArgumentException(
          f"embedding magnitude $mag%.6f outside 1±$tol")
    }
    vecs
  }

  /** Wrap a provider with the magnitude check (reference wraps at
    * `kb.py:997-1002`, `kb.py:1466-1471`).
    */
  def withMagnitudeCheck(p: EmbeddingProvider): EmbeddingProvider =
    new EmbeddingProvider {
      def name: String = p.name
      override def params: Map[String, String] = p.params
      def dim: Int = p.dim
      def embed(texts: Seq[String]): Seq[Array[Float]] =
        checkMagnitude(p.embed(texts))
    }

  /** Deterministic mock: every text → [1, 0, 0, …]
    * (`embeddings/mock.py:11-17`).
    */
  final case class MockProvider(dim: Int = 3) extends EmbeddingProvider {
    def name = "mock"
    def embed(texts: Seq[String]): Seq[Array[Float]] =
      texts.map { _ =>
        val v = new Array[Float](dim)
        v(0) = 1.0f
        v
      }
  }

  /** The test-suite keyword provider (`tests/test_kb.py:1738-1759`,
    * FIXTURES.md §2): keyword presence → fixed unit vector.
    */
  final case class KeywordProvider(
      keywords: Seq[(String, Array[Float])]) extends EmbeddingProvider {
    def name = "keyword"
    def dim: Int = keywords.head._2.length
    def embed(texts: Seq[String]): Seq[Array[Float]] =
      texts.map { t =>
        keywords.collectFirst {
          case (k, v) if t.contains(k) => v
        }.getOrElse(throw new IllegalArgumentException(
          s"no keyword matches text: $t"))
      }
  }

  object KeywordProvider {
    /** FIXTURES.md §2 fixture vectors (d=3, unit within 0.001). */
    def fixture: KeywordProvider = KeywordProvider(Seq(
      "first" -> Array(1.0f, 0.001f, 0.0f),
      "second" -> Array(0.0f, 1.0f, 0.0001f),
      "third" -> Array(0.01f, 0.0f, 1.0f),
      "forth" -> Array(0.707f, 0.707f, 0.0f)))
  }

  // ------------------------------------------------------------------
  // HTTP provider configs (reference `embeddings/openai.py:13-92`,
  // `ollama.py:14-93`): the full config surface — model / dimensions /
  // user, base_url / truncate / keep_alive — with params persisted into
  // the store meta and rehydrated by [[fromParams]] exactly like
  // `make_embeddings_func` (`embeddings/__init__.py:19-31`). The HTTP
  // call goes through a pluggable [[HttpTransport]]; the default is the
  // real [[JdkHttpTransport]], wire-tested against an in-process
  // loopback server (ProviderSpec) since this build environment has no
  // external egress.
  // ------------------------------------------------------------------

  /** POST seam: (url, headers, json body) → (status, response body). */
  trait HttpTransport extends Serializable {
    def post(url: String, headers: Map[String, String],
        jsonBody: String): (Int, String)
  }

  /** Transport that refuses every call — inject where requests must
    * provably never leave the process.
    */
  object NoEgressTransport extends HttpTransport {
    def post(url: String, headers: Map[String, String],
        jsonBody: String): (Int, String) =
      throw new UnsupportedOperationException(
        s"network egress disabled for $url — inject an HttpTransport")
  }

  /** The real wire transport: JDK `java.net.http.HttpClient` (no extra
    * dependency), one shared client per JVM so a partition's batched
    * calls reuse connections — the same POST the reference performs with
    * aiohttp (`embeddings/openai.py:85-92`, `ollama.py:70-93`).
    * Status/body are returned raw; [[HttpEmbeddingProvider]] owns the
    * non-200 error contract. Singleton object ⇒ serializes as a module
    * reference, and each executor JVM lazily builds its own client.
    */
  object JdkHttpTransport extends HttpTransport {
    import java.net.http.{HttpClient, HttpRequest, HttpResponse}
    private lazy val client: HttpClient = HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(30)).build()
    def post(url: String, headers: Map[String, String],
        jsonBody: String): (Int, String) = {
      val b = HttpRequest.newBuilder(java.net.URI.create(url))
        .timeout(java.time.Duration.ofMinutes(5))
        .header("Content-Type", "application/json")
        .POST(HttpRequest.BodyPublishers.ofString(jsonBody,
          java.nio.charset.StandardCharsets.UTF_8))
      headers.foreach { case (k, v) => b.header(k, v) }
      val resp = client.send(b.build(), HttpResponse.BodyHandlers.ofString())
      (resp.statusCode(), resp.body())
    }
  }

  sealed trait HttpProviderConfig extends Serializable {
    def providerName: String
    /** The persisted `__embedding_func_params__` analog. */
    def params: Map[String, String]
    def url(): String
    def headers(): Map[String, String]
    def payload(texts: Seq[String]): String
    /** Parse the response body into one vector per input text. */
    def parse(body: String, n: Int): Seq[Array[Float]]
    /** Best-known output dimensionality (-1 when the model decides). */
    def dimHint: Int
  }

  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** `make_openai_embeddings_func` (`embeddings/openai.py:13-92`). Note
    * the reference persists only (provider, model, dimensions) — never
    * the api key or user tag.
    */
  final case class OpenAiConfig(
      model: String = "text-embedding-3-small",
      apiKey: Option[String] = None,
      dimensions: Option[Int] = None,
      user: Option[String] = None) extends HttpProviderConfig {
    def providerName = "openai"
    def params: Map[String, String] =
      Map("provider" -> "openai", "model" -> model) ++
        dimensions.map(d => "dimensions" -> d.toString)
    def url(): String = "https://api.openai.com/v1/embeddings"
    def headers(): Map[String, String] = {
      val key = apiKey.orElse(sys.env.get("OPENAI_API_KEY")).getOrElse(
        throw new RuntimeException(
          "No OpenAI API key found! It was not passed to the function nor " +
            "was it in the OPENAI_API_KEY environment variable."))
      Map("Authorization" -> s"Bearer $key")
    }
    def payload(texts: Seq[String]): String = {
      val base = s"""{"input":[${texts.map(jstr).mkString(",")}],""" +
        s""""model":${jstr(model)},"encoding_format":"float""""
      base + dimensions.map(d => s""","dimensions":$d""").getOrElse("") +
        user.map(u => s""","user":${jstr(u)}""").getOrElse("") + "}"
    }
    def parse(body: String, n: Int): Seq[Array[Float]] = {
      import org.json4s._
      import org.json4s.jackson.JsonMethods
      val data = (JsonMethods.parse(body) \ "data").asInstanceOf[JArray].arr
      require(data.length == n, s"expected $n embeddings, got ${data.length}")
      data.zipWithIndex.map { case (d, i) =>
        require((d \ "index") == JInt(i), "out-of-order embedding index")
        (d \ "embedding").asInstanceOf[JArray].arr
          .map(v => v.asInstanceOf[JDouble].num.toFloat).toArray
      }
    }
    def dimHint: Int = dimensions.getOrElse(-1)
  }

  /** `make_ollama_embeddings_func` (`embeddings/ollama.py:14-93`). */
  final case class OllamaConfig(
      model: String,
      truncate: Boolean = true,
      keepAlive: String = "5m",
      baseUrl: Option[String] = None) extends HttpProviderConfig {
    def providerName = "ollama"
    def params: Map[String, String] =
      Map("provider" -> "ollama", "model" -> model,
        "truncate" -> truncate.toString, "keep_alive" -> keepAlive) ++
        baseUrl.map("base_url" -> _)
    def url(): String = {
      val base = baseUrl.orElse(sys.env.get("OLLAMA_BASE_URL"))
        .getOrElse("http://127.0.0.1:11434")
      s"$base/api/embed"
    }
    def headers(): Map[String, String] = Map.empty
    def payload(texts: Seq[String]): String =
      s"""{"model":${jstr(model)},"truncate":$truncate,""" +
        s""""keep_alive":${jstr(keepAlive)},""" +
        s""""input":[${texts.map(jstr).mkString(",")}]}"""
    def parse(body: String, n: Int): Seq[Array[Float]] = {
      import org.json4s._
      import org.json4s.jackson.JsonMethods
      val arr = (JsonMethods.parse(body) \ "embeddings").asInstanceOf[JArray].arr
      require(arr.length == n, s"expected $n embeddings, got ${arr.length}")
      arr.map(_.asInstanceOf[JArray].arr
        .map(v => v.asInstanceOf[JDouble].num.toFloat).toArray)
    }
    def dimHint: Int = -1
  }

  /** A provider driving an [[HttpProviderConfig]] through a transport.
    * Wrap with [[cached]] for the reference's per-call LRU behavior.
    */
  final class HttpEmbeddingProvider(
      val config: HttpProviderConfig,
      transport: HttpTransport = JdkHttpTransport) extends EmbeddingProvider {
    def name: String = config.providerName
    override def params: Map[String, String] = config.params
    def dim: Int = config.dimHint
    def embed(texts: Seq[String]): Seq[Array[Float]] = {
      val (status, body) =
        transport.post(config.url(), config.headers(), config.payload(texts))
      if (status != 200)
        throw new RuntimeException(
          s"${config.providerName} API error: status=$status, body=$body")
      config.parse(body, texts.size)
    }
  }

  /** `make_embeddings_func(params)` (`embeddings/__init__.py:19-31`):
    * rehydrate a provider from its persisted params.
    */
  def fromParams(params: Map[String, String],
      transport: HttpTransport = JdkHttpTransport): EmbeddingProvider =
    params.getOrElse("provider",
      throw new IllegalArgumentException("params missing 'provider'")) match {
      case "mock" => MockProvider()
      case "openai" => new HttpEmbeddingProvider(
        OpenAiConfig(
          model = params.getOrElse("model", "text-embedding-3-small"),
          dimensions = params.get("dimensions").map(_.toInt)), transport)
      case "ollama" => new HttpEmbeddingProvider(
        OllamaConfig(
          model = params.getOrElse("model",
            throw new IllegalArgumentException("ollama params missing model")),
          truncate = params.get("truncate").forall(_.toBoolean),
          keepAlive = params.getOrElse("keep_alive", "5m"),
          baseUrl = params.get("base_url")), transport)
      case other =>
        throw new IllegalArgumentException(
          s"unknown embedding provider name: $other")
    }

  // ------------------------------------------------------------------
  // per-executor LRU + single-flight cache (reference `util.py:51-93`,
  // cache size `embeddings/util.py:12`)
  // ------------------------------------------------------------------

  /** Reference `EMBEDDINGS_MAX_CACHE_SIZE` (`embeddings/util.py:12`). */
  val MaxCacheSize: Int =
    sys.env.get("EMBEDDINGS_MAX_CACHE_SIZE").map(_.toInt).getOrElse(100)

  /** Wrap a provider with the per-JVM LRU + single-flight cache: the
    * cache key is (provider params, the whole text batch) — exactly the
    * reference's `@cached` over the batched endpoint call. State lives in
    * a JVM-wide object, so every task deserializing this wrapper on an
    * executor shares one cache.
    */
  def cached(p: EmbeddingProvider,
      maxSize: Int = MaxCacheSize): EmbeddingProvider =
    new EmbeddingProvider {
      def name: String = p.name
      override def params: Map[String, String] = p.params
      def dim: Int = p.dim
      def embed(texts: Seq[String]): Seq[Array[Float]] =
        ProviderCache.getOrCompute((p.params, texts.toList), maxSize,
          () => p.embed(texts))
    }

  /** JVM-wide (= per-executor) LRU with single-flight de-duplication:
    * a concurrent call for a key already being computed waits for that
    * computation instead of re-invoking the provider (`util.py:65-93`).
    */
  private[graft] object ProviderCache {
    private val cache = new java.util.LinkedHashMap[
      Any, Seq[Array[Float]]](16, 0.75f, true) // accessOrder = LRU
    private val inflight =
      new java.util.HashMap[Any, java.util.concurrent.CountDownLatch]
    // observability for tests
    @volatile var computeCount: Long = 0L

    def size: Int = cache.synchronized(cache.size)
    def clear(): Unit = cache.synchronized {
      cache.clear(); computeCount = 0
    }

    @annotation.tailrec
    def getOrCompute(key: Any, maxSize: Int,
        compute: () => Seq[Array[Float]]): Seq[Array[Float]] = {
      var waitFor: java.util.concurrent.CountDownLatch = null
      var mine: java.util.concurrent.CountDownLatch = null
      cache.synchronized {
        val hit = cache.get(key)
        if (hit != null) return hit
        waitFor = inflight.get(key)
        if (waitFor == null) {
          mine = new java.util.concurrent.CountDownLatch(1)
          inflight.put(key, mine)
        }
      }
      if (waitFor != null) {
        waitFor.await()
        getOrCompute(key, maxSize, compute) // re-check the cache
      } else {
        try {
          val res = compute()
          cache.synchronized {
            computeCount += 1
            cache.put(key, res)
            while (cache.size > maxSize) {
              val eldest = cache.keySet().iterator().next()
              cache.remove(eldest)
            }
          }
          res
        } finally {
          cache.synchronized {
            inflight.remove(key)
            mine.countDown()
          }
        }
      }
    }
  }
}
