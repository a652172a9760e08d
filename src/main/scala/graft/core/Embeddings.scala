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
}
