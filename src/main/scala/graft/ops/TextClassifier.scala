package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trained text-quality classification — the fastText-style linear
  * filter real curation pipelines put between heuristic rules and
  * expensive model scoring (cf. the quality classifiers of GPT-3
  * §Appendix A, LLaMA, and DCLM): a logistic-regression model over
  * HASHED bag-of-words features, trained by full-batch gradient
  * descent as DataFrame aggregations, then applied corpus-wide.
  *
  * Everything is deterministic and engine-portable: the feature hash
  * is an explicit polynomial over character codes (no engine-internal
  * hash), training is full-batch (no RNG, no sample order), and the
  * iteration count is fixed — so the whole train+score pipeline is
  * oracle-checkable in SQL with the weights unrolled per iteration.
  *
  * Scale shape: the feature table (doc_id, i, x) is computed once and
  * cached; each GD iteration is two map-side-combinable shuffles (a
  * per-doc score keyed by doc_id against the broadcast weight vector,
  * and a per-feature gradient keyed by i) plus a dim-sized collect —
  * the model lives on the driver like any broadcast-trained linear
  * model. Token volume dominates; iterations are O(|f|) each with no
  * corpus-wide state beyond the D weights.
  */
object TextClassifier {

  /** Portable hashed feature index: h = 7, then h = (h·31 + code) mod
    * 2²⁰ over the token's characters, taken mod `dim`. Matches the
    * oracle's `list_reduce(list_prepend(7, ord(chars)))` exactly; the
    * modulus keeps every intermediate below 2²⁵ so no engine needs
    * wraparound semantics. Defined over single-char codes (`ascii` =
    * codepoint of the char), i.e. the corpus contract is BMP text.
    */
  def hashIdx(tok: Column, dim: Int): Column =
    aggregate(
      transform(regexp_extract_all(tok, lit("."), lit(0)),
        c => ascii(c).cast("long")),
      lit(7L), (a, c) => (a * 31 + c) % 1048576L) % dim

  /** Hashed bag-of-words features (doc_id, i, x) with x = token count
    * in bucket i divided by the document's token count.
    */
  def features(docs: DataFrame, dim: Int,
      textCol: String = "text"): DataFrame = {
    val tk = docs.select(col("doc_id"),
        explode(split(col(textCol), " ")).as("tok"))
      .where(col("tok") =!= "")
    val nt = tk.groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("double").as("n"))
    tk.select(col("doc_id"), hashIdx(col("tok"), dim).as("i"))
      .groupBy(col("doc_id"), col("i"))
      .agg(count(lit(1)).cast("double").as("cnt"))
      .join(nt, "doc_id")
      .select(col("doc_id"), col("i"), (col("cnt") / col("n")).as("x"))
  }

  /** Train `iters` full-batch GD steps of logistic regression (mean
    * gradient, learning rate `lr`, zero-initialized weights + bias)
    * on `labelCol` ∈ {0,1}, then score every document.
    *
    * @return (doc_id, label DOUBLE, prob DOUBLE) — prob rounded to 4 dp
    */
  def trainAndScore(docs: DataFrame, labelCol: String, dim: Int,
      iters: Int, lr: Double, textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val f = features(docs, dim, textCol).cache()
    // yDf is a cheap projection — not cached (no leak past return)
    val yDf = docs.select(col("doc_id"),
      col(labelCol).cast("double").as("y"))
    val n = yDf.count().toDouble
    val w = Array.fill(dim)(0.0)
    var b = 0.0
    def scoresWith(w: Array[Double]): DataFrame = {
      val wDf = w.toSeq.zipWithIndex
        .map { case (v, i) => (i.toLong, v) }.toDF("i", "w")
      f.join(broadcast(wDf), "i").groupBy(col("doc_id"))
        .agg(sum(col("x") * col("w")).as("s"))
    }
    // gradient features = hashed features ∪ a synthetic bias feature
    // (i = -1, x = 1) per doc, so one groupBy(i) job per iteration
    // yields every weight gradient AND the bias gradient together
    val fGrad = f.union(yDf.select(col("doc_id"),
      lit(-1L).as("i"), lit(1.0).as("x")))
    var it = 0
    while (it < iters) {
      val rDf = yDf.join(scoresWith(w), Seq("doc_id"), "left")
        .select(col("doc_id"),
          (lit(1.0) / (lit(1.0) +
            exp(-(coalesce(col("s"), lit(0.0)) + lit(b)))) - col("y"))
            .as("r"))
      val grads = fGrad.join(rDf, "doc_id").groupBy(col("i"))
        .agg(sum(col("r") * col("x")).as("g")).collect()
      var gb = 0.0
      val g = Array.fill(dim)(0.0)
      grads.foreach { r =>
        val i = r.getLong(0)
        if (i < 0) gb = r.getDouble(1) else g(i.toInt) = r.getDouble(1)
      }
      var i = 0
      while (i < dim) { w(i) -= lr * g(i) / n; i += 1 }
      b -= lr * gb / n
      it += 1
    }
    // unpersist the training cache; the final scoring pass recomputes
    // the (cheap, narrow) feature lineage once at the caller's action
    f.unpersist()
    yDf.join(scoresWith(w), Seq("doc_id"), "left")
      .select(col("doc_id"), col("y").as("label"),
        round(lit(1.0) / (lit(1.0) +
          exp(-(coalesce(col("s"), lit(0.0)) + lit(b)))), 4).as("prob"))
  }
}
