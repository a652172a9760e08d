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
  * Scale shape: per-doc sparse feature ARRAYS are computed once and
  * cached; the dim-sized weight vector rides into each step as a
  * literal array, so the per-doc score is a narrow fold and each GD
  * iteration is ONE map-side-combinable shuffle (the per-feature
  * gradient keyed by i) plus a dim-sized collect — the model lives on
  * the driver like any broadcast-trained linear model. Token volume
  * dominates; iterations are O(|f|) each with no corpus-wide state
  * beyond the D weights.
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
    val yDf = docs.select(col("doc_id"),
      col(labelCol).cast("double").as("y"))
    // per-doc SPARSE FEATURE ARRAYS, built once and cached (r8): the
    // weight vector is dim-sized and broadcasts as a literal array, so
    // each iteration's per-doc score is a narrow fold over the cached
    // row — no score-side shuffle per step (the previous formulation
    // re-shuffled feature-by-weight joins and doc-keyed residuals
    // every iteration: 3 exchanges per step, now 1). Tokenless docs
    // keep an empty array (score = bias), matching the old left-join.
    val fa = yDf.join(
        features(docs, dim, textCol)
          .groupBy(col("doc_id"))
          .agg(collect_list(struct(col("i"), col("x"))).as("fx")),
        Seq("doc_id"), "left")
      .select(col("doc_id"), col("y"),
        coalesce(col("fx"),
          array().cast("array<struct<i:bigint,x:double>>")).as("fx"))
      .cache()
    val n = fa.count().toDouble
    val w = Array.fill(dim)(0.0)
    var b = 0.0
    // FP note: the per-doc fold follows collect_list's partition order
    // where the old code followed groupBy partial-sum order — both are
    // engine-nondeterministic below the output's 4-dp rounding, which
    // is the tolerance the oracle compare has always relied on
    def sCol(w: Array[Double], b: Double): Column = {
      val wl = array(w.map(lit): _*)
      aggregate(col("fx"), lit(0.0),
        (acc, e) => acc + e.getField("x") *
          element_at(wl, (e.getField("i") + 1).cast("int"))) + lit(b)
    }
    var it = 0
    while (it < iters) {
      // one map-side-combinable groupBy(i) shuffle + a dim-sized
      // collect per step: the residual r computes inline from the
      // cached arrays, and a synthetic i = -1 feature per doc makes
      // the same job emit the bias gradient
      val grads = fa.select(
          (lit(1.0) / (lit(1.0) + exp(-sCol(w, b))) - col("y")).as("r"),
          explode(concat(col("fx"),
            array(struct(lit(-1L).as("i"), lit(1.0).as("x"))))).as("e"))
        .groupBy(col("e.i"))
        .agg(sum(col("r") * col("e.x")).as("g"))
        .collect()
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
    fa.unpersist()
    fa.select(col("doc_id"), col("y").as("label"),
      round(lit(1.0) / (lit(1.0) + exp(-sCol(w, b))), 4).as("prob"))
  }
}
