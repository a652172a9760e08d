package graft

import org.apache.spark.sql.functions._
import graft.ops.TextClassifier

class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = {
    // separable: "good" docs speak one vocabulary, "bad" docs another
    val good = (0L until 30L).map(i =>
      (i, s"clear prose sentence structure citation detail $i", 1.0))
    val bad = (100L until 130L).map(i =>
      (i, s"spam click banner lottery winner prize $i", 0.0))
    (good ++ bad).toDF("doc_id", "text", "y")
  }

  test("trainAndScore separates a separable corpus") {
    val scored = TextClassifier.trainAndScore(
      corpus, labelCol = "y", dim = 64, iters = 30, lr = 2.0)
    val acc = scored
      .select((((col("prob") > 0.5).cast("int") === col("label").cast("int"))
        .cast("int")).as("ok"))
      .agg(avg(col("ok"))).head.getDouble(0)
    assert(acc >= 0.95, s"train accuracy $acc")
  }

  test("training is deterministic (full batch, no RNG)") {
    val a = TextClassifier.trainAndScore(corpus, "y", 32, 5, 1.0)
      .orderBy("doc_id").collect().toSeq
    val b = TextClassifier.trainAndScore(corpus, "y", 32, 5, 1.0)
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("hashIdx is stable and in range") {
    val idx = corpus
      .select(explode(split(col("text"), " ")).as("tok"))
      .select(TextClassifier.hashIdx(col("tok"), 64).as("i"))
      .agg(min(col("i")), max(col("i"))).head
    assert(idx.getLong(0) >= 0L && idx.getLong(1) < 64L)
    // pinned value: hash("table") with the documented recipe
    val h = corpus.sparkSession.range(1)
      .select(TextClassifier.hashIdx(lit("table"), 64).as("h"))
      .head.getLong(0)
    var acc = 7L
    for (c <- "table") acc = (acc * 31 + c.toInt) % 1048576L
    assert(h == acc % 64)
  }
}
