package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding subword induction (Sennrich et al. 2016) as a
  * distributed pipeline — the tokenizer-training stage of an LLM data
  * pipeline, run over the corpus the tokenizer will serve.
  *
  * Scale shape: the corpus is read ONCE, collapsed to the word-frequency
  * table (`groupBy(word).count` — vocabulary-sized, millions of rows at
  * 100 TB, not corpus-sized). Every merge iteration then runs on that
  * compact table: adjacent-pair counting is a flatMap + map-side-
  * combinable sum, the argmax collects exactly one row to the driver,
  * and the merge application is a narrow map. Lineage is truncated with
  * a rolling `localCheckpoint` so `numMerges` iterations don't stack an
  * unbounded plan.
  *
  * Determinism: ties on pair frequency break lexicographically on
  * (left, right), so the merge table is a pure function of the corpus.
  */
object Bpe {

  /** End-of-word marker symbol (kept distinct from any character). */
  val EndOfWord = "</w>"

  private def wordFreqs(docs: DataFrame, textCol: String,
      unicode: Boolean): DataFrame = {
    val arr =
      if (unicode) TextAnalysis.tokensUnicode(col(textCol))
      else TextAnalysis.tokens(col(textCol))
    docs.select(explode(arr).as("word"))
      .where(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
  }

  /** Learn `numMerges` BPE merges from the corpus.
    *
    * Returns (rank, left, right, freq): the pair merged at each rank
    * and its frequency at merge time. Stops early when no adjacent
    * pair is left (fully merged vocabulary).
    */
  def bpeTrain(docs: DataFrame, numMerges: Int,
      textCol: String = "text", unicode: Boolean = false): DataFrame = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    val spark = docs.sparkSession
    import spark.implicits._

    var words: Dataset[(Seq[String], Long)] = wordFreqs(docs, textCol, unicode)
      .as[(String, Long)]
      .map { case (w, f) => ((w.map(_.toString) :+ EndOfWord): Seq[String], f) }
      .persist()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 0
    var done = false
    while (rank < numMerges && !done) {
      // adjacent-pair counts weighted by word frequency; argmax with a
      // total (freq desc, left asc, right asc) order — one driver row
      val best = words.flatMap { case (syms, f) =>
        var i = 0
        val out = new scala.collection.mutable.ArrayBuffer[((String, String), Long)](syms.length)
        while (i < syms.length - 1) { out += (((syms(i), syms(i + 1)), f)); i += 1 }
        out
      }.groupByKey(_._1).mapValues(_._2).reduceGroups(_ + _)
        .map { case ((a, b), f) => (a, b, f) }
        .toDF("left", "right", "freq")
        .orderBy(desc("freq"), col("left"), col("right"))
        .limit(1).as[(String, String, Long)]
        .collect().headOption
      best match {
        case None => done = true
        case Some((a, b, f)) =>
          merges += ((rank, a, b, f))
          val prev = words
          val merged = words.map { case (syms, fr) =>
            val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
                out += (a + b); i += 2
              } else { out += syms(i); i += 1 }
            }
            (out.toSeq, fr)
          }
          // rolling persist + periodic lineage truncation: each
          // iteration's argmax is the materializing action
          words =
            (if ((rank + 1) % 8 == 0) merged.localCheckpoint(false)
             else merged).persist()
          prev.unpersist()
          rank += 1
      }
    }
    words.unpersist()
    spark.createDataFrame(merges.toSeq)
      .toDF("rank", "left", "right", "freq")
  }

  /** Apply a learned merge table to tokenize documents into BPE pieces.
    *
    * The merge ranks broadcast (they are `numMerges` rows by
    * construction); each word then merges greedily by lowest rank —
    * the standard BPE encode loop — inside one narrow map partition
    * pass. Output: (doc_id, pieces ARRAY<STRING>, n_pieces).
    */
  def bpeEncode(docs: DataFrame, mergesDf: DataFrame,
      textCol: String = "text", unicode: Boolean = false): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ranks: Map[(String, String), Int] = mergesDf
      .select(col("left"), col("right"), col("rank").cast("int"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getInt(2))
      .toMap
    val bc = spark.sparkContext.broadcast(ranks)
    val enc = docs.select(col("doc_id"),
        (if (unicode) TextAnalysis.tokensUnicode(col(textCol))
         else TextAnalysis.tokens(col(textCol))).as("toks"))
      .as[(Long, Seq[String])]
      .map { case (id, toks) =>
        val rk = bc.value
        val pieces = toks.iterator.filter(_.nonEmpty).flatMap { w =>
          var syms = (w.map(_.toString) :+ EndOfWord).toArray
          var cont = true
          while (cont && syms.length > 1) {
            var bestRank = Int.MaxValue
            var bestI = -1
            var i = 0
            while (i < syms.length - 1) {
              val r = rk.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
              if (r < bestRank) { bestRank = r; bestI = i }
              i += 1
            }
            if (bestI < 0) cont = false
            else {
              val nw = new Array[String](syms.length - 1)
              System.arraycopy(syms, 0, nw, 0, bestI)
              nw(bestI) = syms(bestI) + syms(bestI + 1)
              System.arraycopy(syms, bestI + 2, nw, bestI + 1,
                syms.length - bestI - 2)
              syms = nw
            }
          }
          syms.iterator
        }.toSeq
        (id, pieces, pieces.length.toLong)
      }
    enc.toDF("doc_id", "pieces", "n_pieces")
  }

  /** Inverse of [[bpeEncode]]: concatenate the pieces and turn each
    * end-of-word marker back into a space — lossless round-trip of the
    * tokenized text (tokens joined by single spaces), because merges
    * only ever glue symbols WITHIN a word and every word ends in
    * exactly one marker. A narrow codegen'd map (concat + replace +
    * rtrim); completes the train→encode→decode tokenizer lifecycle.
    */
  def bpeDecode(encoded: DataFrame): DataFrame =
    encoded.select(col("doc_id"),
      rtrim(regexp_replace(concat_ws("", col("pieces")),
        java.util.regex.Pattern.quote(EndOfWord), " ")).as("text"))
}
