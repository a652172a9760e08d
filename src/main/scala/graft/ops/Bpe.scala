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
    *
    * BATCHED PASSES (r8), exactly greedy-equivalent: the naive loop is
    * one distributed job per merge — fine at 12 merges, hopeless at a
    * production 30k-merge vocabulary. Each pass instead:
    *
    *  1. counts adjacent pairs once and takes the global top-`batchB`
    *     (one job — same shape as before);
    *  2. selects the maximal PREFIX of that ranking whose pairs are
    *     pairwise symbol-disjoint (a prefix, never a skip: sequential
    *     greedy would have merged a conflicting higher-ranked pair
    *     first, changing the counts below it). Disjointness makes
    *     every selected pair's count invariant under the others —
    *     original pair counts only ever DECREASE under a merge, and
    *     only when a symbol is shared;
    *  3. bounds the one remaining hazard — a merge CREATES pairs
    *     (x, ab)/(ab, y), and sequential greedy would pick such a new
    *     pair before the batch tail if its count were high enough —
    *     with one more job: exact trigram-adjacency counts around
    *     every batch-pair occurrence (an upper bound on any pair the
    *     batch can create, including compound ones like (cd, ab),
    *     whose occurrences all embed an original neighbor trigram).
    *     The batch is cut to the largest prefix whose tail count
    *     strictly exceeds every bound created by that prefix; a
    *     single-pair batch needs no check (it IS plain greedy);
    *  4. applies the surviving merges in ONE narrow left-to-right
    *     scan per word (disjointness makes the combined scan equal to
    *     applying them one at a time in rank order), recording each
    *     pair's pre-pass count — equal to its count at sequential
    *     merge time, by the invariance above.
    *
    * Net: ~2 jobs per pass instead of 1 per merge; Zipfian corpora
    * batch tens of merges per pass once counts separate. `batchB = 1`
    * degenerates to the classic per-merge loop (same results either
    * way — BpeSpec pins batched-vs-sequential identity, and the
    * x15/x19 oracles pin the sequential semantics).
    */
  def bpeTrain(docs: DataFrame, numMerges: Int,
      textCol: String = "text", unicode: Boolean = false,
      batchB: Int = 64): DataFrame = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    require(batchB >= 1, s"batchB must be >= 1, got $batchB")
    val spark = docs.sparkSession
    import spark.implicits._

    var words: Dataset[(Seq[String], Long)] = wordFreqs(docs, textCol, unicode)
      .as[(String, Long)]
      .map { case (w, f) => ((w.map(_.toString) :+ EndOfWord): Seq[String], f) }
      .persist()
    // every symbol name ever in the vocabulary (alphabet + EndOfWord +
    // each merge's concatenated name) — a driver-side superset of the
    // live symbols, maintained incrementally. Used by the batch
    // collision guard below; alphabet-sized, computed once.
    val symbolSet = scala.collection.mutable.Set.empty[String]
    symbolSet ++= words.flatMap(_._1).distinct().collect()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var done = false
    var pass = 0
    while (merges.size < numMerges && !done) {
      val want = math.min(batchB, numMerges - merges.size)
      // adjacent-pair counts weighted by word frequency; global top-K
      // with a total (freq desc, left asc, right asc) order — K driver
      // rows, batch-bounded
      val top = words.flatMap { case (syms, f) =>
        var i = 0
        val out = new scala.collection.mutable.ArrayBuffer[((String, String), Long)](syms.length)
        while (i < syms.length - 1) { out += (((syms(i), syms(i + 1)), f)); i += 1 }
        out
      }.groupByKey(_._1).mapValues(_._2).reduceGroups(_ + _)
        .map { case ((a, b), f) => (a, b, f) }
        .toDF("left", "right", "freq")
        .orderBy(desc("freq"), col("left"), col("right"))
        .limit(want).as[(String, String, Long)]
        .collect()
      if (top.isEmpty) done = true
      else {
        // maximal pairwise-disjoint prefix
        val prefix = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
        val used = scala.collection.mutable.Set.empty[String]
        var stop = false
        for (p <- top if !stop) {
          if (used(p._1) || used(p._2)) stop = true
          else { prefix += p; used += p._1; used += p._2 }
        }
        // created-name collision guard: the decrease-only invariance
        // behind the disjoint-prefix argument assumes each merge's
        // concatenated name is a FRESH string. If a batch pair's name
        // string-coincides with a symbol already in the vocabulary, or
        // with another batch pair's name ('abc' arising from both
        // (a,bc) and (ab,c)), the merge can BOOST an existing counted
        // pair (or compound created pairs across batch members) and
        // sequential greedy would re-rank mid-batch. Cut the prefix
        // before the first colliding pair; if the collision is at rank
        // 0, keep a single-pair batch — that IS plain greedy, safe
        // regardless of name reuse.
        {
          val names = scala.collection.mutable.Set.empty[String]
          var ci = 0
          var cut = prefix.size
          while (ci < prefix.size && cut == prefix.size) {
            val nm = prefix(ci)._1 + prefix(ci)._2
            if (symbolSet(nm) || names(nm)) cut = math.max(ci, 1)
            else { names += nm; ci += 1 }
          }
          prefix.remove(cut, prefix.size - cut)
        }
        val batch =
          if (prefix.size <= 1) prefix.toSeq
          else {
            // hazard job: for each occurrence of batch pair i, the
            // original left/right neighbor symbols bound every pair
            // the merge can create; cut the prefix where a created
            // pair could outrank the tail (strict — a tie is cut too:
            // the tie-break against an unmaterialized name is unknown)
            val pairIdx = prefix.zipWithIndex
              .map { case ((a, b, _), i) => (a, b) -> i }.toMap
            val bcIdx = spark.sparkContext.broadcast(pairIdx)
            val boundPerI = words.flatMap { case (syms, f) =>
              val idx = bcIdx.value
              val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
              var i = 0
              while (i < syms.length - 1) {
                idx.get((syms(i), syms(i + 1))).foreach { pi =>
                  val ab = syms(i) + syms(i + 1)
                  if (i > 0) out += ((pi, syms(i - 1), ab, f))
                  if (i + 2 < syms.length) out += ((pi, ab, syms(i + 2), f))
                }
                i += 1
              }
              out
            }.toDF("i", "nx", "ny", "f")
              .groupBy($"i", $"nx", $"ny").agg(sum($"f").as("cnt"))
              .groupBy($"i").agg(max($"cnt").as("bound"))
              .as[(Int, Long)].collect().toMap
            var t = prefix.size
            while (t > 1 && {
              val cT = prefix(t - 1)._3
              (0 until t).exists(i => boundPerI.getOrElse(i, 0L) >= cT)
            }) t -= 1
            prefix.take(t).toSeq
          }
        val rank0 = merges.size
        batch.zipWithIndex.foreach { case ((a, b, f), j) =>
          merges += ((rank0 + j, a, b, f))
        }
        batch.foreach { case (a, b, _) => symbolSet += a + b }
        val repl = batch.map { case (a, b, _) => (a, b) -> (a + b) }.toMap
        val bcRepl = spark.sparkContext.broadcast(repl)
        val prev = words
        val merged = words.map { case (syms, fr) =>
          val rp = bcRepl.value
          val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && rp.contains((syms(i), syms(i + 1)))) {
              out += rp((syms(i), syms(i + 1))); i += 2
            } else { out += syms(i); i += 1 }
          }
          (out.toSeq, fr)
        }
        // rolling persist + periodic lineage truncation: each pass's
        // top-K collect is the materializing action
        pass += 1
        words =
          (if (pass % 8 == 0) merged.localCheckpoint(false)
           else merged).persist()
        prev.unpersist()
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
