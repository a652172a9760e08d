package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline:
  * token statistics, quality scoring, n-gram-heuristic language ID, and
  * document fingerprinting (SURVEY §7.5).
  *
  * All pure Catalyst column expressions — they stay inside whole-stage
  * codegen and scale linearly with the corpus (no shuffle: every operator
  * here is a narrow map over documents).
  *
  * The reference only sketches text handling in its ingest notebook
  * (`/root/reference/examples/dad_jokes/Build Dad Jokes KB.ipynb` cell 5:
  * strip + dedup before add); these operators generalize that stage.
  */
object TextAnalysis {

  /** Tokenize on single spaces (the corpus contract; swap for `\\s+` on
    * messier corpora).
    */
  def tokens(text: Column): Column = split(text, " ")

  /** Unicode-aware tokenization for real corpora: lower-case, then every
    * maximal run of letters/digits (`[\p{L}\p{N}]+`) is a token — so
    * punctuation no longer glues tokens together (which distorts
    * shingles, minhash, and token stats under [[tokens]]). Extraction
    * (not split) sidesteps empty-string edge tokens, stays in codegen
    * (RegExpExtractAll — no higher-order filter), and is engine-portable:
    * DuckDB's `regexp_extract_all` with the same pattern produces the
    * identical list.
    */
  def tokensUnicode(text: Column): Column =
    regexp_extract_all(lower(text), lit("[\\p{L}\\p{N}]+"), lit(0))

  /** A 60-bit positive integer hash derived from md5 — chosen because it
    * is reproducible in any engine that has md5 (the DuckDB oracle
    * included), unlike engine-private hash functions.
    */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Per-document token statistics: whitespace tokens plus a BPE-ish
    * subword count (alpha runs / digit runs / other symbols — the
    * pre-tokenization split a byte-pair encoder starts from).
    * `unicode = true` switches to [[tokensUnicode]].
    */
  def tokenStats(docs: DataFrame, textCol: String = "text",
      unicode: Boolean = false): DataFrame = {
    val toks = if (unicode) tokensUnicode(col(textCol)) else tokens(col(textCol))
    docs.select(
      col("doc_id"),
      size(toks).as("n_tokens"),
      size(array_distinct(toks)).as("n_uniq"),
      size(regexp_extract_all(col(textCol), lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"), lit(0)))
        .as("n_bpe_pieces"),
      length(col(textCol)).as("n_chars"))
  }

  /** Greedy contiguous sequence packing — the "pack documents into
    * fixed-length training sequences" step of an LLM data pipeline:
    * within each `groupCol` shard, documents in `orderCol` order append
    * into `budgetTokens`-sized bins; a document's bin (and offset) is
    * where its first token lands, so documents may straddle bins —
    * exactly the concatenate-then-chop layout.
    *
    * One partitioned window prefix-sum, no global order: the shard key
    * bounds every sort, so the plan survives 100× (a global packing
    * would need a single-partition running sum). Deterministic given
    * the (groupCol, orderCol) order.
    *
    * `budgetBy` picks the unit the budget counts: `"tokens"`
    * (whitespace tokens — the corpus contract) or `"bpe_pieces"` (the
    * [[tokenStats]] BPE pre-tokenization split — what a real pipeline
    * packs by, since training sequences are measured in tokenizer
    * pieces, not words).
    */
  def packSequences(docs: DataFrame, budgetTokens: Long,
      groupCol: String = "lang", orderCol: String = "doc_id",
      textCol: String = "text", budgetBy: String = "tokens"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budgetTokens > 0, s"budgetTokens must be positive: $budgetTokens")
    val (unit, unitName) = budgetBy match {
      case "tokens" =>
        (size(tokens(col(textCol))).cast("long"), "n_tokens")
      case "bpe_pieces" =>
        (size(regexp_extract_all(col(textCol),
          lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"), lit(0))).cast("long"),
          "n_bpe_pieces")
      case other => throw new IllegalArgumentException(
        s"budgetBy must be 'tokens' or 'bpe_pieces': $other")
    }
    val w = Window.partitionBy(col(groupCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.select(col(orderCol), col(groupCol), unit.as(unitName))
      .withColumn("cum", sum(col(unitName)).over(w))
      .select(col(orderCol), col(groupCol), col(unitName),
        expr(s"(cum - $unitName) div $budgetTokens").as("bin"),
        expr(s"(cum - $unitName) % $budgetTokens").as("bin_offset"))
  }

  /** Deterministic hash sampling: keep a row iff its md5-derived bucket
    * (0-99) falls below `pct`. Engine-portable, reproducible, and — at
    * 100 TB — a narrow map with no RNG state or shuffle, unlike
    * `df.sample`.
    */
  def hashSample(df: DataFrame, keyCol: String, pct: Int,
      salt: String = "s0"): DataFrame =
    df.where(pmod(hash60(concat(col(keyCol), lit(":" + salt))), lit(100L)) < pct)

  /** Mixture sampling: per-stratum deterministic rates — the dataset
    * mixing step of a training pipeline (e.g. upsample rare languages).
    */
  def mixtureSample(df: DataFrame, stratumCol: String,
      rates: Map[String, Int], defaultPct: Int,
      keyCol: String = "doc_id"): DataFrame = {
    val pct = rates.foldLeft(lit(defaultPct)) { case (acc, (k, v)) =>
      when(col(stratumCol) === k, lit(v)).otherwise(acc)
    }
    df.where(pmod(hash60(concat(col(keyCol), lit(":mix"))), lit(100L)) < pct)
  }

  /** Temperature-scaled mixture sampling (the multinomial α-sampling of
    * multilingual/multi-source training mixes — Conneau & Lample 2019
    * §3.1; Raffel et al. 2020 §3.4.3 use the same p_s^α form): stratum
    * s keeps rate ⌊100·(n_min/n_s)^(1−α)⌋ %, so kept counts are
    * ∝ n_s^α — α=1 preserves the natural distribution (everything
    * kept), α→0 flattens toward uniform counts (every stratum
    * downsampled to ≈ n_min). The smallest stratum always keeps 100%:
    * a deterministic filter can only downsample, so flattening is
    * expressed as head-downsampling rather than tail-upsampling (the
    * kept RELATIVE proportions are identical). The gate is the same
    * md5 hash as [[hashSample]] — reproducible across engines and
    * appends within a stratum-count snapshot.
    *
    * Scale shape: one map-side-combinable stratum count (strata are
    * few), a global min over that stratum-sized frame, a broadcast join
    * of the per-stratum rates, then a narrow filter — the corpus itself
    * never shuffles. The rate is rounded at 6 dp before ⌊·⌋ so both
    * engines agree on representable-boundary cases.
    */
  def temperatureMixture(df: DataFrame, stratumCol: String, alpha: Double,
      keyCol: String = "doc_id", salt: String = "tmix"): DataFrame = {
    val n = df.groupBy(col(stratumCol))
      .agg(count(lit(1)).cast("double").as("ns"))
    // the smallest stratum size is one scalar: an aggregate + a
    // broadcast-singleton cross join (plans as BroadcastNestedLoopJoin
    // — allowed by the plan audit), never a window over an empty
    // partitionSpec (a single-partition funnel the audit bans)
    val rates = n
      .crossJoin(broadcast(n.agg(min(col("ns")).as("nmin"))))
      .select(col(stratumCol),
        least(lit(100L),
          floor(round(lit(100.0) * pow(col("nmin") / col("ns"), 1.0 - alpha), 6))
            .cast("long")).as("pct"))
    df.join(broadcast(rates), stratumCol)
      .where(pmod(hash60(concat(col(keyCol), lit(":" + salt))),
        lit(100L)) < col("pct"))
      .select(df.columns.map(col(_)): _*)
  }

  /** Stopword-ratio-based quality score in [0,1]: rewards length (up to
    * 200 tokens), lexical diversity, and stopword presence. Deterministic
    * closed form so the oracle can reproduce it bit-for-bit.
    */
  def qualityScore(docs: DataFrame, stopwords: Seq[String],
      textCol: String = "text"): DataFrame = {
    val toks = tokens(col(textCol))
    val nTok = size(toks).cast("double")
    val nUniq = size(array_distinct(toks)).cast("double")
    val nStop = size(array_intersect(array_distinct(toks),
      array(stopwords.map(lit): _*))).cast("double")
    docs.select(
      col("doc_id"),
      round(least(nTok / 200.0, lit(1.0)) * 0.5
        + (nUniq / nTok) * 0.3
        + (nStop / nUniq) * 0.2, 6).as("quality"))
  }

  /** Gopher-style rule-based quality filter (Rae et al. 2021, "Scaling
    * Language Models: Methods, Analysis & Insights from Training Gopher",
    * §A1.1 — public paper): per-document structural measurements plus
    * the keep/drop decision. Every measurement is a narrow map (no
    * shuffle), so the filter scales linearly with the corpus; the two
    * higher-order array folds (mean word length, alpha fraction) are
    * interpreted-but-cheap per-row lambdas, the rest stays in codegen.
    *
    * Rules (each must hold for `keep = 1`):
    *   - word count in [minWords, maxWords]
    *   - mean word length in [minMeanLen, maxMeanLen]
    *   - symbol-to-word ratio (`#` and `...` occurrences / words) below
    *     maxSymbolRatio
    *   - fraction of words containing a letter at least minAlphaFrac
    *   - at least minStopHits distinct stopwords present
    */
  def gopherQuality(docs: DataFrame, stopwords: Seq[String],
      textCol: String = "text",
      minWords: Int = 15, maxWords: Int = 100000,
      minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1, minAlphaFrac: Double = 0.8,
      minStopHits: Int = 1): DataFrame = {
    val toks = tokens(col(textCol))
    val nWords = size(toks).cast("double")
    val meanLen = aggregate(toks, lit(0L), (acc, t) => acc + length(t))
      .cast("double") / nWords
    val hashes = (length(col(textCol)) -
      length(regexp_replace(col(textCol), "#", ""))).cast("double")
    val ellipses = ((length(col(textCol)) -
      length(regexp_replace(col(textCol), "\\.\\.\\.", ""))) / 3).cast("double")
    val symbolRatio = (hashes + ellipses) / nWords
    val alphaFrac = size(filter(toks, t => t.rlike("[a-z]"))).cast("double") / nWords
    val stopHits = size(array_intersect(array_distinct(toks),
      array(stopwords.map(lit): _*))).cast("long")
    docs.select(
      col("doc_id"),
      nWords.cast("long").as("n_words"),
      round(meanLen, 6).as("mean_word_len"),
      round(symbolRatio, 6).as("symbol_ratio"),
      round(alphaFrac, 6).as("alpha_frac"),
      stopHits.as("stop_hits"),
      (nWords >= minWords && nWords <= maxWords &&
        meanLen >= minMeanLen && meanLen <= maxMeanLen &&
        symbolRatio < maxSymbolRatio &&
        alphaFrac >= minAlphaFrac &&
        stopHits >= minStopHits).cast("long").as("keep"))
  }

  /** Repetition ratio (Gopher §A1.1's "fraction of characters in the
    * most common n-gram" family, on token counts): the share of a
    * document's k-grams taken by its single most frequent k-gram —
    * boilerplate and degenerate repetition score high. Multiset
    * k-grams (unlike the dedup shingle sets), two narrow aggregations
    * keyed by doc_id — scales linearly, no corpus-wide state.
    */
  def repetitionRatio(docs: DataFrame, k: Int = 2,
      textCol: String = "text"): DataFrame = {
    // a PER-DOCUMENT metric, so computed per ROW in one narrow pass —
    // ZERO shuffles. (The original explode + groupBy(doc_id, g) +
    // groupBy(doc_id) formulation shuffled every n-gram occurrence
    // twice: at corpus scale that is trillions of ~20-byte rows
    // crossing the wire for a quantity each row already determines.)
    // A scalar UDF hash-counts the n-grams: the Column-only
    // alternative (transform → array_sort → aggregate) is also
    // shuffle-free but evaluates several INTERPRETED lambdas per
    // n-gram plus a sort — Catalyst higher-order functions don't
    // codegen, so the UDF gives up nothing and does one O(n) pass
    // (measured at sf0.1: 6.4 s grouped → 3.3 s HOF → ~1 s UDF).
    // The n-gram strings are built exactly as the oracle's
    // concat_ws(" ", tokens...) does, from the same tokens() split.
    val gramStats = udf { toks: scala.collection.Seq[String] =>
      if (toks == null || toks.length < k) None
      else {
        val counts = new java.util.HashMap[String, Long]()
        val n = toks.length - k + 1
        val sb = new java.lang.StringBuilder(32)
        var best = 0L
        var i = 0
        while (i < n) {
          sb.setLength(0)
          var j = 0
          while (j < k) {
            if (j > 0) sb.append(' ')
            sb.append(toks(i + j))
            j += 1
          }
          val c = counts.merge(sb.toString, 1L, (a, b) => a + b)
          if (c > best) best = c
          i += 1
        }
        Some((n.toLong, best))
      }
    }
    docs.select(col("doc_id"), gramStats(tokens(col(textCol))).as("m"))
      // docs with fewer than k tokens produced no exploded rows in the
      // original formulation; None → null preserves that contract
      .where(col("m").isNotNull)
      .select(col("doc_id"), col("m._1").as("n_ngrams"),
        round(col("m._2").cast("double") / col("m._1"), 6).as("top_frac"))
  }

  /** N-gram-heuristic language ID: score each candidate language by its
    * marker-token hits; argmax with a fixed precedence order, 'und' when
    * nothing matches.
    */
  def langId(docs: DataFrame, markers: Seq[(String, Seq[String])],
      textCol: String = "text"): DataFrame = {
    val uniq = array_distinct(tokens(col(textCol)))
    val scores = markers.map { case (lang, words) =>
      lang -> size(array_intersect(uniq, array(words.map(lit): _*)))
    }
    // chained argmax, ties to the earlier language in `markers`; 'und'
    // when no marker hits at all
    val pred = scores.zipWithIndex.foldLeft(when(lit(false), "")) {
      case (acc, ((lang, s), i)) =>
        val laterScores = scores.drop(i + 1).map(_._2)
        val beatsLater = laterScores.foldLeft(s > 0) { (c, o) => c && s >= o }
        acc.when(beatsLater, lang)
    }.otherwise("und")
    docs.select(col("doc_id"), col("lang"), pred.as("lang_pred"))
  }

  /** Canonicalizing document fingerprint: md5 over lower-cased,
    * whitespace-collapsed text, plus its 60-bit integer form for compact
    * join keys. The exact-dedup operator groups on this.
    */
  def fingerprint(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val canon = regexp_replace(lower(trim(col(textCol))), "\\s+", " ")
    docs.select(
      col("doc_id"),
      md5(canon).as("fp_md5"),
      hash60(canon).as("fp60"))
  }

  /** Default PII patterns: (category, regex, replacement token). The
    * regexes stay inside the portable intersection of Java regex and
    * RE2 (character classes, bounded repetition, ASCII `\b` — no
    * lookaround), so an external auditor can re-run them in any engine.
    */
  val defaultPiiPatterns: Seq[(String, String, String)] = Seq(
    ("email", """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}""",
      "[EMAIL]"),
    ("phone", """\b\d{3}-\d{3}-\d{4}\b""", "[PHONE]"),
    ("ip", """\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b""", "[IP]"))

  /** PII redaction — the masking stage every published curation pipeline
    * runs before training (emails / phone numbers / IP addresses here;
    * the pattern table is caller-extensible). Patterns apply in order,
    * each replacing ALL its matches with the category token; per-category
    * match counts are taken on the ORIGINAL text so the audit columns are
    * independent of application order.
    *
    * Scale shape: a narrow per-row map of codegen'd `regexp_replace` /
    * `regexp_extract_all` — no shuffle, no UDF; safe directly behind a
    * 100 TB scan.
    *
    * Output: (doc_id, red, n_<category>..., n_pii).
    */
  def piiRedact(docs: DataFrame, textCol: String = "text",
      patterns: Seq[(String, String, String)] = defaultPiiPatterns)
      : DataFrame = {
    require(patterns.nonEmpty, "piiRedact: no patterns")
    val red = patterns.foldLeft(col(textCol)) { case (c, (_, re, tok)) =>
      regexp_replace(c, re, tok)
    }
    val counts = patterns.map { case (cat, re, _) =>
      size(regexp_extract_all(col(textCol), lit(re), lit(0)))
        .cast("long").as(s"n_$cat")
    }
    docs.select((col("doc_id") +: red.as("red") +: counts): _*)
      .withColumn("n_pii",
        patterns.map { case (cat, _, _) => col(s"n_$cat") }.reduce(_ + _))
  }

  /** Per-source (domain-level) corpus statistics — the aggregation
    * behind RefinedWeb-style source filtering: document count, mean
    * heuristic quality, and exact-duplicate count per source, ready
    * for a threshold decision over whole domains rather than single
    * documents. One groupBy over per-doc narrow maps — partial
    * aggregation keeps the shuffle at #sources × #map-partitions rows.
    *
    * Output: (source, n_docs, mean_quality, n_dup_docs).
    */
  def sourceStats(docs: DataFrame, stopwords: Seq[String],
      textCol: String = "text"): DataFrame = {
    val q = qualityScore(docs, stopwords, textCol)
    val fp = fingerprint(docs, textCol)
    docs.select(col("doc_id"), col("source"))
      .join(q, Seq("doc_id"))
      .join(fp.select(col("doc_id"), col("fp_md5")), Seq("doc_id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        round(avg(col("quality")), 6).as("mean_quality"),
        (count(lit(1)) - countDistinct(col("fp_md5"))).as("n_dup_docs"))
  }

  /** CCNet-style n-gram LM perplexity scoring: train an add-alpha
    * smoothed BIGRAM model on the corpus itself, score every document
    * by perplexity under it — the classic "does this read like the
    * corpus" quality filter (low = fluent/typical, high = noise), run
    * before training-data selection. `p(w2|w1) = (c(w1,w2) + alpha) /
    * (c(w1·) + alpha·V)`, `ppl = exp(-mean ln p)` over the doc's
    * bigrams.
    *
    * Scale shape: two count aggregations over the exploded bigram
    * stream (map-side combinable), rejoined to the stream by bigram /
    * context key — all declarative, so Catalyst broadcasts the count
    * tables when the vocabulary is small and shuffle-joins otherwise;
    * nothing touches the driver. The vocabulary size enters as a
    * broadcast one-row aggregate, not a collected scalar.
    *
    * Output: (doc_id, n_bigrams, ppl) — ppl rounded to 4 dp, 0.0 for
    * docs with fewer than two tokens.
    */
  def ngramPerplexity(docs: DataFrame, textCol: String = "text",
      alpha: Double = 1.0, unicode: Boolean = false): DataFrame = {
    require(alpha > 0, s"alpha must be > 0, got $alpha")
    val arr = if (unicode) tokensUnicode(col(textCol)) else tokens(col(textCol))
    val toks = docs.select(col("doc_id"), arr.as("a"))
    val vdf = toks.select(explode(col("a")).as("t"))
      .agg(countDistinct(col("t")).cast("double").as("vs"))
    val bg = toks.select(col("doc_id"), explode(arrays_zip(
        slice(col("a"), lit(1), size(col("a")) - 1).as("w1"),
        slice(col("a"), lit(2), size(col("a")) - 1).as("w2"))).as("p"))
      .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
    val cb = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("nb"))
    val cu = bg.groupBy(col("w1")).agg(count(lit(1)).as("nu"))
    val agg = bg
      .join(cb, Seq("w1", "w2")).join(cu, Seq("w1"))
      .crossJoin(broadcast(vdf))
      .select(col("doc_id"),
        log((col("nb") + alpha) / (col("nu") + col("vs") * alpha))
          .as("logp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(exp(-avg(col("logp"))), 4).as("ppl"))
    docs.select(col("doc_id"))
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("ppl"), lit(0.0)).as("ppl"))
  }

  /** Canonical text normalization — the first stage of every web-scale
    * ingest pipeline: Unicode NFC composition (via the codegen'd
    * [[graft.functions.NfcNormalize]] expression), lower-casing, and
    * whitespace collapse/trim. Everything downstream (fingerprints,
    * shingles, token stats) then sees one canonical form, so visually
    * identical documents that differ only in combining-character
    * encoding or spacing dedup together.
    *
    * A narrow per-row map of codegen'd expressions — no shuffle, no UDF.
    * Output: (doc_id, norm, changed).
    */
  def normalizeText(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val norm = trim(regexp_replace(
      lower(graft.functions.NfcNormalize.nfc(col(textCol))), "\\s+", " "))
    docs.select(col("doc_id"), norm.as("norm"),
      (norm =!= col(textCol)).as("changed"))
  }

  /** Deterministic stratified sampling: EXACTLY `min(n, |stratum|)` rows
    * per stratum, chosen by md5-derived hash order (so the sample is
    * reproducible across runs and engines, unlike `sampleBy`'s
    * per-fraction Bernoulli draw which can't hit an exact count).
    *
    * Scale shape: one window rank per stratum — the partition key bounds
    * every sort, so no global order exists; skew is bounded by the
    * largest stratum, the same bound any per-stratum operation has.
    * Output: input columns + sample_rank (1-based within stratum).
    */
  def stratifiedSample(df: DataFrame, stratumCol: String, n: Int,
      keyCol: String = "doc_id", salt: String = "strat"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(n > 0, s"n must be positive: $n")
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(hash60(concat(col(keyCol).cast("string"), lit(":" + salt))),
        col(keyCol))
    df.withColumn("sample_rank", row_number().over(w).cast("long"))
      .where(col("sample_rank") <= n)
  }

  /** Deterministic train/val/test split assignment: each row's
    * md5-derived bucket (0-99) maps through the cumulative `weights`
    * (label, pct) list — e.g. `Seq("train"->80, "val"->10, "test"->10)`.
    * Hash-keyed, so membership is a pure function of the key: re-runs,
    * engines, and incremental appends all agree, and a document can
    * never migrate between splits as the corpus grows (the property
    * random splits lack).
    *
    * A narrow map — no shuffle, no RNG state. Output: input columns +
    * split_bucket + split.
    */
  def assignSplit(df: DataFrame, weights: Seq[(String, Int)],
      keyCol: String = "doc_id", salt: String = "split"): DataFrame = {
    require(weights.nonEmpty && weights.map(_._2).sum == 100,
      s"split weights must sum to 100: $weights")
    val bucket = pmod(
      hash60(concat(col(keyCol).cast("string"), lit(":" + salt))), lit(100L))
    val bounds = weights.scanLeft(0) { case (acc, (_, w)) => acc + w }.tail
    val label = weights.zip(bounds).init.foldRight(
      lit(weights.last._1): Column) { case (((name, _), hi), acc) =>
      when(bucket < hi, lit(name)).otherwise(acc)
    }
    df.withColumn("split_bucket", bucket).withColumn("split", label)
  }

  /** Length-bucketed batch assignment — the "bucket by sequence length,
    * then batch within bucket" step that minimizes padding waste when
    * training on variable-length documents: documents with token counts
    * in the same `bucketTokens`-wide band go to the same bucket; within
    * a bucket, hash order assigns batch index and position
    * deterministically. Padding cost per batch is bounded by
    * `bucketTokens - 1` tokens per sequence by construction.
    *
    * Same scale shape as [[stratifiedSample]]: one window rank per
    * bucket, partition-bounded sort, no global order.
    * Output: (keyCol, n_tokens, bucket, batch_idx, pos_in_batch).
    */
  def batchByLength(docs: DataFrame, batchSize: Int,
      bucketTokens: Int = 64, textCol: String = "text",
      keyCol: String = "doc_id", unicode: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(batchSize > 0 && bucketTokens > 0,
      s"batchSize and bucketTokens must be positive: $batchSize, $bucketTokens")
    val toks = if (unicode) tokensUnicode(col(textCol)) else tokens(col(textCol))
    val w = Window.partitionBy(col("bucket"))
      .orderBy(hash60(concat(col(keyCol).cast("string"), lit(":lb"))),
        col(keyCol))
    docs.select(col(keyCol), size(toks).cast("long").as("n_tokens"))
      .withColumn("bucket", expr(s"n_tokens div $bucketTokens"))
      .withColumn("rn", (row_number().over(w) - 1).cast("long"))
      .select(col(keyCol), col("n_tokens"), col("bucket"),
        expr(s"rn div $batchSize").as("batch_idx"),
        expr(s"rn % $batchSize").as("pos_in_batch"))
  }

  /** Sliding-window chunking with overlap — the RAG / context-window
    * preparation step: each document yields chunks of `chunkTokens`
    * tokens whose starts step by `stride` (stride < chunkTokens ⇒
    * consecutive chunks overlap by `chunkTokens - stride` tokens, the
    * usual retrieval-chunking layout; the reference's `chunkify` is the
    * degenerate stride == chunk case, `util.py` via `kb.py:233`).
    *
    * A narrow map + explode: chunk count is ceil(n/stride) per document,
    * so output volume is (chunkTokens/stride)× the corpus — linear, no
    * shuffle, stays in whole-stage codegen (sequence/slice/array_join).
    * The final chunk may be shorter than `chunkTokens`; a document
    * always yields at least one chunk.
    *
    * Output: (doc_id, chunk_id, chunk_start, chunk_text, n_chunk_tokens).
    */
  def chunkOverlap(docs: DataFrame, chunkTokens: Int, stride: Int,
      textCol: String = "text", unicode: Boolean = false): DataFrame = {
    require(chunkTokens > 0 && stride > 0 && stride <= chunkTokens,
      s"need 0 < stride <= chunkTokens: chunk=$chunkTokens stride=$stride")
    val toks = if (unicode) tokensUnicode(col(textCol)) else tokens(col(textCol))
    docs.select(col("doc_id"), toks.as("s"))
      .select(col("doc_id"), col("s"),
        explode(sequence(lit(0), greatest(size(col("s")) - 1, lit(0)),
          lit(stride))).as("st"))
      .select(col("doc_id"),
        expr(s"st div $stride").cast("long").as("chunk_id"),
        col("st").cast("long").as("chunk_start"),
        array_join(slice(col("s"), col("st") + 1, lit(chunkTokens)), " ")
          .as("chunk_text"),
        size(slice(col("s"), col("st") + 1, lit(chunkTokens))).cast("long")
          .as("n_chunk_tokens"))
  }

  /** Tokenizer-coverage statistics: per-document out-of-vocabulary rate
    * against the corpus's own top-`vocabSize` terms (the fixed-vocab
    * coverage check run before committing to a tokenizer). The vocabulary
    * is vocabulary-sized, not corpus-sized, so it broadcasts; the per-doc
    * pass is one explode + broadcast left join + keyed agg — linear at
    * 100 TB with no corpus shuffle beyond the doc_id agg.
    *
    * Output: (doc_id, n_tokens, n_oov, oov_rate).
    */
  def oovStats(docs: DataFrame, vocabSize: Int, textCol: String = "text",
      unicode: Boolean = false): DataFrame = {
    require(vocabSize > 0, s"vocabSize must be positive: $vocabSize")
    val vocab = TextRetrieval.vocabTopK(docs, vocabSize, textCol, unicode)
      .select(col("term"), lit(1).as("in_vocab"))
    val toks = if (unicode) tokensUnicode(col(textCol)) else tokens(col(textCol))
    docs.select(col("doc_id"), explode(toks).as("term"))
      .join(broadcast(vocab), Seq("term"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col("doc_id"), col("n_tokens"), col("n_oov"),
        round(col("n_oov").cast("double") / col("n_tokens"), 6).as("oov_rate"))
  }

  /** DSIR-style hashed-bigram importance weights (Xie et al. 2023,
    * "Data Selection for Language Models via Importance Resampling"):
    * score every raw document by how target-like its hashed n-gram
    * profile is. Bigrams hash into `buckets` buckets; each corpus gets
    * add-1-smoothed bucket probabilities; a document's log-weight is
    * Σ_b c_b(x) · (ln p_target(b) − ln p_raw(b)). Selecting top-weight
    * (or Gumbel-resampling on the weights) yields the target-matched
    * subset.
    *
    * Scale shape: both bucket tables are `buckets`-sized (broadcast);
    * the raw pass is explode → broadcast join → keyed agg — linear, no
    * corpus shuffle beyond the doc_id agg. Deterministic and
    * engine-portable (md5-derived bucket hash, closed-form smoothing).
    * Buckets unseen in raw cannot appear in a raw document, so the
    * log-ratio table only needs raw-observed buckets.
    *
    * Output: (doc_id, n_bigrams, log_weight) for every raw document
    * (docs with < 2 tokens get n_bigrams = 0, log_weight = 0).
    */
  def importanceWeights(raw: DataFrame, target: DataFrame, buckets: Int = 64,
      textCol: String = "text", unicode: Boolean = false): DataFrame = {
    require(buckets > 0, s"buckets must be positive: $buckets")
    def bigramBuckets(df: DataFrame) = {
      val toks = if (unicode) tokensUnicode(col(textCol)) else tokens(col(textCol))
      df.select(col("doc_id"), toks.as("s"))
        .select(col("doc_id"), explode(when(size(col("s")) >= 2,
          expr("transform(sequence(1, size(s) - 1), i -> concat(element_at(s, i), ' ', element_at(s, i + 1)))"))
          .otherwise(array().cast("array<string>"))).as("g"))
        .select(col("doc_id"), pmod(hash60(col("g")), lit(buckets.toLong)).as("bk"))
    }
    val rawBk = bigramBuckets(raw)
    val rawCnt = rawBk.groupBy(col("bk"))
      .agg(count(lit(1)).cast("double").as("rc"))
    val tgtCnt = bigramBuckets(target).groupBy(col("bk"))
      .agg(count(lit(1)).cast("double").as("tc"))
    val totals = rawCnt.agg(sum(col("rc")).as("rt")).crossJoin(
      tgtCnt.agg(coalesce(sum(col("tc")), lit(0.0)).as("tt")))
    // log-ratio per raw-observed bucket: tiny (≤ buckets rows), broadcast
    val lr = rawCnt.join(tgtCnt, Seq("bk"), "left").crossJoin(totals)
      .select(col("bk"),
        (log((coalesce(col("tc"), lit(0.0)) + 1.0) / (col("tt") + buckets)) -
         log((col("rc") + 1.0) / (col("rt") + buckets))).as("lw"))
    val scored = rawBk.join(broadcast(lr), Seq("bk"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), round(sum(col("lw")), 6).as("lwsum"))
    raw.select(col("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("lwsum"), lit(0.0)).as("log_weight"))
  }

  /** Per-group keep-rate calibration (the "keep the best X% of every
    * language/source" step of DataComp/CCNet-style pipelines): within
    * each group, rank by (score desc, doc_id asc) and keep the top
    * `ceil(keepRate · n_group)` rows. Rank-based rather than an
    * interpolated quantile threshold on purpose — pure integer cutoff
    * logic, deterministic under score ties, and engine-portable with
    * no quantile-interpolation FP hazard (the oracle is the identical
    * window).
    *
    * Scale shape: one ranking window + one count window, both
    * partitioned by the group — groups parallelize, the sort is
    * spill-backed; no global window, no collect.
    */
  def keepTopRate(scored: DataFrame, groupCol: String, scoreCol: String,
      keepRate: Double, idCol: String = "doc_id"): DataFrame = {
    require(keepRate > 0.0 && keepRate <= 1.0, s"keepRate: $keepRate")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol))
      .orderBy(desc(scoreCol), col(idCol))
    val cw = Window.partitionBy(col(groupCol))
    scored
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("n_group", count(lit(1)).over(cw))
      .where(col("rk") <= ceil(col("n_group") * keepRate).cast("long"))
  }

  /** Per-group TOKEN-BUDGET selection (the data-mixing step "take the
    * best `budget` tokens from each source"): within each group, order
    * by (score desc, id asc) and keep rows while the RUNNING total of
    * `costCol` stays within `budget` — the strict-prefix rule, so the
    * kept set is a deterministic function of the scores (a large doc
    * at the boundary blocks the tail, the standard greedy-prefix
    * semantics). Same partitioned-window scale shape as
    * [[keepTopRate]].
    */
  def budgetSelect(docs: DataFrame, groupCol: String, scoreCol: String,
      costCol: String, budget: Long, idCol: String = "doc_id"): DataFrame = {
    require(budget > 0, s"budget: $budget")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol))
      .orderBy(desc(scoreCol), col(idCol))
    docs
      .withColumn("cum_cost", sum(col(costCol)).over(w))
      .where(col("cum_cost") <= budget)
  }

  /** CCNet head/middle/tail perplexity bucketing (Wenzek et al. 2020,
    * "CCNet: Extracting High Quality Monolingual Datasets from Web
    * Crawl Data" §4.3): score every document by corpus-trained bigram
    * perplexity ([[ngramPerplexity]]), then PER LANGUAGE split the
    * corpus into equal thirds by perplexity rank — `head` (most
    * fluent), `middle`, `tail` (noisiest). The bucket is the standard
    * downstream selection unit (train on head+middle, drop tail).
    *
    * Rank-based terciles, not interpolated quantile thresholds: the
    * cut is `percent_rank` over (round(ppl, 4) asc, doc_id asc) — a
    * unique ordering, so the bucket is a deterministic integer-rank
    * function with no quantile-interpolation FP hazard.
    *
    * Scale shape: the perplexity pipeline's map-side-combinable count
    * aggregations + one ranking window PARTITIONED by language —
    * languages parallelize, each partition's sort is spill-backed; no
    * global window, no collect.
    */
  def pplBuckets(docs: DataFrame, groupCol: String = "lang",
      textCol: String = "text", alpha: Double = 1.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ppl = ngramPerplexity(docs, textCol, alpha)
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("ppl"), col("doc_id"))
    docs.select(col("doc_id"), col(groupCol))
      .join(ppl, Seq("doc_id"))
      .withColumn("pr", percent_rank().over(w))
      .select(col("doc_id"), col(groupCol), col("n_bigrams"), col("ppl"),
        when(col("pr") * 3 < 1, "head")
          .when(col("pr") * 3 < 2, "middle")
          .otherwise("tail").as("bucket"))
  }

  /** UniMax mixing allocation (Chung et al. 2023, "UniMax: Fairer and
    * More Effective Language Sampling for Large-Scale Multilingual
    * Pretraining"): given per-group token counts `c_g`, a total token
    * budget `B`, and a repeat cap `maxEpochs`, allocate budget by
    * WATERFILLING — every group gets `min(c_g · maxEpochs, λ)` tokens,
    * with the water level λ chosen so the allocations sum to `B`
    * (small groups saturate their epoch cap, large groups share the
    * remainder uniformly). The closed form over caps sorted ascending:
    * λ = (B − S_{i−1}) / (n − i + 1) at the first i where that value
    * is ≤ cap_i (S = prefix sum of caps); if Σcap ≤ B every group is
    * fully capped.
    *
    * Scale shape: one map-side-combinable token-count aggregation over
    * the corpus; the waterfilling itself runs on the GROUP table,
    * whose cardinality is provider-bounded (languages/sources — the
    * same bound as the centroid collects elsewhere), so λ is computed
    * driver-side from a #groups-sized collect and applied back as a
    * literal — no global window in the distributed plan.
    *
    * Output: (group, tokens, alloc, epochs), alloc/epochs rounded to
    * 4 dp; `budgetFrac` sets B as a fraction of total corpus tokens so
    * the operator is scale-free across SFs.
    */
  def unimaxAllocate(docs: DataFrame, groupCol: String = "lang",
      textCol: String = "text", budgetFrac: Double = 0.5,
      maxEpochs: Double = 2.0): DataFrame = {
    require(budgetFrac > 0 && maxEpochs > 0,
      s"budgetFrac: $budgetFrac, maxEpochs: $maxEpochs")
    val counts = docs
      .select(col(groupCol), size(tokens(col(textCol))).cast("long").as("nt"))
      .groupBy(col(groupCol)).agg(sum(col("nt")).as("tokens"))
    // #groups-sized collect (languages/sources — bounded), the same
    // driver-scale exception as the IVF centroid tables
    val caps = counts.select(col("tokens")).collect()
      .map(_.getLong(0).toDouble * maxEpochs).sorted
    val budget = budgetFrac * caps.map(_ / maxEpochs).sum // B = budgetFrac × Σ c_g
    val lambda =
      if (caps.sum <= budget) Double.MaxValue
      else {
        val n = caps.length
        var s = 0.0; var i = 0; var lam = budget / n
        var done = false
        while (i < n && !done) {
          val cand = (budget - s) / (n - i)
          if (cand <= caps(i)) { lam = cand; done = true }
          else s += caps(i)
          i += 1
        }
        lam
      }
    counts.select(col(groupCol), col("tokens"),
      round(least(col("tokens") * maxEpochs, lit(lambda)), 4).as("alloc"),
      round(least(col("tokens") * maxEpochs, lit(lambda)) / col("tokens"), 4)
        .as("epochs"))
  }

  /** Interpolated Kneser–Ney bigram scoring (Kneser & Ney 1995; Chen &
    * Goodman 1999 §2.7) — the stronger sibling of the add-alpha model
    * in [[ngramPerplexity]], standard for perplexity-based quality
    * filtering when the corpus LM must not over-penalize rare-but-real
    * continuations:
    * {{{
    * P(w2|w1) = max(c(w1,w2) − D, 0) / c(w1·)
    *          + D · N1+(w1,·) / c(w1·) · N1+(·,w2) / N1+(··)
    * }}}
    * with absolute discount `D` (0.75, the Chen–Goodman default). The
    * model is trained on the scored corpus itself, so every document
    * bigram has c(w1,w2) ≥ 1 and the formula needs no unseen-context
    * fallback.
    *
    * Scale shape: mirrors [[ngramPerplexity]] — four count/distinct
    * aggregations over the exploded bigram stream (all map-side
    * combinable), rejoined by bigram / context / continuation key;
    * Catalyst broadcasts the count tables when the vocabulary is small
    * and shuffle-joins otherwise. Nothing touches the driver.
    *
    * Output: (doc_id, n_bigrams, kn_ppl) — exp(−mean ln P), 4 dp, 0.0
    * for docs with fewer than two tokens.
    */
  def knPerplexity(docs: DataFrame, textCol: String = "text",
      discount: Double = 0.75): DataFrame = {
    require(discount > 0 && discount < 1, s"discount: $discount")
    val toks = docs.select(col("doc_id"), tokens(col(textCol)).as("a"))
    val bg = toks.select(col("doc_id"), explode(arrays_zip(
        slice(col("a"), lit(1), size(col("a")) - 1).as("w1"),
        slice(col("a"), lit(2), size(col("a")) - 1).as("w2"))).as("p"))
      .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
    val cb = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("nb"))
    val cu = cb.groupBy(col("w1")).agg(sum(col("nb")).as("nu"),
      count(lit(1)).as("fan")) // c(w1·), N1+(w1,·)
    val cont = cb.groupBy(col("w2")).agg(count(lit(1)).as("hist")) // N1+(·,w2)
    val types = cb.agg(count(lit(1)).cast("double").as("nbt")) // N1+(··)
    val agg = bg
      .join(cb, Seq("w1", "w2")).join(cu, Seq("w1")).join(cont, Seq("w2"))
      .crossJoin(broadcast(types))
      .select(col("doc_id"),
        log(greatest(col("nb") - discount, lit(0.0)) / col("nu")
          + lit(discount) * col("fan") / col("nu")
            * (col("hist") / col("nbt"))).as("logp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(exp(-avg(col("logp"))), 4).as("kn_ppl"))
    docs.select(col("doc_id"))
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("kn_ppl"), lit(0.0)).as("kn_ppl"))
  }
}
