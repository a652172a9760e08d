package graft

import graft.ops.Bpe

/** BPE merge learning + encoding against the hand-computed example
  * corpus of the BPE paper's genre (low/lower/newest/widest).
  */
class BpeSpec extends SparkSpec {

  private lazy val corpus = {
    import spark.implicits._
    Seq(
      (1L, "low low low low low"),
      (2L, "lower lower"),
      (3L, "newest newest newest newest newest newest"),
      (4L, "widest widest widest"))
      .toDF("doc_id", "text")
  }

  test("bpeTrain learns the hand-computed merges in deterministic order") {
    // word freqs: low:5 lower:2 newest:6 widest:3
    // pair counts round 1: (e,s)=9 (s,t)=9 (t,</w>)=9 (w,e)=8 (l,o)=7
    //   (o,w)=7 ... -> lexicographic tie-break picks (e,s)
    // round 2: (es,t)=9 (t,</w>)=9 -> (es,t); round 3: (est,</w>)=9
    // round 4: (l,o)=7 beats (o,w)=7 on left asc; (w,e) fell to 2
    val m = Bpe.bpeTrain(corpus, numMerges = 4).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(m.toSeq == Seq(
      (0, "e", "s", 9L),
      (1, "es", "t", 9L),
      (2, "est", "</w>", 9L),
      (3, "l", "o", 7L)))
  }

  test("bpeTrain stops early when the vocabulary is fully merged") {
    import spark.implicits._
    val tiny = Seq((1L, "ab ab")).toDF("doc_id", "text")
    // a+b, ab+</w> — then nothing is left to merge
    val m = Bpe.bpeTrain(tiny, numMerges = 10).collect()
    assert(m.length == 2)
  }

  test("bpeEncode applies merges greedily by rank") {
    import spark.implicits._
    val merges = Bpe.bpeTrain(corpus, numMerges = 4)
    // "lowest": l o w e s t </w> -> es -> est -> est</w> -> lo
    val enc = Bpe.bpeEncode(
      Seq((9L, "lowest low")).toDF("doc_id", "text"), merges)
      .collect().head
    assert(enc.getSeq[String](1) ==
      Seq("lo", "w", "est</w>", "lo", "w", "</w>"))
    assert(enc.getLong(2) == 6L)
  }

  test("batched passes are exactly greedy-equivalent: batchB=16 and " +
      "batchB=1 learn identical merge tables on a mixed corpus") {
    import spark.implicits._
    // a corpus rich enough that batches genuinely form (disjoint
    // high-count pairs) AND hazards genuinely cut (shared symbols,
    // created-pair ties) — randomized words over a small alphabet
    val rnd = new java.util.Random(42)
    val alpha = "abcdefgh"
    val docs = (1L to 60L).map { id =>
      val words = (0 until 30).map { _ =>
        val len = 2 + rnd.nextInt(5)
        (0 until len).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      }
      (id, words.mkString(" "))
    }.toDF("doc_id", "text")
    val sequential = Bpe.bpeTrain(docs, numMerges = 30, batchB = 1)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    val batched = Bpe.bpeTrain(docs, numMerges = 30, batchB = 16)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(batched == sequential,
      "batched BPE must reproduce the sequential greedy merge table exactly")
  }

  test("created-name collisions don't break greedy equivalence: batched " +
      "== sequential on a 2-letter repeat-heavy corpus") {
    import spark.implicits._
    // alphabet {a,b} makes created symbol names string-collide readily
    // ((aa,b) and (a,ab) both create "aab"; such pairs are
    // symbol-DISJOINT, so without the collision guard they can land in
    // one batch and boost each other's created pairs mid-batch) — the
    // exact hazard ADVICE r9 flagged. Fuzz with many merges and assert
    // exact equality with the per-merge loop.
    val rnd = new java.util.Random(7)
    val docs = (1L to 40L).map { id =>
      val words = (0 until 25).map { _ =>
        val len = 2 + rnd.nextInt(7)
        (0 until len).map(_ => if (rnd.nextBoolean()) "a" else "b").mkString
      }
      (id, words.mkString(" "))
    }.toDF("doc_id", "text")
    val sequential = Bpe.bpeTrain(docs, numMerges = 50, batchB = 1)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    val batched = Bpe.bpeTrain(docs, numMerges = 50, batchB = 16)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(batched == sequential,
      "batched BPE must stay greedy-exact under created-name collisions")
  }

  test("bpeDecode inverts bpeEncode (lossless round-trip)") {
    import spark.implicits._
    val docs = Seq((1L, "low lowest low"), (2L, "newer wider low"))
      .toDF("doc_id", "text")
    val merges = graft.ops.Bpe.bpeTrain(docs, numMerges = 6)
    val enc = graft.ops.Bpe.bpeEncode(docs, merges)
    val dec = graft.ops.Bpe.bpeDecode(enc)
      .orderBy($"doc_id").collect().map(_.getString(1)).toSeq
    assert(dec == Seq("low lowest low", "newer wider low"))
  }
}
