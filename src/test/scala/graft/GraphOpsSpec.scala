package graft

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, GraphOps}

class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank: ranks sum to 1 and a pure sink outranks its sources") {
    // star: 1,2,3 → 4 (4 is dangling)
    val e = Seq((1L, 4L), (2L, 4L), (3L, 4L)).toDF("src", "dst")
    val r = GraphOps.pageRank(e, iters = 10)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(math.abs(r.values.sum - 1.0) < 1e-9)
    assert(r(4L) > r(1L))
    assert(r(1L) == r(2L) && r(2L) == r(3L)) // symmetric sources tie
  }

  test("pageRank: dangling mass is redistributed (no rank leaks)") {
    // chain with a dangling tail: 1 → 2 → 3
    val e = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val sum0 = GraphOps.pageRank(e, iters = 0)
      .agg(org.apache.spark.sql.functions.sum($"rank")).head.getDouble(0)
    val sum5 = GraphOps.pageRank(e, iters = 5)
      .agg(org.apache.spark.sql.functions.sum($"rank")).head.getDouble(0)
    assert(math.abs(sum0 - 1.0) < 1e-9 && math.abs(sum5 - 1.0) < 1e-9)
  }

  test("pageRank: matches the hand-computed first iteration") {
    // 1 → 2, 1 → 3; N = 3, d = 0.85, r0 = 1/3 each.
    // dangling mass = r(2)+r(3) = 2/3
    // r1(1) = 0.15/3 + 0.85*(2/3/3)           (dangling share only)
    // r1(2) = 0.15/3 + 0.85*(1/3/2 + 2/3/3)   (half of 1's rank + share)
    val e = Seq((1L, 2L), (1L, 3L)).toDF("src", "dst")
    val r = GraphOps.pageRank(e, iters = 1)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    val n = 3.0
    val dang = 2.0 / 3.0
    val exp1 = (1.0 - 0.85) / n + 0.85 * (dang / n)
    val exp2 = (1.0 - 0.85) / n + 0.85 * (1.0 / 3.0 / 2.0 + dang / n)
    assert(math.abs(r(1L) - exp1) < 1e-12)
    assert(math.abs(r(2L) - exp2) < 1e-12)
    assert(math.abs(r(3L) - exp2) < 1e-12)
  }

  test("ewma: hand-computed fold, per-key isolation, ts-then-id order") {
    val ev = Seq(
      (1L, 10L, 100L, 4.0), (1L, 11L, 200L, 8.0), (1L, 12L, 300L, 2.0),
      // same ts -> event_id breaks the tie (13 before 14)
      (2L, 14L, 100L, 10.0), (2L, 13L, 100L, 0.0))
      .toDF("user_id", "event_id", "ts", "value")
    val r = graft.ops.TimeJoins.ewma(ev, alpha = 0.5)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        x.getDouble(3))).toSet
    assert(r == Set(
      (1L, 10L, 1L, 4.0), (1L, 11L, 2L, 6.0), (1L, 12L, 3L, 4.0),
      (2L, 13L, 1L, 0.0), (2L, 14L, 2L, 5.0)))
  }

  test("semanticContamination: planted leak found, clean docs absent, " +
       "sketch path agrees with exact on the found pairs") {
    val rnd = new scala.util.Random(7)
    def unit(d: Int): Array[Float] = {
      val v = Array.fill(d)(rnd.nextGaussian().toFloat)
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / n)
    }
    val d = 32
    val train = (0L until 40L).map(i => (i, unit(d)))
    // test doc 1000 = exact copy of train doc 3 (cos 1.0); 1001..1010 random
    val test = Seq((1000L, train(3)._2)) ++
      (1001L to 1010L).map(i => (i, unit(d)))
    val trDf = train.toDF("vec_id", "embedding")
    val teDf = test.toDF("vec_id", "embedding")
    val exact = Dedup.semanticContamination(trDf, teDf, threshold = 0.95)
      .collect()
    assert(exact.length == 1)
    assert(exact.head.getLong(0) == 1000L)
    assert(exact.head.getLong(1) == 3L)
    assert(exact.head.getDouble(3) >= 0.999999)
    // force the sketch path (exactLimit = 0) — the planted near-exact
    // duplicate is the easiest possible recall case; result must agree
    val sk = Dedup.semanticContamination(trDf, teDf, threshold = 0.95,
      exactLimit = 0L).collect()
    assert(sk.map(r => (r.getLong(0), r.getLong(1))).toSet ==
      exact.map(r => (r.getLong(0), r.getLong(1))).toSet)
  }

  test("triangleCounts: known graph, duplicate/reversed edges and " +
      "self-loops ignored") {
    import spark.implicits._
    // K4 on {1,2,3,4} (every node in C(3,2)=3 triangles), a pendant 5-1
    // (0 triangles), plus noise: a reversed duplicate, an exact
    // duplicate, and a self-loop
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (5L, 1L),
      (2L, 1L), // reversed dup
      (3L, 4L), // exact dup
      (4L, 4L)  // self-loop
    ).toDF("src", "dst")
    val got = GraphOps.triangleCounts(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L, 5L -> 0L))
  }
}
