package graft

import org.apache.spark.sql.functions._
import graft.functions.FloatVecPack.floatVecPack
import graft.functions.FloatVecDot.floatVecDot
import graft.ops.PairwiseTopK

/** The §3.3 pairwise scale paths vs the brute-force baseline. */
class PairwiseSpec extends SparkSpec {

  private lazy val packed = Tables.t(spark, sf("0.001"), "embeddings")
    .select(col("vec_id").as("id"), floatVecPack(col("embedding")).as("vec"))

  private def bruteTopK(k: Int): Seq[(Long, Long, Double)] = {
    val a = packed.select(col("id").as("id1"), col("vec").as("v1"))
    val b = packed.select(col("id").as("id2"), col("vec").as("v2"))
    a.join(b, col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        round(floatVecDot(col("v1"), col("v2")), 6).as("score"))
      .orderBy(desc("score"), col("id1"), col("id2"))
      .limit(k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
  }

  test("blockedTopKPairs matches the exact all-pairs join, any block count") {
    val expect = bruteTopK(25)
    Seq(1, 3, 8).foreach { blocks =>
      val got = PairwiseTopK.blockedTopKPairs(packed, dim = 64, k = 25,
        numBlocks = blocks, roundTo = 6)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(got == expect, s"numBlocks=$blocks")
    }
  }

  test("blockedTopKPairs refTie order matches the reference tie order") {
    val a = packed.select(col("id").as("id1"), col("vec").as("v1"))
    val b = packed.select(col("id").as("id2"), col("vec").as("v2"))
    val expect = a.join(b, col("id1") < col("id2"))
      .select(col("id1"), col("id2"), floatVecDot(col("v1"), col("v2")).as("score"))
      .orderBy(desc("score"), desc("id2"), desc("id1"))
      .limit(10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val got = PairwiseTopK.blockedTopKPairs(packed, dim = 64, k = 10,
      numBlocks = 4, refTie = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == expect)
  }

  test("sketchTopKPairs recovers planted near-identical pairs") {
    import spark.implicits._
    val dim = 32
    val rnd = new java.util.Random(7)
    def unit(): Array[Float] = {
      val v = Array.fill(dim)(rnd.nextGaussian().toFloat)
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / n)
    }
    def jitter(v: Array[Float]): Array[Float] = {
      val w = v.map(x => x + 0.01f * rnd.nextGaussian().toFloat)
      val n = math.sqrt(w.map(x => x.toDouble * x).sum).toFloat
      w.map(_ / n)
    }
    // 200 random vectors + 5 planted near-dup partners (cos > 0.99)
    val base = (0L until 200L).map(i => (i, unit()))
    val planted = (0L until 5L).map(i => (1000L + i, jitter(base(i.toInt)._2)))
    val df = (base ++ planted).toDF("id", "v")
      .select(col("id"), floatVecPack(col("v")).as("vec"))
    val got = PairwiseTopK.sketchTopKPairs(df, dim, k = 5,
      sketchBits = 256, bands = 16, rerank = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (0L until 5L).map(i => (i, 1000L + i)).toSet
    assert(got == want)
  }
}
