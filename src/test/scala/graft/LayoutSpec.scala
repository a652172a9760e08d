package graft

import org.apache.spark.sql.functions._
import graft.ops.Layout

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits: col k bit j -> output bit j*K+k") {
    val df = Seq((1L, 0L), (0L, 1L), (3L, 3L), (2L, 1L))
      .toDF("a", "b")
      .select(Layout.zValue(2, col("a"), col("b")).as("z"))
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 15L, 6L))
    // z(2,1): a bit1 -> pos 2 (4); b bit0 -> pos 1 (2) => 6
  }

  test("zValue rejects too-wide interleaves") {
    intercept[IllegalArgumentException] {
      Layout.zValue(32, col("a"), col("b"))
    }
  }

  test("writeZordered: each file owns a disjoint z-range, so min/max " +
       "stats prune on either dimension") {
    val rnd = new scala.util.Random(11)
    val rows = (0 until 2000).map(_ =>
      (rnd.nextInt(256).toLong, rnd.nextInt(256).toLong))
    val df = rows.toDF("x", "y")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-zorder").toString + "/t"
    Layout.writeZordered(df, dir,
      Layout.zValue(8, col("x"), col("y")), numFiles = 8)
    val back = spark.read.parquet(dir)
      .select(input_file_name().as("f"),
        Layout.zValue(8, col("x"), col("y")).as("z"))
    val ranges = back.groupBy(col("f"))
      .agg(min(col("z")).as("lo"), max(col("z")).as("hi"))
      .orderBy(col("lo"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(ranges.length > 1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2)
      case _ =>
    }
    assert(back.count() == 2000)
  }
}
