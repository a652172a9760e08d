package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.storage.StorageLevel

/** Dev profiler for the text-load bench point: where does the 10k-row
  * write's time go (task count vs parquet encode vs codec)?
  * Run: `sbt "runMain graft.ProfileLoad"`.
  */
object ProfileLoad {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val words = Array("spark", "vector", "store", "document", "retrieval",
      "index", "batch", "stream", "graph", "dedup", "cosine", "shuffle")
    val docs = spark.range(0, 10548, 1, 32).map { id =>
      val rnd = new java.util.Random(id)
      val sb = new java.lang.StringBuilder(1250)
      while (sb.length < 1200) sb.append(words(rnd.nextInt(words.length))).append(' ')
      (id, sb.toString)
    }.toDF("id", "text").persist(StorageLevel.MEMORY_AND_DISK)
    docs.count()

    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    for (rep <- 1 to 3; parts <- Seq(1, 2, 4, 8, 32)) {
      val t = timed {
        docs.coalesce(parts).write.mode("overwrite")
          .parquet(s"/tmp/profile_load_$parts")
      }
      println(f"rep=$rep parts=$parts%2d  $t%.3f s")
    }
    for (rep <- 1 to 3; codec <- Seq("none", "snappy")) {
      val t = timed {
        docs.coalesce(1).write.mode("overwrite").option("compression", codec)
          .parquet(s"/tmp/profile_load_c$codec")
      }
      println(f"rep=$rep codec=$codec  $t%.3f s")
    }
    spark.stop()
  }
}
