package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.core.Embeddings.MockProvider
import graft.functions.FloatVecDot
import graft.streaming.StreamingIngest
import graft.streaming.StreamingIngest.UserEvent

/** Streaming operators driven synchronously with MemoryStream. */
class StreamingSpec extends SparkSpec {

  test("windowed agg: streaming result equals the batch twin") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val events = Tables.t(spark, sf("0.001"), "events")
      .select($"ts", $"event_type", $"value")
    val rows = events.as[(java.sql.Timestamp, String, Double)].collect().toSeq

    val stream = MemoryStream[(java.sql.Timestamp, String, Double)]
    stream.addData(rows)
    val agg = StreamingIngest.windowedEventCounts(
      stream.toDF().toDF("ts", "event_type", "value"))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("win_out").start()
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("win_out")
      .select($"win_start", $"event_type", $"n",
        round($"sum_value", 4).as("sum_value"))
      .orderBy($"win_start", $"event_type").collect().toSeq
    val batch = StreamingIngest.windowedEventCounts(events)
      .select($"win_start", $"event_type", $"n",
        round($"sum_value", 4).as("sum_value"))
      .orderBy($"win_start", $"event_type").collect().toSeq
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("sessionize: gap splitting and aggregation (batch-driven)") {
    import spark.implicits._
    def ts(s: Long) = new java.sql.Timestamp(s * 1000)
    val evs = Seq(
      UserEvent(1, ts(0), "view", 1.0),
      UserEvent(1, ts(10), "click", 2.0),
      UserEvent(1, ts(1000), "view", 3.0), // >gap → new session
      UserEvent(2, ts(5), "view", 5.0)).toDS()
    val sessions = StreamingIngest.sessionize(evs, gapMs = 60000)
      .collect().sortBy(s => (s.user_id, s.start.getTime))
    // batch run emits only *closed* sessions (open ones wait for timeout):
    // user 1's first session closed by the 1000s event
    assert(sessions.map(s => (s.user_id, s.n_events, s.sum_value)).toSeq ==
      Seq((1L, 2L, 3.0)))
  }

  test("streaming ingest: embed stage through a parquet sink") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val out = Files.createTempDirectory("graft-stream").toString
    val stream = MemoryStream[(Long, String)]
    stream.addData(Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")))
    val q = StreamingIngest.startIngest(spark, stream.toDF(),
      MockProvider(4), s"$out/docs", s"$out/ckpt")
    q.processAllAvailable()
    stream.addData(Seq((4L, "delta")))
    q.processAllAvailable()
    q.stop()

    val got = spark.read.parquet(s"$out/docs")
    assert(got.count() == 4)
    val vec = got.where($"doc_id" === 4L).select($"vec")
      .head().getAs[Array[Byte]](0)
    assert(FloatVecDot.unpack(vec).toSeq == Seq(1.0f, 0.0f, 0.0f, 0.0f))
  }

  test("streaming ingest into the KbStore via foreachBatch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val path = Files.createTempDirectory("graft-skb").resolve("kb").toString
    val kb = graft.core.KbStore.create(spark, path, Map("provider" -> "mock"))
    val p = MockProvider(4)

    val stream = MemoryStream[String]
    stream.addData(Seq("alpha", "beta"))
    val q = stream.toDF().toDF("text").writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!batch.isEmpty) kb.bulkAddDocsDistributed(batch, p): Unit
      }
      .start()
    q.processAllAvailable()
    stream.addData(Seq("gamma"))
    q.processAllAvailable()
    q.stop()

    assert(kb.len == 3)
    assert(kb.embeddings.count() == 3)
    // ids remain dense across micro-batches
    assert(kb.docs.collect().map(_.id).sorted.toSeq == Seq(1L, 2L, 3L))
    assert(kb.retrieve("anything", 1, p).nonEmpty)
    kb.close()
  }
}
