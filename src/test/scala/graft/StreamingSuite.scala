package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.tjk._

/** Batch/stream parity: the streaming session pipeline over an incremental
  * feed must produce exactly the batch sessionWindowAgg result — one
  * expression, two execution modes (SURVEY.md §2.8).
  */
class StreamingSuite extends SparkTestBase {
  import spark.implicits._

  test("streaming session aggregates == batch session_window aggregates") {
    implicit val sc = spark.sqlContext
    val turns = Gen.turnsSeq(42L, 6, 40)
    val stream = MemoryStream[Turn]
    val q = Streaming.sessionAggStream(stream.toDF(), "conv_id", "ts",
        "30 minutes", watermark = "0 seconds")
      .writeStream.format("memory").queryName("sess_stream")
      .outputMode("complete").start()
    // feed in two increments to exercise state merge across micro-batches
    val (a, b) = turns.splitAt(turns.size / 2)
    stream.addData(a); q.processAllAvailable()
    stream.addData(b); q.processAllAvailable()
    val streamed = spark.table("sess_stream")
      .select(col("conv_id"), col("session_bounds.start").as("ws"),
        col("session_start"), col("session_end"), col("n_turns"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1),
        r.getTimestamp(2), r.getTimestamp(3), r.getLong(4))).toSet
    q.stop()
    val batch = Sessionize.sessionWindowAgg(
        spark.createDataset(turns).toDF(), "conv_id", "ts", "30 minutes")
      .select(col("conv_id"), col("session_bounds.start").as("ws"),
        col("session_start"), col("session_end"), col("n_turns"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1),
        r.getTimestamp(2), r.getTimestamp(3), r.getLong(4))).toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("streaming dedup drops duplicates within the watermark") {
    implicit val sc = spark.sqlContext
    val t0 = new Timestamp(1767225600000L)
    val stream = MemoryStream[Turn]
    val q = Streaming.dedupStream(stream.toDF(), "ts", "1 hour", Seq("conv_id", "turn_idx"))
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    stream.addData(Turn("c1", 0, "user", "hello", null, t0))
    q.processAllAvailable()
    stream.addData(Turn("c1", 0, "user", "hello", null, t0)) // dup within watermark
    stream.addData(Turn("c1", 1, "user", "world", null, t0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("dedup_stream").select("conv_id", "turn_idx").collect()
      .map(r => (r.getString(0), r.getInt(1))).toSeq.sorted
    assert(got == Seq(("c1", 0), ("c1", 1)))
  }
}
