package graft

import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.streaming.EventStreams

/** Streaming surface specs: the same transform running in batch and
  * in Structured Streaming must agree (one-codepath contract), and
  * the custom-state sessionization must reproduce the batch
  * gaps-and-islands result.
  */
class StreamingSpec extends SparkSpecBase {

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.select(col("user_id"), col("session_seq"), col("n_events"),
      col("session_start"), col("session_end"))
      .collect().map(_.toSeq).toSet

  test("stateful sessionization (flatMapGroupsWithState) == batch gaps-and-islands") {
    val events = Tables.events(spark, sfDir)
    val batch = EventStreams.sessionStats(events, "30 minutes")
    val stateful = EventStreams.sessionizeStateful(spark, events, 30L)
    assert(canon(stateful) == canon(batch))
    assert(canon(batch).nonEmpty)
  }

  test("streaming windowed agg == batch windowed agg over the same files") {
    // Stage the parquet as a streaming source dir.
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream").toString
    Tables.events(spark, sfDir).write.mode("overwrite").parquet(tmp)
    val batch = EventStreams.windowedAgg(spark.read.parquet(tmp), "1 hour")
      .collect().map(_.toSeq).toSet
    val streamed = EventStreams.runStreamToMemory(
      spark, tmp, df => EventStreams.windowedAgg(df, "1 hour", watermark = Some("2 hours")),
      queryName = "win_agg_test")
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }
}
