package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming surface over the `events` table shape.
  *
  * Net-new relative to the reference (batch-only); expressed so the
  * same transform runs identically in batch and streaming mode — the
  * Spark-native way to keep one codepath for backfill and live data.
  */
object EventStreams {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Tumbling-window aggregate: count + value sum per (window,
    * event_type). Works on either a batch or streaming DataFrame —
    * watermarking is applied only when the input is streaming.
    */
  def windowedAgg(events: DataFrame, windowLen: String, watermark: Option[String] = None): DataFrame = {
    val src = watermark match {
      case Some(w) if events.isStreaming => events.withWatermark("ts", w)
      case _                             => events
    }
    src
      .groupBy(window(col("ts"), windowLen).as("win"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(
        col("win.start").as("win_start"),
        col("event_type"),
        col("n"),
        col("total"))
  }

  /** Run a streaming query over a parquet directory source and drain it
    * synchronously into an in-memory table (local verification path;
    * in production the sink would be kafka/delta/parquet).
    */
  def runStreamToMemory(
      spark: SparkSession,
      sourceDir: String,
      transform: DataFrame => DataFrame,
      queryName: String): DataFrame = {
    val stream = spark.readStream
      .schema(eventSchema)
      .parquet(sourceDir)
    val q = transform(stream).writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(queryName)
  }

  /** Sessionization: assign session ids by inactivity gap per user —
    * the batch gaps-and-islands formulation (lag + cumulative sum of
    * gap-breaks), equivalent to streaming `session_window`.
    * One shuffle on user_id; the two windows share the same
    * partitioning so Catalyst plans a single exchange.
    */
  def sessionize(events: DataFrame, gap: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    val gapExpr = expr(s"INTERVAL $gap")
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull || col("ts") > col("prev_ts") + gapExpr, 1L).otherwise(0L))
      .withColumn("session_seq", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("prev_ts", "new_session")
  }

  /** Per-user session stats built on [[sessionize]]. */
  def sessionStats(events: DataFrame, gap: String): DataFrame =
    sessionize(events, gap)
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"))
}
