package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the benchmark/test parquet tables.
  *
  * One parquet file per table under a scale-factor directory
  * (TESTDATA.md). Column pruning and predicate pushdown happen at the
  * parquet scan — callers should select/filter as early as possible and
  * let Catalyst push them down.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  /** `events.ts` has shipped in three physical shapes, all normalized
    * here to one logical type, [[org.apache.spark.sql.types.TimestampType]]:
    *
    *  - parquet nanos, surfaced as long under
    *    `spark.sql.legacy.parquet.nanosAsLong=true` (GraftSession sets
    *    it) → converted with integer arithmetic (a double division
    *    would lose precision at 2024-epoch nanos ≈ 1.7e18 > 2^53);
    *  - parquet micros with `isAdjustedToUTC=0`, which Spark 4.x
    *    infers as `TIMESTAMP_NTZ` (`spark.sql.parquet.inferTimestampNTZ`
    *    defaults to true) → cast to TIMESTAMP, lossless under the UTC
    *    session time zone GraftSession pins;
    *  - already TIMESTAMP → passthrough.
    *
    * Downstream code (event-time functions like `unix_micros`,
    * watermarks, window joins against TIMESTAMP literals) may then
    * assume a session-time-zone timestamp without re-checking.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = load(spark, dir, "events")
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType =>
        raw.withColumn("ts", raw("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
