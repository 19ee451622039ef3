package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's recommended configuration.
  *
  * Tuned for correctness parity with the DuckDB oracle (UTC session
  * time zone) and for scale (AQE on, shuffle partitions sized for the
  * local[32] test harness; on a real cluster callers override
  * `spark.sql.shuffle.partitions` to ~2-3x total cores).
  */
object GraftSession {
  def builder(master: String = "local[*]", appName: String = "graft"): SparkSession.Builder =
    SparkSession
      .builder()
      .master(master)
      .appName(appName)
      // The engine's Catalyst surface: SQL registration of the native
      // expressions (dot_product, minhash_sketch) and the
      // CollapseJsonExtracts optimizer rule.
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  def local(): SparkSession = builder().getOrCreate()
}
