package graft.ops

import org.apache.spark.sql.DataFrame

/** Parallelism guard for compute-bound narrow stages.
  *
  * File scans split by BYTES (`spark.sql.files.maxPartitionBytes`), so a
  * physically small input whose rows fan out into heavy per-row work — a
  * few MB of documents, each expanding to hundreds of n-grams + md5
  * hashes, or embedding rows each paying dim-length dot products —
  * planned as one or two partitions serializes the whole stage on one
  * core while the rest of the cluster idles.
  *
  * `ensure` round-robins such inputs up to the session's default
  * parallelism. At the design scale (100 TB, thousands of row groups)
  * the scan already yields far more partitions than cores and this is a
  * structural no-op: no repartition node is added, so no shuffle ever
  * touches the full-size input.
  */
object Parallelism {

  def ensure(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    // Estimate the scan's split count from optimizer statistics instead
    // of materializing df.rdd: rdd forces physical planning of the
    // subtree (thrown away whenever we wrap in repartition) and
    // observes the pre-AQE count anyway. Byte-based stats mirror how
    // FilePartition splits scans; unknown-size relations report the
    // conservative default (huge), so the guard structurally no-ops on
    // anything that isn't provably small — exactly the intent.
    val maxPartitionBytes = spark.sessionState.conf.filesMaxPartitionBytes
    val estSplits = df.queryExecution.optimizedPlan.stats.sizeInBytes /
      BigInt(math.max(1L, maxPartitionBytes)) + 1
    if (estSplits < target) df.repartition(target) else df
  }
}
