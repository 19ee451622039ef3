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
    val target = df.sparkSession.sparkContext.defaultParallelism
    // getNumPartitions plans (lazily) but runs no job.
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
