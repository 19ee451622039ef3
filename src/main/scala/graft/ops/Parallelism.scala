package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

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
    if (estimatedSplits(df) < target) df.repartition(target) else df
  }

  /** Post-materialization twin of [[ensure]] for locally-checkpointed
    * intermediates. AQE rightly coalesces a small aggregate's exchange
    * to one partition — but `localCheckpoint` FREEZES that
    * partitioning, so every downstream narrow stage (including a
    * broadcast-join fan-out that multiplies the rows 100×) inherits
    * ONE task (measured: q88's 29M-row score fan-out serialized on a
    * single core, 11 of its 13 seconds). Restoring parallelism on the
    * frozen checkpoint shuffles only the checkpoint's own (small)
    * rows; a big checkpoint keeps its many post-AQE partitions and
    * this no-ops. `df.rdd` on a checkpointed frame returns the frozen
    * RDD — no re-planning, no extra job.
    */
  def ensureCheckpointed(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /** Materialization point for a REUSED corpus-sized intermediate
    * (the tokenized corpus feeding PMI's pair and unigram aggregates,
    * BM25's posting table feeding probe + df + stats). The default —
    * `localCheckpoint` — is the right single-JVM/bench answer: no
    * re-tokenize per consumer, lineage truncated. Its cluster trade
    * is real, though: blocks pin to executor storage and are LOST on
    * executor failure (lineage is gone, the job dies), which is the
    * wrong default for a 1000-executor run where some executor loss
    * is routine. `spark.graft.stage.storage` picks the strategy:
    *
    *  - `local-checkpoint` (default): fastest, non-resilient;
    *  - `disk`: `persist(DISK_ONLY)` — keeps lineage, so a lost
    *    block recomputes from source instead of failing the job
    *    (the cluster answer; costs lineage growth, fine for these
    *    non-iterative plans);
    *  - `none`: no materialization — every consumer recomputes
    *    (spot-instance fleets where storage churn beats recompute).
    *
    * NOT for iterative loops ([[graft.dedup.Dedup.dupClusters]]):
    * those need the lineage TRUNCATION, not just the caching, and
    * keep their explicit `localCheckpoint`.
    */
  def stage(df: DataFrame): DataFrame =
    df.sparkSession.conf.getOption("spark.graft.stage.storage")
      .getOrElse("local-checkpoint") match {
      case "local-checkpoint" => df.localCheckpoint(false)
      case "disk" => df.persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
      case "none" => df
      case other => sys.error(
        s"unknown spark.graft.stage.storage '$other' (local-checkpoint|disk|none)")
    }

  /** Estimate how many partitions the scan will plan, WITHOUT physical
    * planning (`df.rdd` would plan the subtree — thrown away whenever we
    * then wrap in repartition — and observes the pre-AQE count anyway).
    *
    * For file sources this mirrors `FilePartition.maxSplitBytes`'s
    * bin-packing: each file is padded by `openCostInBytes`, and the
    * split size is `min(maxPartitionBytes, max(openCost, totalPadded /
    * defaultParallelism))`. Raw `sizeInBytes / maxPartitionBytes` is NOT
    * a substitute — a directory of 1000 tiny files packs to dozens of
    * partitions via the open-cost padding while its byte total says
    * "one", and repartitioning such an input on every call would add a
    * needless full shuffle.
    *
    * Non-file leaves (in-memory relations, v2 sources) keep the
    * byte-stats estimate; unknown sizes report the conservative default
    * (huge), so the guard structurally no-ops on anything that isn't
    * provably small — exactly the intent.
    */
  private def estimatedSplits(df: DataFrame): BigInt = {
    val spark = df.sparkSession
    val conf = spark.sessionState.conf
    val maxPartitionBytes = math.max(1L, conf.filesMaxPartitionBytes)
    val openCost = conf.filesOpenCostInBytes
    val plan = df.queryExecution.optimizedPlan
    plan.collectLeaves().map[BigInt] {
      case lr: LogicalRelation if lr.relation.isInstanceOf[HadoopFsRelation] =>
        val fs = lr.relation.asInstanceOf[HadoopFsRelation]
        // File listing is cached in the relation's FileIndex — reading
        // lengths here lists nothing new.
        val sizes = fs.location.listFiles(Nil, Nil).flatMap(_.files.map(_.getLen))
        val totalPadded = sizes.map(s => BigInt(s) + openCost).sum
        val bytesPerCore = totalPadded / math.max(1, spark.sparkContext.defaultParallelism)
        val maxSplit = BigInt(maxPartitionBytes)
          .min(BigInt(openCost).max(bytesPerCore))
          .max(1)
        totalPadded / maxSplit + 1
      case leaf =>
        leaf.stats.sizeInBytes / maxPartitionBytes + 1
    }.sum
  }
}
