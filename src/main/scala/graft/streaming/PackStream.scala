package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.ops.Packing

/** Streaming continuation of the packing prefix sum: documents
  * landing in a directory are chunked ([[Packing.chunk]] — the q61
  * stage verbatim) and pack-assigned ([[Packing.assignWithTotal]] —
  * the q63 distributed prefix sum verbatim) with the token cumsum
  * CONTINUING across micro-batches, so a trainer can consume packs
  * incrementally while the corpus is still landing. Within a batch,
  * global (doc_id, chunk_seq) order; across batches, arrival order —
  * the natural semantics of an append-only landing stream (equal to
  * the batch q63 whenever files land in key order, asserted in
  * StreamingSpec).
  *
  * Exactly-once offsets without a transactional sink:
  *  - the running offset lives in `<outDir>/_offsets/<batchId>`
  *    ("start end"), written AFTER the batch's data commit via
  *    create-temp-then-rename (atomic on HDFS and local FS);
  *  - each batch overwrites its own `data/batch=<id>` directory, so a
  *    crash-retried batch replaces — never duplicates — its output;
  *  - a retried batch whose offset file already exists reuses its
  *    recorded start; one that crashed before the offset write
  *    re-derives the same start from the previous batch's end. Batch
  *    content is pinned by the source checkpoint and the assignment
  *    is a pure function of (content, start), so every retry path
  *    rewrites byte-identical data.
  *
  * Scale shape: per-batch driver state is one (start, end) pair —
  * cross-batch state lives in the offset files, never in executor
  * memory; the assignment itself inherits q63's bounds (driver
  * collect is one row per shuffle partition).
  */
object PackStream {

  /** The landing contract: parquet files of `(doc_id, text)`. */
  val landingSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  def maintain(
      spark: SparkSession,
      landingDir: String,
      outDir: String,
      checkpointDir: String,
      budget: Long = 512L,
      window: Int = 50,
      stride: Int = 40,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    spark.readStream.schema(landingSchema).parquet(landingDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        processBatch(batch, id, outDir, budget, window, stride)
      }
      .start()

  /** One micro-batch: chunk, continue the cumsum from this batch's
    * start offset, overwrite `data/batch=<id>`, then commit the
    * offset file. Package-visible so StreamingSpec can drive the
    * crash-retry paths directly.
    */
  private[graft] def processBatch(
      batch: DataFrame,
      id: Long,
      outDir: String,
      budget: Long,
      window: Int,
      stride: Int): Unit = {
    val spark = batch.sparkSession
    val f = fs(spark, outDir)
    // Replaying a batch the last compaction already covered would
    // overwrite its partition with arrival-order rows whose pack ids
    // collide with the compacted global assignment — silent store
    // corruption. Refuse loudly instead: this only fires when compact
    // ran against a stream whose final batch hadn't committed its
    // checkpoint (the documented don't — drain first).
    compactedThrough(f, outDir).filter(id <= _).foreach { through =>
      sys.error(s"batch $id replays into a store compacted through batch $through; " +
        "the store already holds these rows under the global order. Restart the " +
        "stream with a fresh checkpoint + landing delta, or compact only after " +
        "the stream has fully committed (drain with Trigger.AvailableNow).")
    }
    // Pin the pack geometry: every batch (and compact) must use the
    // SAME budget or pack ids stop being comparable across the store.
    recordBudget(f, outDir, budget)
    val start = startOffsetFor(spark, outDir, id)
    val (assigned, total) = Packing.assignWithTotal(
      Packing.chunk(batch, window, stride), budget, start)
    assigned.write.mode("overwrite").parquet(s"$outDir/data/batch=$id")
    writeOffset(spark, outDir, id, start, start + total)
  }

  /** Highest batch id covered by the last [[compact]], if any. */
  private def compactedThrough(f: FileSystem, outDir: String): Option[Long] = {
    val p = new Path(s"$outDir/_compacted")
    if (f.exists(p)) Some(readSmallFile(f, p).trim.toLong) else None
  }

  /** The store's pinned pack budget, if recorded (stores created
    * before budget pinning lack the file). */
  private[graft] def recordedBudget(f: FileSystem, outDir: String): Option[Long] = {
    val p = new Path(s"$outDir/_budget")
    if (f.exists(p)) Some(readSmallFile(f, p).trim.toLong) else None
  }

  private def recordBudget(f: FileSystem, outDir: String, budget: Long): Unit =
    recordedBudget(f, outDir) match {
      case Some(b) if b != budget =>
        sys.error(s"pack store $outDir was built with --budget $b; running with " +
          s"--budget $budget would mix two pack geometries in one store")
      case Some(_) => ()
      case None => writeSmallFile(f, new Path(s"$outDir/_budget"), budget.toString)
    }

  private def readSmallFile(f: FileSystem, p: Path): String = {
    val in = f.open(p)
    try new String(org.apache.commons.io.IOUtils.toByteArray(in), UTF_8)
    finally in.close()
  }

  private def writeSmallFile(f: FileSystem, p: Path, content: String): Unit = {
    val tmp = new Path(p.getParent, s".${p.getName}.tmp")
    val out = f.create(tmp, true)
    try out.write(content.getBytes(UTF_8)) finally out.close()
    if (!f.rename(tmp, p)) {
      f.delete(tmp, false)
      if (!f.exists(p)) sys.error(s"could not commit $p")
    }
  }

  /** All packed chunks so far; `batch` arrives as a partition column
    * from the `data/batch=<id>` layout. */
  def packed(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(s"$outDir/data")

  private def fs(spark: SparkSession, outDir: String): FileSystem =
    FileSystem.get(new java.net.URI(outDir),
      spark.sparkContext.hadoopConfiguration)

  private def offsetsDir(outDir: String) = new Path(s"$outDir/_offsets")

  private def readOffset(f: FileSystem, p: Path): (Long, Long) = {
    val in = f.open(p)
    val txt = try new String(
      org.apache.commons.io.IOUtils.toByteArray(in), UTF_8) finally in.close()
    val Array(s, e) = txt.trim.split(" ")
    (s.toLong, e.toLong)
  }

  /** This batch's start offset: its own recorded start on a retry,
    * else the highest prior batch's end, else 0. */
  private[graft] def startOffsetFor(spark: SparkSession, outDir: String, id: Long): Long = {
    val f = fs(spark, outDir)
    val dir = offsetsDir(outDir)
    if (!f.exists(dir)) return 0L
    val mine = new Path(dir, id.toString)
    if (f.exists(mine)) readOffset(f, mine)._1
    else {
      val prior = f.listStatus(dir).map(_.getPath.getName)
        .filterNot(_.startsWith(".")).map(_.toLong).filter(_ < id)
      if (prior.isEmpty) 0L
      else readOffset(f, new Path(dir, prior.max.toString))._2
    }
  }

  /** Restore the batch-q63 global order over everything landed so far.
    *
    * Cross-batch pack order is arrival order by design (the natural
    * append-only semantics); when landings arrived out of key order, a
    * trainer wanting the canonical corpus order re-runs the batch
    * assignment over all landed chunk rows — (doc_id, chunk_seq,
    * n_tokens) is exactly [[Packing.assign]]'s input contract, so
    * compaction needs no document text and costs one prefix-sum pass.
    *
    * Token conservation is REQUIRED before the store swaps: the
    * reassigned grand total must equal the last committed offset end,
    * so the running cumsum stays valid and subsequent maintenance
    * batches continue appending from the same offset. The rewritten
    * rows land under the last batch's `batch=<id>` partition (one
    * coherent layout for [[packed]]); the swap is the same
    * write-aside-then-two-renames as the ANN store compactor, with
    * the same interrupted-swap recovery. The geometry comes from the
    * store's pinned `_budget` (an explicit conflicting override is
    * refused), and the `_compacted` watermark fences out crash-replays
    * of covered batch ids afterwards. Run between maintenance windows
    * only — drain the stream (Trigger.AvailableNow) first.
    */
  def compact(
      spark: SparkSession,
      outDir: String,
      budgetOverride: Option[Long] = None): Unit = {
    val f = fs(spark, outDir)
    // The pack geometry comes from the store's own pinned budget —
    // compacting with a different budget than the stream used would
    // rewrite every row under the wrong geometry while the
    // conservation check (budget-independent) still passes. An
    // explicit conflicting override is refused; the override only
    // serves stores created before budget pinning.
    val budget = (recordedBudget(f, outDir), budgetOverride) match {
      case (Some(b), Some(o)) if b != o =>
        sys.error(s"pack store $outDir is pinned to --budget $b; refusing to compact " +
          s"with --budget $o (two pack geometries in one store)")
      case (Some(b), _) => b
      case (None, Some(o)) => o
      case (None, None) =>
        // No pin and no override: guessing a default here would rewrite
        // a pre-pin store built with a different budget under the wrong
        // geometry while the budget-independent conservation check still
        // passes. Make the caller state the geometry explicitly.
        sys.error(s"pack store $outDir has no pinned _budget; pass an explicit " +
          "--budget matching the budget the store was built with")
    }
    val data = new Path(s"$outDir/data")
    val tmp = new Path(s"$outDir/data__compacting")
    val old = new Path(s"$outDir/data__old")
    f.delete(tmp, true)
    // Crash recovery BEFORE any delete: a prior compact that died
    // between its swap renames leaves `data` gone and `old` holding
    // the only copy.
    if (!f.exists(data) && f.exists(old))
      require(f.rename(old, data),
        s"compact: found interrupted swap ($data missing) but could not restore $old")
    f.delete(old, true)
    val offDir = offsetsDir(outDir)
    val ids =
      if (!f.exists(offDir)) Array.empty[Long]
      else f.listStatus(offDir).map(_.getPath.getName)
        .filterNot(_.startsWith(".")).map(_.toLong)
    // A store with no committed offsets has nothing to compact; writing
    // `_compacted = 0` + a `batch=0` partition here would permanently
    // fence out a legitimate first batch id 0 from a stream that simply
    // hadn't committed yet (half-initialized or never-streamed store).
    if (ids.isEmpty)
      sys.error(s"pack store $outDir has no committed offsets (_offsets empty); " +
        "nothing to compact — run the stream (or let a batch commit) first")
    val lastEnd = readOffset(f, new Path(offDir, ids.max.toString))._2
    val chunks = spark.read.parquet(data.toString)
      .select("doc_id", "chunk_seq", "n_tokens")
    val (assigned, total) = Packing.assignWithTotal(chunks, budget, 0L)
    require(total == lastEnd,
      s"compact: reassigned token total $total != last committed offset end $lastEnd — " +
        "refusing to swap (store and offsets would disagree)")
    assigned.write.mode("overwrite")
      .parquet(new Path(tmp, s"batch=${ids.max}").toString)
    require(f.rename(data, old), s"compact: could not move $data aside")
    if (!f.rename(tmp, data)) {
      f.rename(old, data)
      sys.error(s"compact: could not activate $tmp; original store restored")
    }
    f.delete(old, true)
    // Pin the resolved geometry so subsequent maintenance batches are
    // held to the same budget (recordBudget is a no-op when already
    // pinned; the conflict case was refused above). Pinned only AFTER
    // the swap succeeds: a refused or failed compact must not mutate
    // the store — pinning an unverified --budget override up front
    // would leave a wrong pin behind on a store whose empty-offsets or
    // conservation guard then rejected the operation, and the stream's
    // first legitimate batch would be refused against it.
    recordBudget(f, outDir, budget)
    // Replay fence: every batch id up to the compaction coverage now
    // lives inside the rewritten store; a crash-replay of one of them
    // would overwrite its partition with colliding arrival-order pack
    // ids. processBatch refuses ids <= this watermark.
    writeSmallFile(f, new Path(s"$outDir/_compacted"), ids.max.toString)
  }

  private def writeOffset(
      spark: SparkSession, outDir: String, id: Long, start: Long, end: Long): Unit = {
    val f = fs(spark, outDir)
    val dir = offsetsDir(outDir)
    f.mkdirs(dir)
    val tmp = new Path(dir, s".$id.tmp")
    val fin = new Path(dir, id.toString)
    val out = f.create(tmp, true)
    try out.write(s"$start $end".getBytes(UTF_8)) finally out.close()
    // Replace-if-exists rename: a retried batch rewrites the same
    // (deterministic) offsets, so losing the race to a previous
    // attempt's file is benign.
    if (!f.rename(tmp, fin)) {
      f.delete(tmp, false)
      if (!f.exists(fin))
        sys.error(s"could not commit offset file for batch $id")
    }
  }
}
