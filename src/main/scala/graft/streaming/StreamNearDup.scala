package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.dedup.Dedup
import graft.functions.TextFunctions

/** Streaming NEAR-duplicate candidate detection: MinHash band buckets
  * as keyed state.
  *
  * Each arriving document computes its signature per-row (bit-equal to
  * the batch one-pass aggregate — same hash parametrization, see
  * [[Dedup.minHashSignature]]), explodes into its band buckets, and is
  * matched via `flatMapGroupsWithState` against the ids already seen
  * in each bucket. Emitted pairs are CANDIDATES — the honest streaming
  * contract at scale: exact-Jaccard verification needs both documents'
  * texts, so candidates stream to a downstream batch/`foreachBatch`
  * verify join ([[Dedup.minHashLshPairs]]'s verification stage).
  *
  * Scale notes:
  *  - state per bucket is the id list, capped at `maxBucketSize`: a
  *    hot bucket (the skew analog of a stopword gram) stops admitting
  *    new members instead of going quadratic — same trade as the
  *    batch `maxDocFreq` posting-list cap;
  *  - the same code runs on a BATCH frame (Spark executes
  *    `flatMapGroupsWithState` with empty initial state per key),
  *    where it emits every same-bucket pair — equal to
  *    [[Dedup.minHashCandidates]] up to the final `distinct()`
  *    (asserted both ways in StreamingSpec).
  */
/** Encoder element type for the bucketed stream — top-level visible
  * because Dataset codegen materializes accessor calls. */
case class BandBucketRow(key: String, doc_id: Long)

object StreamNearDup {

  /** Candidate pairs (doc_a < doc_b), possibly repeated across bands
    * and micro-batches; consumers `dropDuplicates` downstream (a
    * stateful distinct is deliberately NOT chained here — candidate
    * volume is tiny relative to corpus and the verify join dedups
    * anyway).
    */
  def candidatePairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      numHashes: Int = 32,
      bands: Int = 8,
      maxBucketSize: Int = 1000,
      stateTtl: Option[String] = None): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // The keyed-state row encodes doc ids as primitive longs; a
    // non-integral id would cast to null and kill the encoder mid
    // stream — fail loud at planning time instead (the batch path
    // keeps native id types; map string ids to longs upstream before
    // streaming).
    val idType = docs.schema(idCol).dataType
    require(idType == org.apache.spark.sql.types.LongType ||
      idType == org.apache.spark.sql.types.IntegerType,
      s"candidatePairs requires an integral id column; $idCol is $idType")

    // Materialize each stage's array as an attribute before the next
    // lambda consumes it (grams -> hashes -> signature -> buckets):
    // Catalyst re-evaluates lambda-captured subtrees per element.
    val bucketed = docs
      .select(col(idCol).cast("long").as("doc_id"),
        array_distinct(TextFunctions.wordNgrams(
          TextFunctions.tokens(col(textCol)), n)).as("grams"))
      .filter(size(col("grams")) > 0) // gramless docs have no signature in batch either
      .select(col("doc_id"),
        transform(col("grams"), g => pmod(Dedup.gramHash(g), lit(1L << 32))).as("hs"))
      .select(col("doc_id"), Dedup.minHashSignature(col("hs"), numHashes).as("sig"))
      .select(col("doc_id"), explode(Dedup.bandBuckets(col("sig"), numHashes, bands)).as("bb"))
      .select(concat_ws("|", col("bb.band"), col("bb.bucket")).as("key"), col("doc_id"))
      .as[BandBucketRow]

    // Per-bucket size is capped by maxBucketSize, but bucket COUNT
    // grows with the corpus — pass `stateTtl` on long-running streams
    // to evict buckets not touched within the TTL, bounding total
    // state (the trade: a pair whose halves arrive further apart than
    // the TTL is missed; a periodic batch compaction via
    // Dedup.minHashLshPairs catches those). The TTL is OPT-IN because
    // ProcessingTimeTimeout makes the micro-batch engine schedule
    // timeout-check batches continuously (shouldRunAnotherBatch ==
    // true), which busy-loops an untriggered query and never
    // quiesces processAllAvailable — acceptable under a real trigger
    // interval, wrong as a default. Batch execution is unchanged
    // either way (hasTimedOut is always false there).
    val timeoutConf =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    val paired: Dataset[(Long, Long)] = bucketed
      .groupByKey(_.key)
      .flatMapGroupsWithState[Array[Long], (Long, Long)](
        OutputMode.Append, timeoutConf) {
        (_: String, rows: Iterator[BandBucketRow], state: GroupState[Array[Long]]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val buf = scala.collection.mutable.ArrayBuffer[Long](
              state.getOption.getOrElse(Array.empty[Long]).toSeq: _*)
            val out = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
            rows.foreach { r =>
              if (!buf.contains(r.doc_id)) {
                if (buf.length < maxBucketSize) {
                  buf.foreach { o =>
                    out += ((math.min(o, r.doc_id), math.max(o, r.doc_id)))
                  }
                  buf += r.doc_id
                }
                // else: hot-bucket cap hit — stop admitting (skew guard)
              }
            }
            state.update(buf.toArray)
            stateTtl.foreach(state.setTimeoutDuration)
            out.iterator
          }
      }
    paired.toDF("doc_a", "doc_b")
  }
}
