package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Streaming exact deduplication for document ingest.
  *
  * Batch dedup (`graft.dedup.Dedup.exact`) is one hash aggregate; its
  * streaming analog keys arriving documents by the same normalized
  * fingerprint and drops repeats with
  * `dropDuplicatesWithinWatermark` — the state store only retains
  * fingerprints until the watermark passes them, so state is bounded
  * by (arrival rate × watermark delay) instead of growing with the
  * whole corpus the way plain `dropDuplicates` state would at 100 TB
  * of ingest.
  *
  * The trade is explicit: a duplicate arriving LATER than the
  * watermark delay after its first copy is re-emitted (its key has
  * been evicted). Choose the delay to cover the realistic re-delivery
  * window (e.g. upstream retry horizon), and run the batch exact dedup
  * as the periodic ground-truth compaction.
  */
object StreamDedup {

  /** Drop re-arrivals of the same normalized document text within the
    * watermark window. Works identically on a batch frame (no
    * watermark; plain dropDuplicates on the fingerprint) so backfill
    * and live ingest share one codepath.
    */
  def exactDedupStream(
      docs: DataFrame,
      textCol: String,
      tsCol: String,
      watermarkDelay: String): DataFrame = {
    val fp = docs.withColumn("fp", TextFunctions.fingerprint(col(textCol)))
    val deduped =
      if (fp.isStreaming)
        fp.withWatermark(tsCol, watermarkDelay).dropDuplicatesWithinWatermark("fp")
      else
        fp.dropDuplicates("fp")
    // The fingerprint is dedup-internal: callers get their input
    // schema back, not an extra md5 column persisted corpus-wide.
    deduped.drop("fp")
  }
}
