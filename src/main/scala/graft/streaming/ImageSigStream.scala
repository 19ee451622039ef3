package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.multimodal.ImageOps

/** [[SigStream]] with packed aHash: PPM images landing in a directory
  * are decoded and aHash-signed ONCE, linked against everything seen
  * so far by the exchange-free band-bucket join, and their signatures
  * appended — the image twin of the text near-dup store (q87): the
  * corpus is never re-decoded, never re-hashed, and per-batch cost is
  * O(batch) signing + bucketed store probes. After all images have
  * streamed through, the emitted pairs equal the batch
  * [[ImageOps.nearDupPairs]] set over the full corpus (StreamingSpec
  * pins the equality). Crash/retry semantics: see [[SigStream]].
  */
object ImageSigStream {

  /** Start linking-and-appending PPM images from `landingDir` against
    * the signature store at `storePath` (created by
    * [[graft.dedup.SigBandStore.createAt]] — possibly over an empty
    * corpus). Emitted pairs append as parquet under `pairsDir`.
    */
  def maintain(
      spark: SparkSession,
      landingDir: String,
      storePath: String,
      pairsDir: String,
      checkpointDir: String,
      maxHamming: Int,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    SigStream.maintain(spark, landingDir, storePath, pairsDir, checkpointDir,
      maxHamming,
      sign = b => ImageOps.aHash64Packed(spark,
        ImageOps.decodePpm(spark, b.select(col("path"), col("content")))),
      aCol = "img_a", bCol = "img_b", trigger = trigger)
}
