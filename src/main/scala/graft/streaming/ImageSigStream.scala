package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{BinaryType, LongType, StringType, StructField, StructType, TimestampType}

import graft.dedup.{Dedup, SigBandStore}
import graft.multimodal.ImageOps

/** Streaming image near-dup maintenance over the persisted signature
  * band store ([[SigBandStore]]): PPM images landing in a directory
  * are decoded and aHash-signed ONCE, linked against everything seen
  * so far by the exchange-free band-bucket join, and their signatures
  * appended — the image twin of the text near-dup store (q87): the
  * corpus is never re-decoded, never re-hashed, and per-batch cost is
  * O(batch) signing + bucketed store probes.
  *
  * Each micro-batch emits the canonical (img_a < img_b, hamming)
  * pairs that involve at least one batch image:
  * cross pairs (batch vs store) from [[SigBandStore.linkNew]] and
  * within-batch pairs from [[Dedup.bandedHammingPairs]] — together,
  * after all images have streamed through, exactly the batch
  * [[ImageOps.nearDupPairs]] set over the full corpus
  * (StreamingSpec pins the equality).
  *
  * Same foreachBatch-append trade as [[AnnIndexStream.maintain]]:
  * source progress is checkpointed, sink writes are not
  * transactional, so a crash mid-batch can duplicate that batch's
  * pair rows on retry — `dropDuplicates` on read reconciles.
  */
object ImageSigStream {

  /** binaryFile's fixed schema (the streaming source requires one
    * explicitly). */
  private val binarySchema = StructType(Seq(
    StructField("path", StringType),
    StructField("modificationTime", TimestampType),
    StructField("length", LongType),
    StructField("content", BinaryType)))

  /** Start linking-and-appending PPM images from `landingDir` against
    * the signature store at `storePath` (created by
    * [[SigBandStore.createAt]] — possibly over an empty corpus).
    * Emitted pairs append as parquet under `pairsDir`.
    */
  def maintain(
      spark: SparkSession,
      landingDir: String,
      storePath: String,
      pairsDir: String,
      checkpointDir: String,
      maxHamming: Int,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val (table, (sigBits, bands, buckets)) = SigBandStore.attach(spark, storePath)
    spark.readStream.format("binaryFile").schema(binarySchema).load(landingDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // one decode+sign per image, consumed by three stages
        val sigs = ImageOps.aHash64Packed(spark,
          ImageOps.decodePpm(spark, batch.select(col("path"), col("content"))))
          .localCheckpoint(false)
        val cross = SigBandStore.linkNew(spark, table, sigs, "name", "sig",
            maxDist = maxHamming, sigBits = sigBits, bands = bands)
          .select(least(col("id_a"), col("id_b")).as("img_a"),
            greatest(col("id_a"), col("id_b")).as("img_b"), col("hamming"))
          .filter(col("img_a") =!= col("img_b")) // re-delivered image self-link
        val within = Dedup.bandedHammingPairs(sigs, "name", "sig",
            sigBits = sigBits, bands = bands, maxDist = maxHamming)
          .select(col("id_a").as("img_a"), col("id_b").as("img_b"), col("hamming"))
        cross.unionByName(within).distinct()
          .write.mode("append").parquet(pairsDir)
        SigBandStore.append(spark, table, sigs, "name", "sig",
          sigBits = sigBits, bands = bands, buckets = buckets)
      }
      .start()
  }
}
