package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (binary) column handling for training-data pipelines.
  *
  * Design: image/audio/video travel as opaque `binary` columns with
  * typed metadata alongside (path, length, md5). Decode/feature steps
  * run per-partition over the binary payloads — the one place
  * imperative code is the right Spark answer (SURVEY §7, option (d)),
  * because the work is per-blob CPU, not relational. Everything
  * around the decode (scan, schema, partitioning, downstream
  * aggregation) stays declarative.
  *
  * PPM (ASCII P3) decode is implemented for real — it needs no codec
  * library. JPEG/audio/video decodes would slot into [[decodePpm]]'s
  * exact shape via an external codec; in this container those
  * libraries don't exist, so [[resizeStub]] documents the contract
  * with a deterministic stand-in rather than a fake codec.
  */
object ImageOps {

  /** Typed decoded-image row: metadata + flat RGB pixel array
    * (row-major, r,g,b interleaved — the `mapInPandas` batch shape a
    * Python feature-extractor would see). */
  final case class DecodedImage(
      name: String,
      width: Int,
      height: Int,
      pixels: Array[Int])

  /** Binary scan of an image directory: one row per file with path,
    * modification time, length and content (Spark's binaryFile
    * source). Partitioned by file — each blob decodes where it
    * lands; no shuffle. */
  def readBinary(spark: SparkSession, glob: String): DataFrame =
    spark.read.format("binaryFile").load(glob)

  /** Decode ASCII PPM (P3) payloads per-partition. Real parse, no
    * stub: header `P3\n<w> <h>\n<maxval>` then whitespace-separated
    * RGB triples. */
  def decodePpm(spark: SparkSession, binaries: DataFrame): Dataset[DecodedImage] = {
    import spark.implicits._
    binaries
      .select(
        regexp_extract(col("path"), "[^/]+$", 0).as("name"),
        col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (name, bytes) =>
          // PPM comments ('#' to end of line) are spec-legal anywhere
          // whitespace is (GIMP/ImageMagick emit a CREATOR line) —
          // strip them before tokenizing, or the positional header
          // parse reads a comment word as the width.
          val toks = new String(bytes, java.nio.charset.StandardCharsets.US_ASCII)
            .replaceAll("#[^\n]*", " ")
            .split("\\s+").filter(_.nonEmpty)
          require(toks.headOption.contains("P3"), s"$name: not an ASCII PPM")
          try {
            val w = toks(1).toInt
            val h = toks(2).toInt
            DecodedImage(name, w, h, toks.drop(4).map(_.toInt))
          } catch {
            case e: NumberFormatException =>
              throw new IllegalArgumentException(s"$name: malformed PPM: ${e.getMessage}", e)
          }
        }
      }
  }

  /** Per-channel mean brightness over the decoded pixels — computed
    * declaratively with codegen'd HOFs over the pixel array (the
    * decode is imperative; the analytics stay relational). */
  def channelMeans(decoded: Dataset[DecodedImage]): DataFrame = {
    def channelMean(ch: Int) = {
      val vals = filter(
        zip_with(col("pixels"), sequence(lit(0), size(col("pixels")) - 1),
          (p, i) => when(i % 3 === ch, p)),
        v => v.isNotNull)
      round(aggregate(vals, lit(0L), (acc, v) => acc + v).cast("double") / size(vals), 6)
    }
    decoded.toDF().select(
      col("name"), col("width"), col("height"),
      channelMean(0).as("mean_r"),
      channelMean(1).as("mean_g"),
      channelMean(2).as("mean_b"))
  }

  /** Resize contract (STUB): a real implementation would decode via a
    * codec library (absent in this container) and box-filter to
    * `(outW, outH)`. The deterministic stand-in keeps the exact
    * signature, schema and per-partition batch shape so the pipeline
    * around it is real and testable: it stride-samples the pixel grid
    * — which IS a correct nearest-neighbor resize for PPM inputs.
    */
  def resizeNearest(
      spark: SparkSession,
      decoded: Dataset[DecodedImage],
      outW: Int,
      outH: Int): Dataset[DecodedImage] = {
    import spark.implicits._
    decoded.mapPartitions { rows =>
      rows.map { img =>
        val px = Array.ofDim[Int](outW * outH * 3)
        var y = 0
        while (y < outH) {
          val sy = y * img.height / outH
          var x = 0
          while (x < outW) {
            val sx = x * img.width / outW
            val src = (sy * img.width + sx) * 3
            val dst = (y * outW + x) * 3
            px(dst) = img.pixels(src); px(dst + 1) = img.pixels(src + 1); px(dst + 2) = img.pixels(src + 2)
            x += 1
          }
          y += 1
        }
        DecodedImage(img.name, outW, outH, px)
      }
    }
  }

  /** Perceptual average-hash (aHash) signature: nearest-resize to
    * 8×8, per-cell brightness g = r+g+b, bit i = [64·gᵢ > Σg] — the
    * mean comparison kept in EXACT integers (64·g vs the total, never
    * a float mean), so the 64-bit signature is bit-reproducible in
    * any engine. The resize is the imperative per-blob step; the
    * hashing itself is declarative HOFs (the [[channelMeans]]
    * pattern).
    *
    * Output: (name, bits) with bits an int[64] of 0/1.
    */
  def aHash64(spark: SparkSession, decoded: Dataset[DecodedImage]): DataFrame = {
    val eight = resizeNearest(spark, decoded, 8, 8).toDF()
    val gs = transform(sequence(lit(0), lit(63)), k =>
      element_at(col("pixels"), k * 3 + 1) +
        element_at(col("pixels"), k * 3 + 2) +
        element_at(col("pixels"), k * 3 + 3))
    eight
      .select(col("name"), gs.as("gs"))
      .withColumn("total", aggregate(col("gs"), lit(0L), (acc, g) => acc + g))
      .select(col("name"),
        transform(col("gs"), g =>
          when(g.cast("long") * 64 > col("total"), 1).otherwise(0)).as("bits"))
  }

  /** [[aHash64]] with the 64 bits PACKED into one long — bit k of the
    * array at long bit (63 - k), so two packed signatures xor+popcount
    * to exactly the array hamming distance. This is the signature the
    * band-bucket candidate machinery keys on; bit 63 may be set
    * (negative long), which is why the banding shifts unsigned.
    */
  def aHash64Packed(spark: SparkSession, decoded: Dataset[DecodedImage]): DataFrame =
    aHash64(spark, decoded).select(col("name"),
      aggregate(col("bits"), lit(0L),
        (acc, b) => shiftleft(acc, 1).bitwiseOR(b.cast("long"))).as("sig"))

  /** Perceptual near-duplicate image pairs: aHash signatures within
    * `maxHamming` bits — (img_a, img_b, hamming), img_a < img_b.
    *
    * Scale shape: NOT a self-join. The packed signature feeds the
    * same band-bucket candidate generator as text SimHash
    * ([[graft.dedup.Dedup.bandedHammingPairs]] — `bands` 16-bit
    * slices of the 64-bit signature, equal-band bucket join plus
    * Hamming-1 probes), with the exact xor+popcount hamming check as
    * the verifier on collision rows only. Recall is exact for
    * `maxHamming <= 2*bands - 1` (enforced there); candidate volume
    * is bounded by bucket sizes, never corpus². `maxBucketSize` caps
    * degenerate buckets (mass-identical images) at the documented
    * recall trade-off.
    */
  def nearDupPairs(
      spark: SparkSession,
      decoded: Dataset[DecodedImage],
      maxHamming: Int,
      bands: Int = 4,
      maxBucketSize: Long = Long.MaxValue): DataFrame =
    graft.dedup.Dedup.bandedHammingPairs(
        aHash64Packed(spark, decoded), "name", "sig",
        sigBits = 64, bands = bands, maxDist = maxHamming,
        maxBucketSize = maxBucketSize)
      .select(col("id_a").as("img_a"), col("id_b").as("img_b"), col("hamming"))
}
