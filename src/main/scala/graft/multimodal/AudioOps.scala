package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Audio/video (binary) column handling for training-data pipelines.
  *
  * Same design as [[ImageOps]]: media travels as opaque `binary`
  * columns; container parsing runs per-partition (per-blob CPU work),
  * everything around it stays declarative. The WAV/RIFF PCM header
  * parse is real — it needs no codec library. Frame sampling is the
  * video shape too: a video container parse yields (offset, length)
  * per frame the same way; here the per-frame "decode" is stubbed as a
  * deterministic content fingerprint (md5 of the frame bytes' hex),
  * exactly where a codec call would slot in.
  *
  * Engine-portable identities: frame fingerprints hash the UPPERCASE
  * hex rendering of the bytes, because the DuckDB oracle can only md5
  * strings (`md5(substr(hex(content), 2*off+1, 2*len))`); Spark's
  * `hex()` produces the identical rendering.
  */
object AudioOps {

  /** Parsed canonical-WAV metadata (44-byte RIFF/PCM header). */
  final case class WavMeta(
      name: String,
      sample_rate: Int,
      channels: Int,
      bits: Int,
      data_bytes: Long,
      n_samples: Long)

  /** One sampled frame: evenly-spaced byte window over the PCM data. */
  final case class AudioFrame(
      name: String,
      frame_idx: Int,
      frame_off: Long,
      frame_md5: String)

  private def leU16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def leU32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  /** The canonical-44-byte-header contract, validated IN FULL: RIFF/
    * WAVE magic, a plain 16-byte PCM `fmt ` chunk at offset 12, and
    * the `data` chunk at offset 36. A WAV with an 18-byte fmt (cbSize
    * present — common encoder output) or a LIST/INFO chunk before
    * `data` would otherwise pass a magic-only check and yield silently
    * garbage sizes from the fixed offsets; fail loud WITH the
    * filename instead. */
  private def requireCanonicalWav(name: String, b: Array[Byte]): Unit = {
    require(b.length >= 44 &&
      new String(b, 0, 4, "US-ASCII") == "RIFF" &&
      new String(b, 8, 4, "US-ASCII") == "WAVE", s"$name: not RIFF/WAVE")
    require(new String(b, 12, 4, "US-ASCII") == "fmt " && leU32(b, 16) == 16L,
      s"$name: not a canonical 16-byte PCM fmt chunk at offset 12 " +
        "(extended fmt / extra chunks are out of this parser's contract)")
    require(new String(b, 36, 4, "US-ASCII") == "data",
      s"$name: no data chunk at offset 36 (non-canonical chunk layout)")
  }

  /** Decode canonical RIFF/PCM WAV headers per-partition: sample rate,
    * channel count, bit depth, data size. One row per file, no
    * shuffle — each blob parses where the binaryFile scan put it. */
  def decodeWavMeta(spark: SparkSession, binaries: DataFrame): Dataset[WavMeta] = {
    import spark.implicits._
    binaries
      .select(regexp_extract(col("path"), "[^/]+$", 0).as("name"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (name, b) =>
          requireCanonicalWav(name, b)
          val ch = leU16(b, 22)
          val rate = leU32(b, 24).toInt
          val bits = leU16(b, 34)
          val dataLen = math.min(leU32(b, 40), (b.length - 44).toLong)
          val block = ch * bits / 8
          WavMeta(name, rate, ch, bits, dataLen, dataLen / block)
        }
      }
  }

  /** One packed 64-bit energy-hash signature per clip. */
  final case class AudioSig(name: String, sig: Long)

  /** Energy-hash ("eHash") signature: the audio twin of image aHash.
    * The 16-bit PCM payload (all channels, interleaved — the hash is
    * channel-agnostic by design) splits into 64 contiguous windows
    * (sample j lands in window j·64/n); bit w is set when window w's
    * mean |sample| EXCEEDS the clip mean, compared in exact
    * cross-multiplied integers (sum_w·n > total·cnt_w — never a float
    * mean), so the signature is bit-reproducible in any engine. Bit w
    * of the hash sits at long bit (63 − w), like [[ImageOps
    * .aHash64Packed]], so xor+popcount is the window hamming distance.
    *
    * Decode is the per-blob imperative step (same contract as
    * [[decodeWavMeta]]); one row out per clip, no shuffle. Clips
    * shorter than 64 samples leave their empty windows at bit 0.
    */
  def energyHash64(spark: SparkSession, binaries: DataFrame): DataFrame = {
    import spark.implicits._
    binaries
      .select(regexp_extract(col("path"), "[^/]+$", 0).as("name"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (name, b) =>
          requireCanonicalWav(name, b)
          val dataLen = math.min(leU32(b, 40), (b.length - 44).toLong)
          val n = (dataLen / 2).toInt
          val ws = new Array[Long](64)
          val wc = new Array[Long](64)
          var total = 0L
          var j = 0
          while (j < n) {
            val lo = b(44 + 2 * j) & 0xff
            val v = (b(45 + 2 * j) << 8) | lo // signed hi byte: two's-complement 16-bit
            val a = math.abs(v).toLong
            val w = ((j.toLong * 64) / n).toInt
            ws(w) += a; wc(w) += 1; total += a
            j += 1
          }
          var sig = 0L
          var w = 0
          while (w < 64) {
            // Exact integer mean comparison: sum_w/cnt_w > total/n.
            // Widened through BigInt: ws(w)*n and total*wc(w) can
            // exceed Long for long full-scale clips (~50 min at
            // 44.1 kHz), and the oracle's sums widen to HUGEINT —
            // 64 BigInt compares per clip is noise next to the scan.
            val hot = BigInt(ws(w)) * n > BigInt(total) * wc(w)
            sig = (sig << 1) | (if (hot) 1L else 0L)
            w += 1
          }
          AudioSig(name, sig)
        }
      }
      .toDF()
  }

  /** Perceptual near-duplicate audio pairs: energy-hash signatures
    * within `maxHamming` bits — (clip_a, clip_b, hamming), clip_a <
    * clip_b. Same scale shape as [[ImageOps.nearDupPairs]]: NOT a
    * self-join — the packed signature feeds the band-bucket candidate
    * generator ([[graft.dedup.Dedup.bandedHammingPairs]]) with the
    * exact xor+popcount check as verifier on collision rows only;
    * recall is exact for `maxHamming <= 2*bands - 1`. */
  def nearDupPairs(
      spark: SparkSession,
      binaries: DataFrame,
      maxHamming: Int,
      bands: Int = 4,
      maxBucketSize: Long = Long.MaxValue): DataFrame =
    graft.dedup.Dedup.bandedHammingPairs(
        energyHash64(spark, binaries), "name", "sig",
        sigBits = 64, bands = bands, maxDist = maxHamming,
        maxBucketSize = maxBucketSize)
      .select(col("id_a").as("clip_a"), col("id_b").as("clip_b"), col("hamming"))

  /** Sample `nFrames` evenly-spaced `frameBytes`-byte windows from each
    * file's PCM payload: (name, frame_idx, frame_off, frame_md5).
    * Offsets stride `data_bytes / nFrames` from the 44-byte header
    * end; the final window clamps to the file length. This is where a
    * codec would decode the window — the fingerprint stands in for the
    * decoded tensor while keeping schema, partitioning and batch shape
    * real. */
  def frameSample(
      spark: SparkSession,
      binaries: DataFrame,
      nFrames: Int,
      frameBytes: Int): Dataset[AudioFrame] = {
    // Fail at planning, not per-file inside the job: nFrames divides
    // the payload length below (CLI-reachable via `frames --frames 0`).
    require(nFrames > 0, s"nFrames must be > 0, got $nFrames")
    require(frameBytes > 0, s"frameBytes must be > 0, got $frameBytes")
    import spark.implicits._
    binaries
      .select(regexp_extract(col("path"), "[^/]+$", 0).as("name"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (name, b) =>
          requireCanonicalWav(name, b) // same contract as decodeWavMeta
          val dataLen = math.min(leU32(b, 40), (b.length - 44).toLong)
          val stride = dataLen / nFrames
          (0 until nFrames).iterator.map { i =>
            val off = 44L + i * stride
            val len = math.min(frameBytes.toLong, b.length - off).toInt
            AudioFrame(name, i, off, BlobHex.fingerprint(b, off.toInt, len))
          }
        }
      }
  }
}
