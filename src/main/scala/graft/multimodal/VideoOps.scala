package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Video (binary) column handling for training-data pipelines — the
  * third multimodal column type next to [[ImageOps]] and [[AudioOps]].
  *
  * Same design: video travels as an opaque `binary` column; the
  * CONTAINER parse (a real recursive RIFF/AVI chunk walk — `LIST hdrl`
  * → `avih` for stream metadata, `LIST movi` → `00db`/`00dc` chunks
  * for per-frame byte extents) runs per-partition where the binaryFile
  * scan landed each blob, no shuffle. The per-frame DECODE is the one
  * step that needs a codec library (absent in this container) and is
  * stubbed as the same deterministic content fingerprint the audio
  * path uses — md5 of the frame bytes' uppercase hex — exactly where
  * the codec call would slot in; schema, partitioning and batch shape
  * around it are real.
  *
  * Frame sampling (`everyK`) is the standard training-data move: a
  * video contributes every K-th frame, not all of them — the sampled
  * frame set is what a vision encoder would embed.
  *
  * Engine-portable identities: the DuckDB oracle cannot walk chunks,
  * but the fixture writer's canonical layout makes frame offsets a
  * closed form (movi data at byte 232 + i·(8+frame_size)); the Spark
  * side never assumes that layout — it walks whatever chunks are
  * present — so oracle and engine agree through genuinely independent
  * derivations.
  */
object VideoOps {

  /** Parsed AVI main-header metadata (`avih`). */
  final case class AviMeta(
      name: String,
      width: Int,
      height: Int,
      n_frames: Long,
      us_per_frame: Long)

  /** One sampled frame: container-level byte extent + content
    * fingerprint (the codec slot). */
  final case class VideoFrame(
      name: String,
      frame_idx: Int,
      frame_off: Long,
      frame_bytes: Int,
      frame_md5: String)

  private def leU32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  private def fourcc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Recursive chunk walk: (fourcc or LIST-type, dataOff, dataLen) for
    * every chunk in `[from, until)`, descending into LISTs. Chunks are
    * word-aligned (odd sizes pad one byte) per the RIFF spec.
    */
  private def walk(b: Array[Byte], from: Int, until: Int): Iterator[(String, Int, Int)] = {
    var pos = from
    new Iterator[(String, Int, Int)] {
      var pending: Iterator[(String, Int, Int)] = Iterator.empty
      def hasNext: Boolean = pending.hasNext || pos + 8 <= until
      def next(): (String, Int, Int) = {
        if (pending.hasNext) pending.next()
        else {
          val cc = fourcc(b, pos)
          val sz = leU32(b, pos + 4).toInt
          val dataOff = pos + 8
          // Corrupt/truncated containers must fail loud, not loop: a
          // size >= 2^31 wraps negative (pos would walk BACKWARDS
          // forever), and an overlong chunk must not escape its
          // enclosing extent. The bound is computed in LONG — an Int
          // dataOff + sz would itself wrap for sizes just under 2^31
          // and sail past the check.
          require(sz >= 0 && dataOff.toLong + sz <= until,
            s"corrupt RIFF chunk '$cc' at $pos: size $sz exceeds extent $until")
          pos = dataOff + sz + (sz & 1)
          if (cc == "LIST") {
            require(sz >= 4, s"corrupt LIST at $pos: size $sz < 4")
            val listType = fourcc(b, dataOff)
            pending = walk(b, dataOff + 4, dataOff + sz)
            (listType, dataOff + 4, sz - 4)
          } else (cc, dataOff, sz)
        }
      }
    }
  }

  private def requireAvi(name: String, b: Array[Byte]): Unit =
    require(b.length >= 12 && fourcc(b, 0) == "RIFF" && fourcc(b, 8) == "AVI ",
      s"$name: not a RIFF/AVI container")

  private def named(binaries: DataFrame): DataFrame =
    binaries.select(regexp_extract(col("path"), "[^/]+$", 0).as("name"), col("content"))

  /** Parse `avih` main headers per-partition: one row per file, no
    * shuffle. */
  def decodeAviMeta(spark: SparkSession, binaries: DataFrame): Dataset[AviMeta] = {
    import spark.implicits._
    named(binaries)
      .as[(String, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (name, b) =>
          requireAvi(name, b)
          val avih = walk(b, 12, b.length).collectFirst { case ("avih", off, _) => off }
            .getOrElse(sys.error(s"$name: no avih header"))
          AviMeta(name,
            width = leU32(b, avih + 32).toInt,
            height = leU32(b, avih + 36).toInt,
            n_frames = leU32(b, avih + 16),
            us_per_frame = leU32(b, avih))
        }
      }
  }

  /** One decoded video frame: row-major r,g,b-interleaved pixels —
    * the same batch shape as [[ImageOps.DecodedImage]], keyed by
    * frame. */
  final case class DecodedFrame(
      name: String,
      frame_idx: Int,
      width: Int,
      height: Int,
      pixels: Array[Int])

  /** REAL frame decode for uncompressed 24-bpp AVIs — no codec
    * needed, just BITMAPINFOHEADER semantics: `00db` payloads are
    * bottom-up DIB rows in BGR byte order, each row padded to 4
    * bytes. Emits every `everyK`-th frame as row-major top-down RGB,
    * feeding the same downstream analytics as the image path
    * ([[ImageOps.channelMeans]]' input shape). Compressed fourccs
    * (`00dc` with a non-DIB handler) are where a codec library would
    * take over — same slot, same schema.
    */
  def decodeDibFrames(
      spark: SparkSession,
      binaries: DataFrame,
      everyK: Int): Dataset[DecodedFrame] = {
    import spark.implicits._
    named(binaries)
      .as[(String, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (name, b) =>
          requireAvi(name, b)
          val avih = walk(b, 12, b.length).collectFirst { case ("avih", off, _) => off }
            .getOrElse(sys.error(s"$name: no avih header"))
          val w = leU32(b, avih + 32).toInt
          val h = leU32(b, avih + 36).toInt
          val rowBytes = ((w * 3 + 3) / 4) * 4
          val frameCc = "^\\d\\d(db|dc)$".r
          walk(b, 12, b.length)
            .filter(c => frameCc.findFirstIn(c._1).isDefined)
            .zipWithIndex
            .collect { case ((_, off, len), idx) if idx % everyK == 0 =>
              require(len >= rowBytes * h, s"$name frame $idx: $len bytes < ${rowBytes * h}")
              val px = new Array[Int](w * h * 3)
              var y = 0
              while (y < h) {
                val srcRow = off + (h - 1 - y) * rowBytes // bottom-up
                var x = 0
                while (x < w) {
                  val s = srcRow + x * 3
                  val d = (y * w + x) * 3
                  px(d) = b(s + 2) & 0xff     // R
                  px(d + 1) = b(s + 1) & 0xff // G
                  px(d + 2) = b(s) & 0xff     // B
                  x += 1
                }
                y += 1
              }
              DecodedFrame(name, idx, w, h, px)
            }
        }
      }
  }

  /** Per-FRAME perceptual aHash signatures across a video corpus:
    * every decoded DIB frame, re-badged as an image named
    * `file.avi#NNN`, through [[ImageOps.aHash64Packed]] — ONE
    * signature pipeline for still images and video frames. Output:
    * (name, sig). */
  def frameAHash(
      spark: SparkSession,
      binaries: DataFrame,
      everyK: Int = 1): DataFrame = {
    import spark.implicits._
    val frames = decodeDibFrames(spark, binaries, everyK)
      .map(f => ImageOps.DecodedImage(
        f"${f.name}#${f.frame_idx}%03d", f.width, f.height, f.pixels))
    ImageOps.aHash64Packed(spark, frames)
  }

  /** Frame-level near-duplicate pairs across a video corpus — static
    * intros/outros, freeze frames, re-encoded copies: (frame_a,
    * frame_b, hamming) over `file#idx` frame ids. Same scale shape as
    * [[ImageOps.nearDupPairs]]: band-bucket candidates over the
    * packed signatures, exact xor+popcount verifier on collisions
    * only — never a frames² self-join. */
  def frameNearDupPairs(
      spark: SparkSession,
      binaries: DataFrame,
      maxHamming: Int,
      everyK: Int = 1,
      bands: Int = 4,
      maxBucketSize: Long = Long.MaxValue): DataFrame =
    graft.dedup.Dedup.bandedHammingPairs(
        frameAHash(spark, binaries, everyK), "name", "sig",
        sigBits = 64, bands = bands, maxDist = maxHamming,
        maxBucketSize = maxBucketSize)
      .select(col("id_a").as("frame_a"), col("id_b").as("frame_b"), col("hamming"))

  /** Every `everyK`-th video frame chunk (`00db`/`00dc`), with its
    * container byte extent and content fingerprint. The chunk walk is
    * the real container parse; the fingerprint is the codec slot. */
  def frameSample(
      spark: SparkSession,
      binaries: DataFrame,
      everyK: Int): Dataset[VideoFrame] = {
    import spark.implicits._
    named(binaries)
      .as[(String, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (name, b) =>
          requireAvi(name, b)
          val frameCc = "^\\d\\d(db|dc)$".r
          walk(b, 12, b.length)
            .filter(c => frameCc.findFirstIn(c._1).isDefined)
            .zipWithIndex
            .collect { case ((_, off, len), idx) if idx % everyK == 0 =>
              VideoFrame(name, idx, off.toLong, len, BlobHex.fingerprint(b, off, len))
            }
        }
      }
  }
}
