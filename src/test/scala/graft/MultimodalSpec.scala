package graft

import org.apache.spark.sql.functions._
import graft.multimodal.ImageOps

/** Multimodal binary-column pipeline: decode correctness against a
  * hand-computed fixture and the resize contract (shape, determinism,
  * nearest-neighbor identity at 1:1).
  */
class MultimodalSpec extends SparkSpecBase {

  private val imgGlob = "/root/repo/fixtures/images/*.ppm"
  private lazy val decoded = ImageOps.decodePpm(
    spark, ImageOps.readBinary(spark, imgGlob))

  test("PPM decode: dimensions and pixel count agree per image") {
    val rows = decoded.collect()
    assert(rows.nonEmpty)
    rows.foreach { img =>
      assert(img.pixels.length == img.width * img.height * 3,
        s"${img.name}: ${img.pixels.length} != ${img.width}x${img.height}x3")
    }
  }

  test("channelMeans equals a driver-side recomputation") {
    val spark2 = spark
    import spark2.implicits._
    val got = ImageOps.channelMeans(decoded)
      .select(col("name"), col("mean_r"), col("mean_g"), col("mean_b"))
      .as[(String, Double, Double, Double)].collect()
      .map { case (k, r, g, b) => k -> ((r, g, b)) }.toMap
    decoded.collect().foreach { img =>
      def mean(ch: Int): Double = {
        val vs = img.pixels.zipWithIndex.collect { case (p, i) if i % 3 == ch => p.toLong }
        BigDecimal(vs.sum.toDouble / vs.length)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
      val (r, g, b) = got(img.name)
      assert((r, g, b) == ((mean(0), mean(1), mean(2))), img.name)
    }
  }

  test("resizeNearest: target shape, and identity at the source size") {
    val small = ImageOps.resizeNearest(spark, decoded, 2, 2).collect()
    small.foreach { img =>
      assert(img.width == 2 && img.height == 2 && img.pixels.length == 12)
    }
    // 1:1 resize must be the identity (stride sampling hits every
    // source pixel exactly once).
    decoded.collect().foreach { img =>
      val same = ImageOps.resizeNearest(
        spark, decoded.filter(col("name") === img.name), img.width, img.height)
        .head()
      assert(same.pixels.toSeq == img.pixels.toSeq, s"${img.name}: 1:1 resize not identity")
    }
    // Deterministic: two runs agree.
    val again = ImageOps.resizeNearest(spark, decoded, 2, 2).collect()
    assert(small.map(i => (i.name, i.pixels.toSeq)).toSet ==
      again.map(i => (i.name, i.pixels.toSeq)).toSet)
  }
}
