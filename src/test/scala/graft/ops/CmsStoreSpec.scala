package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** The frozen CMS store's contracts, each against an INDEPENDENT
  * driver-side re-derivation (the q135 DuckDB gate covers the full
  * engine/oracle value parity; this pins the definitions).
  */
class CmsStoreSpec extends SparkSpecBase {
  import spark.implicits._

  /** Independent md5-prefix hash — mirrors the oracle's
    * CAST(concat('0x', substr(md5(s),1,15)) AS BIGINT) identity, not
    * the engine's expression. */
  private def md5p64(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.map("%02x".format(_)).mkString.take(15), 16)
  }
  private def bucketOf(row: Int, tok: String, w: Int): Long =
    java.lang.Math.floorMod(md5p64(s"${row}_$tok"), w.toLong)

  test("CMS estimate upper-bounds every fitted token's exact count and is " +
    "exact wherever some row is collision-free (driver re-derivation)") {
    val docs = Seq(
      (1L, "aa aa aa bb"), (2L, "bb cc"), (3L, "aa cc cc dd"), (4L, "ee"))
      .toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("graft_cms_exact").toString
    val (d, w) = (4, 64)
    CmsStore.createAt(spark, docs, s"$tmp/cms", d = d, w = w)
    val exact = Map("aa" -> 4L, "bb" -> 2L, "cc" -> 3L, "dd" -> 1L, "ee" -> 1L)
    val (counters, (dA, wA)) = CmsStore.attach(spark, s"$tmp/cms")
    assert((dA, wA) == (d, w), "attach must round-trip the geometry")
    val est = CmsStore.estimateRef(
      exact.keys.toSeq.toDF("tok"), counters, d, w)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // independent driver-side CMS: same buckets, same min
    val driverEst = exact.keys.map { t =>
      t -> (0 until d).map { r =>
        val b = bucketOf(r, t, w)
        exact.collect { case (u, c) if bucketOf(r, u, w) == b => c }.sum
      }.min
    }.toMap
    assert(est == driverEst, s"engine CMS != driver CMS: $est vs $driverEst")
    exact.foreach { case (t, c) =>
      assert(est(t) >= c, s"CMS underestimated $t: ${est(t)} < $c")
      val collisionFree = (0 until d).exists { r =>
        val b = bucketOf(r, t, w)
        exact.keys.forall(u => u == t || bucketOf(r, u, w) != b)
      }
      if (collisionFree)
        assert(est(t) == c, s"collision-free $t must be exact: ${est(t)} vs $c")
    }
    // unseen token: min over rows of whatever reference mass collided
    // into its buckets — never negative, and 0 when all rows are clear
    val unseen = CmsStore.estimateRef(Seq("qq").toDF("tok"), counters, d, w)
      .collect()(0).getLong(1)
    assert(unseen == driverEst.getOrElse("qq",
      (0 until d).map { r =>
        val b = bucketOf(r, "qq", w)
        exact.collect { case (u, c) if bucketOf(r, u, w) == b => c }.sum
      }.min), "unseen-token estimate diverged from the driver CMS")
  }

  test("surge: a planted novel heavy token tops the ratio column; a " +
    "reference-heavy token does not alarm") {
    val ref = (0L until 50L).map(i => (i, "the quick brown fox the the"))
      .toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("graft_cms_surge").toString
    CmsStore.createAt(spark, ref, s"$tmp/cms")
    // batch: same shape plus a token the reference never saw, 3x/doc
    val batch = (0L until 20L).map(i => (i, "the quick zz zz zz"))
      .toDF("doc_id", "text")
    val got = CmsStore.surge(spark, s"$tmp/cms", batch, k = 5)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got.contains("zz") && got("zz")._1 == 60L, got.toString)
    // 'the' was heavy in the reference (150 occurrences): low ratio
    assert(got.contains("the") && got("the")._2 >= 150L, got.toString)
    val zzRatio = got("zz")._3
    assert(got.filterNot(_._1 == "zz").values.forall(_._3 < zzRatio),
      s"planted token must top the surge ratios: $got")
    // CMS can only OVERestimate the reference, so the novel token's
    // ratio is a conservative lower bound on its true surge
    assert(zzRatio >= 60.0 / (got("zz")._2 + 1).toDouble - 1e-9)
  }
}
