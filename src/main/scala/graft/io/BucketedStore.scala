package graft.io

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.XenaOps

/** Persistent bucketed accumulator for INCREMENTAL pan-cancer
  * assembly (CLI `merge-xena --bucketed-store`).
  *
  * The reference re-runs `join_xena.sh` — re-sort every matrix, every
  * time — whenever a cohort is added to a pan-cancer matrix
  * (`scripts/join_xena.sh:59-67`). At 100 TB the accumulated matrix
  * is the dominant volume, so the scale design keeps IT bucketed and
  * sorted on the row key between runs: each incremental merge is then
  * a sort-merge join where the accumulated side streams straight off
  * its bucket files (no exchange, no sort — see
  * [[graft.ops.XenaOps.writeBucketed]]); only the NEW matrices (one
  * cohort, orders of magnitude smaller) shuffle.
  *
  * Store layout under `dir`:
  *  - `store.json` — rowKey, bucket count, current version (the
  *    commit point, swapped atomically via temp + rename);
  *  - `acc_v<k>/` — version k's bucketed parquet files.
  *
  * Crash contract: data for the next version is fully written before
  * `store.json` is swapped, so a crash leaves the store readable at
  * the previous version; an orphaned `acc_v<k+1>` directory is
  * removed by the next successful commit's sweep.
  */
object BucketedStore {

  case class Meta(rowKey: String, buckets: Int, version: Int)

  private def metaPath(dir: String): Path = Paths.get(dir, "store.json")

  private def accTable(version: Int): String = s"graft_bucketed_acc_v$version"

  private def accPath(dir: String, version: Int): String =
    Paths.get(dir, s"acc_v$version").toString

  def exists(dir: String): Boolean = Files.exists(metaPath(dir))

  def readMeta(dir: String): Meta = {
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(Files.readString(metaPath(dir)))
    Meta(node.get("rowKey").asText, node.get("buckets").asInt,
      node.get("version").asInt)
  }

  private def writeMeta(dir: String, m: Meta): Unit = {
    val body =
      s"""{"rowKey": ${com.fasterxml.jackson.databind.node.TextNode.valueOf(m.rowKey).toString}, "buckets": ${m.buckets}, "version": ${m.version}}"""
    val tmp = Paths.get(dir, "store.json.tmp")
    Files.write(tmp, body.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, metaPath(dir), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Current accumulated matrix as a BUCKETED table (re-declared into
    * this session's catalog, restoring the exchange-free merge plan). */
  def accumulated(spark: SparkSession, dir: String): DataFrame = {
    val m = readMeta(dir)
    XenaOps.declareBucketedTable(
      spark, accTable(m.version), accPath(dir, m.version), m.rowKey, m.buckets)
    spark.table(accTable(m.version))
  }

  /** Initialize the store from a first matrix. */
  def init(spark: SparkSession, dir: String, first: DataFrame,
      rowKey: String, buckets: Int): Unit = {
    require(!exists(dir), s"bucketed store already initialized at $dir")
    Files.createDirectories(Paths.get(dir))
    XenaOps.writeBucketed(first, accTable(1), rowKey, buckets,
      path = Some(accPath(dir, 1)))
    writeMeta(dir, Meta(rowKey, buckets, 1))
  }

  /** Merge new matrices into the store: pairwise full-outer joins
    * where the accumulated side never shuffles or sorts, then commit
    * the result as the next bucketed version (the ONE shuffle this
    * operation pays, priming the next run's free side). Returns the
    * new accumulated matrix.
    */
  def merge(spark: SparkSession, dir: String, newDfs: Seq[DataFrame]): DataFrame = {
    require(newDfs.nonEmpty, "bucketed-store merge needs at least one new matrix")
    val m = readMeta(dir)
    val merged = newDfs.foldLeft(accumulated(spark, dir))(
      (acc, df) => acc.join(df, Seq(m.rowKey), "full_outer"))
    val next = m.version + 1
    XenaOps.writeBucketed(merged, accTable(next), m.rowKey, m.buckets,
      path = Some(accPath(dir, next)))
    writeMeta(dir, Meta(m.rowKey, m.buckets, next))
    // Sweep superseded and orphaned versions (crash leftovers) AFTER
    // the commit point moved.
    Files.list(Paths.get(dir)).forEach { p =>
      val n = p.getFileName.toString
      if (n.startsWith("acc_v") && n.stripPrefix("acc_v").toIntOption.exists(_ != next))
        org.apache.commons.io.FileUtils.deleteDirectory(p.toFile)
    }
    accumulated(spark, dir)
  }
}
