package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Download-cache reconciliation (SURVEY §2 S9/U4): the reference
  * skips downloads whose local file md5 matches the remote catalog
  * and deletes stale local files (`xena_dataset.py:571-664`, md5
  * check at `:591-622`; md5 at `:246-261`).
  *
  * Re-expressed as set algebra over two catalogs — `remote(name,
  * md5sum)` from the GDC files endpoint and `local(name, md5sum)`
  * computed by a binaryFile scan — so the reconciliation is two
  * anti-joins, not a per-file driver loop, and the md5 computation is
  * distributed over the files.
  */
object DownloadCache {

  /** Local catalog: one row per file under `glob` with its md5 —
    * a distributed binaryFile scan (the checksum work happens where
    * the blocks are). */
  def localCatalog(spark: SparkSession, glob: String): DataFrame =
    spark.read.format("binaryFile").load(glob)
      .select(
        regexp_extract(col("path"), "[^/]+$", 0).as("name"),
        md5(col("content")).as("md5sum"))

  /** Files to (re-)download: in the remote catalog but locally absent
    * OR present with a different md5. Anti-join on (name, md5sum). */
  def toDownload(remote: DataFrame, local: DataFrame): DataFrame =
    remote.join(local, Seq("name", "md5sum"), "left_anti")

  /** Stale local files to delete: present locally but no longer in
    * the remote catalog under any md5. Anti-join on name. */
  def toDelete(local: DataFrame, remote: DataFrame): DataFrame =
    local.join(remote.select("name"), Seq("name"), "left_anti")

  /** Up-to-date files (the skip set): md5-exact matches. */
  def upToDate(remote: DataFrame, local: DataFrame): DataFrame =
    remote.join(local, Seq("name", "md5sum"), "left_semi")
}
