package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot-to-snapshot corpus diff — the release audit run before a
  * retrain: which documents ARRIVED, which VANISHED, which changed
  * content under the same id, per source. A training-data pipeline
  * republishes its corpus periodically; the diff is what review
  * actually reads (a source suddenly churning half its documents is
  * an upstream incident, not a refresh), and its counts feed the
  * data card's "what changed since" section.
  *
  * Semantics: rows key by `idCol`; content identity is `md5(text)`
  * (the engine-portable hash every exact-dedup path here already
  * uses), compared NULL-SAFELY so a null text equals null text and
  * differs from any real hash. Source attribution: `now`'s source for
  * rows present now (added/changed/unchanged — a doc that moved
  * sources counts under where it lives TODAY), `prev`'s for removed
  * rows.
  *
  * Scale shape: one full-outer join keyed by the id — both sides
  * shuffle once on the join key and the result reduces immediately to
  * a source-sized aggregate; nothing is ever collected, no state
  * grows with corpus size. (With both snapshots bucket-stored on the
  * id — the [[graft.dedup.FingerprintStore]] layout — the exchange
  * disappears entirely; the operator takes plain frames so it also
  * runs on ad-hoc parquet.)
  *
  * Output: (source, n_added, n_removed, n_changed, n_unchanged),
  * one row per source seen in either snapshot.
  */
object CorpusDiff {

  def diff(
      prev: DataFrame,
      now: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      srcCol: String = "source"): DataFrame = {
    val a = prev.select(col(idCol).as("id"),
      col(srcCol).as("p_src"), md5(col(textCol)).as("p_hash"),
      lit(1).as("p_present"))
    val b = now.select(col(idCol).as("id"),
      col(srcCol).as("n_src"), md5(col(textCol)).as("n_hash"),
      lit(1).as("n_present"))
    a.join(b, Seq("id"), "full_outer")
      .select(
        coalesce(col("n_src"), col("p_src")).as("source"),
        when(col("p_present").isNull, 1L).otherwise(0L).as("added"),
        when(col("n_present").isNull, 1L).otherwise(0L).as("removed"),
        when(col("p_present").isNotNull && col("n_present").isNotNull &&
          !(col("p_hash") <=> col("n_hash")), 1L).otherwise(0L).as("changed"),
        when(col("p_present").isNotNull && col("n_present").isNotNull &&
          (col("p_hash") <=> col("n_hash")), 1L).otherwise(0L).as("unchanged"))
      .groupBy(col("source"))
      .agg(
        sum("added").cast("long").as("n_added"),
        sum("removed").cast("long").as("n_removed"),
        sum("changed").cast("long").as("n_changed"),
        sum("unchanged").cast("long").as("n_unchanged"))
  }
}
