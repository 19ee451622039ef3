package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins the built-in operators don't express directly.
  *
  * The reference has no theta/range/as-of joins (SURVEY.md:171), but a
  * training-data pipeline aligning events to snapshots, sessions, or
  * feature windows needs them, and the NAIVE formulations are the two
  * classic scale-killers:
  *
  *  - `a JOIN b ON a.k = b.k AND a.t >= b.t` + "latest b" post-filter
  *    fans out to every historical right row per left row before the
  *    window prunes it — quadratic in history depth per key;
  *  - a pure inequality join (no equi key, or Spark failing to use it)
  *    plans as BroadcastNestedLoopJoin / CartesianProduct.
  *
  * Both operators here stay strictly equi-join/window shaped, so the
  * plans they produce survive a 100 TB corpus: one hash shuffle per
  * side, no nested-loop fallback, fan-out bounded by construction.
  */
object Joins {

  /** As-of join: for each left row, attach the payload of the LATEST
    * right row with the same key and `rightTime <= leftTime` (nulls
    * when no such row — left-outer semantics, ANSI `ASOF LEFT JOIN`).
    *
    * Shape: tag both sides, union them, and run ONE window pass per
    * key ordered by (time, tag) carrying `last(payload, ignoreNulls)`
    * forward — the standard union+window as-of formulation. Cost is a
    * single hash shuffle of |left|+|right| rows and a per-key sort; no
    * row ever fans out, so it is safe at any history depth (contrast
    * the inequality-join + argmax form, which materializes every
    * (left, earlier-right) pair first).
    *
    * Right rows sort BEFORE left rows at equal timestamps (tag 0 < 1),
    * giving inclusive `<=` semantics. The payload travels as one
    * struct, so all attached columns come from the SAME matched right
    * row even if some payload fields are null. Ties among right rows
    * at identical (key, time) resolve to the row last in `tieBreak`
    * order; pass a unique column for a deterministic result.
    *
    * At cluster scale the window's per-key sort spills gracefully
    * (ExternalSorter); for a SKEWED key (one user holding a large
    * fraction of all rows) pass `saltBuckets > 1`: the left side
    * salts into that many sub-partitions (deterministically, by a
    * hash of the left timestamp) and the right side replicates into
    * every salt, so each window partition carries ~1/saltBuckets of
    * the hot key's left rows plus one full copy of its right rows.
    * Result is provably identical for any saltBuckets (each left row
    * still sees every right row of its key) — JoinsSpec pins equality
    * at saltBuckets ∈ {1, 8}.
    *
    * Null semantics match ANSI `ASOF LEFT JOIN` (and DuckDB): right
    * rows with a null key or null timestamp can never match and are
    * filtered before the union; left rows always survive (null-key /
    * null-time left rows get a null payload, since no right row
    * precedes them).
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      leftTime: String,
      rightKey: String,
      rightTime: String,
      payload: Seq[String],
      tieBreak: Option[String] = None,
      saltBuckets: Int = 1): DataFrame = {
    require(saltBuckets >= 1, "saltBuckets must be >= 1")
    val leftCols = left.columns.toSeq
    require(!leftCols.exists(payload.contains),
      s"payload columns ${payload.intersect(leftCols).mkString(",")} collide with left side — alias them first")

    val taggedRight = right
      .filter(col(rightKey).isNotNull && col(rightTime).isNotNull)
      .select(
        col(rightKey).as("__asof_k"),
        col(rightTime).as("__asof_t"),
        tieBreak.map(col).getOrElse(lit(0L)).as("__asof_tie"),
        struct(payload.map(col): _*).as("__asof_payload"))
      .withColumn("__asof_tag", lit(0))
      .withColumn("__asof_salt",
        if (saltBuckets == 1) lit(0)
        else explode(sequence(lit(0), lit(saltBuckets - 1))))

    val taggedLeft = left.select(
      (col(leftKey).as("__asof_k") +:
        col(leftTime).as("__asof_t") +:
        leftCols.map(col)): _*)
      .withColumn("__asof_tag", lit(1))
      .withColumn("__asof_salt",
        if (saltBuckets == 1) lit(0)
        else pmod(xxhash64(col("__asof_t")), lit(saltBuckets)).cast("int"))

    val unioned = taggedRight.unionByName(taggedLeft, allowMissingColumns = true)

    val w = Window.partitionBy("__asof_k", "__asof_salt")
      .orderBy(col("__asof_t"), col("__asof_tag"), col("__asof_tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    unioned
      .withColumn("__asof_match", last(col("__asof_payload"), ignoreNulls = true).over(w))
      .filter(col("__asof_tag") === 1)
      .select(leftCols.map(col) ++ payload.map(p => col("__asof_match").getField(p).as(p)): _*)
  }

  /** Range join: inner-join `points` to `intervals` where
    * `pointKey = intervalKey` and `start <= pointTime < end`, WITHOUT
    * an inequality join. Both sides are mapped onto fixed-width time
    * bins (`binUs` microseconds): a point lands in exactly one bin, an
    * interval explodes into the bins it covers (ceil(len/binUs)+1 of
    * them — bounded by construction when callers size `binUs` near the
    * typical interval length). The join is then a plain equi-join on
    * (key, bin) with an exact residual filter; Catalyst plans a hash
    * join, never BroadcastNestedLoopJoin.
    *
    * Columns: all interval columns, then all point columns — caller
    * guarantees disjoint names (alias before the call).
    *
    * Degenerate inputs fail fast, not silently: the top bin is
    * clamped with `greatest` so an empty interval (end <= start) emits
    * ONE bin and dies at the residual filter — without the clamp the
    * two-arg `sequence()` would auto-step -1 and explode a spurious
    * DESCENDING bin range. An interval spanning more than
    * `maxBinsPerInterval` bins (a mis-sized `binUs` — the explode is
    * only bounded when binUs is near the typical interval length)
    * raises a sized error naming the knob instead of hitting Spark's
    * opaque sequence-length cap mid-job.
    */
  def rangeJoinBinned(
      points: DataFrame,
      intervals: DataFrame,
      pointKey: String,
      pointTime: String,
      intervalKey: String,
      intervalStart: String,
      intervalEnd: String,
      binUs: Long,
      maxBinsPerInterval: Int = 4096): DataFrame = {
    require(binUs > 0, "binUs must be positive")
    require(maxBinsPerInterval >= 1, "maxBinsPerInterval must be >= 1")
    val p = points
      .withColumn("__rj_bin", floor(unix_micros(col(pointTime)) / binUs))
    // end is exclusive: a zero-length or end-on-boundary interval must
    // not claim the next bin, hence (end - 1us) for the top bin.
    val startBin = floor(unix_micros(col(intervalStart)) / binUs)
    val endBin = greatest(startBin, floor((unix_micros(col(intervalEnd)) - 1) / binUs))
    val i = intervals
      .withColumn("__rj_bin", explode(
        when(endBin - startBin >= maxBinsPerInterval, raise_error(concat(
          lit("rangeJoinBinned: interval spans "), endBin - startBin + 1,
          lit(s" bins > maxBinsPerInterval=$maxBinsPerInterval — increase binUs"))))
          .otherwise(sequence(startBin, endBin))))
    i.join(p,
        i("__rj_bin") === p("__rj_bin") &&
          col(intervalKey) === col(pointKey) &&
          col(pointTime) >= col(intervalStart) &&
          col(pointTime) < col(intervalEnd))
      .drop("__rj_bin")
  }
}
