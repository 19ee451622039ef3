package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Md5Prefix64

/** Deterministic budget-bounded sampling for corpus assembly.
  *
  * A training-mixture spec is usually "at most B tokens from each
  * source"; the sample must be a pure function of the data (stable
  * across runs, engines and cluster sizes), which rules out RNG and
  * sampling-order dependence. Documents are taken in md5-hash order —
  * a fixed, content-independent permutation per source — until the
  * source's token budget is exhausted.
  */
object Sampling {

  /** Per-key token-budget sample: within each `keyCol` group, order
    * rows by (md5(`"budget_" + id`), id) and keep every row whose
    * cumulative `weightCol` BEFORE the row is < `budget` (so the
    * budget may overshoot by at most one document — the standard
    * "last doc straddles the boundary" convention). Returns
    * (`idCol`, `keyCol`, `weightCol`, cum_before) for kept rows.
    *
    * The naive formulation is one window cumsum per key — a 100 TB
    * skew bug: a dominant source (web crawl: most of the corpus)
    * becomes a single sort task. This is the bucketed two-phase
    * prefix sum instead, the per-key sibling of
    * [[Packing.assignWithTotal]]'s global one:
    *
    *  1. bucket = top bits of the 60-bit order hash, so bucket order
    *     IS hash order and every key spreads over `nBuckets`
    *     independent sort tasks;
    *  2. per-(key, bucket) weight totals — one map-side-combined
    *     aggregate, `keys × nBuckets` rows by contract — prefix-scan
    *     on the driver to the bucket's starting offset;
    *  3. intra-bucket window cumsum (partitioned by key AND bucket)
    *     + broadcast offset join → exact global-within-key cumsum.
    *
    * The result is a pure function of the data: bucketing cannot
    * change any row's cumulative sum, only where it is computed.
    */
  def tokenBudgetPerKey(
      df: DataFrame,
      keyCol: String,
      idCol: String,
      weightCol: String,
      budget: Long,
      nBuckets: Int = 256): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(nBuckets > 0 && (nBuckets & (nBuckets - 1)) == 0,
      s"nBuckets must be a power of two, got $nBuckets")
    val shift = 60 - Integer.numberOfTrailingZeros(nBuckets)
    val spark = df.sparkSession
    import spark.implicits._
    // String keys by contract (mixture keys are names); keeps the
    // driver scan's round-trip through Row.get exact.
    val hashed = Parallelism.ensure(df)
      .select(col(idCol), col(keyCol).cast("string").as(keyCol),
        col(weightCol).cast("long").as(weightCol))
      .withColumn("ord",
        Md5Prefix64(concat(lit("budget_"), col(idCol).cast("string"))))
      .withColumn("bkt", shiftrightunsigned(col("ord"), shift).cast("int"))
      .transform(Parallelism.stage) // reused corpus-sized intermediate: pluggable storage
    // Driver-side prefix scan: one row per (key, bucket) with data —
    // bounded by contract (sources are a curated list, not data-scale).
    val totals = hashed.groupBy(col(keyCol), col("bkt"))
      .agg(sum(col(weightCol)).as("t"))
      .collect()
      .toSeq
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1)
      .toSeq
      .flatMap { case (k, rows) =>
        val sorted = rows.sortBy(_._2)
        val offs = sorted.scanLeft(0L)(_ + _._3)
        sorted.zip(offs).map { case ((_, b, _), off) => (k, b, off) }
      }
    val offDf = (if (totals.isEmpty) Seq(("", -1, 0L)) else totals)
      .toDF(keyCol, "bkt", "poffset")
    val local = Window.partitionBy(col(keyCol), col("bkt"))
      .orderBy(col("ord"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    hashed
      .withColumn("local_cum", coalesce(sum(col(weightCol)).over(local), lit(0L)))
      .join(broadcast(offDf), Seq(keyCol, "bkt"))
      .withColumn("cum_before", col("local_cum") + col("poffset"))
      .filter(col("cum_before") < budget)
      .select(col(idCol), col(keyCol), col(weightCol), col("cum_before"))
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis & Spirakis,
    * "Weighted random sampling with a reservoir", IPL 2006): each row
    * draws a uniform u and competes with key u^(1/w); the k largest
    * keys per group are exactly a size-k weighted sample without
    * replacement — the one-pass, order-independent formulation of
    * "sample k docs per source, preferring high quality". This is the
    * selection shape q62 (fixed per-stratum RATES) and
    * [[tokenBudgetPerKey]] (hash-order truncation, weight-blind
    * inclusion) can't express: every document's inclusion chance is
    * proportional to its weight, but no document can be drawn twice.
    *
    * Determinism: u is NOT a random number — it derives from the
    * 60-bit md5 of the row id (the q62/q68 recipe), so the sample is
    * reproducible across runs, partitionings, and engines, and a
    * document's draw never changes as other documents arrive. The
    * competition key is the MONOTONE transform ln(u)/w of u^(1/w)
    * (same ordering, no cross-engine `pow`), quantized to fixed
    * point ×10⁹ so the rank is engine-portable; ties break by id.
    *
    * Scale shape: one window partitioned by the group column. Group
    * cardinality is typically TINY (sources, languages) — what makes
    * this safe at 100 TB is the WindowGroupLimit pushdown on the
    * rank filter: each input partition pre-prunes to its own
    * per-group top-k BEFORE the exchange, so the per-group reducer
    * sees O(partitions × k) rows, never the group's full mass
    * (PlanShapeSpec pins the pushdown).
    *
    * Weights must be strictly positive; a non-positive weight fails
    * the job with an explicit error rather than ranking garbage.
    */
  def weightedSample(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      weight: org.apache.spark.sql.Column,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // u in (0, 1): (h + 0.5) / 2^60 — the half-step keeps u off both
    // endpoints (ln(0) and the measure-zero u = 1). h -> double loses
    // bits past 2^53, but identically (IEEE round-to-nearest) in
    // every engine, so the order is still engine-portable.
    val u = (Md5Prefix64(concat(lit("ws_"), col(idCol).cast("string")))
      .cast("double") + lit(0.5)) / lit(1152921504606846976.0) // 2^60
    val key9 = when(weight > lit(0.0),
      round(log(u) / weight * lit(1.0e9), 0).cast("long"))
      .otherwise(raise_error(concat(
        lit("weightedSample: non-positive weight for id "), col(idCol).cast("string"))))
    df.withColumn("__ws_k9", key9)
      .withColumn("rank", row_number().over(
        Window.partitionBy(col(groupCol))
          .orderBy(col("__ws_k9").desc, col(idCol))).cast("long"))
      .filter(col("rank") <= k)
      .drop("__ws_k9")
  }
}
