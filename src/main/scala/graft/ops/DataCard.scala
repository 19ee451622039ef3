package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.functions.TextFunctions
import graft.io.JsonUtil

/** Corpus data card — the one-file JSON summary a curated training
  * corpus ships with (the "datasheet"): sizes, language and source
  * composition, exact/near duplication rates, per-language quality
  * bucket profile, and (optionally) the token-budget mixture plan.
  * Every number is produced by an operator that already carries its
  * own oracle or spec (the card ADDS no math — it composes and
  * serializes), so the card is as trustworthy as the gates behind
  * it; DomainSpec re-derives each section independently and checks
  * the JSON byte-for-byte fields.
  *
  * Scale shape: each section is one aggregate over the corpus —
  * nothing here is heavier than the operators it reuses, and the
  * collected results are summary-sized by construction (languages,
  * sources, buckets — never documents). The near-dup count reuses
  * the df-capped Jaccard pair generator, the card's only
  * corpus-pair-shaped input, already banded/capped for scale.
  */
object DataCard {

  /** Build the card JSON for `docs` (documents-table schema:
    * doc_id, source, lang, text). `budget`/`maxEpochs` add the
    * mixture-plan section when budget > 0. */
  def build(
      spark: SparkSession,
      docs: DataFrame,
      jaccardThreshold: Double = 0.8,
      maxDocFreq: Long = 100L,
      budget: Long = 0L,
      maxEpochs: Long = 2L): String = {
    val base = Parallelism.ensure(docs)
      .select(col("doc_id"), col("source"), col("lang"),
        when(col("text").isNotNull,
          size(TextFunctions.tokens(col("text")))).otherwise(0)
          .cast("long").as("n_tokens"),
        when(col("text").isNotNull, length(col("text"))).otherwise(0)
          .cast("long").as("n_chars"))
      .transform(Parallelism.stage) // four consumers: totals, langs, sources, budget
    val tot = base.agg(
      count(lit(1)).cast("long").as("n_docs"),
      sum("n_tokens").cast("long").as("n_tokens"),
      sum("n_chars").cast("long").as("n_chars")).collect()(0)
    def groupRows(key: String) = base.groupBy(key)
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum("n_tokens").cast("long").as("n_tokens"))
      .orderBy(key).collect()
      .map(r => s"""{"${key}":${JsonUtil.quote(r.getString(0))},""" +
        s""""n_docs":${r.getLong(1)},"n_tokens":${r.getLong(2)}}""")
    val exactGroups = Dedup.exact(docs, "doc_id", "text").count()
    val nearDupPairs = Dedup.ngramJaccardPairs(
      docs, "doc_id", "text", n = 2,
      threshold = jaccardThreshold, maxDocFreq = maxDocFreq).count()
    val buckets = Quality.qualityBuckets(docs, nBuckets = 3)
      .orderBy("lang", "bucket").collect()
      .map(r => s"""{"lang":${JsonUtil.quote(r.getString(0))},"bucket":${r.getLong(1)},""" +
        s""""n_docs":${r.getLong(2)},"mean_logprob":${r.getDouble(3)}}""")
    val mixture =
      if (budget <= 0L) ""
      else {
        val per = base.groupBy(col("source"))
          .agg(sum("n_tokens").cast("long").as("n_tokens"))
        val rows = Mixture.tokenBudgetAllocation(per, budget, maxEpochs)
          .orderBy("source").collect()
          .map(r => s"""{"source":${JsonUtil.quote(r.getString(0))},""" +
            s""""alloc_tokens":${r.getLong(3)},"epochs":${r.getDouble(5)},""" +
            s""""capped":${r.getInt(4)}}""")
        s""","mixture_plan":{"budget":$budget,"max_epochs":$maxEpochs,""" +
          s""""allocations":[${rows.mkString(",")}]}"""
      }
    s"""{"n_docs":${tot.getLong(0)},"n_tokens":${tot.getLong(1)},""" +
      s""""n_chars":${tot.getLong(2)},""" +
      s""""languages":[${groupRows("lang").mkString(",")}],""" +
      s""""sources":[${groupRows("source").mkString(",")}],""" +
      s""""dedup":{"exact_groups":$exactGroups,""" +
      s""""exact_dup_docs":${tot.getLong(0) - exactGroups},""" +
      s""""near_dup_pairs":$nearDupPairs,""" +
      s""""jaccard_threshold":$jaccardThreshold},""" +
      s""""quality_buckets":[${buckets.mkString(",")}]""" +
      mixture + "}"
  }

  /** Write `card.json` under `outDir`. */
  def write(spark: SparkSession, docs: DataFrame, outDir: String,
      budget: Long = 0L, maxEpochs: Long = 2L): String = {
    val json = build(spark, docs, budget = budget, maxEpochs = maxEpochs)
    val p = new org.apache.hadoop.fs.Path(s"$outDir/card.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write((json + "\n").getBytes("UTF-8")) finally out.close()
    json
  }
}
