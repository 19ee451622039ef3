package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.functions.TextFunctions

/** The end-to-end training-corpus curation pipeline — the standard
  * LLM-data shape (near-dup → survivor → quality gate → decontaminate
  * → budget). This is q79's dataflow factored into an operator so the
  * oracle-gated query, the `curate-pipeline` CLI verb and the 10×
  * rehearsal all run ONE code path:
  *
  *  1. near-dup clusters over the corpus (inverted-index Jaccard
  *     edges + connected components);
  *  2. best-quality survivor per cluster ([[Dedup.keepBestPerCluster]]);
  *  3. quality and token-length gates;
  *  4. benchmark decontamination of the survivors via the
  *     Bloom-prefiltered n-gram overlap (no false negatives, so
  *     prefilter + exact confirm ≡ exact);
  *  5. a per-source token budget over what remains (bucketed
  *     distributed prefix sum).
  *
  * Scale shape: every stage is the individually-audited operator —
  * the composition adds only `doc_id` equi-joins (survivor set is
  * dedup-output-sized; the decontamination flag set is
  * contamination-sized). Nothing here is new physical work.
  *
  * `docs` must carry (doc_id, text, source, lang); `bench` carries
  * (doc_id, text) — the held-out set that must not leak into
  * training. Output: (doc_id, source, n_tokens, lang, quality).
  */
object Curation {

  /** Stage thresholds (defaults = q79's gate-pinned values). */
  final case class Config(
      ngramN: Int = 2,
      jaccardThreshold: Double = 0.8,
      maxDocFreq: Long = 100L,
      minQuality: Double = 0.5,
      minTokens: Int = 5,
      maxTokens: Int = 1000,
      decontamN: Int = 5,
      budgetPerSource: Long = 10000L)

  /** Every stage boundary, for callers that audit or count; plain
    * [[pipeline]] callers only consume `budgeted`. */
  final case class Stages(
      survivors: DataFrame,
      gated: DataFrame,
      clean: DataFrame,
      budgeted: DataFrame)

  /** One ledger line: rows leaving a named stage. */
  final case class StageCount(stage: String, rows: Long)

  /** `materialize` wraps each stage boundary — identity for the
    * one-consumer query path (q79: expression-tree-identical to the
    * inline composition the oracle transcribes), `localCheckpoint`
    * for [[withLedger]] where every boundary has two consumers
    * (count + next stage) and the cluster pass must not run twice. */
  def stages(
      docs: DataFrame,
      bench: DataFrame,
      cfg: Config = Config(),
      materialize: DataFrame => DataFrame = identity): Stages = {
    val scored = docs.select(col("doc_id"),
      TextFunctions.qualityScore(col("text")).as("quality"))
    val edges = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      n = cfg.ngramN, threshold = cfg.jaccardThreshold, maxDocFreq = cfg.maxDocFreq)
    val clusters = Dedup.dupClusters(docs, edges, "doc_id")
      .select(col("doc_id"), col("cluster_id"))
    val survivors = materialize(
      Dedup.keepBestPerCluster(clusters, scored, "doc_id", "quality")
        .select(col("doc_id"), col("quality")))
    val gated = materialize(survivors
      .join(docs.select(col("doc_id"), col("text"), col("source"), col("lang"),
        TextFunctions.tokenCount(col("text")).as("n_tokens")), Seq("doc_id"))
      .filter(col("quality") >= cfg.minQuality &&
        col("n_tokens").between(cfg.minTokens, cfg.maxTokens)))
    val flagged = Dedup.crossNgramOverlapBloom(
      gated.select("doc_id", "text"), bench, "doc_id", "text", n = cfg.decontamN)
      .select("doc_id")
    val clean = materialize(gated.join(flagged, Seq("doc_id"), "left_anti"))
    val budgeted = materialize(Sampling.tokenBudgetPerKey(
      clean.select("doc_id", "source", "n_tokens"),
      "source", "doc_id", "n_tokens", budget = cfg.budgetPerSource)
      .select(col("doc_id"), col("source"), col("n_tokens"))
      .join(clean.select(col("doc_id"), col("lang"), col("quality")), Seq("doc_id")))
    Stages(survivors, gated, clean, budgeted)
  }

  /** The curated corpus — q79's exact result. */
  def pipeline(docs: DataFrame, bench: DataFrame, cfg: Config = Config()): DataFrame =
    stages(docs, bench, cfg).budgeted

  /** [[pipeline]] plus the per-stage row-count ledger a curation run
    * ships with its output — the operational audit trail ("n in, n
    * survived dedup, n passed gates, n decontaminated, n under
    * budget", plus the final token total). Stage boundaries are
    * localCheckpointed so the count action and the downstream stage
    * share one materialization instead of re-running the cluster
    * pass per consumer. */
  def withLedger(
      docs: DataFrame,
      bench: DataFrame,
      cfg: Config = Config()): (DataFrame, Seq[StageCount]) = {
    val input = docs.localCheckpoint(false)
    val st = stages(input, bench, cfg, materialize = _.localCheckpoint(false))
    val ledger = Seq(
      StageCount("input", input.count()),
      StageCount("dedup_survivors", st.survivors.count()),
      StageCount("quality_gated", st.gated.count()),
      StageCount("decontaminated", st.clean.count()),
      StageCount("token_budgeted", st.budgeted.count()),
      StageCount("final_tokens",
        st.budgeted.agg(coalesce(sum("n_tokens"), lit(0L)).cast("long")).head().getLong(0)))
    (st.budgeted, ledger)
  }
}
