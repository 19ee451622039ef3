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

  /** `materialize` wraps each stage boundary. The boundaries are NOT
    * single-consumer even in the plain [[pipeline]] path: `gated`
    * feeds both the decontamination scan and the anti-join's left
    * side, and `clean` feeds both the token-budget staging and the
    * final rejoin — unmaterialized, the gated subtree (survivor join,
    * quality/token gates, and the scored pass above them) re-executes
    * up to 4× inside one query (measured in the q79 profile: the same
    * checkpoint/save stages repeating across executions). So
    * [[pipeline]] materializes with [[Parallelism.stage]] (pluggable:
    * localCheckpoint locally, DISK_ONLY on clusters, none to opt
    * out), and [[withLedger]] keeps its explicit `localCheckpoint`
    * (count + next stage as added consumers). Values are unchanged —
    * a materialization barrier moves no arithmetic. */
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
    stages(docs, bench, cfg, materialize = Parallelism.stage).budgeted

  /** The pipeline's pluggable language source, production default:
    * REPLACE the incoming `lang` column with the Cavnar–Trenkle
    * classifier's prediction ([[LangId]]), profiles fit once on the
    * incoming labels. Callers that trust their labels pass `docs`
    * straight to [[pipeline]]; callers that don't (scraped corpora,
    * mixed-provenance merges) wrap with this first, so every lang the
    * pipeline groups, gates, or reports comes from ONE surface — the
    * oracle-gated CT operator — not the marker-token heuristic.
    * Classification is [[LangId.langColumn]], a zero-exchange
    * projection; the fit is the one (lang, gram) corpus aggregate.
    * Docs whose text yields no grams keep a null lang (they carry no
    * evidence either way). Null INCOMING labels are excluded from the
    * fit by [[LangId.langProfiles]]' contract (a mixed-provenance
    * corpus — exactly this method's target — carries them): a null
    * label is no evidence for any language, and a null-language
    * profile row would poison the argmin kernel. */
  def withCtLang(
      docs: DataFrame,
      langCol: String = "lang",
      textCol: String = "text",
      topM: Int = 64): DataFrame = {
    val rows = LangId.profileRows(
      LangId.langProfiles(docs, langCol, textCol, topM))
    docs.withColumn(langCol,
      LangId.langColumn(col(textCol), rows, topM))
  }

  /** [[withCtLang]] with the fit HOISTED OUT of the pipeline run — the
    * production labeling shape: profiles come from a persisted
    * [[LangIdStore]] (fit once on a trusted snapshot, frozen), so the
    * curation pass pays only the zero-exchange classification
    * projection per batch and no batch's labels can move another
    * batch's. Same contract as [[withCtLang]] when the store was fit
    * on the same corpus (the q92-vs-q88 one-contract-two-plans
    * precedent); StoreBench measures the split. */
  def withStoreLang(
      spark: org.apache.spark.sql.SparkSession,
      storePath: String,
      docs: DataFrame,
      langCol: String = "lang",
      textCol: String = "text"): DataFrame =
    docs.withColumn(langCol,
      LangIdStore.langColumn(spark, storePath, col(textCol)))

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

  /** One quality-ledger line: the row/token counts plus the stage's
    * MEASURED filter quality ([[Eval.classifierMetrics]] of "survived
    * to this stage" against the caller's trusted seed label):
    * precision = fraction of kept docs that are label-positive,
    * recall = fraction of label-positive docs still kept, f1 their
    * mean, auc the quality score's ranking power over the label
    * (stage-independent — reported once per line for the card). Null
    * metric = undefined denominator (e.g. no label-positives). */
  final case class StageQuality(
      stage: String,
      rows: Long,
      tokens: Long,
      precision: Option[Double],
      recall: Option[Double],
      f1: Option[Double],
      auc: Option[Double])

  /** [[withLedger]] with MEASURED quality per stage, not just counts —
    * what the data card cites as "filter quality":
    *
    *  - every stage boundary gets an [[Eval.classifierMetrics]] line
    *    against `seedLabel` (the caller's trusted positive class —
    *    a language, a source allowlist, a human rating column): a
    *    curation pass that silently sheds label-positive documents
    *    shows up as falling recall BETWEEN stages, not as a row count;
    *  - decontamination gets the retrieval audit
    *    ([[Retrieval.bm25TopK]] → [[Eval.retrievalMetrics]] →
    *    [[Eval.retrievalSummary]]): benchmark documents QUERY the
    *    corpus before and after the decontamination stage, a
    *    retrieved document counting as a hit iff it shares a
    *    decontamination n-gram with that query. After a correct
    *    decontamination the summary's mean_recall is 0.0 — leakage
    *    is not just filtered, it is UNFINDABLE by retrieval.
    *
    * The retrieval audit runs on the gated corpus (already
    * dedup+quality-shrunk) against the small benchmark — evaluation
    * metrology; the 100-TB decontamination itself stays the Bloom
    * path inside [[stages]].
    *
    * Returns (curated corpus, per-stage quality lines, 2-row
    * retrieval-audit frame: phase ∈ {before_decontam, after_decontam}
    * × retrievalSummary columns).
    */
  def withQualityLedger(
      docs: DataFrame,
      bench: DataFrame,
      seedLabel: org.apache.spark.sql.Column,
      cfg: Config = Config()): (DataFrame, Seq[StageQuality], DataFrame) = {
    val input = docs.localCheckpoint(false)
    val st = stages(input, bench, cfg, materialize = _.localCheckpoint(false))
    // every input doc scored ONCE: quality score (the ranking score
    // the AUC rates), token count, trusted label
    val scoredAll = input.select(col("doc_id"),
      TextFunctions.qualityScore(col("text")).as("q"),
      TextFunctions.tokenCount(col("text")).as("nt"),
      seedLabel.cast("int").as("y")).localCheckpoint(false)
    def line(stage: String, kept: DataFrame): StageQuality = {
      val pred = scoredAll
        .join(kept.select(col("doc_id"), lit(1).as("flag")), Seq("doc_id"), "left")
        .select(col("q"), coalesce(col("flag"), lit(0)).as("pred"),
          col("y"), col("nt"))
        .localCheckpoint(false) // two consumers: metrics + token sum
      val m = Eval.classifierMetrics(pred, "q", "pred", "y").head()
      val kt = pred.filter(col("pred") === 1)
        .agg(count(lit(1)).cast("long"),
          coalesce(sum("nt"), lit(0L)).cast("long")).head()
      def opt(name: String): Option[Double] =
        if (m.isNullAt(m.fieldIndex(name))) None
        else Some(m.getAs[Double](name))
      StageQuality(stage, kt.getLong(0), kt.getLong(1),
        opt("precision"), opt("recall"), opt("f1"), opt("auc"))
    }
    val lines = Seq(
      line("input", input.select("doc_id")),
      line("dedup_survivors", st.survivors),
      line("quality_gated", st.gated),
      line("decontaminated", st.clean),
      line("token_budgeted", st.budgeted))
    // retrieval audit of the decontamination stage
    val truth = contaminationPairs(
      st.gated.select("doc_id", "text"), bench, cfg.decontamN)
      .localCheckpoint(false)
    def probe(corpus: DataFrame, phase: String): DataFrame =
      Eval.retrievalSummary(Eval.retrievalMetrics(
        Retrieval.bm25TopK(corpus.select("doc_id", "text"),
          bench.select(col("doc_id").as("q_id"), col("text")), k = 10),
        truth, k = 10))
        .select(lit(phase).as("phase"), col("n_queries"),
          col("mean_recall"), col("mean_mrr"), col("mean_ndcg"))
    val audit = probe(st.gated, "before_decontam")
      .unionByName(probe(st.clean, "after_decontam"))
    (st.budgeted, lines, audit)
  }

  /** Exact (benchmark doc, corpus doc) contamination pairs — one row
    * per pair sharing ≥ 1 decontamination n-gram. The retrieval
    * audit's truth set; runs on already-curated corpora (evaluation
    * scale), while the pipeline's own decontamination stays the
    * Bloom-prefiltered per-document path. */
  private def contaminationPairs(
      corpus: DataFrame, bench: DataFrame, n: Int): DataFrame = {
    def grams(df: DataFrame, out: String): DataFrame = df.select(
      col("doc_id").as(out),
      explode(array_distinct(TextFunctions.wordNgrams(
        TextFunctions.tokens(col("text")), n))).as("gram"))
    grams(corpus, "doc_id")
      .join(grams(bench, "query_id"), Seq("gram"))
      .select("query_id", "doc_id")
      .distinct()
  }
}
