package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Character-n-gram language identification — Cavnar & Trenkle 1994
  * ("N-Gram-Based Text Categorization"): per language, a PROFILE of
  * its `topM` most frequent character n-grams ranked by frequency;
  * per document, the same profile of its own text; classification is
  * the out-of-place rank distance between the two, smallest wins.
  * This computes the `lang` column the rest of the pipeline consumes
  * (quality buckets, per-lang fertility, slice evaluation) instead of
  * assuming it arrives labeled.
  *
  * Grams: every whitespace token (lowercased, the shared
  * [[TextFunctions.tokens]] normalization) is padded to `_tok_` and
  * ALL its 2- and 3-grams counted with multiplicity — the padded
  * boundary grams ("_t", "he_") carry most of the signal in the
  * paper. Everything downstream is integer counts and integer ranks:
  * no floats anywhere, so profiles, distances, and the argmin replay
  * exactly in any engine.
  *
  * Distance (the paper's out-of-place measure, capped): for each gram
  * of the DOCUMENT profile, |rank_doc − rank_lang| when the language
  * profile contains it, else the cap `topM`; total = sum over the
  * document's profile. Predicted language = argmin distance, ties to
  * the lexicographically smallest language.
  *
  * Scale shape: the language profiles are (|langs| × topM) rows —
  * broadcast; per-document work is one narrow gram projection, one
  * per-document top-M window (partitioned by doc, data-parallel), and
  * a (doc-profile × |langs|) expansion joined against the broadcast
  * profiles — O(topM × |langs|) rows per document, independent of
  * document length, no corpus-sized shuffle beyond the per-doc gram
  * aggregate.
  */
object LangId {

  /** All padded 2- and 3-grams of every token, one row per OCCURRENCE:
    * (id, gram). */
  private def gramRows(docs: DataFrame, keyCol: String, textCol: String): DataFrame = {
    def gramsOf(tok: Column, n: Int): Column = {
      val padded = concat(lit("_"), tok, lit("_"))
      transform(sequence(lit(1), length(padded) - (n - 1)),
        i => padded.substr(i, lit(n)))
    }
    docs
      .filter(col(textCol).isNotNull)
      .select(col(keyCol),
        explode(flatten(transform(TextFunctions.tokens(col(textCol)),
          t => concat(gramsOf(t, 2), gramsOf(t, 3))))).as("gram"))
  }

  /** Rank grams per key by (count desc, gram asc), keep the top M:
    * (key, gram, rank). The window partitions by the profile key —
    * languages (bounded) or documents (data-parallel) — never a
    * single global partition. */
  private def profile(grams: DataFrame, keyCol: String, topM: Int): DataFrame =
    grams
      .groupBy(col(keyCol), col("gram"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col(keyCol)).orderBy(col("cnt").desc, col("gram"))))
      .filter(col("rank") <= topM)
      .select(col(keyCol), col("gram"), col("rank"))

  /** Train per-language profiles from a LABELED corpus:
    * (lang, gram, rank), rank 1..topM per language. */
  def langProfiles(
      docs: DataFrame,
      langCol: String,
      textCol: String,
      topM: Int = 64): DataFrame =
    profile(gramRows(docs.select(col(langCol).as("lang"), col(textCol)),
      "lang", textCol), "lang", topM)

  /** Classify every document against trained `profiles`
    * ([[langProfiles]]'s shape): (doc_id, pred_lang, distance).
    * Documents with no grams (null/whitespace-only text) are absent —
    * no profile, no honest prediction. */
  def classify(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      profiles: DataFrame,
      topM: Int = 64): DataFrame = {
    val docProf = profile(
      gramRows(docs.select(col(idCol).as("doc_id"), col(textCol)),
        "doc_id", textCol), "doc_id", topM)
    val langs = profiles.select(col("lang")).distinct()
    val dist = docProf
      .join(broadcast(langs))
      .join(broadcast(profiles.select(col("lang"), col("gram"),
        col("rank").as("lrank"))), Seq("lang", "gram"), "left")
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(coalesce(abs(col("rank") - col("lrank")), lit(topM)))
        .cast("long").as("distance"))
    dist
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("distance"), col("lang"))))
      .filter(col("rk") === 1)
      .select(col("doc_id"), col("lang").as("pred_lang"), col("distance"))
  }

  /** Self-classification confusion matrix — fit profiles on the
    * corpus's own labels, classify the same corpus, count per
    * (true, predicted): the off-diagonal is where the n-gram
    * heuristic and the incoming labels disagree (mislabeled data or
    * languages too close for the profile size).
    * Output: (lang, pred_lang, n_docs). */
  def confusion(
      docs: DataFrame,
      idCol: String,
      langCol: String,
      textCol: String,
      topM: Int = 64): DataFrame = {
    val staged = Parallelism.stage(docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"), col(langCol).as("lang"), col(textCol)))
    val profiles = langProfiles(staged, "lang", textCol, topM)
    classify(staged, "doc_id", textCol, profiles, topM)
      .join(staged.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .groupBy(col("lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n_docs"))
  }
}
