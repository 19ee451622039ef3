package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** Hand-computed ground truth for the retrieval evaluation metrics —
  * the DuckDB gate (q111) covers engine/oracle value parity on real
  * ranked lists; this pins the metric DEFINITIONS on a worked
  * example. */
class EvalSpec extends SparkSpecBase {
  import spark.implicits._

  private def ln2(x: Double): Double = math.log(x) / math.log(2.0)
  private def q9(x: Double): Long = BigDecimal(x * 1e9)
    .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  test("retrievalMetrics matches a hand-computed example at k=3") {
    // q1: rel {10,11,12}; ranked [10, 99, 11] -> hits at ranks 1, 3
    // q2: rel {20};        ranked [98, 97, 96] -> no hits
    // q3: rel {30,31};     ranked [31, 30, 95] -> hits at ranks 1, 2
    // q4 appears in truth only (no results row) -> all-zero metrics
    // q5 appears in results only -> DROPPED (metrics undefined)
    val results = Seq(
      (1L, 10L, 1), (1L, 99L, 2), (1L, 11L, 3),
      (2L, 98L, 1), (2L, 97L, 2), (2L, 96L, 3),
      (3L, 31L, 1), (3L, 30L, 2), (3L, 95L, 3),
      (5L, 50L, 1)
    ).toDF("query_id", "doc_id", "rank")
    val truth = Seq(
      (1L, 10L), (1L, 11L), (1L, 12L),
      (2L, 20L),
      (3L, 30L), (3L, 31L),
      (4L, 40L)
    ).toDF("query_id", "doc_id")
    val got = Eval.retrievalMetrics(results, truth, k = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L), s"query set ${got.keySet}")
    // q1: recall 2/3; mrr 1; dcg = 1/log2(2) + 1/log2(4) quantized
    // per-term; idcg = positions 1..3
    val dcg1 = q9(1.0 / ln2(2.0)) + q9(1.0 / ln2(4.0))
    val idcg1 = q9(1.0 / ln2(2.0)) + q9(1.0 / ln2(3.0)) + q9(1.0 / ln2(4.0))
    val ndcg1 = BigDecimal(dcg1.toDouble / idcg1.toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) == ((3L, 2L, 0.666667, 1.0, ndcg1)))
    assert(got(2L) == ((1L, 0L, 0.0, 0.0, 0.0)))
    // q3: perfect top-2 -> everything 1
    assert(got(3L) == ((2L, 2L, 1.0, 1.0, 1.0)))
    assert(got(4L) == ((1L, 0L, 0.0, 0.0, 0.0)))
  }

  test("retrievalMetrics ignores results past k") {
    val results = Seq((1L, 10L, 4)).toDF("query_id", "doc_id", "rank")
    val truth = Seq((1L, 10L)).toDF("query_id", "doc_id")
    val r = Eval.retrievalMetrics(results, truth, k = 3).collect()(0)
    assert((r.getLong(2), r.getDouble(3)) == ((0L, 0.0)),
      "a hit at rank 4 must not count at k=3")
  }

  test("retrievalSummary: unweighted means over per-query rows") {
    val perQuery = Seq(
      (1L, 2L, 1L, 0.5, 1.0, 0.8),
      (2L, 1L, 0L, 0.0, 0.0, 0.0)
    ).toDF("query_id", "n_rel", "n_hits", "recall", "mrr", "ndcg")
    val s = Eval.retrievalSummary(perQuery).collect()(0)
    assert(s.getLong(0) == 2L)
    assert((s.getDouble(1), s.getDouble(2), s.getDouble(3)) == ((0.25, 0.5, 0.4)))
  }

  test("classifierMetrics matches a hand-computed tie-aware AUC at k-level ties") {
    // scores: 0.9 (pos), 0.8 (pos), 0.8 (neg), 0.1 (neg)
    // pos-neg pairs: (0.9,0.8)=1, (0.9,0.1)=1, (0.8,0.8)=0.5,
    // (0.8,0.1)=1 -> AUC = 3.5/4 = 0.875
    val scored = Seq(
      (0.9, 1, 1), (0.8, 1, 1), (0.8, 1, 0), (0.1, 0, 0)
    ).toDF("score", "pred", "y")
    val r = Eval.classifierMetrics(scored, "score", "pred", "y").collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((4L, 2L, 2L)))
    assert(r.getDouble(3) == 0.875, s"auc ${r.getDouble(3)}")
    // pred=1 for the first three: tp=2 fp=1 fn=0 tn=1
    assert((r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)) ==
      ((2L, 1L, 0L, 1L)))
    assert(r.getDouble(8) == 0.75) // accuracy
    assert(r.getDouble(9) == 0.666667) // precision
    assert(r.getDouble(10) == 1.0) // recall
    assert(r.getDouble(11) == 0.8) // f1 = 2*2/3*1/(2/3+1) = 0.8
  }

  test("classifierMetrics: perfect, inverted, one-class and all-negative-pred edges") {
    val perfect = Seq((1.0, 1, 1), (0.0, 0, 0)).toDF("score", "pred", "y")
    val p = Eval.classifierMetrics(perfect, "score", "pred", "y").collect()(0)
    assert(p.getDouble(3) == 1.0 && p.getDouble(11) == 1.0)
    val inverted = Seq((0.0, 0, 1), (1.0, 1, 0)).toDF("score", "pred", "y")
    val i = Eval.classifierMetrics(inverted, "score", "pred", "y").collect()(0)
    assert(i.getDouble(3) == 0.0, "inverted ranking must score AUC 0")
    assert(i.getDouble(11) == 0.0, "tp=0 with nonzero denominators -> f1 0")
    val oneClass = Seq((0.5, 1, 1), (0.2, 0, 1)).toDF("score", "pred", "y")
    val o = Eval.classifierMetrics(oneClass, "score", "pred", "y").collect()(0)
    assert(o.isNullAt(3), "one-class corpus has no defined AUC")
    val noPred = Seq((0.5, 0, 1), (0.2, 0, 0)).toDF("score", "pred", "y")
    val np = Eval.classifierMetrics(noPred, "score", "pred", "y").collect()(0)
    assert(np.isNullAt(9), "no predicted positives -> precision null")
    assert(np.getDouble(10) == 0.0, "recall 0 when nothing found")
  }

  test("classifierMetrics is partitioning-invariant") {
    val base = (1 to 200).map { n =>
      (n * 0.01, if (n % 3 == 0) 1 else 0, if (n % 2 == 0) 1 else 0)
    }
    val df1 = base.toDF("score", "pred", "y").repartition(1)
    val df7 = base.toDF("score", "pred", "y").repartition(7)
    val a = Eval.classifierMetrics(df1, "score", "pred", "y").collect()(0).toSeq
    val b = Eval.classifierMetrics(df7, "score", "pred", "y").collect()(0).toSeq
    assert(a == b, s"partitioning changed the metrics: $a vs $b")
  }

  test("groupedClassifierMetrics: each slice equals the corpus-level call on that slice") {
    val scored = Seq(
      ("a", 0.9, 1, 1), ("a", 0.8, 1, 1), ("a", 0.8, 1, 0), ("a", 0.1, 0, 0),
      ("b", 1.0, 1, 1), ("b", 0.0, 0, 0),
      ("c", 0.5, 1, 1), ("c", 0.2, 0, 1) // one-class slice
    ).toDF("grp", "score", "pred", "y")
    val grouped = Eval.groupedClassifierMetrics(scored, "grp", "score", "pred", "y")
      .collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    assert(grouped.keySet == Set("a", "b", "c"))
    for (g <- Seq("a", "b", "c")) {
      val solo = Eval.classifierMetrics(
        scored.filter(col("grp") === g), "score", "pred", "y").collect()(0).toSeq
      assert(grouped(g) == solo, s"slice $g diverged from the corpus-level call")
    }
    assert(grouped("a")(3) == 0.875)
    assert(grouped("b")(3) == 1.0)
    assert(grouped("c")(3) == null, "a one-class slice has no defined AUC")
  }

  test("q112 on real documents: NB seed filter separates its own label") {
    val r = graft.SparkEntry.queries("q112_classifier_eval")(spark, sfDir).collect()(0)
    assert(r.getLong(1) > 0 && r.getLong(2) > 0, "both classes present")
    assert(r.getLong(0) == r.getLong(1) + r.getLong(2))
    // resubstitution scores on the ~31-token synthetic vocabulary:
    // the classes share almost all their tokens, so separation is
    // WEAK by construction (~0.63 at sf0.001) — the filter must beat
    // chance, and the gate's value parity pins the exact number
    assert(r.getDouble(3) > 0.55 && r.getDouble(3) < 1.0,
      s"resubstitution AUC ${r.getDouble(3)}")
    assert(r.getDouble(8) > 0.5, s"accuracy ${r.getDouble(8)}")
  }

  test("q111 on real embeddings: LSH ANN scores sane vs brute-force truth") {
    val m = graft.SparkEntry.queries("q111_retrieval_eval")(spark, sfDir)
    val s = Eval.retrievalSummary(m).collect()(0)
    assert(s.getLong(0) == 8L, s"expected 8 evaluated queries, got ${s.getLong(0)}")
    // at this corpus size the q25 geometry lands every true top-1 in
    // the LSH page (MRR 1) but misses part of the top-10 tail —
    // recall strictly between chance and perfect is exactly what the
    // evaluation exists to measure
    assert(s.getDouble(2) == 1.0, s"mean mrr ${s.getDouble(2)} — top-1 lost")
    assert(s.getDouble(1) > 0.4 && s.getDouble(1) < 1.0,
      s"mean recall ${s.getDouble(1)} outside the approximate-index band")
  }

  test("calibration matches a hand-computed two-bin example") {
    import spark.implicits._
    def sig(x: Double) = 1.0 / (1.0 + math.exp(-x))
    def fp9(x: Double) = math.rint(x * 1e9)
    val scored = Seq(
      (1L, -2.0, 0), (2L, -1.0, 0), (3L, 1.0, 1), (4L, 2.0, 1))
      .toDF("doc_id", "log_odds", "y")
    val got = Eval.calibration(scored, "doc_id", "log_odds", "y", nBins = 2)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    def conf(xs: Double*) =
      math.rint(xs.map(fp9).sum / 1e9 / xs.size * 1e6) / 1e6
    val c1 = conf(sig(-2.0), sig(-1.0))
    val c2 = conf(sig(1.0), sig(2.0))
    assert(got(1) == ((2L, c1, 0.0, math.rint(c1 * 1e6) / 1e6)), got.toString)
    assert(got(2) == ((2L, c2, 1.0, math.rint(math.abs(c2 - 1.0) * 1e6) / 1e6)),
      got.toString)
  }

  test("calibration: a perfectly-calibrated score has near-zero gaps; a " +
    "constant-score degenerate input collapses to deterministic bins") {
    import spark.implicits._
    // 100 docs per logit level; empirical positive rate per level set
    // to sigmoid(level) exactly (to rounding), so gap ~ 0 in each bin.
    val rows = for {
      (lvl, i) <- Seq(-2.0, -1.0, 0.0, 1.0, 2.0).zipWithIndex
      j <- 0 until 100
    } yield {
      val rate = 1.0 / (1.0 + math.exp(-lvl))
      (lvl.toLong * 1000 + j, lvl, if (j < math.round(rate * 100)) 1 else 0)
    }
    val got = Eval.calibration(rows.toDF("doc_id", "log_odds", "y"),
      "doc_id", "log_odds", "y", nBins = 5)
      .collect()
    assert(got.length == 5)
    got.foreach { r =>
      assert(r.getLong(1) == 100L)
      assert(r.getDouble(4) <= 0.005 + 1e-9, s"gap too large: $r")
    }
    // all-equal scores: ntile still cuts deterministically by id
    val const = (0 until 10).map(i => (i.toLong, 0.0, i % 2)).toDF("doc_id", "log_odds", "y")
    val bins = Eval.calibration(const, "doc_id", "log_odds", "y", nBins = 2)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(bins == Map(1 -> 5L, 2 -> 5L))
  }

  test("calibrationAtCuts equals calibration when the cuts are the " +
    "equal-frequency bin maxima (frozen-cut 100-TB path parity)") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    // distinct scores by construction, so rank-based and value-based
    // binning agree exactly
    val rows = (0 until 200).map(i => (i.toLong, -1.0 + i * 0.01, rnd.nextInt(2)))
    val scored = rows.toDF("doc_id", "log_odds", "y")
    val sortedScores = rows.map(_._2).sorted
    val nBins = 4
    val cuts = (1 until nBins).map(b => sortedScores(b * rows.size / nBins - 1))
    def rowsOf(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getInt(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    val rankBased = rowsOf(Eval.calibration(scored, "doc_id", "log_odds", "y", nBins))
    val cutBased = rowsOf(Eval.calibrationAtCuts(scored, "log_odds", "y", cuts))
    assert(cutBased == rankBased)
  }

  test("calibration exact-path guard: oversized input refused, hatch accepted") {
    // Guard fires on the COUNT, before the single-partition ntile is
    // ever planned — so an over-cap frame is cheap to build.
    val big = spark.range(Eval.MaxExactCalibrationRows + 1)
      .select(col("id").as("doc_id"),
        (col("id") % 7).cast("double").as("log_odds"),
        (col("id") % 2).cast("int").as("y"))
    val e = intercept[IllegalArgumentException](
      Eval.calibration(big, "doc_id", "log_odds", "y", nBins = 10))
    assert(e.getMessage.contains("allowExact"))
    assert(e.getMessage.contains("calibrationAtCuts"),
      "refusal must name the zero-window scale path")

    // Hatched: the same oversized frame plans and runs (tiny nBins
    // keeps the collect bounded); result is still nBins rows.
    val hatched = Eval.calibration(big.limit(64), "doc_id", "log_odds", "y",
      nBins = 2, allowExact = true).collect()
    assert(hatched.length == 2)
  }

  test("calibrationAtCuts: boundary scores close the bin; out-of-range " +
    "arrivals land in the edge bins") {
    import spark.implicits._
    // cuts frozen from some reference distribution; arrivals drift
    // beyond both ends — the monitoring scenario the frozen path is for
    val scored = Seq(
      (1L, -99.0, 0), (2L, 0.0, 0), (3L, 0.000001, 1), (4L, 99.0, 1))
      .toDF("doc_id", "log_odds", "y")
    val got = Eval.calibrationAtCuts(scored, "log_odds", "y", Seq(0.0))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // score == cut (doc 2) stays in bin 1; strictly-above goes to bin 2
    assert(got == Map(1 -> 2L, 2 -> 2L))
  }
}
