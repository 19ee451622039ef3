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
}
