package graft

/** t1-style smoke: every declared query runs at sf0.001 and the
  * flagship entry returns rows. Correctness vs DuckDB is the driver's
  * gate (tools/check_correctness.py locally).
  */
class QueriesSmokeSpec extends SparkSpecBase {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has an oracle or documented omission") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // Queries without oracles get a weaker rows-only driver check;
    // keep the set deliberately small and explicit.
    // q45 is the IVF ANN path: its k-means quantizer is not
    // reproducible in SQL (the LSH paths q25/q26 ARE — deterministic
    // md5 planes — and carry full oracles); recall is gated by
    // SimilaritySpec instead.
    val allowed = Set("q45_ivf_ann_topk")
    assert(noOracle.subsetOf(allowed), s"queries missing oracle: $noOracle")
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs at sf0.001 with a non-empty schema") {
      val df = fn(spark, sfDir)
      assert(df.columns.nonEmpty)
      df.count() // forces full execution
    }
  }
}
