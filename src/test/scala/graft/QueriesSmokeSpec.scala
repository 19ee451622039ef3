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
    // Queries without oracles would get a weaker rows-only driver
    // check; since the IVF quantizer moved to deterministic integer
    // Lloyd (reproducible in SQL, like the md5-derived LSH planes of
    // q25/q26), every declared query carries a full value oracle.
    assert(noOracle.isEmpty, s"queries missing oracle: $noOracle")
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs at sf0.001 with a non-empty schema") {
      val df = fn(spark, sfDir)
      assert(df.columns.nonEmpty)
      df.count() // forces full execution
    }
  }
}
