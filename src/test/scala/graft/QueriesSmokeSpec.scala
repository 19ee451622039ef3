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

  test("Verify.orderable recurses: nested maps are unorderable, everything else sorts") {
    import org.apache.spark.sql.types._
    val m = MapType(StringType, LongType)
    assert(!Verify.orderable(m))
    assert(!Verify.orderable(ArrayType(m)))
    assert(!Verify.orderable(StructType(Seq(StructField("x", m)))))
    assert(!Verify.orderable(ArrayType(StructType(Seq(StructField("x", ArrayType(m)))))))
    assert(Verify.orderable(ArrayType(StructType(Seq(StructField("x", ArrayType(LongType)))))))
    assert(Verify.orderable(StringType) && Verify.orderable(BinaryType))
    // The canonical-order sort itself must survive a nested-map column:
    // a df with array<map<...>> used to make orderBy throw inside
    // Verify's loop and record a false query failure.
    import org.apache.spark.sql.functions._
    val df = spark.range(3).select(col("id"),
      array(map(lit("k"), col("id"))).as("am"))
    val sortable = df.schema.fields.filter(f => Verify.orderable(f.dataType))
      .map(f => col(s"`${f.name}`"))
    assert(sortable.map(_.toString).toSeq == Seq("id"))
    df.orderBy(sortable.toIndexedSeq: _*).collect() // must not throw
  }
}
