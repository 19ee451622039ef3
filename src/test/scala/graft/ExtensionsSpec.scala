package graft

/** The SparkSessionExtensions surface: a session configured with
  * `graft.plans.GraftExtensions` resolves graft functions from SQL
  * text, with the same semantics as the DataFrame API kernel.
  */
class ExtensionsSpec extends SparkSpecBase {

  test("dot_product is callable from SQL via GraftExtensions") {
    // The shared test session was not built with the extension;
    // register through the same descriptor the extension injects —
    // identical registry path, no second SparkContext.
    val (id, info, builder) = graft.plans.GraftExtensions.dotProductDescriptor
    spark.sessionState.functionRegistry.registerFunction(id, info, builder)

    val r = spark.sql(
      "SELECT dot_product(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .head().getDouble(0)
    assert(r == 32.0)

    // Same value as the DataFrame API kernel on a real table.
    import org.apache.spark.sql.functions._
    val emb = graft.model.Tables.embeddings(spark, sfDir).limit(16)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    emb.createOrReplaceTempView("ext_emb")
    val sqlSum = spark.sql("SELECT sum(dot_product(v, v)) AS s FROM ext_emb")
      .head().getDouble(0)
    val dfSum = emb.select(
      sum(graft.functions.VectorFunctions.dot(col("v"), col("v"))).as("s"))
      .head().getDouble(0)
    assert(math.abs(sqlSum - dfSum) < 1e-12)
  }

  test("CollapseJsonExtracts rewrites multi-field extraction to one from_json") {
    import org.apache.spark.sql.functions._
    val spark2 = spark
    import spark2.implicits._
    // The shared session is built by GraftSession, which installs
    // GraftExtensions — the rule must fire with no extra setup.
    // Non-foldable input (literal JSON would be constant-folded away
    // before the plan assertion could see the rewrite).
    val df = spark.range(1)
      .select(format_string("""{"a":"x%d","b":"y"}""", col("id")).as("j"))
    val q = df.select(
      get_json_object(col("j"), "$.a").as("a"),
      get_json_object(col("j"), "$.b").as("b"))
    val opt = q.queryExecution.optimizedPlan.toString
    assert(opt.contains("from_json"), "rule did not fire:\n" + opt)
    assert(!opt.contains("get_json_object"), "extraction not collapsed:\n" + opt)
    assert(q.head() == org.apache.spark.sql.Row("x0", "y"))
  }

  test("CollapseJsonExtracts preserves get_json_object semantics case by case") {
    import org.apache.spark.sql.functions._
    val spark2 = spark
    import spark2.implicits._
    val rows = Seq(
      """{"a": "plain", "b": 1}""",
      "{\"a\": \"esc\\\"aped\\nnl\", \"b\": 1.5}",
      """{"a": 12345678901234567890, "b": true}""",
      """{"a": {"x": [1,2]}, "b": [1, {"y":2}]}""",
      """{"a": null, "b": "x"}""",
      """{"b": "missing a"}""",
      """not json at all""",
      """{"a": "", "b": ""}""",
      "{\"a\": \"raw\tcontrol\", \"b\": 1}", // unescaped TAB: lenient parse
      null
    ).toDF("j")
    // Ground truth: json_tuple — the independent single-parse streaming
    // implementation of the same top-level-field semantics, which the
    // rule never rewrites. get_json_object below IS rewritten (the
    // session installs GraftExtensions), so this compares the
    // from_json-based rewrite against an unrewritten reference.
    val expected = rows.select(json_tuple(col("j"), "a", "b")).collect()
    val actual = rows.select(
      get_json_object(col("j"), "$.a"), get_json_object(col("j"), "$.b")).collect()
    assert(actual.toSeq == expected.toSeq)
  }

  test("CollapseJsonExtracts can be disabled per session") {
    import org.apache.spark.sql.functions._
    val df = spark.range(1)
      .select(format_string("""{"a":"x%d","b":"y"}""", col("id")).as("j"))
    val q = df.select(
      get_json_object(col("j"), "$.a").as("a"),
      get_json_object(col("j"), "$.b").as("b"))
    val key = graft.plans.CollapseJsonExtracts.EnabledKey
    spark.conf.set(key, "false")
    try {
      val opt = q.queryExecution.optimizedPlan.toString
      assert(opt.contains("get_json_object") && !opt.contains("from_json"),
        "escape hatch did not suppress the rewrite:\n" + opt)
    } finally spark.conf.unset(key)
  }

  test("CollapseJsonExtracts leaves single-field and complex paths alone") {
    import org.apache.spark.sql.functions._
    val spark2 = spark
    import spark2.implicits._
    val df = spark.range(1)
      .select(format_string("""{"a":{"x":%d},"b":[2]}""", col("id")).as("j"))
    // One simple path only: a lone full parse would not pay for itself.
    val single = df.select(get_json_object(col("j"), "$.a").as("a"))
      .queryExecution.optimizedPlan.toString
    assert(single.contains("get_json_object") && !single.contains("from_json"))
    // Nested / subscripted paths keep the early-exit streaming parser.
    val complex = df.select(
      get_json_object(col("j"), "$.a.x").as("ax"),
      get_json_object(col("j"), "$.b[0]").as("b0"))
      .queryExecution.optimizedPlan.toString
    assert(complex.contains("get_json_object") && !complex.contains("from_json"))
  }

  test("text/ann kernels are callable from SQL via GraftExtensions") {
    // The shared session installs GraftExtensions, so these resolve
    // with no extra registration.
    val toks = spark.sql(
      """SELECT word_ngrams(array('a','b','c'), 2) AS g,
        |       rolling_hashes('abcd', 2) AS rh,
        |       winnow_minima(array(9L, 1L, 9L, 2L), 2) AS wm,
        |       hyperplane_sig(array(1.0d, -1.0d), 2, 4) AS hs,
        |       md5_prefix64('x') AS m""".stripMargin).head()
    assert(toks.getSeq[String](0) == Seq("a b", "b c"))
    assert(toks.getSeq[Long](1).length == 3)
    assert(toks.getSeq[Long](2) == Seq(1L, 2L))
    assert(toks.getLong(3) == toks.getLong(3)) // resolves + evaluates
    assert(toks.getLong(4) >= 0L)
  }

  test("SQL kernels coerce or reject wrong-typed arguments at analysis") {
    // array<int> coerces to array<double>: same value as the exact call.
    val coerced = spark.sql(
      "SELECT dot_product(array(1, 2, 3), array(4.0d, 5.0d, 6.0d)) AS d")
      .head().getDouble(0)
    assert(coerced == 32.0)
    // A string argument where an array is required fails ANALYSIS —
    // not mid-job with a ClassCastException.
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT md5_prefix64(array(1, 2))").collect()
    }
    assert(err.getMessage.toLowerCase.contains("type"))
  }

  test("minhash_sketch aggregate is callable from SQL via GraftExtensions") {
    val (id, info, builder) = graft.plans.GraftExtensions.minhashSketchDescriptor
    spark.sessionState.functionRegistry.registerFunction(id, info, builder)

    val spark2 = spark
    import spark2.implicits._
    import org.apache.spark.sql.functions._
    Seq((1L, 5L), (1L, 9L), (2L, 7L)).toDF("g", "h")
      .createOrReplaceTempView("ext_mh")
    val sqlSig = spark.sql(
      "SELECT g, minhash_sketch(h, 4) AS sig FROM ext_mh GROUP BY g")
      .as[(Long, Seq[Long])].collect().toMap
    val dfSig = Seq((1L, 5L), (1L, 9L), (2L, 7L)).toDF("g", "h")
      .groupBy(col("g"))
      .agg(graft.functions.MinHashSketchAgg.minhashSketch(col("h"), 4).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(sqlSig == dfSig)
  }
}
