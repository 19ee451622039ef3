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
