package graft.ops

import graft.SparkSpecBase

/** The parallelism guard must repartition only when the planned scan
  * would really under-parallelize — in particular, a directory of many
  * tiny files already packs to plenty of partitions via
  * `openCostInBytes` padding, and wrapping it in repartition would add
  * a needless full shuffle on every call. `ensure` returns the input
  * DataFrame UNCHANGED when it no-ops, so reference identity is the
  * no-shuffle assertion.
  */
class ParallelismSpec extends SparkSpecBase {

  test("ensure repartitions a single physically small file") {
    val dir = java.nio.file.Files.createTempDirectory("par_one").toString
    spark.range(100).selectExpr("id", "repeat('x', 10) AS s")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    val guarded = Parallelism.ensure(df)
    assert(guarded ne df,
      "one small file plans one split; the guard must round-robin it")
    assert(guarded.rdd.getNumPartitions == spark.sparkContext.defaultParallelism)
  }

  test("ensure no-ops on many tiny files that already pack to >= target partitions") {
    val dir = java.nio.file.Files.createTempDirectory("par_many").toString
    // 160 files x ~1KB: byte total says "one split", but open-cost
    // padding (4MB/file) packs them into maxSplitBytes-sized bins ->
    // the scan already parallelizes past defaultParallelism (4 here).
    spark.range(160).selectExpr("id", "repeat('x', 10) AS s")
      .repartition(160).write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    val guarded = Parallelism.ensure(df)
    assert(guarded eq df,
      "many packed files already exceed the target; no repartition node expected")
  }

  test("ensure handles non-file relations without crashing") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    val guarded = Parallelism.ensure(df)
    assert(guarded.count() == 2)
  }

  test("ensureBy fires under ensure's guard and keys the spread") {
    val dir = java.nio.file.Files.createTempDirectory("par_by").toString
    spark.range(100).selectExpr("id", "repeat('x', 10) AS s")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    val guarded = Parallelism.ensureBy(df, org.apache.spark.sql.functions.col("id"))
    assert(guarded ne df)
    assert(guarded.rdd.getNumPartitions == spark.sparkContext.defaultParallelism)
    // key-clustered, not round-robin: a same-key pair must co-locate
    val parts = guarded
      .select(org.apache.spark.sql.functions.spark_partition_id().as("p"), df("id"))
      .groupBy("id").agg(org.apache.spark.sql.functions.countDistinct("p").as("np"))
      .agg(org.apache.spark.sql.functions.max("np")).head().getLong(0)
    assert(parts == 1L, "rows of one key must land in one partition")
  }

  test("broadcastIfCounted: hints under the cap, leaves the plan alone past it") {
    val spark2 = spark
    import spark2.implicits._
    val small = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    def isHinted(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.logical.collectFirst {
        case h: org.apache.spark.sql.catalyst.plans.logical.UnresolvedHint => h
      }.nonEmpty ||
        df.queryExecution.analyzed.collectFirst {
          case r: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
            if r.hints.strategy.contains(
              org.apache.spark.sql.catalyst.plans.logical.BROADCAST) => r
        }.nonEmpty
    assert(isHinted(Parallelism.broadcastIfCounted(small, 2L)),
      "exact count under the cap must add the broadcast hint")
    assert(Parallelism.broadcastIfCounted(small, 3000000L) eq small,
      "count past the default cap must return the frame unchanged")
    spark.conf.set("spark.graft.broadcastVocabMaxRows", "1")
    try {
      assert(Parallelism.broadcastIfCounted(small, 2L) eq small,
        "a lowered cap must flip the decision to the shuffle plan")
    } finally spark.conf.unset("spark.graft.broadcastVocabMaxRows")
  }

  test("scorer results are identical under broadcast and shuffle vocab joins") {
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq(
      (1L, "aa bb aa cc", "en"), (2L, "bb bb dd", "en"),
      (3L, "cc dd ee aa", "fr"), (4L, "ee ee aa bb cc", "fr"))
      .toDF("doc_id", "text", "lang")
    import org.apache.spark.sql.functions.col
    def run(): (Array[org.apache.spark.sql.Row], Array[org.apache.spark.sql.Row]) = (
      Quality.unigramLogprob(docs).orderBy("doc_id").collect(),
      Quality.naiveBayesLogOdds(docs, col("lang") === "en")
        .orderBy("doc_id").collect())
    val (u1, n1) = run()
    spark.conf.set("spark.graft.broadcastVocabMaxRows", "0") // force shuffle path
    val (u2, n2) = try run() finally spark.conf.unset("spark.graft.broadcastVocabMaxRows")
    assert(u1.sameElements(u2), "unigramLogprob must not depend on the join strategy")
    assert(n1.sameElements(n2), "naiveBayesLogOdds must not depend on the join strategy")
  }
}
