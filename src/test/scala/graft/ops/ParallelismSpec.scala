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
}
