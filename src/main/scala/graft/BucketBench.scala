package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Paired timing for the repeat-merge workload: [[graft.ops.XenaOps.mergeHorizontal]]
  * over plain parquet vs [[graft.ops.XenaOps.mergeHorizontalBucketed]] over
  * bucketed+sorted tables (the stated 100-TB answer to the reference's
  * repeated `join_xena.sh` sort|join passes — shuffle paid once at
  * write time, every subsequent merge exchange- and sort-free).
  *
  * Prints a markdown-ready block for EXPLAIN.md: exchange/sort counts
  * from both executed plans plus min-of-two merge timings and the
  * one-time bucketed-write cost.
  *
  *   sbt "runMain graft.BucketBench /root/testdata/sf0.1"
  */
object BucketBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nMatrices = 6
    val buckets = 32
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val wh = java.nio.file.Files.createTempDirectory("graft_bucket_wh").toString
    val spark = GraftSession.builder(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.warehouse.dir", wh)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // The merge workload: N single-measure matrices sharing the order
    // row key (the pan-cancer shape — same row universe, one column
    // family per source). Derived once from lineitem and persisted so
    // both paths read identical bytes.
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val plainDir = java.nio.file.Files.createTempDirectory("graft_bucket_plain").toString
    val names = (0 until nMatrices).map(i => s"bb_m$i")
    (0 until nMatrices).foreach { i =>
      li.filter(col("l_partkey") % nMatrices === i)
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_extendedprice")).as(s"m$i"))
        .write.mode("overwrite").parquet(s"$plainDir/m$i")
    }

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def shape(df: DataFrame): (Int, Int) = {
      val p = df.queryExecution.executedPlan.toString
      ("Exchange".r.findAllIn(p).length, "\\bSort\\b".r.findAllIn(p).length)
    }
    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    def unbucketed(): DataFrame = graft.ops.XenaOps.mergeHorizontal(
      names.map(n => spark.read.parquet(s"$plainDir/${n.drop(3)}")), "l_orderkey")
    // min-of-two: first run pays codegen, second is steady state.
    val tPlain = math.min(timed(noop(unbucketed())), timed(noop(unbucketed())))
    val (exPlain, sortPlain) = { val d = unbucketed(); noop(d); shape(d) }

    val tWrite = timed {
      names.foreach { n =>
        graft.ops.XenaOps.writeBucketed(
          spark.read.parquet(s"$plainDir/${n.drop(3)}"), n, "l_orderkey", buckets)
      }
    }
    def bucketed(): DataFrame =
      graft.ops.XenaOps.mergeHorizontalBucketed(spark, names, "l_orderkey")
    val tBucket = math.min(timed(noop(bucketed())), timed(noop(bucketed())))
    val (exBucket, sortBucket) = { val d = bucketed(); noop(d); shape(d) }
    val rows = bucketed().count()
    assert(graft.ops.XenaOps.canonicalEqual(unbucketed(), bucketed()),
      "bucketed merge result diverged from the unbucketed merge")

    // The repeat-merge pattern the writer exists for: ONE new matrix
    // joins the accumulated bucketed table — must be exchange-free
    // and sort-free end to end (each bucket is one pre-sorted file).
    def pairwise(): DataFrame =
      graft.ops.XenaOps.mergeHorizontalBucketed(spark, names.take(2), "l_orderkey")
    val tPair = math.min(timed(noop(pairwise())), timed(noop(pairwise())))
    val (exPair, sortPair) = { val d = pairwise(); noop(d); shape(d) }
    assert(exPair == 0 && sortPair == 0,
      s"pairwise bucketed merge must run 0 exchanges / 0 sorts, got $exPair/$sortPair")
    def pairPlain(): DataFrame = graft.ops.XenaOps.mergeHorizontal(
      names.take(2).map(n => spark.read.parquet(s"$plainDir/${n.drop(3)}")), "l_orderkey")
    val tPairPlain = math.min(timed(noop(pairPlain())), timed(noop(pairPlain())))
    val (exPairPlain, sortPairPlain) = { val d = pairPlain(); noop(d); shape(d) }

    println(f"""
      |## bucketed-merge paired timing ($sfDir, $nMatrices matrices, $rows rows, $buckets buckets, local[$cpus])
      |
      || path | merge sec (min-of-2) | exchanges | sorts |
      ||---|---|---|---|
      || pairwise mergeHorizontal (plain parquet) | $tPairPlain%.2f | $exPairPlain | $sortPairPlain |
      || pairwise mergeHorizontalBucketed | $tPair%.2f | $exPair | $sortPair |
      || $nMatrices-chain mergeHorizontal (plain parquet) | $tPlain%.2f | $exPlain | $sortPlain |
      || $nMatrices-chain mergeHorizontalBucketed | $tBucket%.2f | $exBucket | $sortBucket |
      |
      |one-time writeBucketed cost: $tWrite%.2f s (amortized across every later merge)
      |""".stripMargin)
    names.foreach(n => spark.sql(s"DROP TABLE IF EXISTS $n"))
    spark.stop()
  }
}
