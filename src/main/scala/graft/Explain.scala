package graft

/** Plan-inspection tool: prints the FORMATTED physical plan of the
  * named queries (all queries when none given) against a scale-factor
  * directory. Used to audit pushdown / broadcast / codegen spans and
  * to regenerate EXPLAIN.md.
  *
  * Usage: runMain graft.Explain <sfDir> [q01_agg_pushdown,...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names: Seq[String] =
      if (args.length > 1) args(1).split(",").toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.builder("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      println(s"\n===== $name =====")
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        // queryExecution.explainString(FormattedMode) without running;
        // AQE-final shapes are asserted separately in PlanShapeSpec.
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      } catch {
        case e: Throwable => println(s"(failed: ${e.getMessage})")
      }
    }
    spark.stop()
  }
}
