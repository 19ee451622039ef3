package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import scala.collection.concurrent.TrieMap
/** Scratch profiler — not a test; run via Test/runMain graft.ProfMain <query> [reps]. */
object ProfMain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val q = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = GraftSession.builder("local[32]")
      .config("spark.sql.shuffle.partitions", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobStart = TrieMap[Int, Long]()
    val stageInfo = TrieMap[Int, String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobStart(j.jobId) = System.nanoTime()
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val dt = (System.nanoTime() - jobStart.getOrElse(j.jobId, 0L))/1e9
        if (dt > 0.15) println(f"[job] ${j.jobId} $dt%.2f s")
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val si = s.stageInfo
        val dt = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L))/1000.0
        if (dt > 0.15) println(f"[stage] ${si.stageId} ${si.name.takeWhile(_ != '\n').take(60)} $dt%.2f s tasks=${si.numTasks}")
      }
    })
    // documents exists in every profiled dir (incl. the 10x workdir,
    // which carries only the text/vector/event tables)
    spark.read.parquet(s"$sfDir/documents.parquet").count()
    for (i <- 0 until reps) {
      val t0 = System.nanoTime()
      println(s"[rep] $i start")
      SparkEntry.queries(q)(spark, sfDir).write.mode("overwrite").format("noop").save()
      val dt = (System.nanoTime()-t0)/1e9
      Thread.sleep(300)
      println(f"[prof] $q rep$i: $dt%.3f s")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
