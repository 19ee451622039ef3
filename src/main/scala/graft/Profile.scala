package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Stage-level profiler for a declared query (measurement tooling,
  * never on a query path): runs the named queries through the bench's
  * noop sink with a stage listener attached and prints, per stage,
  * wall duration, task count, summed task time, input bytes and
  * shuffle read/write bytes — the "which Exchange is the money"
  * attribution the Spark UI would give, in a headless harness
  * (guide §1/§7: measure first, map stages back to operators).
  *
  * Usage: runMain graft.Profile <sfDir> q92_bm25_indexed[,q141_...]
  */
object Profile {
  private final case class StageRow(
      id: Int, name: String, wallMs: Long, tasks: Int,
      taskMs: Long, inputMB: Double, srMB: Double, swMB: Double)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names: Seq[String] =
      if (args.length > 1) args(1).split(",").toSeq
      else Seq("q92_bm25_indexed")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = GraftSession.builder(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val rows = new java.util.concurrent.ConcurrentLinkedQueue[StageRow]()
    val stageDesc = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    val execDesc = new java.util.concurrent.ConcurrentHashMap[String, String]()
    val listener = new SparkListener {
      override def onOtherEvent(e: org.apache.spark.scheduler.SparkListenerEvent): Unit =
        e match {
          case s: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
            execDesc.put(s.executionId.toString, s.description.takeWhile(_ != '\n'))
          case _ =>
        }
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val p = Option(js.properties)
        val d = p.flatMap(x => Option(x.getProperty("spark.sql.execution.id")))
          .map(id => s"exec$id " + Option(execDesc.get(id)).getOrElse(""))
          .orElse(p.flatMap(x => Option(x.getProperty("callSite.short"))))
          .getOrElse("")
        js.stageIds.foreach(id => stageDesc.put(id, d))
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (for {
          s <- si.submissionTime; c <- si.completionTime
        } yield c - s).getOrElse(0L)
        val m = si.taskMetrics
        val label = Option(stageDesc.get(si.stageId)).filter(_.nonEmpty)
          .getOrElse(si.name.takeWhile(_ != '\n'))
        rows.add(StageRow(
          si.stageId, label, wall, si.numTasks,
          m.executorRunTime,
          m.inputMetrics.bytesRead / 1e6,
          m.shuffleReadMetrics.remoteBytesRead / 1e6 +
            m.shuffleReadMetrics.localBytesRead / 1e6,
          m.shuffleWriteMetrics.bytesWritten / 1e6))
      }
    }

    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      // warm pass: JIT/codegen out of the attribution
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      spark.catalog.clearCache()
      rows.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      spark.catalog.clearCache()
      println(f"%n===== $name%s: ${dt}%.3f s (warm), ${rows.size}%d stages =====")
      println(f"${"stage"}%6s ${"wall_ms"}%8s ${"tasks"}%6s ${"task_ms"}%9s " +
        f"${"in_MB"}%8s ${"shR_MB"}%8s ${"shW_MB"}%8s  name")
      import scala.jdk.CollectionConverters._
      val all = rows.asScala.toSeq.sortBy(-_.wallMs)
      all.take(28).foreach { r =>
        println(f"${r.id}%6d ${r.wallMs}%8d ${r.tasks}%6d ${r.taskMs}%9d " +
          f"${r.inputMB}%8.1f ${r.srMB}%8.1f ${r.swMB}%8.1f  ${r.name}%s")
      }
      println(f"TOTAL wall(sum)=${all.map(_.wallMs).sum}%d ms over ${all.size}%d stages; " +
        f"task_ms sum=${all.map(_.taskMs).sum}%d")
    }
    spark.stop()
  }
}
