package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BaseJoinExec, SortMergeJoinExec, ShuffledHashJoinExec}

import graft.dedup.FingerprintStore

/** Incremental fingerprint-store dedup: multi-batch correctness
  * (create → dedupe → append → dedupe), null-fingerprint semantics,
  * and the scale contract — the store side of the anti-join scans
  * bucketed with NO exchange (the corpus never reshuffles as batches
  * arrive; only each batch does).
  */
class DedupStoreSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmpPath(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("multi-batch dedupeNew/append equals brute-force global exact dedup") {
    val b1 = Seq((1L, "a b c"), (2L, "d e f"), (3L, "a b c")).toDF("doc_id", "text")
    val b2 = Seq(
      (10L, "a  B c"),  // dup of 1 after normalization
      (11L, "g h i"),   // new
      (12L, "g h i"),   // intra-batch dup of 11
      (13L, null.asInstanceOf[String])) // null text: new (store has none)
      .toDF("doc_id", "text")
    val b3 = Seq(
      (20L, "g h i"),   // dup of 11 via the APPENDED fps
      (21L, null.asInstanceOf[String]), // null dedups against 13's null fp
      (22L, "j k l"))   // new
      .toDF("doc_id", "text")

    val table = s"fp_spec_${java.util.UUID.randomUUID.toString.replace("-", "")}"
    FingerprintStore.create(b1, "doc_id", "text", table, s"${tmpPath("fp_store")}/s", buckets = 4)

    val new2 = FingerprintStore.dedupeNew(spark, table, b2, "doc_id", "text")
    assert(new2.select("doc_id").as[Long].collect().sorted.toSeq == Seq(11L, 13L))
    assert(new2.columns.toSeq == Seq("doc_id", "text"), "batch schema must round-trip")
    FingerprintStore.append(spark, table, new2, "doc_id", "text", buckets = 4)

    val new3 = FingerprintStore.dedupeNew(spark, table, b3, "doc_id", "text")
    assert(new3.select("doc_id").as[Long].collect().sorted.toSeq == Seq(22L))
  }

  test("anti-join scans the store bucketed: zero exchanges on the store side") {
    // Disable auto-broadcast: at test scale the store would broadcast
    // (also exchange-free, but vacuously). The 100-TB contract is the
    // NON-broadcast shape — store side streams from its buckets.
    val thresholdKey = "spark.sql.autoBroadcastJoinThreshold"
    val orig = spark.conf.get(thresholdKey)
    spark.conf.set(thresholdKey, "-1")
    try {
      val docs = model.Tables.documents(spark, sfDir)
      val table = s"fp_spec_${java.util.UUID.randomUUID.toString.replace("-", "")}"
      FingerprintStore.create(docs.filter(col("doc_id") % 2 === 0),
        "doc_id", "text", table, s"${tmpPath("fp_store_plan")}/s", buckets = 32)
      val planned = FingerprintStore.dedupeNew(
        spark, table, docs.filter(col("doc_id") % 2 === 1), "doc_id", "text")
      // Unwrap AQE BEFORE execution: the initial plan is a plain
      // SparkPlan tree (post-execution, exchanges hide inside
      // QueryStageExec wrappers that TreeNode.collect won't enter).
      val finalPlan = planned.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      val anti = finalPlan.collect {
        case j: BaseJoinExec if j.joinType.sql == "LEFT ANTI" => j
      }
      assert(anti.nonEmpty, s"no anti-join in the plan:\n$finalPlan")
      val storeSide = anti.head match {
        case smj: SortMergeJoinExec => smj.right
        case shj: ShuffledHashJoinExec => shj.right
        case other => other.children.last
      }
      val storeShuffles = storeSide.collect { case e: ShuffleExchangeExec => e }
      assert(storeShuffles.isEmpty,
        s"store side of the anti-join reshuffles:\n$storeSide")
      assert(storeSide.toString.contains("Bucketed: true"),
        s"store scan is not bucketed:\n$storeSide")
    } finally spark.conf.set(thresholdKey, orig)
  }
}
