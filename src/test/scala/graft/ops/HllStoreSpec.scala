package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Behavior tests for the persisted HLL register store: self-growth
  * identity, unseen-language accounting, idempotent ingest, and
  * store-equals-single-shot after folding (the q133 gate covers value
  * parity at corpus scale). */
class HllStoreSpec extends SparkSpecBase {
  import spark.implicits._

  private def docsOf(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "lang", "text")

  test("growth of the store's own corpus is identically zero; an unseen " +
    "language reports est_before 0") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_hll1").toString
    val ref = docsOf((1L, "en", "aa bb cc"), (2L, "de", "dd ee"))
    HllStore.createAt(spark, ref, s"$tmp/hll", p = 10)
    val self = HllStore.growth(spark, s"$tmp/hll", ref)
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    self.foreach { case (lang, (before, after, growth)) =>
      assert(before == after && growth == 0.0, s"$lang: $before -> $after")
    }
    val alien = HllStore.growth(spark, s"$tmp/hll",
      docsOf((9L, "fr", "xx yy zz")))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(3)))).toMap
    assert(alien("fr")._1 == 0.0 && alien("fr")._2 > 0.0, alien.toString)
    // languages untouched by the batch keep their rows, growth 0
    assert(alien("en")._2 == 0.0 && alien("de")._2 == 0.0, alien.toString)
  }

  test("ingest folds registers: replay is a no-op, the store equals the " +
    "single-shot sketch over everything ingested, attach round-trips p") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_hll2").toString
    val a = docsOf((1L, "en", "aa bb"), (2L, "en", "cc"))
    val b = docsOf((3L, "en", "cc dd ee"), (4L, "de", "ff"))
    HllStore.createAt(spark, a, s"$tmp/hll", p = 10)
    assert(HllStore.attach(spark, s"$tmp/hll")._2 == 10)
    HllStore.ingest(spark, s"$tmp/hll", b)
    // after the fold, b contributes nothing new
    val again = HllStore.growth(spark, s"$tmp/hll", b)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(again.values.forall(_ == 0.0), again.toString)
    // replaying the SAME ingest leaves the registers bit-identical
    val regs1 = spark.read.parquet(s"$tmp/hll/regs")
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    HllStore.ingest(spark, s"$tmp/hll", b)
    val regs2 = spark.read.parquet(s"$tmp/hll/regs")
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    assert(regs1 == regs2, "replayed ingest moved the registers")
    // store == single-shot sketch over a ∪ b
    val tmp2 = java.nio.file.Files.createTempDirectory("graft_hll3").toString
    HllStore.createAt(spark, a.union(b), s"$tmp2/hll", p = 10)
    val want = spark.read.parquet(s"$tmp2/hll/regs")
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    assert(regs2 == want, "folded store != single-shot sketch of the union")
  }

  test("growthAndIngest ledger-first ordering: a crash between the ledger " +
    "write and the register fold replays to the SAME growth row") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_hll4").toString
    val ref = docsOf((1L, "en", "aa bb"), (2L, "de", "cc"))
    val batch = docsOf((3L, "en", "dd ee"), (4L, "de", "cc ff"))
    HllStore.createAt(spark, ref, s"$tmp/hll", p = 10)
    val regsBefore = spark.read.parquet(s"$tmp/hll/regs")
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    // First attempt: the sink persists the ledger partition, then the
    // "process" dies BEFORE growthAndIngest reaches the register fold —
    // exactly the window the ledger-first ordering exists for.
    val boom = intercept[RuntimeException] {
      HllStore.growthAndIngest(spark, s"$tmp/hll", batch,
        reportSink = { df =>
          df.write.mode("overwrite").parquet(s"$tmp/ledger/batch=0")
          throw new RuntimeException("crash between ledger and fold")
        })
    }
    assert(boom.getMessage.contains("between ledger and fold"))
    val firstLedger = spark.read.parquet(s"$tmp/ledger/batch=0")
      .collect().map(_.toSeq.toVector).toSet
    // the fold never committed: the store is byte-identical
    val regsAfterCrash = spark.read.parquet(s"$tmp/hll/regs")
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    assert(regsAfterCrash == regsBefore, "crashed run moved the registers")
    // Replay (at-least-once): same batch against the unmodified store
    // must overwrite the ledger partition with the SAME growth numbers,
    // not ~0 — and this time the fold commits.
    HllStore.growthAndIngest(spark, s"$tmp/hll", batch,
      reportSink = _.write.mode("overwrite").parquet(s"$tmp/ledger/batch=0"))
    val replayedLedger = spark.read.parquet(s"$tmp/ledger/batch=0")
      .collect().map(_.toSeq.toVector).toSet
    assert(replayedLedger == firstLedger,
      s"replayed ledger row diverged: $replayedLedger vs $firstLedger")
    // and the batch really grew the store (the report was not a no-op)
    assert(replayedLedger.exists(r => r.last match {
      case d: Double => d > 0.0
      case _ => false
    }), s"expected positive growth in $replayedLedger")
    val after = HllStore.growth(spark, s"$tmp/hll", batch)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(after.values.forall(_ == 0.0), s"fold did not absorb the batch: $after")
  }
}
