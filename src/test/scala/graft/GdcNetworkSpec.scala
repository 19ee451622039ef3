package graft

import java.io.{ByteArrayInputStream, IOException, InputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths}

import graft.gdc.{GdcCatalog, GdcResponse, GdcRetryExhausted, HttpTransport, RetryingTransport}
import graft.io.{DownloadCache, DownloadExecutor}

/** The network edge: retry policy (`utils.py:187-204`), download
  * executor (`gdc.py:360-431`, `xena_dataset.py:571-664`) and the
  * `gdc-check-new` summary (`gdc.py:615-669`, `main.py:43-48`) — all
  * against fake transports, no egress.
  */
class GdcNetworkSpec extends SparkSpecBase {

  private def resp(status: Int, body: String = "") =
    GdcResponse(status, body.getBytes(UTF_8))

  /** Transport scripted with a status sequence; 200 thereafter. */
  private class Scripted(statuses: Int*) extends HttpTransport {
    var calls = 0
    override def get(ep: String, params: Map[String, String]): GdcResponse = {
      val s = if (calls < statuses.length) statuses(calls) else 200
      calls += 1
      resp(s, if (s == 200) "ok" else s"err$s")
    }
  }

  // ---- RetryingTransport -------------------------------------------

  test("retry: recovers after transient 502/504, urllib3 backoff schedule") {
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    val raw = new Scripted(502, 504, 500)
    val t = new RetryingTransport(raw, retries = 10, sleeper = sleeps += _)
    val r = t.get("files", Map.empty)
    assert(r.status == 200 && r.text == "ok")
    assert(raw.calls == 4, "3 failures + 1 success")
    // urllib3 get_backoff_time: first retry immediate, then
    // 0.5 * 2^(n-1) seconds = 1000, 2000 ms. Zero sleeps are skipped.
    assert(sleeps.toSeq == Seq(1000L, 2000L))
  }

  test("retry: gives up after `retries` attempts with the last status") {
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    val raw = new Scripted(Seq.fill(20)(500): _*)
    val t = new RetryingTransport(raw, retries = 3, sleeper = sleeps += _)
    val e = intercept[GdcRetryExhausted](t.get("files", Map.empty))
    assert(e.lastStatus.contains(500))
    assert(raw.calls == 4, "retries=3 means 4 total attempts")
    assert(sleeps.toSeq == Seq(1000L, 2000L), "no sleep after the final failure")
  }

  test("retry: interruption is NOT retryable — one attempt, no backoff") {
    var calls = 0
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    val raw = new HttpTransport {
      override def get(ep: String, params: Map[String, String]): GdcResponse = {
        calls += 1
        throw new graft.gdc.GdcInterrupted(new InterruptedException("cancelled"))
      }
    }
    val t = new RetryingTransport(raw, retries = 10, sleeper = sleeps += _)
    intercept[graft.gdc.GdcInterrupted](t.get("files", Map.empty))
    assert(calls == 1, "an interrupted request must not be retried")
    assert(sleeps.isEmpty, "no backoff sleep may follow an interruption")
  }

  test("retry: connect/read IOExceptions retried, cause preserved on give-up") {
    var calls = 0
    val flaky = new HttpTransport {
      override def get(ep: String, params: Map[String, String]): GdcResponse = {
        calls += 1
        if (calls <= 2) throw new IOException(s"connection reset $calls")
        resp(200, "ok")
      }
    }
    assert(new RetryingTransport(flaky, retries = 5, sleeper = _ => ())
      .get("x", Map.empty).text == "ok")
    assert(calls == 3)

    val dead = new HttpTransport {
      override def get(ep: String, params: Map[String, String]): GdcResponse =
        throw new IOException("refused")
    }
    val e = intercept[GdcRetryExhausted](
      new RetryingTransport(dead, retries = 2, sleeper = _ => ()).get("x", Map.empty))
    assert(e.getCause.getMessage == "refused")
  }

  test("retry: non-forcelist statuses return immediately (404 is an answer)") {
    val raw = new Scripted(404)
    val r = new RetryingTransport(raw, sleeper = _ => ()).get("files", Map.empty)
    assert(r.status == 404 && raw.calls == 1)
  }

  test("retry: backoff formula capped at backoffMaxSeconds") {
    val t = new RetryingTransport(new Scripted(), backoffMaxSeconds = 4.0)
    assert(t.backoffMillis(1) == 0L)
    assert(t.backoffMillis(2) == 1000L)
    assert(t.backoffMillis(3) == 2000L)
    assert(t.backoffMillis(4) == 4000L)
    assert(t.backoffMillis(5) == 4000L, "capped")
    assert(t.backoffMillis(10) == 4000L, "capped")
  }

  test("retry: open() retries too and closes failed bodies") {
    var closed = 0
    var calls = 0
    val raw = new HttpTransport {
      override def get(ep: String, params: Map[String, String]): GdcResponse = resp(200)
      override def open(ep: String, params: Map[String, String]): (Int, InputStream) = {
        calls += 1
        val status = if (calls <= 2) 502 else 200
        (status, new ByteArrayInputStream("body".getBytes(UTF_8)) {
          override def close(): Unit = { closed += 1; super.close() }
        })
      }
    }
    val (status, in) = new RetryingTransport(raw, sleeper = _ => ()).open("d", Map.empty)
    assert(status == 200 && calls == 3)
    assert(closed == 2, "both failed attempts' bodies closed")
    in.close()
  }

  test("fetchFn: non-2xx surfaces as IOException, never parsed as JSON") {
    val t = new Scripted(403)
    val e = intercept[IOException](HttpTransport.fetchFn(t)("files", Map.empty))
    assert(e.getMessage.contains("403"))
  }

  // ---- DownloadExecutor --------------------------------------------

  /** Serves `name -> bytes` from memory keyed by url suffix. */
  private class BlobTransport(blobs: Map[String, Array[Byte]],
      redactedUrls: Set[String] = Set.empty) extends HttpTransport {
    override def get(ep: String, params: Map[String, String]): GdcResponse = {
      val name = ep.split('/').last
      if (redactedUrls(ep)) resp(451)
      else blobs.get(name).map(GdcResponse(200, _)).getOrElse(resp(404))
    }
  }

  private def md5Of(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(bytes)
      .map(b => f"${b & 0xff}%02x").mkString

  private def write(p: Path, s: String): Unit = Files.write(p, s.getBytes(UTF_8))

  test("execute: streams to disk, verifies md5, quarantines mismatches, records 451") {
    val dir = Files.createTempDirectory("graft_dl")
    val good = "gene\tcount\ng1\t5\n".getBytes(UTF_8)
    val bad = "corrupted body".getBytes(UTF_8)
    val t = new BlobTransport(
      Map("a.tsv" -> good, "b.tsv" -> bad, "c.tsv" -> good),
      redactedUrls = Set("mock://data/c.tsv"))
    val report = DownloadExecutor.execute(
      Seq(
        DownloadExecutor.Item("a.tsv", md5Of(good), "mock://data/a.tsv"),
        DownloadExecutor.Item("b.tsv", md5Of(good), "mock://data/b.tsv"), // wrong bytes
        DownloadExecutor.Item("c.tsv", md5Of(good), "mock://data/c.tsv")), // redacted
      toDelete = Seq.empty, destDir = dir, transport = t)
    assert(report.downloaded == Seq("a.tsv"))
    assert(Files.readAllBytes(dir.resolve("a.tsv")).sameElements(good))
    assert(report.quarantined.map(_._1) == Seq("b.tsv"))
    assert(Files.exists(dir.resolve("quarantine/b.tsv")), "mismatch moved aside")
    assert(!Files.exists(dir.resolve("b.tsv")), "mismatch never lands under its name")
    assert(report.redacted == Seq("mock://data/c.tsv"))
    val redactedTxt = new String(Files.readAllBytes(dir.resolve("redacted.txt")), UTF_8)
    assert(redactedTxt == "Fail to download file mock://data/c.tsv. Response 451\n")
    assert(!report.ok)
  }

  test("execute: non-2xx non-451 aborts like the reference's raise IOError") {
    val dir = Files.createTempDirectory("graft_dl404")
    val e = intercept[IOException](DownloadExecutor.execute(
      Seq(DownloadExecutor.Item("x.tsv", "0" * 32, "mock://data/x.tsv")),
      Seq.empty, dir, new BlobTransport(Map.empty)))
    assert(e.getMessage.contains("Response 404"))
  }

  test("sync: fresh dir downloads all; re-sync is a no-op; stale+corrupt reconcile") {
    import spark.implicits._
    val raw = Files.createTempDirectory("graft_sync")
    val blobs = Map(
      "s1.tsv" -> "gene\ts1\ng1\t1\n".getBytes(UTF_8),
      "s2.tsv" -> "gene\ts2\ng1\t2\n".getBytes(UTF_8))
    val t = new BlobTransport(blobs)
    val remote = blobs.toSeq.sortBy(_._1)
      .map { case (n, b) => (n, md5Of(b), s"mock://data/$n") }
      .toDF("name", "md5sum", "url")

    val first = DownloadExecutor.sync(spark, remote, raw, t)
    assert(first.downloaded.sorted == Seq("s1.tsv", "s2.tsv") && first.deleted.isEmpty)

    val second = DownloadExecutor.sync(spark, remote, raw, t)
    assert(second.downloaded.isEmpty && second.deleted.isEmpty,
      "md5-matched files must be skipped, not re-downloaded")

    // Corrupt one file, plant one stale file: the next sync repairs
    // the former and deletes the latter (xena_dataset.py:591-622).
    write(raw.resolve("s1.tsv"), "locally damaged")
    write(raw.resolve("old_release.tsv"), "no longer in the catalog")
    val third = DownloadExecutor.sync(spark, remote, raw, t)
    assert(third.downloaded == Seq("s1.tsv"))
    assert(third.deleted == Seq("old_release.tsv"))
    assert(!Files.exists(raw.resolve("old_release.tsv")))
    assert(Files.readAllBytes(raw.resolve("s1.tsv")).sameElements(blobs("s1.tsv")))
  }

  test("sync: quarantined file is re-planned and recovers once the source heals") {
    import spark.implicits._
    val raw = Files.createTempDirectory("graft_sync_q")
    val good = "gene\tv\ng1\t9\n".getBytes(UTF_8)
    val remote = Seq(("f.tsv", md5Of(good), "mock://data/f.tsv"))
      .toDF("name", "md5sum", "url")
    // First sync serves corrupt bytes -> quarantine, nothing lands.
    val r1 = DownloadExecutor.sync(spark, remote, raw,
      new BlobTransport(Map("f.tsv" -> "garbage".getBytes(UTF_8))))
    assert(!r1.ok && !Files.exists(raw.resolve("f.tsv")))
    assert(Files.exists(raw.resolve("quarantine/f.tsv")))
    // Source healed: the name is still absent locally (quarantine is
    // excluded from the catalog's satisfaction set), so the re-sync
    // re-plans and completes the download.
    val r2 = DownloadExecutor.sync(spark, remote, raw, new BlobTransport(Map("f.tsv" -> good)))
    assert(r2.ok && r2.downloaded == Seq("f.tsv"))
    assert(Files.readAllBytes(raw.resolve("f.tsv")).sameElements(good))
  }

  test("S9 end-to-end: download a raw dir from a fixture catalog, then etl it") {
    // Remote catalog = the star_counts fixture files, served over the
    // fake transport; sync materializes the raw dir the etl verb
    // consumes — the full reference chain download() -> transform().
    import scala.jdk.CollectionConverters._
    import spark.implicits._
    val fixtureDir = Paths.get("/root/repo/fixtures/star_counts")
    val blobs = {
      val s = Files.list(fixtureDir)
      try s.iterator().asScala
        .map(p => p.getFileName.toString -> Files.readAllBytes(p)).toMap
      finally s.close()
    }
    val remote = blobs.toSeq.sortBy(_._1)
      .map { case (n, b) => (n, md5Of(b), s"mock://data/$n") }
      .toDF("name", "md5sum", "url")
    val raw = Files.createTempDirectory("graft_e2e_raw")
    val report = DownloadExecutor.sync(spark, remote, raw, new BlobTransport(blobs))
    assert(report.ok && report.downloaded.size == blobs.size)

    val out = Files.createTempDirectory("graft_e2e_out").resolve("star.tsv").toString
    assert(Cli.run(Array("etl", "-t", "star_counts", "-r", raw.toString, "-o", out)) == 0)
    val back = graft.io.XenaTsv.read(spark, out, None)
    assert(back.columns.head == "Ensembl_ID" && back.count() == 8)
  }

  test("CLI download: manifest TSV through the injected transport") {
    val blobs = Map("m1.tsv" -> "gene\tv\ng1\t7\n".getBytes(UTF_8))
    val dir = Files.createTempDirectory("graft_cli_dl")
    val manifest = dir.resolve("manifest.tsv")
    write(manifest, "name\tmd5sum\turl\nm1.tsv\t" + md5Of(blobs("m1.tsv")) +
      "\tmock://data/m1.tsv\n")
    val saved = Cli.transportFactory
    try {
      Cli.transportFactory = _ => new BlobTransport(blobs)
      val rawDir = dir.resolve("raw")
      assert(Cli.run(Array("download",
        "-m", manifest.toString, "-o", rawDir.toString)) == 0)
      assert(Files.readAllBytes(rawDir.resolve("m1.tsv")).sameElements(blobs("m1.tsv")))
    } finally Cli.transportFactory = saved
  }

  test("CLI etl-batch -p all: project loop via the projects endpoint, one project quarantined") {
    // `-p all` expands like main.py:63-66 -> gdc.py:434-459: the
    // projects endpoint lists PROJ-A and PROJ-B; A has raw star_counts
    // data, B doesn't -> B is quarantined, A completes.
    val projectsBody =
      """{"data":{"pagination":{"total":2},"hits":[
        |{"id":"PROJ-A","project_id":"PROJ-A","name":"A","primary_site":"s","program":{"name":"P"}},
        |{"id":"PROJ-B","project_id":"PROJ-B","name":"B","primary_site":"s","program":{"name":"P"}}]}}""".stripMargin
    val tmp = Files.createTempDirectory("graft_cli_pall")
    val raw = Files.createDirectory(tmp.resolve("raw"))
    Files.createDirectory(raw.resolve("PROJ-A"))
    Files.createSymbolicLink(raw.resolve("PROJ-A").resolve("star_counts"),
      Paths.get("/root/repo/fixtures/star_counts"))
    val out = tmp.resolve("out").toString
    val saved = Cli.transportFactory
    try {
      Cli.transportFactory = _ => new HttpTransport {
        override def get(ep: String, params: Map[String, String]): GdcResponse =
          if (ep == "projects") GdcResponse(200, projectsBody.getBytes(UTF_8))
          else resp(404)
      }
      assert(Cli.run(Array("etl-batch", "-t", "star_counts", "-p", "all",
        "-r", raw.toString, "-o", out)) == 1)
    } finally Cli.transportFactory = saved
    val matrix = graft.io.XenaTsv.read(spark, s"$out/PROJ-A/star_counts.tsv", None)
    assert(matrix.count() == 8, "healthy project did not complete")
    assert(Files.readString(raw.resolve("unfinished.json"))
      == """{"PROJ-B": ["star_counts"]}""")
  }

  // ---- gdc-check-new -----------------------------------------------

  private val checkNewHits = Seq(
    ("u1", """{"id":"u1","data_type":"Gene Expression Quantification","analysis":{"workflow_type":"STAR - Counts"},"cases":[{"project":{"project_id":"TCGA-BRCA"}}]}"""),
    ("u2", """{"id":"u2","data_type":"Gene Expression Quantification","analysis":{"workflow_type":"STAR - Counts"},"cases":[{"project":{"project_id":"TCGA-BRCA"}}]}"""),
    ("u3", """{"id":"u3","data_type":"miRNA Expression Quantification","analysis":{"workflow_type":"BCGSC miRNA Profiling"},"cases":[{"project":{"project_id":"TCGA-BRCA"}},{"project":{"project_id":"TCGA-LUAD"}}]}"""),
    ("u4", """{"id":"u4","data_type":"Slide Image","cases":[{"project":{"project_id":"TCGA-KIRC"}}]}"""),
    ("u5", """{"id":"u5","data_type":"Copy Number Segment","analysis":{"workflow_type":"ASCAT2"},"cases":[{"project":{"project_id":"TCGA-LUAD"}}]}"""))

  /** Envelope server for the files endpoint: answers the probe with
    * the batch's total, the page with its hits — hits are the scripted
    * rows whose uuid appears in the request's file_id filter.
    */
  private def checkNewFetch(
      calls: scala.collection.mutable.ArrayBuffer[Map[String, String]] = scala.collection.mutable.ArrayBuffer.empty)
      : (String, Map[String, String]) => String = { (endpoint, params) =>
    assert(endpoint == "files")
    calls += params
    val filters = params("filters")
    assert(filters.contains(""""field":"access","value":["open"]"""))
    val mine = checkNewHits.filter { case (u, _) => filters.contains(s""""$u"""") }
    if (params("size") == "1")
      s"""{"data":{"pagination":{"total":${mine.size}},"hits":[${mine.headOption.map(_._2).getOrElse("")}]}}"""
    else
      s"""{"data":{"pagination":{"total":${mine.size}},"hits":[${mine.map(_._2).mkString(",")}]}}"""
  }

  test("checkNew: batches uuids, string-aggs projects, drops id, dedups") {
    val calls = scala.collection.mutable.ArrayBuffer.empty[Map[String, String]]
    val catalog = new GdcCatalog(spark, checkNewFetch(calls))
    val df = catalog.checkNew(Seq("u1", "u2", "u3", "u4", "u5"), chunkSize = 2)
    assert(df.columns.toSeq == Seq("analysis.workflow_type", "cases", "data_type"))
    // 3 batches (2+2+1), each a probe + a page fetch.
    assert(calls.size == 6)
    val batchFilters = calls.map(_("filters")).distinct
    assert(batchFilters.size == 3, "20k-uuid batching (here chunk=2) -> 3 distinct filters")
    assert(batchFilters.forall(_.contains(""""field":"file_id"""")))
    val rows = df.collect().map(r =>
      (Option(r.getString(0)).getOrElse(""), r.getString(1), r.getString(2))).toSet
    assert(rows == Set(
      ("STAR - Counts", "TCGA-BRCA", "Gene Expression Quantification"),
      ("BCGSC miRNA Profiling", "TCGA-BRCA, TCGA-LUAD", "miRNA Expression Quantification"),
      ("", "TCGA-KIRC", "Slide Image"),
      ("ASCAT2", "TCGA-LUAD", "Copy Number Segment")),
      "u1/u2 dedup to one row; u3 multi-project comma-joins; u4 null workflow survives")
  }

  test("readUuidColumn: http(s) release file via transport, gz and plain, error status") {
    val body = "Old File UUID\tNew File UUID\nold-1\tu1\nold-2\tu2\n"
    val gzBytes = {
      val bos = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(bos)
      gz.write(body.getBytes(UTF_8)); gz.close(); bos.toByteArray
    }
    val t = new HttpTransport {
      override def get(ep: String, params: Map[String, String]): GdcResponse =
        ep match {
          case "https://example.invalid/rel.tsv.gz" => GdcResponse(200, gzBytes)
          case "https://example.invalid/rel.tsv" => GdcResponse(200, body.getBytes(UTF_8))
          case _ => resp(404)
        }
    }
    assert(Cli.readUuidColumn("https://example.invalid/rel.tsv.gz", t) == List("u1", "u2"))
    assert(Cli.readUuidColumn("https://example.invalid/rel.tsv", t) == List("u1", "u2"))
    val e = intercept[RuntimeException](
      Cli.readUuidColumn("https://example.invalid/missing.tsv", t))
    assert(e.getMessage.contains("404"))
  }

  test("CLI gdc-check-new: release TSV.gz in, fixture-matched summary TSV out") {
    // The reference test shape (tests/test_gdc.py:115-126): feed the
    // release's 'New File UUID' list, compare the stdout TSV against
    // a committed fixture.
    val dir = Files.createTempDirectory("graft_checknew")
    val release = dir.resolve("DR_files_swap.tsv.gz")
    val gz = new java.util.zip.GZIPOutputStream(Files.newOutputStream(release))
    gz.write(("Old File UUID\tNew File UUID\n" +
      Seq("u1", "u2", "u3", "u4", "u5").map(u => s"old-$u\t$u").mkString("\n") + "\n")
      .getBytes(UTF_8))
    gz.close()

    val fetch = checkNewFetch()
    val fake = new HttpTransport {
      override def get(ep: String, params: Map[String, String]): GdcResponse =
        resp(200, fetch(ep, params))
    }
    val saved = Cli.transportFactory
    val out = new java.io.ByteArrayOutputStream()
    try {
      Cli.transportFactory = _ => fake
      Console.withOut(new java.io.PrintStream(out, true, "UTF-8")) {
        assert(Cli.run(Array("gdc-check-new", release.toString)) == 0)
      }
    } finally Cli.transportFactory = saved

    val printed = new String(out.toByteArray, UTF_8).linesIterator.toSeq
    val expected = new String(Files.readAllBytes(
      Paths.get("/root/repo/fixtures/gdc/check_new_expected.tsv")), UTF_8)
      .linesIterator.toSeq
    assert(printed.head == expected.head, "header row")
    // Row order after dropDuplicates is plan-dependent; the summary is
    // a SET of combinations (the reference doesn't sort either).
    assert(printed.tail.sorted == expected.tail.sorted)
  }
}
