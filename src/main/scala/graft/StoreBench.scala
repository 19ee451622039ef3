package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables

/** Build/probe split benchmark for the persisted-store families.
  *
  * The store-backed oracle-gated queries (q92, q103, q110, q123,
  * q127, q131, q133, q135, q136) time store CREATION and the frozen
  * MONITORING PROBE as one number, because the DuckDB gate has to
  * replay the fit to validate the probe. That makes the headline bench cost dominated by build
  * work the stores exist to amortize — and leaves the core 100-TB
  * claim ("monitoring is O(batch) against a frozen artifact") argued
  * in prose. This main measures the two sides separately:
  *
  *  - `build`: store fit + persist, timed once (it runs once per
  *    corpus release, not per batch);
  *  - `probe`: the monitoring path alone against the already-frozen
  *    store — one untimed warm pass (codegen/JIT), then the min of
  *    two measured passes (the paired-bench discipline, collapsed to
  *    a store-sized sweep).
  *
  * Splits, parameters and probe shapes are exactly the gate
  * queries' (same reference/arrival carve, same k/topM/nMerges), so
  * a probe number here is the monitoring cost inside the
  * corresponding BENCH_r row, not a synthetic variant.
  *
  * Output: one JSON line on stdout plus a pretty sidecar
  * (SPARK_GRAFT_STOREBENCH_OUT, default BENCH_STORES.json).
  */
object StoreBench {

  private final case class StoreCase(
      name: String,
      gateQuery: String,
      build: () => Unit,
      probe: () => DataFrame)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = GraftSession.builder(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = java.nio.file.Files.createTempDirectory("graft_store_bench").toString

    // Parallelism.ensure: the gate queries' shape (q49/q92/q136 all
    // stage the documents read the same way).
    def docs = graft.ops.Parallelism.ensure(Tables.documents(spark, sfDir))
    def norms = {
      import graft.functions.VectorFunctions.dot
      Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("vd"))
        .select(col("vec_id"), round(sqrt(dot(col("vd"), col("vd"))), 6).as("norm"))
    }
    // q133's arrivals: every even id carries one genuinely new token.
    def hllArrivals = docs.filter(col("doc_id") % 25 === 0)
      .withColumn("text", when(col("doc_id") % 2 === 0,
        concat(col("text"), lit(" nw"), col("doc_id").cast("string")))
        .otherwise(col("text")))

    val cases = Seq(
      StoreCase("posting", "q92_bm25_indexed",
        () => graft.ops.PostingStore.create(
          docs.filter(col("doc_id") % 25 =!= 0).select("doc_id", "text"),
          s"$root/posting"),
        () => graft.ops.PostingStore.retrieve(
          spark, s"$root/posting",
          docs.filter(col("doc_id") % 25 === 0)
            .select(col("doc_id").as("q_id"), col("text")),
          k = 10)),
      StoreCase("lm", "q103_lm_store_score",
        () => graft.ops.LmStore.createAt(
          spark, docs.filter(col("doc_id") % 25 =!= 0), s"$root/lm"),
        () => graft.ops.LmStore.score(
          spark, s"$root/lm", docs.filter(col("doc_id") % 25 === 0))),
      StoreCase("nb", "q110_nb_store_score",
        () => graft.ops.NbStore.createAt(
          spark, docs.filter(col("doc_id") % 25 =!= 0),
          isSeed = col("lang") === "en", s"$root/nb"),
        () => graft.ops.NbStore.score(
          spark, s"$root/nb", docs.filter(col("doc_id") % 25 === 0))),
      StoreCase("tok", "q123_tok_store_drift",
        () => graft.ops.TokStore.createAt(
          spark, docs.filter(col("doc_id") % 25 === 0), s"$root/tok", nMerges = 5),
        () => graft.ops.TokStore.fertilityDrift(
          spark, s"$root/tok", docs.filter(col("doc_id") % 25 =!= 0))),
      StoreCase("langid", "q127_langid_store_mix",
        () => graft.ops.LangIdStore.createAt(
          spark, docs.filter(col("doc_id") % 25 === 0), s"$root/lid", topM = 64),
        () => graft.ops.LangIdStore.mixDrift(
          spark, s"$root/lid", docs.filter(col("doc_id") % 25 =!= 0))),
      StoreCase("psi", "q131_score_psi",
        () => graft.ops.PsiStore.createAt(
          spark, norms.filter(col("vec_id") % 5 =!= 0), "norm", s"$root/psi"),
        () => graft.ops.PsiStore.psi(
          spark, s"$root/psi", norms.filter(col("vec_id") % 5 === 0), "norm")),
      StoreCase("hll", "q133_vocab_growth",
        () => graft.ops.HllStore.createAt(
          spark, docs.filter(col("doc_id") % 25 =!= 0), s"$root/hll"),
        () => graft.ops.HllStore.growth(spark, s"$root/hll", hllArrivals)),
      // q135's splits: reference counters frozen on doc_id % 25 != 0,
      // arrivals carry the three planted zz tokens.
      StoreCase("cms", "q135_hitter_surge",
        () => graft.ops.CmsStore.createAt(
          spark, docs.filter(col("doc_id") % 25 =!= 0), s"$root/cms"),
        () => graft.ops.CmsStore.surge(
          spark, s"$root/cms",
          docs.filter(col("doc_id") % 25 === 0)
            .withColumn("text", concat(col("text"),
              lit(" zz"), (col("doc_id") % 3).cast("string"))),
          k = 20)),
      // q136's split: the CT language profiles are the build (one
      // (lang, gram) corpus fit, frozen); the probe is the FULL q49
      // curation report consuming them as a zero-exchange projection —
      // the number that shows the 2.4x q49 bench movement of r12 was
      // fit cost riding inside the measured query, not probe cost.
      StoreCase("curation_lang", "q136_curation_store_lang",
        () => graft.ops.LangIdStore.createAt(spark, docs, s"$root/curlid", topM = 64),
        () => SparkEntry.curationReport(docs,
          graft.ops.LangIdStore.langColumn(spark, s"$root/curlid", col("text")))))

    def isolate(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      spark.catalog.clearCache()
    }
    def timed(fn: () => Unit): Double = {
      val t0 = System.nanoTime()
      fn()
      val dt = (System.nanoTime() - t0) / 1e9
      isolate()
      dt
    }
    // noop sink, the Bench contract: every projected column is computed.
    def sink(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    // Session warmup (the Bench shapes): session-global init is not
    // charged to the first store's build.
    try {
      sink(docs.limit(200).select(graft.functions.TextFunctions.wordNgrams(
        graft.functions.TextFunctions.tokens(col("text")), 2).as("g")))
    } catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[store-bench] warmup failed: ${e.getMessage}")
    }

    val results = cases.map { c =>
      val build = timed(c.build)
      val warm = timed(() => sink(c.probe()))
      val p1 = timed(() => sink(c.probe()))
      val p2 = timed(() => sink(c.probe()))
      val probe = math.min(p1, p2)
      System.err.println(f"[store-bench] ${c.name}%-8s build=$build%.3fs " +
        f"probe=$probe%.3fs (warm=$warm%.3f, passes=$p1%.3f/$p2%.3f)")
      (c, build, warm, probe)
    }

    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val storesJson = results.map { case (c, b, w, p) =>
      s""""${c.name}":{"gate_query":"${c.gateQuery}","build":${fmt(b)},""" +
        s""""probe_warm":${fmt(w)},"probe":${fmt(p)}}"""
    }.mkString("{", ",", "}")
    val totalProbe = results.map(_._4).sum
    val totalBuild = results.map(_._2).sum
    val line =
      s"""{"metric":"store_probe_total","value":${fmt(totalProbe)},"unit":"sec",""" +
        s""""build_total":${fmt(totalBuild)},"stores":$storesJson,"sf":"$sfDir"}"""
    val out = sys.env.getOrElse("SPARK_GRAFT_STOREBENCH_OUT", "BENCH_STORES.json")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), line + "\n")
    println(line)
    spark.stop()
  }
}
