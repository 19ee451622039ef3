package graft

import org.apache.spark.sql.functions._
import graft.similarity.Similarity

/** Quality gates for the approximate ANN paths: exact SQL oracles
  * can't check recall<1 operators, so this spec measures recall
  * against the brute-force ground truth on the real embeddings table.
  */
class SimilaritySpec extends SparkSpecBase {

  private lazy val emb = graft.model.Tables.embeddings(spark, sfDir)
  private lazy val queries = emb.filter(col("vec_id") < 8)
    .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))

  /** recall@k of `approx` vs the brute-force top-k ground truth. */
  private def recallVsBruteForce(approx: org.apache.spark.sql.DataFrame, k: Int): Double = {
    val truth = Similarity.bruteForceTopK(
      emb, queries, "vec_id", "embedding", "q_id", "q_vec", k)
      .select(col("query_id"), col("neighbor_id"))
    val hit = truth.join(
      approx.select(col("query_id"), col("neighbor_id")),
      Seq("query_id", "neighbor_id"), "left_semi")
    hit.count().toDouble / truth.count().toDouble
  }

  test("IVF ANN recall@5 vs brute force") {
    val ivf = Similarity.ivfTopK(
      emb, queries, "vec_id", "embedding", "q_id", "q_vec",
      dim = 64, k = 5, nlist = 24, nprobe = 6)
    // Probing 6/24 cells scans ~25% of the corpus; measured recall
    // 0.775 on the sf0.001 embeddings with the deterministic
    // orthant-init Lloyd — gate a little below for headroom on other
    // scale factors.
    val r = recallVsBruteForce(ivf, 5)
    assert(r >= 0.7, s"IVF recall@5 = $r < 0.7")
  }

  test("multi-table hyperplane-LSH ANN recall@5 vs brute force") {
    val lsh = Similarity.lshTopK(
      emb, queries, "vec_id", "embedding", "q_id", "q_vec",
      dim = 64, bits = 6, k = 5, tables = 4)
    val r = recallVsBruteForce(lsh, 5)
    assert(r >= 0.5, s"LSH recall@5 = $r < 0.5")
  }

  test("PQ ADC recall@5 vs brute force, and scores track true cosine") {
    val pq = Similarity.pqTopK(
      emb, "vec_id", "embedding", queries, "q_id", "q_vec", k = 5, dim = 64)
    // Config sweep on the sf0.001 embeddings (near-incompressible
    // random-ish vectors — the PQ worst case): m=8/ksub=16 → 0.15,
    // m=16/ksub=32 → 0.43, m=32/ksub=16 → 0.68, m=32/ksub=32/iters=3
    // → 0.80 (the shipped default: dsub=2 subspaces quantize direction
    // finely enough for the cosine rank). Gate below the measurement
    // for headroom on other scale factors.
    val r = recallVsBruteForce(pq, 5)
    assert(r >= 0.6, s"PQ recall@5 = $r < 0.6")
    // ADC scores are approximate cosines: on the pairs PQ returns,
    // the mean absolute error vs the true cosine must stay small
    // (quantization distortion, not rank garbage).
    val err = pq.join(emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("nv")),
        Seq("neighbor_id"))
      .join(emb.select(col("vec_id").as("query_id"), col("embedding").as("qv2")),
        Seq("query_id"))
      .select(abs(col("cos") - Similarity.cosine(col("nv"), col("qv2"))).as("e"))
      .agg(avg("e")).collect()(0).getDouble(0)
    assert(err < 0.15, s"mean |ADC cos - true cos| = $err >= 0.15")
  }

  test("persisted PQ index: identical to in-memory pqTopK; store holds codes only") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_pq_idx").toString
    Similarity.writePqIndex(emb, "vec_id", "embedding", dim = 64, path = tmp)
    val indexed = Similarity.pqTopKIndexed(spark, tmp, queries, "q_id", "q_vec", k = 5)
    val mem = Similarity.pqTopK(
      emb, "vec_id", "embedding", queries, "q_id", "q_vec", k = 5, dim = 64)
    assert(indexed.collect().map(_.toSeq).toSet == mem.collect().map(_.toSeq).toSet,
      "persisted-index PQ search != in-memory pqTopK")
    // The store is the compression: codes only, no float vectors.
    val store = spark.read.parquet(s"$tmp/codes")
    assert(store.columns.toSet == Set("vec_id", "codes"), store.columns.mkString(","))
  }

  test("persisted IVF-PQ index: full probe == in-memory PQ; pruned probe scans only probed cells") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_ivfpq_idx").toString
    // residual = false: raw-vector codes are definitionally identical
    // to the in-memory global-PQ path — the strongest possible oracle
    // for the cell-partitioned store + probe plumbing. The residual
    // default's quality is gated in the next test.
    Similarity.writeIvfPqIndex(emb, "vec_id", "embedding",
      dim = 64, nlist = 24, path = tmp, residual = false)
    // nprobe = nlist disables pruning: the result must be EXACTLY the
    // in-memory ADC ranking (same deterministic codebooks and codes).
    val full = Similarity.ivfPqTopKIndexed(
      spark, tmp, queries, "q_id", "q_vec", k = 5, nprobe = 24)
    val mem = Similarity.pqTopK(
      emb, "vec_id", "embedding", queries, "q_id", "q_vec", k = 5, dim = 64)
    assert(full.collect().map(_.toSeq).toSet == mem.collect().map(_.toSeq).toSet,
      "full-probe IVF-PQ != in-memory pqTopK")

    val pruned = Similarity.ivfPqTopKIndexed(
      spark, tmp, queries, "q_id", "q_vec", k = 5, nprobe = 6)
    val plan = pruned.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(plan).isDefined,
      "probe cells not in PartitionFilters:\n" + plan.take(2000))
    // Measured 0.725 on the sf0.001 embeddings (≈ the 0.775 IVF prune
    // recall × PQ's 0.80 ADC recall); gate leaves drift headroom for
    // regenerated test data.
    val r = recallVsBruteForce(pruned, 5)
    assert(r >= 0.65, s"IVF-PQ pruned recall@5 = $r < 0.65")
  }

  test("IVF-PQ residual encoding: wins decisively on a planted-cluster corpus") {
    // The case the residual refinement exists for: a corpus with real
    // cluster structure. 24 planted unit centers, 600 members at small
    // angular jitter — after the coarse quantizer recovers the
    // centers, residuals live in a tiny ball the codebooks quantize
    // almost exactly, while raw-vector codes must spread the same
    // m·ksub budget over the whole sphere. (On the near-uniform bench
    // embeddings residual measured strictly WORSE — full 0.75 vs
    // 0.80, pruned 0.60 vs 0.725 — which is why it defaults off.)
    import spark.implicits._
    val rnd = new scala.util.Random(421)
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val centers = Array.fill(24)(unit(Array.fill(64)(rnd.nextGaussian())))
    def member(c: Array[Double]): Seq[Float] =
      unit(c.map(_ + 0.08 * rnd.nextGaussian())).map(_.toFloat).toSeq
    val corpus = (0 until 600).map(i => (i.toLong, member(centers(i % 24))))
      .toDF("vec_id", "embedding")
    val qs = (0 until 8).map(i => (1000L + i, member(centers(i * 3 % 24))))
      .toDF("q_id", "q_vec")
    def recallOf(path: String): Double = {
      val truth = Similarity.bruteForceTopK(
        corpus, qs, "vec_id", "embedding", "q_id", "q_vec", k = 5)
        .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val got = Similarity.ivfPqTopKIndexed(spark, path, qs, "q_id", "q_vec", k = 5, nprobe = 24)
        .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      got.intersect(truth).size.toDouble / truth.size
    }
    val tmpR = java.nio.file.Files.createTempDirectory("graft_ivfpq_res").toString
    Similarity.writeIvfPqIndex(corpus, "vec_id", "embedding",
      dim = 64, nlist = 24, path = tmpR, residual = true)
    assert(Similarity.readIvfPqIndexMeta(spark, tmpR).residual)
    val tmpRaw = java.nio.file.Files.createTempDirectory("graft_ivfpq_praw").toString
    Similarity.writeIvfPqIndex(corpus, "vec_id", "embedding",
      dim = 64, nlist = 24, path = tmpRaw, residual = false)
    val (rRes, rRaw) = (recallOf(tmpR), recallOf(tmpRaw))
    info(s"planted clusters: residual=$rRes raw=$rRaw")
    assert(rRes > rRaw, s"residual $rRes not above raw $rRaw on clustered data")
    assert(rRes >= 0.7, s"residual recall $rRes < 0.7 on planted clusters")
  }

  test("IVF-PQ residualAuto: picks residual on clustered data, raw on near-uniform, and records the estimate") {
    // The r7 measurement showed residual strictly wins on clustered
    // corpora and strictly loses on near-uniform ones — auto mode
    // measures the corpus (mean residual-norm / mean vector-norm
    // under the trained quantizer) instead of asking the caller to
    // know which they have. Both anchor corpora, both recall gates.
    import spark.implicits._
    val rnd = new scala.util.Random(421)
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val centers = Array.fill(24)(unit(Array.fill(64)(rnd.nextGaussian())))
    def member(c: Array[Double]): Seq[Float] =
      unit(c.map(_ + 0.08 * rnd.nextGaussian())).map(_.toFloat).toSeq
    val clustered = (0 until 600).map(i => (i.toLong, member(centers(i % 24))))
      .toDF("vec_id", "embedding")
    val cqs = (0 until 8).map(i => (1000L + i, member(centers(i * 3 % 24))))
      .toDF("q_id", "q_vec")

    val tmpC = java.nio.file.Files.createTempDirectory("graft_ivfpq_autoC").toString
    Similarity.writeIvfPqIndex(clustered, "vec_id", "embedding",
      dim = 64, nlist = 24, path = tmpC, residualAuto = true)
    val metaC = Similarity.readIvfPqIndexMeta(spark, tmpC)
    info(s"clustered: gain=${metaC.residualGain} residual=${metaC.residual}")
    assert(metaC.residual, s"auto did not pick residual on clustered data (gain=${metaC.residualGain})")
    assert(metaC.residualGain.exists(_ < Similarity.ResidualAutoThreshold))
    val truthC = Similarity.bruteForceTopK(
      clustered, cqs, "vec_id", "embedding", "q_id", "q_vec", k = 5)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val gotC = Similarity.ivfPqTopKIndexed(spark, tmpC, cqs, "q_id", "q_vec", k = 5, nprobe = 24)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rC = gotC.intersect(truthC).size.toDouble / truthC.size
    assert(rC >= 0.7, s"auto(residual) recall $rC < 0.7 on planted clusters")

    val tmpU = java.nio.file.Files.createTempDirectory("graft_ivfpq_autoU").toString
    Similarity.writeIvfPqIndex(emb, "vec_id", "embedding",
      dim = 64, nlist = 24, path = tmpU, residualAuto = true)
    val metaU = Similarity.readIvfPqIndexMeta(spark, tmpU)
    info(s"near-uniform: gain=${metaU.residualGain} residual=${metaU.residual}")
    assert(!metaU.residual, s"auto picked residual on near-uniform data (gain=${metaU.residualGain})")
    assert(metaU.residualGain.exists(_ >= Similarity.ResidualAutoThreshold))
    val prunedU = Similarity.ivfPqTopKIndexed(spark, tmpU, queries, "q_id", "q_vec", k = 5, nprobe = 6)
    val rU = recallVsBruteForce(prunedU, 5)
    assert(rU >= 0.65, s"auto(raw) pruned recall $rU < 0.65 on near-uniform data")
  }

  test("IVF-PQ residual score decomposition is exact: engine cos == driver q·c + q·decode(codes)") {
    val tmpR = java.nio.file.Files.createTempDirectory("graft_ivfpq_exact").toString
    Similarity.writeIvfPqIndex(emb, "vec_id", "embedding",
      dim = 64, nlist = 24, path = tmpR, residual = true)
    val meta = Similarity.readIvfPqIndexMeta(spark, tmpR)
    val scale = meta.scale
    val q = queries.limit(1).collect().head
    val qv = q.getSeq[Float](q.fieldIndex("q_vec")).map(_.toDouble).toArray
    val qn = math.sqrt(qv.map(x => x * x).sum)
    val qq = qv.map(x => math.floor(x / qn * scale + 0.5).toLong)
    // Driver reimplementation over the raw codes store: the ADC score
    // must be (q·centroid + q·concat(codebook rows))/scale² EXACTLY.
    val codes = spark.read.parquet(s"$tmpR/codes").collect()
      .map(r => (r.getLong(r.fieldIndex("vec_id")),
        r.getSeq[Int](r.fieldIndex("codes")).toArray,
        r.getInt(r.fieldIndex("cell"))))
    val dsub = meta.codebooks.head.head.length
    val want = codes.map { case (id, cs, cell) =>
      var acc = 0L
      meta.centroids(cell).zipWithIndex.foreach { case (c, j) => acc += qq(j) * c }
      cs.zipWithIndex.foreach { case (code, s) =>
        val row = meta.codebooks(s)(code)
        var j = 0
        while (j < dsub) { acc += qq(s * dsub + j) * row(j); j += 1 }
      }
      id -> BigDecimal(acc.toDouble / (scale.toDouble * scale.toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
    val got = Similarity.ivfPqTopKIndexed(
      spark, tmpR, queries.limit(1), "q_id", "q_vec", k = 600, nprobe = 24)
      .select("neighbor_id", "cos").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.nonEmpty)
    got.foreach { case (id, cos) =>
      assert(math.abs(cos - want(id)) < 1e-9, s"neighbor $id: engine $cos != driver ${want(id)}")
    }
  }

  test("PQ output is invariant to corpus partitioning") {
    val a = Similarity.pqTopK(
      emb, "vec_id", "embedding", queries, "q_id", "q_vec", k = 5, dim = 64)
      .collect().map(_.toSeq).toSet
    val b = Similarity.pqTopK(
      emb.repartition(7), "vec_id", "embedding", queries, "q_id", "q_vec", k = 5, dim = 64)
      .collect().map(_.toSeq).toSet
    assert(a == b, "PQ training/encoding/ranking depends on partitioning")
  }

  test("single-table LSH recall is strictly below the multi-table union") {
    // The reason `tables` exists: one table's recall decays like
    // p^bits; the L-table union must dominate it.
    val one = recallVsBruteForce(Similarity.lshTopK(
      emb, queries, "vec_id", "embedding", "q_id", "q_vec",
      dim = 64, bits = 6, k = 5, tables = 1), 5)
    val four = recallVsBruteForce(Similarity.lshTopK(
      emb, queries, "vec_id", "embedding", "q_id", "q_vec",
      dim = 64, bits = 6, k = 5, tables = 4), 5)
    assert(four > one, s"multi-table recall $four not above single-table $one")
  }

  test("persisted IVF index: identical results to in-memory ivfTopK, pruned scan") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_ivf_index").toString
    Similarity.writeIvfIndex(emb, "vec_id", "embedding",
      dim = 64, nlist = 24, path = tmp)
    val indexed = Similarity.ivfTopKIndexed(
      spark, tmp, queries, "q_id", "q_vec", k = 5, nprobe = 6)
    val inMemory = Similarity.ivfTopK(
      emb, queries, "vec_id", "embedding", "q_id", "q_vec",
      dim = 64, k = 5, nlist = 24, nprobe = 6)
    // Deterministic quantizer -> the persisted index reproduces the
    // in-memory pruned search exactly.
    val diff = indexed.exceptAll(inMemory).count() + inMemory.exceptAll(indexed).count()
    assert(diff == 0, s"indexed IVF differs from in-memory by $diff rows")

    // The scan must carry the probe cells as PARTITION filters — the
    // layout, not a post-scan filter, limits what is read.
    val plan = indexed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      "no partition filter on the index scan:\n" + plan.take(2000))
    val pruned = "PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(plan)
    assert(pruned.isDefined, "cell not in PartitionFilters:\n" + plan.take(2000))

    // Fewer cell directories read than exist: list the index layout.
    val allCells = new java.io.File(s"$tmp/vectors").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell=")).map(_.getName)
    assert(allCells.length > 6, s"degenerate index layout: ${allCells.length} cells")
  }

  test("persisted LSH index: identical results to in-memory lshTopK, pruned scan") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_lsh_index").toString
    Similarity.writeLshIndex(emb, "vec_id", "embedding",
      dim = 64, bits = 6, path = tmp, tables = 4)
    val indexed = Similarity.lshTopKIndexed(
      spark, tmp, queries, "q_id", "q_vec", k = 5)
    val inMemory = Similarity.lshTopK(
      emb, queries, "vec_id", "embedding", "q_id", "q_vec",
      dim = 64, bits = 6, k = 5, tables = 4)
    val diff = indexed.exceptAll(inMemory).count() + inMemory.exceptAll(indexed).count()
    assert(diff == 0, s"indexed LSH differs from in-memory by $diff rows")

    val plan = indexed.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*sig".r.findFirstIn(plan).isDefined,
      "probe buckets not in PartitionFilters:\n" + plan.take(2000))
  }

  test("IVF assigns every corpus vector to exactly one of nlist cells") {
    // The partition-pruning story depends on a total, single assignment.
    val ivf = Similarity.ivfTopK(
      emb, queries, "vec_id", "embedding", "q_id", "q_vec",
      dim = 64, k = 3, nlist = 8, nprobe = 8)
    // nprobe == nlist probes everything -> IVF must equal brute force.
    val bf = Similarity.bruteForceTopK(
      emb, queries, "vec_id", "embedding", "q_id", "q_vec", 3)
    val diff = ivf.exceptAll(bf).count() + bf.exceptAll(ivf).count()
    assert(diff == 0, s"full-probe IVF differs from brute force by $diff rows")
  }

  test("cosinePairs exact-path guard: oversized corpus refused, hatch accepted") {
    val spark2 = spark
    import spark2.implicits._
    // Guard fires on the COUNT, before any pair is planned -- so an
    // over-cap frame is cheap to build (one tiny vector per row).
    val big = spark.range(Similarity.MaxExactPairsRows + 1)
      .select(col("id").as("vec_id"), array(lit(1.0f)).as("embedding"))
    val e = intercept[IllegalArgumentException](
      Similarity.cosinePairs(big, "vec_id", "embedding", threshold = 0.5))
    assert(e.getMessage.contains("allowExact"))

    // Under the cap: no hatch needed.
    val small = spark.range(4)
      .select(col("id").as("vec_id"), array(lit(1.0f), col("id").cast("float")).as("embedding"))
    assert(Similarity.cosinePairs(small, "vec_id", "embedding", threshold = -1.0)
      .count() == 6, "4 choose 2 pairs")

    // Hatched: identical result, and no guard count job on the big frame.
    assert(Similarity.cosinePairs(small, "vec_id", "embedding", threshold = -1.0,
      allowExact = true).count() == 6)
  }

  test("semanticDedup: total output, and kept/dropped matches the brute-force dominance rule") {
    val spark2 = spark
    import spark2.implicits._
    val out = Similarity.semanticDedup(emb, "vec_id", "embedding",
      dim = 64, nlist = 24, threshold = 0.4)
      .select(col("vec_id"), col("cell"), col("cos_centroid"), col("kept"))
      .localCheckpoint(false)
    // Every corpus vector appears exactly once, kept or not.
    assert(out.count() == emb.count())
    assert(out.select("vec_id").distinct().count() == emb.count())
    // Recompute dominance by brute force from the OUTPUT's own cells
    // and centroid cosines: dropped == "some same-cell neighbor at
    // rounded cos >= threshold sits strictly closer to the centroid
    // (id tiebreak)". This re-derives the rule from first principles —
    // the only shared input is the cell assignment itself.
    val vecs = emb.select(col("vec_id"), col("embedding"))
    val side = out.join(vecs, "vec_id")
    val a = side.select(col("cell"), col("vec_id").as("ia"),
      col("embedding").as("va"), col("cos_centroid").as("ca"))
    val b = side.select(col("cell"), col("vec_id").as("ib"),
      col("embedding").as("vb"), col("cos_centroid").as("cb"))
    val expectedDropped = a.join(b, Seq("cell"))
      .filter(col("ia") =!= col("ib"))
      .filter(round(Similarity.cosine(col("va").cast("array<double>"),
        col("vb").cast("array<double>")), 6) >= 0.4)
      .filter(col("ca") < col("cb") || (col("ca") === col("cb") && col("ia") < col("ib")))
      .select(col("ib")).distinct().as[Long].collect().toSet
    val gotDropped = out.filter(col("kept") === 0).select("vec_id").as[Long].collect().toSet
    assert(gotDropped == expectedDropped,
      s"dropped sets differ: got ${gotDropped.size}, expected ${expectedDropped.size}")
    // The gate corpus genuinely exercises the rule (non-degenerate).
    assert(gotDropped.nonEmpty, "threshold finds no within-cell dups at this SF")
  }

  test("semanticDedup is invariant to corpus partitioning") {
    val base = Similarity.semanticDedup(emb, "vec_id", "embedding",
      dim = 64, nlist = 24, threshold = 0.4)
    val shuffled = Similarity.semanticDedup(emb.repartition(13), "vec_id", "embedding",
      dim = 64, nlist = 24, threshold = 0.4)
    val diff = base.exceptAll(shuffled).count() + shuffled.exceptAll(base).count()
    assert(diff == 0, s"semanticDedup output depends on partitioning: $diff rows differ")
  }

  test("mmrRerank demotes a redundant near-duplicate hit (hand-computed)") {
    val spark2 = spark
    import spark2.implicits._
    // A (rel .9) and B (rel .89) are near-identical vectors; C (rel
    // .5) is orthogonal. Pure relevance keeps A,B,C; λ=0.5 demotes B
    // below C: mmr(B|A) = .445 − .5·cos(B,A)≈ −0.055 < mmr(C|A)=0.25.
    val hits = Seq((1L, 10L, 0.9), (1L, 11L, 0.89), (1L, 12L, 0.5))
      .toDF("query_id", "doc_id", "score")
    val vecs = Seq(
      (10L, Seq(1.0, 0.0)), (11L, Seq(1.0, 0.01)), (12L, Seq(0.0, 1.0)))
      .toDF("vec_id", "embedding")
    def order(lambda: Double) = Similarity.mmrRerank(
        hits, vecs, "vec_id", "embedding", k = 3, lambda = lambda)
      .orderBy("rank").collect().map(_.getLong(1)).toSeq
    assert(order(1.0) == Seq(10L, 11L, 12L), "λ=1 must be pure relevance order")
    assert(order(0.5) == Seq(10L, 12L, 11L), "λ=0.5 must demote the near-dup")
    // rank is dense 1..k and the first mmr is λ·rel
    val r = Similarity.mmrRerank(hits, vecs, "vec_id", "embedding", k = 2, lambda = 0.5)
      .orderBy("rank").collect()
    assert(r.map(_.getLong(2)).toSeq == Seq(1L, 2L))
    assert(r(0).getDouble(3) == 0.45)
  }

  test("mmrRerank at λ=1 reproduces relevance order on real retrieval pages") {
    val hits = Similarity.bruteForceTopK(
        emb, queries, "vec_id", "embedding", "q_id", "q_vec", k = 10)
      .select(col("query_id"), col("neighbor_id").as("doc_id"),
        col("cos").as("score"), col("rank"))
    val rr = Similarity.mmrRerank(
      hits.select("query_id", "doc_id", "score"), emb, "vec_id", "embedding",
      k = 10, lambda = 1.0)
    val want = hits.select(col("query_id"), col("doc_id"), col("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong)).toSet
    val got = rr.select(col("query_id"), col("doc_id"), col("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want, s"λ=1 rerank diverged from relevance order")
    // k larger than the page: every candidate comes back exactly once
    val all = Similarity.mmrRerank(
      hits.select("query_id", "doc_id", "score").filter(col("query_id") === 0),
      emb, "vec_id", "embedding", k = 100, lambda = 0.3)
    assert(all.count() == hits.filter(col("query_id") === 0).count())
  }

  test("clusterBalancedSample: per-cell quota, independent draw replay, determinism") {
    // k beyond any cell's population = the full assignment with a
    // total per-cell ordering; the k=8 sample must be exactly its
    // rank<=8 prefix (quota + membership internal consistency)
    val full = Similarity.clusterBalancedSample(
      emb, "vec_id", "embedding", dim = 64, nlist = 24, k = 100000)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val got = Similarity.clusterBalancedSample(
      emb, "vec_id", "embedding", dim = 64, nlist = 24, k = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(full.map(_._1).distinct.length == 500, "full draw must cover the corpus")
    assert(got == full.filter(_._3 <= 8).toSet)
    assert(got.groupBy(_._2).values.forall(_.size <= 8))
    // independent replay of the Efraimidis–Spirakis draw: within each
    // cell, ranks must order by (quantized ln(u) desc, id), with u
    // from the same 60-bit md5 recipe recomputed here from scratch
    def key9(id: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"ws_$id".getBytes("UTF-8"))
      val h = java.lang.Long.parseLong(d.take(8).map("%02x".format(_)).mkString.take(15), 16)
      BigDecimal(math.log((h.toDouble + 0.5) / 1152921504606846976.0) / 1.0 * 1.0e9)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    for ((cell, rows) <- full.groupBy(_._2)) {
      val byRank = rows.sortBy(_._3).map(_._1).toSeq
      val replay = rows.map(_._1).sortBy(id => (-key9(id), id)).toSeq
      assert(byRank == replay, s"cell $cell rank order diverged from the md5 draw")
    }
    // partitioning must not change the sample (deterministic quantizer
    // + deterministic draw)
    val rep = Similarity.clusterBalancedSample(
      graft.ops.Parallelism.ensure(emb.repartition(13)),
      "vec_id", "embedding", dim = 64, nlist = 24, k = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(rep == got, "sample changed under repartitioning")
  }

  test("filtered IVF search: exact top-k among admissible ids; pruning survives the filter") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_ivf_filt").toString
    Similarity.writeIvfIndex(emb, "vec_id", "embedding", dim = 64, nlist = 24,
      path = s"$tmp/ivf")
    val allowed = emb.filter(col("label") % 2 === 0).select(col("vec_id"))
    val filtered = Similarity.ivfTopKIndexed(spark, s"$tmp/ivf", queries,
      "q_id", "q_vec", k = 5, nprobe = 6, allowed = Some(allowed))
    val allowedSet = allowed.collect().map(_.getLong(0)).toSet
    val got = filtered.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3).toLong))
    assert(got.forall(t => allowedSet(t._2)), "a neighbor violated the predicate")
    // the filtered ranking must be EXACTLY the unfiltered candidate
    // ranking restricted to admissible ids (post-filter semantics)
    val unf = Similarity.ivfTopKIndexed(spark, s"$tmp/ivf", queries,
      "q_id", "q_vec", k = 1000000, nprobe = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3).toLong))
    val expected = unf.filter(t => allowedSet(t._2))
      .groupBy(_._1).toSeq.flatMap { case (_, rows) =>
        rows.sortBy(_._4).take(5).zipWithIndex
          .map { case ((q, n, c, _), i) => (q, n, c, (i + 1).toLong) }
      }.toSet
    assert(got.toSet == expected,
      s"filtered top-5 diverged from the restricted unfiltered ranking")
    // the metadata filter must not defeat the probe's partition pruning
    val plan = Similarity.ivfTopKIndexed(spark, s"$tmp/ivf", queries,
      "q_id", "q_vec", k = 5, nprobe = 6, allowed = Some(allowed))
      .queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(plan).isDefined,
      "probe cells fell out of PartitionFilters under the semi join:\n" + plan.take(2000))
  }

  test("embeddingDimStats: hand-computed means/variances; constant dim has zero variance") {
    import spark.implicits._
    val emb = Seq(
      (1L, Array(1.0f, 0.5f)),
      (2L, Array(1.0f, -0.5f)),
      (3L, Array(1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.embeddingDimStats(emb, "embedding")
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    assert(got(0) == ((3L, 1.0, 0.0, 1.0, 1.0)), s"constant dim: ${got(0)}")
    // var = (3·(0.25+0.25) − 0) / 9 = 1/6
    assert(got(1) == ((3L, 0.0, 0.166667, -0.5, 0.5)), s"varying dim: ${got(1)}")
    val rep = Similarity.embeddingDimStats(emb.repartition(7), "embedding")
      .collect().map(_.toSeq).toSet
    assert(rep == Similarity.embeddingDimStats(emb, "embedding")
      .collect().map(_.toSeq).toSet, "stats changed under repartitioning")
  }

  test("embeddingDimStats on real embeddings: 64 dims, full coverage, sane ranges") {
    val emb = graft.model.Tables.embeddings(spark, sfDir)
    val rows = Similarity.embeddingDimStats(emb, "embedding").collect()
    assert(rows.length == 64)
    val n = emb.count()
    assert(rows.forall(_.getLong(1) == n), "every dimension covers the corpus")
    assert(rows.forall(r => r.getDouble(3) >= 0.0), "variance is non-negative")
    assert(rows.forall(r => r.getDouble(4) <= r.getDouble(2) &&
      r.getDouble(2) <= r.getDouble(5)), "min <= mean <= max per dimension")
  }

  test("ivfHealth: counts cover the corpus, match the persisted index layout") {
    val emb = graft.model.Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val health = Similarity.ivfHealth(emb, "vec_id", "embedding", dim = 64, nlist = 24)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getDouble(2), if (r.isNullAt(3)) -1.0 else r.getDouble(3))))
      .toMap
    assert(health.size == 24, "one row per cell, empty cells included")
    assert(health.values.map(_._1).sum == emb.count(), "counts must cover the corpus")
    assert(health.values.forall { case (n, _, e) => (n == 0L) == (e == -1.0) },
      "mean error defined exactly on non-empty cells")
    assert(health.values.forall { case (n, _, e) => n == 0L || e >= 0.0 })
    // occupancy must agree with the persisted index's partition layout
    // (same quantizer, same assignment)
    val tmp = java.nio.file.Files.createTempDirectory("graft_ivf_health").toString
    Similarity.writeIvfIndex(emb, "vec_id", "embedding", dim = 64, nlist = 24,
      path = s"$tmp/ivf")
    val stored = spark.read.parquet(s"$tmp/ivf/vectors")
      .groupBy("cell").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(health.filter(_._2._1 > 0).map { case (c, v) => c -> v._1 } == stored,
      "health occupancy diverged from the index's own partitioning")
  }

  test("reindexIfUnhealthy: fresh index is a no-op; a degraded assignment " +
    "breaches the thresholds, fires the rebuild, and restores probe parity") {
    val embs = emb.select("vec_id", "embedding")
    val tmp = java.nio.file.Files.createTempDirectory("graft_reindex").toString
    Similarity.writeIvfIndex(embs, "vec_id", "embedding", dim = 64, nlist = 24,
      path = s"$tmp/ivf")
    val freshMeta = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$tmp/ivf/index.json")).toSeq

    // fresh: generous thresholds -> measured, logged, NOT rebuilt
    val ok = Similarity.reindexIfUnhealthy(spark, s"$tmp/ivf",
      maxOccupancyCv = 100.0, maxMeanSqErr = Double.MaxValue)
    assert(!ok.rebuilt, s"healthy index must not rebuild: $ok")
    assert(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$tmp/ivf/index.json")).toSeq == freshMeta,
      "a no-op decision must leave the index metadata untouched")
    val log = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$tmp/ivf/reindex.json")), "UTF-8")
    assert(log.contains("\"rebuilt\":false"), s"decision log missing: $log")

    // degrade: cram every vector into cell 0 — occupancy CV blows up
    // (23 empty cells) and the quantization error no longer reflects
    // the trained centroids
    val crammed = spark.read.parquet(s"$tmp/ivf/vectors")
      .select(col("vec_id"), col("embedding"))
      .withColumn("cell", lit(0)).localCheckpoint()
    crammed.write.mode("overwrite").partitionBy("cell").parquet(s"$tmp/ivf/vectors")
    val sick = Similarity.reindexIfUnhealthy(spark, s"$tmp/ivf",
      maxOccupancyCv = 1.0, maxMeanSqErr = Double.MaxValue)
    assert(sick.rebuilt && sick.occupancyCv > 1.0,
      s"degraded index must trigger the rebuild: $sick")
    assert(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$tmp/ivf/reindex.json")), "UTF-8")
      .contains("\"rebuilt\":true"))

    // the rebuild re-spreads the cells and restores exact probe
    // parity with the in-memory pruned search
    val again = Similarity.reindexIfUnhealthy(spark, s"$tmp/ivf",
      maxOccupancyCv = 1.0, maxMeanSqErr = Double.MaxValue)
    assert(!again.rebuilt, s"rebuilt index must measure healthy again: $again")
    val indexed = Similarity.ivfTopKIndexed(
      spark, s"$tmp/ivf", queries, "q_id", "q_vec", k = 5, nprobe = 6)
    val inMemory = Similarity.ivfTopK(
      embs, queries,
      "vec_id", "embedding", "q_id", "q_vec", dim = 64, k = 5, nlist = 24, nprobe = 6)
    val diff = indexed.exceptAll(inMemory).count() + inMemory.exceptAll(indexed).count()
    assert(diff == 0, s"rebuilt index probe differs from in-memory by $diff rows")
  }

  test("ivfHealth: an identical-vector corpus collapses to one zero-error cell") {
    import spark.implicits._
    val vec = Array.fill(64)(0.25f)
    val emb = (1L to 5L).map(i => (i, vec)).toDF("vec_id", "embedding")
    val rows = Similarity.ivfHealth(emb, "vec_id", "embedding", dim = 64, nlist = 4)
      .collect().map(r => (r.getInt(0), r.getLong(1),
        if (r.isNullAt(3)) null else r.getDouble(3).asInstanceOf[AnyRef]))
    assert(rows.length == 4)
    val nonEmpty = rows.filter(_._2 > 0L)
    assert(nonEmpty.length == 1, s"identical vectors must land in one cell: ${rows.toSeq}")
    assert(nonEmpty.head._3 == 0.0.asInstanceOf[AnyRef],
      "a centroid equal to its only vector has zero quantization error")
    assert(rows.filter(_._2 == 0L).forall(_._3 == null))
  }
}
