package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Md5Prefix64

/** Persisted BM25 posting store — the production shape of repeated
  * retrieval over a stable (or growing) corpus: the corpus is
  * tokenized and counted ONCE into a posting table partitioned by a
  * term-hash bucket, and every query batch after that probes the
  * store WITHOUT re-reading — let alone re-tokenizing — the corpus
  * text.
  *
  * Scale shape of [[retrieve]]: the query batch's distinct term
  * buckets (bounded by the batch's vocabulary, collected once on the
  * driver) become a STATIC `tb IN (...)` predicate on the partition
  * column, so the posting scan reads only the buckets that can
  * contain query terms — `PartitionFilters` in the plan, the same
  * pruning contract as the persisted IVF index. Everything joined to
  * the postings is broadcast (query terms; df restricted to query
  * terms); corpus stats come from `store.json` as literals. Per-batch
  * cost: O(batch) tokenize + O(matched postings) scan/score, never
  * O(corpus).
  *
  * [[append]] keeps the store authoritative as the corpus grows:
  * new docs' postings land in their term-bucket partitions, the
  * |vocab|-bounded df table is merged, and the stats counters update
  * arithmetically. Batches must carry only NEW doc_ids (the
  * [[graft.dedup.FingerprintStore]] contract — dedup upstream).
  *
  * Equality contract: [[retrieve]] over a store created from `corpus`
  * returns BIT-IDENTICAL rows to [[Retrieval.bm25TopK]] on the same
  * inputs (one shared scoring expression; `avg(dl)` of integer-valued
  * doubles is exactly `total_dl / n_docs` in IEEE, so the stored
  * counter pair reproduces the in-memory average). The driver gate
  * runs the store path against the in-memory oracle verbatim.
  */
object PostingStore {

  private def termBucket(term: org.apache.spark.sql.Column, nBuckets: Int) =
    pmod(Md5Prefix64(concat(lit("bm_"), term)), lit(nBuckets.toLong)).cast("int")

  private def writeText(spark: SparkSession, path: String, body: String): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new org.apache.hadoop.fs.Path(path), true)
    try out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  private final case class StoreMeta(nDocs: Long, totalDl: Long, nBuckets: Int)

  private def readMeta(spark: SparkSession, path: String): StoreMeta = {
    val row = spark.read.json(s"$path/store.json").collect()(0)
    StoreMeta(
      nDocs = row.getAs[Long]("n_docs"),
      totalDl = row.getAs[Long]("total_dl"),
      nBuckets = row.getAs[Long]("n_buckets").toInt)
  }

  private def writeMeta(spark: SparkSession, path: String, m: StoreMeta): Unit =
    writeText(spark, s"$path/store.json",
      s"""{"n_docs":${m.nDocs},"total_dl":${m.totalDl},"n_buckets":${m.nBuckets}}""")

  /** Tokenize + count `corpus` (doc_id, text) into `path`:
    * `postings/` (doc_id, dl, term, tf) partitioned by term bucket,
    * `dfreq/` (term, df) partitioned the same way, and `store.json`
    * with the exact (n_docs, total_dl) counters.
    */
  def create(corpus: DataFrame, path: String, nBuckets: Int = 64): Unit = {
    val spark = corpus.sparkSession
    val postings = Retrieval.buildPostings(Parallelism.ensure(corpus))
      .localCheckpoint(false)
    // repartition by bucket before the partitioned write: one task's
    // output per bucket, not tasks × buckets sliver files.
    postings
      .withColumn("tb", termBucket(col("term"), nBuckets))
      .repartition(col("tb"))
      .write.mode("overwrite").partitionBy("tb").parquet(s"$path/postings")
    postings.groupBy("term").agg(count(lit(1)).as("df"))
      .withColumn("tb", termBucket(col("term"), nBuckets))
      .repartition(col("tb"))
      .write.mode("overwrite").partitionBy("tb").parquet(s"$path/dfreq")
    val st = postings.select(col("doc_id"), col("dl")).distinct()
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum(col("dl").cast("long")), lit(0L)).as("total_dl"))
      .collect()(0)
    writeMeta(spark, path, StoreMeta(st.getLong(0), st.getLong(1), nBuckets))
  }

  /** BM25 top-`k` of `queries` (q_id, text) against the store —
    * [[Retrieval.bm25TopK]]'s result, with the corpus-sized tokenize
    * replaced by a bucket-pruned posting scan. */
  def retrieve(
      spark: SparkSession,
      path: String,
      queries: DataFrame,
      k: Int = 10,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    val meta = readMeta(spark, path)
    // Materialized once: feeds the driver-side bucket collect and the
    // two broadcast joins — a re-evaluated source could otherwise
    // probe buckets the static partition filter never admitted.
    val qterms = Retrieval.queryTerms(queries)
      .withColumn("tb", termBucket(col("term"), meta.nBuckets))
      .localCheckpoint(false)
    val buckets = qterms.select("tb").distinct().collect().map(_.getInt(0)).toSeq
    val postings = spark.read.parquet(s"$path/postings")
      .filter(col("tb").isin(buckets: _*))
    val dfreq = spark.read.parquet(s"$path/dfreq")
      .filter(col("tb").isin(buckets: _*))
    // avg(dl) over integer-valued doubles == total/count exactly.
    val avgdl = meta.totalDl.toDouble / meta.nDocs.toDouble
    Retrieval.scoreTopK(
      postings.select("doc_id", "dl", "term", "tf"),
      qterms.select("q_id", "term"), dfreq.select("term", "df"),
      withStats = _.withColumn("n_docs", lit(meta.nDocs)).withColumn("avgdl", lit(avgdl)),
      k = k, k1 = k1, b = b)
  }

  /** Grow the store with `newDocs` (doc_id, text) — doc_ids must be
    * NEW (dedup upstream; a re-appended doc would double-count its
    * postings). New postings append into their bucket partitions; the
    * df table merges (|vocab|-bounded); the stats counters advance
    * arithmetically, preserving the exact-average contract. */
  def append(newDocs: DataFrame, path: String): Unit = {
    val spark = newDocs.sparkSession
    val meta = readMeta(spark, path)
    val postings = Retrieval.buildPostings(Parallelism.ensure(newDocs))
      .localCheckpoint(false)
    postings
      .withColumn("tb", termBucket(col("term"), meta.nBuckets))
      .repartition(col("tb"))
      .write.mode("append").partitionBy("tb").parquet(s"$path/postings")
    // Merge df: old + new per term. The merged table is eagerly
    // checkpointed BEFORE the overwrite — it reads from the path it
    // is about to replace.
    val newDf = postings.groupBy("term").agg(count(lit(1)).as("df"))
    val merged = spark.read.parquet(s"$path/dfreq").select("term", "df")
      .unionByName(newDf)
      .groupBy("term").agg(sum("df").cast("long").as("df"))
      .withColumn("tb", termBucket(col("term"), meta.nBuckets))
      .localCheckpoint(true)
    merged
      .repartition(col("tb"))
      .write.mode("overwrite").partitionBy("tb").parquet(s"$path/dfreq")
    val st = postings.select(col("doc_id"), col("dl")).distinct()
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum(col("dl").cast("long")), lit(0L)).as("total_dl"))
      .collect()(0)
    writeMeta(spark, path,
      meta.copy(nDocs = meta.nDocs + st.getLong(0), totalDl = meta.totalDl + st.getLong(1)))
  }
}
