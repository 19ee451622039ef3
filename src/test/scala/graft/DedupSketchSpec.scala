package graft

import org.apache.spark.sql.functions._

import graft.functions.MinHashSketchAgg

/** The custom TypedImperativeAggregate MinHash sketch must be
  * bit-equal to the declarative k-column `min()` formulation it
  * replaced inside `Dedup.minHashLshPairs` — same universal-hash
  * parametrization, same minima, any input distribution. Also checks
  * the partial-aggregation path (merge) by forcing multiple input
  * partitions per group.
  */
class DedupSketchSpec extends SparkSpecBase {

  private val p = MinHashSketchAgg.Prime

  test("sketch signatures equal the declarative k-column min() signatures") {
    val spark2 = spark
    import spark2.implicits._
    val k = 16
    val rnd = new scala.util.Random(7)
    // 40 groups x ~50 hashes, deliberately spread over 8 partitions so
    // every group spans several partial buffers (exercises merge()).
    val rows = for {
      g <- 0 until 40
      _ <- 0 until (10 + rnd.nextInt(80))
    } yield (g.toLong, rnd.nextLong().abs % (1L << 32))
    val df = rows.toDF("doc_id", "h").repartition(8)

    val sketch = df.groupBy(col("doc_id"))
      .agg(MinHashSketchAgg.minhashSketch(col("h"), k).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap

    val minAggs = (0 until k).map { i =>
      val a = 2L * i + 1
      val b = 1013904223L * (i + 1) % p
      min(pmod(col("h") * lit(a) + lit(b), lit(p))).as(s"mh_$i")
    }
    val declarative = df.groupBy(col("doc_id")).agg(minAggs.head, minAggs.tail: _*)
      .collect().map(r => r.getLong(0) -> (1 to k).map(r.getLong)).toMap

    assert(sketch.keySet == declarative.keySet)
    sketch.foreach { case (g, sig) =>
      assert(sig == declarative(g), s"group $g signature mismatch")
    }
  }

  test("per-row minHashSignature is bit-equal to the aggregate sketch") {
    val spark2 = spark
    import spark2.implicits._
    val k = 16
    val rnd = new scala.util.Random(11)
    val rows = for {
      g <- 0 until 25
      _ <- 0 until (5 + rnd.nextInt(40))
    } yield (g.toLong, rnd.nextLong().abs % (1L << 32))
    val df = rows.toDF("doc_id", "h").repartition(4)

    val agg = df.groupBy(col("doc_id"))
      .agg(MinHashSketchAgg.minhashSketch(col("h"), k).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap

    // Per-row form: one row per doc carrying the hash array.
    val perRow = df.groupBy(col("doc_id"))
      .agg(collect_list(col("h")).as("hs"))
      .select(col("doc_id"),
        graft.dedup.Dedup.minHashSignature(col("hs"), k).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap

    assert(perRow == agg)
  }

  test("simhash sketch equals the declarative 60-column vote signatures") {
    val spark2 = spark
    import spark2.implicits._
    val bitsN = 60
    val rnd = new scala.util.Random(11)
    val rows = for {
      g <- 0 until 30
      _ <- 0 until (5 + rnd.nextInt(60))
    } yield (g.toLong, rnd.nextLong().abs % (1L << 60))
    val df = rows.toDF("doc_id", "h").repartition(8)

    val sketch = df.groupBy(col("doc_id"))
      .agg(graft.functions.SimHashSketchAgg.simhashSig(col("h"), bitsN).as("sig"))
      .as[(Long, Long)].collect().toMap

    val voteAggs = (0 until bitsN).map { j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L)).as(s"b$j")
    }
    val votes = df.groupBy(col("doc_id")).agg(voteAggs.head, voteAggs.tail: _*)
    val sigExpr = (0 until bitsN)
      .map(j => when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce((a, b) => a.bitwiseOR(b))
    val declarative = votes.select(col("doc_id"), sigExpr.as("sig"))
      .as[(Long, Long)].collect().toMap

    assert(sketch == declarative)
  }

  test("null inputs are ignored; empty-input group keeps Long.MaxValue minima") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq((1L, Some(5L)), (1L, None), (2L, None))
      .toDF("doc_id", "h")
    val got = df.groupBy(col("doc_id"))
      .agg(MinHashSketchAgg.minhashSketch(col("h"), 4).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    // group 2 saw only nulls: buffer stays at the identity
    assert(got(2L) == Seq.fill(4)(Long.MaxValue))
    // group 1: minima of the single hash h=5
    val expect = (0 until 4).map { i =>
      val a = 2L * i + 1
      val b = 1013904223L * (i + 1) % MinHashSketchAgg.Prime
      (a * 5L + b) % MinHashSketchAgg.Prime
    }
    assert(got(1L) == expect)
  }

  test("hot-bucket cap drops degenerate buckets; uncapped is unchanged") {
    val spark2 = spark
    import spark2.implicits._
    // 40 byte-identical docs: every band bucket for them has 40
    // members -> 780 pairs per band uncapped. Two genuinely similar
    // but distinct docs ride along.
    val boiler = (0 until 40).map(i => (i.toLong, "the same boilerplate text repeated here"))
    val pair = Seq(
      (100L, "a distinctly worded document about graph clustering"),
      (101L, "a distinctly worded document about graph clusters"))
    val docs = (boiler ++ pair).toDF("doc_id", "text")
    val uncapped = graft.dedup.Dedup.minHashCandidates(docs, "doc_id", "text", n = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.size >= 40 * 39 / 2, s"expected quadratic boilerplate pairs, got ${uncapped.size}")
    // Cap below the boilerplate bucket size: its pairs vanish; the
    // distinct near-dup pair survives (its buckets are size 2).
    val capped = graft.dedup.Dedup.minHashCandidates(docs, "doc_id", "text", n = 2,
      maxBucketSize = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.contains((100L, 101L)), s"cap dropped the true near-dup pair: $capped")
    assert(!capped.exists(p => p._1 < 40 && p._2 < 40), s"hot bucket not capped: $capped")
    // Long.MaxValue cap == no cap (the q19 oracle relies on this).
    val defaulted = graft.dedup.Dedup.minHashCandidates(docs, "doc_id", "text", n = 2,
      maxBucketSize = Long.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(defaulted == uncapped)
  }

  test("minHashLshJoin links cross-corpus near-dups, never intra-corpus pairs") {
    val spark2 = spark
    import spark2.implicits._
    val left = Seq(
      (0L, "the amazon river flows through the dense south american rainforest canopy"),
      (2L, "completely unrelated text about compiler optimization passes and registers"),
      // intra-left near-dup of doc 0: must NOT be reported
      (4L, "the amazon river flows through the dense south american rainforest basin"))
      .toDF("doc_id", "text")
    val right = Seq(
      // near-dup of left 0 (one token differs)
      (1L, "the amazon river flows through the dense south american rainforest floor"),
      (3L, "a totally different document describing spark shuffle partitioning")
    ).toDF("doc_id", "text")
    val got = graft.dedup.Dedup.minHashLshJoin(left, right, "doc_id", "text",
      n = 2, threshold = 0.6, numHashes = 64, bands = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((0L, 1L)) && got.contains((4L, 1L)),
      s"cross-corpus near-dups missed: $got")
    assert(!got.exists { case (a, b) => a % 2 == b % 2 },
      s"intra-corpus pair leaked into the cross join: $got")
  }

  test("minHashLshJoin matches exact cross-Jaccard on a planted corpus") {
    val spark2 = spark
    import spark2.implicits._
    val base = (0 until 20).map { i =>
      (i.toLong, s"document family $i with a unique payload token tok$i plus shared filler words")
    }
    // odd ids: near-copies of the even family (swap one trailing word)
    val docs = base.map { case (id, t) => (id * 2, t) } ++
      base.map { case (id, t) => (id * 2 + 1, t.replace("filler words", "filler terms")) }
    val df = docs.toDF("doc_id", "text")
    val got = graft.dedup.Dedup.minHashLshJoin(
      df.filter(col("doc_id") % 2 === 0), df.filter(col("doc_id") % 2 === 1),
      "doc_id", "text", n = 2, threshold = 0.7, numHashes = 64, bands = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact truth: each even doc pairs with its own odd copy only
    // (families differ by the unique tok$i gram pair)
    val truth = (0 until 20).map(i => (i.toLong * 2, i.toLong * 2 + 1)).toSet
    assert(got == truth, s"got $got\nwant $truth")
  }

  test("bandingReport: totals re-derive from the band table; identical docs share every band") {
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"), // exact twin of 1
      (3L, "one two three four five six seven"),
      (4L, "completely different content lives here")
    ).toDF("doc_id", "text")
    val report = graft.dedup.Dedup.bandingReport(docs, "doc_id", "text", n = 2)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(report.keySet == (0 until 8).toSet, "one row per band")
    // identical texts -> identical signatures -> shared bucket in
    // EVERY band; the two singles share with nobody
    for ((b, (nDocs, nBuckets, maxB, pairs)) <- report) {
      assert(nDocs == 4L, s"band $b covers all gram-bearing docs")
      assert(nBuckets == 3L, s"band $b: twins collapse to one bucket")
      assert(maxB == 2L && pairs == 1L, s"band $b: exactly the twin pair")
    }
    // totals must re-derive from the raw band table (the report
    // audits the real banding, not a re-derivation)
    val sigs = graft.dedup.Dedup.minHashCandidates(docs, "doc_id", "text", n = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sigs == Set((1L, 2L)), s"candidate set $sigs")
  }

  test("prefixDupProfile: shared headers counted corpus-wide, profiled per source") {
    val spark2 = spark
    import spark2.implicits._
    // docs 1 (A) and 2 (B) share a 4-token header with different
    // tails; 3 (A) and 4 (B) are unique; 5 (A) shares the header too
    val docs = Seq(
      ("A", "terms of service apply today only"),
      ("B", "terms of service apply tomorrow instead"),
      ("A", "completely original content number one"),
      ("B", "another unique piece of writing"),
      ("A", "terms of service apply forever now")
    ).toDF("source", "text")
    val got = graft.dedup.Dedup.prefixDupProfile(docs, "text", "source", prefixTokens = 4)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // A: 3 docs, 2 share the corpus-wide header prefix, 1 distinct
    // shared prefix; B: 2 docs, 1 shares (with A's — cross-source!)
    assert(got("A") == ((3L, 2L, 1L, 0.666667)), s"A: ${got("A")}")
    assert(got("B") == ((2L, 1L, 1L, 0.5)), s"B: ${got("B")}")
    // a prefix cut longer than every document degrades to exact-text
    // fingerprints: nothing shared here
    val long = graft.dedup.Dedup.prefixDupProfile(docs, "text", "source", prefixTokens = 50)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(long.values.forall(_ == 0L), s"full-text fingerprints collide: $long")
  }
}
