package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** Hand-computed water-filling ground truth for the token-budget
  * allocator — the q113 gate covers engine/oracle parity on the real
  * corpus; this pins the ALLOCATION math on worked examples. */
class MixtureSpec extends SparkSpecBase {
  import spark.implicits._

  private val three = Seq(
    ("s1", 100L), ("s2", 100L), ("s3", 10000L)
  ).toDF("source", "n_tokens")

  private def byName(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getString(0) ->
      ((r.getLong(1), r.getDouble(2), r.getLong(3), r.getInt(4), r.getDouble(5))))
      .toMap

  test("no source caps: proportional sqrt fill, floor spends <= budget") {
    // w = {10, 10, 100}; caps (E=2) = {200, 200, 20000}; B = 1000
    // level = 1000 / 120 = 8.333... -> allocs floor{83.33, 83.33, 833.33}
    val got = byName(Mixture.tokenBudgetAllocation(three, 1000L, 2L))
    assert(got("s1") == ((100L, 0.083333, 83L, 0, 0.83)))
    assert(got("s2") == ((100L, 0.083333, 83L, 0, 0.83)))
    assert(got("s3") == ((10000L, 0.833333, 833L, 0, 0.0833)))
  }

  test("small sources saturate the epoch cap, the big one fills the rest") {
    // B = 5000: cut candidates 41.67 / 43.6 fail their levels (r=20);
    // the third cut gives c = (5000 - 400) / 100 = 46 < 200 -> s1, s2
    // clamp at 2 epochs, s3 gets floor(46 * 100) = 4600
    val got = byName(Mixture.tokenBudgetAllocation(three, 5000L, 2L))
    assert(got("s1") == ((100L, 0.083333, 200L, 1, 2.0)))
    assert(got("s2") == ((100L, 0.083333, 200L, 1, 2.0)))
    assert(got("s3") == ((10000L, 0.833333, 4600L, 0, 0.46)))
  }

  test("budget beyond every cap clamps everything to maxEpochs") {
    val got = byName(Mixture.tokenBudgetAllocation(three, 25000L, 2L))
    assert(got.values.forall(_._4 == 1), s"not all capped: $got")
    assert(got("s1")._3 == 200L && got("s3")._3 == 20000L)
    assert(got.values.forall(_._5 == 2.0))
  }

  test("partitioning-invariant; zero-token sources dropped; temperature 1 = proportional") {
    val withZero = three.union(Seq(("s0", 0L)).toDF("source", "n_tokens"))
    val a = byName(Mixture.tokenBudgetAllocation(withZero.repartition(1), 3000L, 3L))
    val b = byName(Mixture.tokenBudgetAllocation(withZero.repartition(7), 3000L, 3L))
    assert(a == b, s"partitioning changed the allocation: $a vs $b")
    assert(!a.contains("s0"), "a zero-token source has no defined weight")
    // alpha = 1: weights proportional to size, nothing caps at B < total
    val p = byName(Mixture.tokenBudgetAllocation(three, 5100L, 2L, temperature = 1.0))
    assert(p("s1")._2 == 0.009804 && p("s3")._2 == 0.980392)
    assert(p.values.forall(_._4 == 0))
    assert(p.values.map(_._3).sum <= 5100L)
  }

  test("q113 on real documents: minority langs cap at 2 epochs, en fills") {
    val rows = graft.SparkEntry.queries("q113_token_budget")(spark, sfDir).collect()
    assert(rows.length == 5, s"expected 5 language subcorpora, got ${rows.length}")
    val byLang = rows.map(r => r.getString(0) -> r).toMap
    assert(byLang("en").getInt(4) == 0, "en must fill proportionally, not cap")
    assert(byLang.filterKeys(_ != "en").values.forall(_.getInt(4) == 1),
      "every minority language saturates the 2-epoch cap")
    val totalTokens = rows.map(_.getLong(1)).sum
    val spent = rows.map(_.getLong(3)).sum
    assert(spent <= totalTokens * 9L / 5L, "floor fill must not overspend")
    assert(rows.forall(_.getDouble(5) <= 2.0), "no source past the epoch cap")
  }
}
