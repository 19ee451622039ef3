package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Token-budget mixture allocation — the planning step of a
  * multi-source training run: given per-source token counts, a total
  * token budget, a temperature, and a repetition cap, decide how many
  * tokens to draw from each source. Temperature-scaled weights
  * (w_s = n_s^α — α < 1 flattens the mixture toward small sources,
  * the standard multilingual/multi-corpus reweighting) fill the
  * budget proportionally, but no source may be drawn past
  * `maxEpochs` passes over its data — the published lesson that
  * repeating a small corpus tens of times hurts more than the
  * diversity helps.
  *
  * The capped fill is the classic water-filling problem:
  * a_s = min(c·w_s, E·n_s) with c chosen so Σ a_s = budget. Rather
  * than iterating (cap, redistribute, repeat — data-dependent round
  * count), the level c is found in CLOSED FORM: sources sort by the
  * level r_s = E·n_s / w_s at which they saturate; prefix sums of
  * caps and weights in that order give each cut's candidate level
  * c_k = (B − Σ_{capped} cap) / Σ_{uncapped} w, and the first
  * candidate below its row's saturation level is the answer (the
  * fill function is monotone, so exactly one cut is consistent; if
  * none is, the budget exceeds every cap and all sources clamp to
  * `maxEpochs`).
  *
  * Determinism across engines and partitionings: weights quantize to
  * 1e-9 fixed point immediately after the (exactly-rounded IEEE)
  * sqrt, so every sum is a LONG sum; saturation levels and candidate
  * levels are single divisions of longs — reproducible bit-for-bit
  * in any engine (the q113 oracle replays the whole allocator in
  * SQL). Temperatures other than 0.5 and 1.0 go through pow(), whose
  * last-ulp behavior is libm-specific — fine within Spark, not
  * certified cross-engine.
  *
  * Scale shape: the allocator runs on the PER-SOURCE table (one row
  * per corpus source — thousands at most, after callers aggregate
  * the 100 TB corpus down with one groupBy). Prefix sums still go
  * through [[Packing.globalCumsum]]'s distributed form and the
  * 1-row level/total frames broadcast, so nothing assumes the
  * source table fits one partition.
  *
  * Input contract: `(source: string, n_tokens: long)`, one row per
  * source. Output: (source, n_tokens, weight — normalized, 6dp,
  * alloc_tokens, epochs — 6dp, capped 0/1). Σ alloc_tokens ≤ budget
  * (floor rounding spends at most one token per source under the
  * level) unless budget > Σ caps, in which case every source clamps.
  */
object Mixture {

  def tokenBudgetAllocation(
      perSource: DataFrame,
      budget: Long,
      maxEpochs: Long,
      temperature: Double = 0.5): DataFrame = {
    require(budget >= 0L, s"budget must be >= 0, got $budget")
    require(maxEpochs >= 1L, s"maxEpochs must be >= 1, got $maxEpochs")
    require(temperature > 0.0 && temperature <= 1.0,
      s"temperature must be in (0, 1], got $temperature")
    val nD = col("n_tokens").cast("double")
    // sqrt and identity are exactly-rounded IEEE ops (pow is not):
    // prefer them so the quantized weight is engine-portable
    val wRaw =
      if (temperature == 0.5) sqrt(nD)
      else if (temperature == 1.0) nD
      else pow(nD, lit(temperature))
    val b = perSource
      .filter(col("n_tokens") > 0L)
      .select(col("source"), col("n_tokens").cast("long").as("n_tokens"),
        Quality.fixedPoint9(wRaw).as("w9"),
        (col("n_tokens") * lit(maxEpochs)).cast("long").as("cap_t"))
      // saturation level: the fill level at which this source hits
      // its epoch cap — longs in, one exact double division out
      .withColumn("r", col("cap_t").cast("double") * 1.0e9 / col("w9").cast("double"))
      // three consumers (prefix sums, totals, final fill) and a
      // corpus-sized lineage behind the per-source aggregate: stage
      // it so the caller's 100 TB tokenize runs once, not three times
      .transform(Parallelism.stage)
    val cum = Packing.globalCumsum(
      Packing.globalCumsum(b, Seq("r", "source"), "cap_t")
        .withColumnRenamed("cum", "cum_cap"),
      Seq("r", "source"), "w9")
      .withColumnRenamed("cum", "cum_w9")
    val tot = b.agg(
      sum("w9").cast("long").as("tot_w9"),
      sum("cap_t").cast("long").as("tot_cap"))
    // cut BEFORE this row: everything earlier capped, this row and
    // later fill proportionally; exclusive cumsums are exactly the
    // capped-side totals
    val cand = cum.crossJoin(broadcast(tot))
      .withColumn("c_cand",
        (lit(budget) - col("cum_cap")).cast("double") /
          ((col("tot_w9") - col("cum_w9")).cast("double") / 1.0e9))
    // first (in saturation order) self-consistent cut; min of an
    // empty filter is a single null row = the all-capped case
    val level = cand.filter(col("c_cand") < col("r"))
      .agg(min(struct(col("r"), col("source"), col("c_cand"))).as("m"))
      .select(col("m.c_cand").as("c_star"))
    b.crossJoin(broadcast(level)).crossJoin(broadcast(tot))
      .select(
        col("source"), col("n_tokens"),
        round(col("w9").cast("double") / col("tot_w9").cast("double"), 6)
          .as("weight"),
        when(col("c_star").isNull || col("c_star") >= col("r"), col("cap_t"))
          .otherwise(floor(col("c_star") * col("w9").cast("double") / 1.0e9)
            .cast("long"))
          .as("alloc_tokens"),
        col("cap_t"),
        (col("c_star").isNull || col("c_star") >= col("r")).cast("int")
          .as("capped"))
      .withColumn("epochs",
        round(col("alloc_tokens").cast("double") / col("n_tokens").cast("double"), 6))
      .drop("cap_t")
  }
}
