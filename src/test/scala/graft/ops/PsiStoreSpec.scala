package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Hand-computed PSI cases: exact quintile cut-points, ties-go-low
  * binning, the self-PSI identity, and the empty/missing-bin edges
  * (the q131 gate covers value parity at corpus scale). */
class PsiStoreSpec extends SparkSpecBase {
  import spark.implicits._

  private def store(path: String): String = {
    val ref = (1 to 10).map(_.toDouble).toDF("v")
    PsiStore.createAt(spark, ref, "v", path)
    path
  }

  test("createAt freezes exact rank cut-points; psi against the reference " +
    "itself is identically zero in every bin") {
    val path = s"${java.nio.file.Files.createTempDirectory("graft_psi").toString}/psi"
    store(path)
    // ranks ceil(q*10) = 2,4,6,8 over 1..10 -> cuts 2,4,6,8
    val (cuts, _) = PsiStore.attach(spark, path)
    assert(cuts == Seq(2.0, 4.0, 6.0, 8.0))
    val self = PsiStore.psi(spark, path, (1 to 10).map(_.toDouble).toDF("v"), "v")
      .orderBy("bin").collect()
    assert(self.length == 5)
    self.foreach { r =>
      assert(r.getLong(3) == 2L && r.getLong(5) == 2L) // n_ref, n_arr
      assert(r.getDouble(4) == 0.2 && r.getDouble(6) == 0.2)
      assert(r.getDouble(7) == 0.0, s"self-PSI must be 0: $r")
    }
  }

  test("ties go LOW, shifted arrivals produce the hand-computed PSI terms, " +
    "empty bins keep their row with a null term") {
    val path = s"${java.nio.file.Files.createTempDirectory("graft_psi2").toString}/psi"
    store(path)
    // arrivals {1, 2, 9}: 2 == cut -> LOWER bin, so bin0 has {1, 2},
    // bin4 has {9}; bins 1-3 empty (rows kept, psi_term null).
    val got = PsiStore.psi(spark, path, Seq(1.0, 2.0, 9.0).toDF("v"), "v")
      .orderBy("bin").collect()
      .map(r => r.getInt(0) ->
        ((r.getLong(3), r.getLong(5), Option(r.get(7)).map(_.asInstanceOf[Double]))))
      .toMap
    def term(a: Double, r: Double) =
      math.rint((a - r) * math.log(a / r) * 1e6) / 1e6
    assert(got(0) == ((2L, 2L, Some(term(2.0 / 3.0, 0.2)))), got.toString)
    assert(got(1) == ((2L, 0L, None)), got.toString)
    assert(got(2) == ((2L, 0L, None)), got.toString)
    assert(got(3) == ((2L, 0L, None)), got.toString)
    assert(got(4) == ((2L, 1L, Some(term(1.0 / 3.0, 0.2)))), got.toString)
    // boundary columns: bin0 open-ended below, bin4 above
    val rows = PsiStore.psi(spark, path, Seq(1.0).toDF("v"), "v")
      .orderBy("bin").collect()
    assert(rows(0).isNullAt(1) && rows(0).getDouble(2) == 2.0)
    assert(rows(4).getDouble(1) == 8.0 && rows(4).isNullAt(2))
  }

  test("empty arrivals: all shares 0, terms null — vanishing mass is drift, " +
    "not a crash") {
    val path = s"${java.nio.file.Files.createTempDirectory("graft_psi3").toString}/psi"
    store(path)
    val got = PsiStore.psi(spark, path, Seq.empty[Double].toDF("v"), "v")
      .orderBy("bin").collect()
    assert(got.length == 5)
    got.foreach { r =>
      assert(r.getLong(5) == 0L && r.getDouble(6) == 0.0 && r.isNullAt(7), s"$r")
    }
  }
}
