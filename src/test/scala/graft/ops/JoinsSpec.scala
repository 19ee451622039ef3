package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Unit coverage for the temporal joins (`ops/Joins.scala`) — the
  * edge cases that one gate query each (q96/q97) cannot pin: tie
  * ordering at equal timestamps, empty/no-match sides, null keys and
  * timestamps (ANSI ASOF never matches a null), bin-boundary
  * exclusivity, degenerate intervals, partition-count invariance,
  * and the skew salt hatch's result-equality contract.
  */
class JoinsSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  // ---- as-of join -------------------------------------------------

  private def leftDf: DataFrame = Seq(
    (1L, "u1", ts("2024-01-01 10:00:00")), // exact tie with a right row
    (2L, "u1", ts("2024-01-01 11:30:00")), // between two right rows
    (3L, "u1", ts("2024-01-01 09:00:00")), // before every right row
    (4L, "u2", ts("2024-01-01 10:00:00")), // key with no right rows
    (5L, "u3", ts("2024-01-01 12:00:00"))  // tie among right rows
  ).toDF("lid", "user", "ltime")

  private def rightDf: DataFrame = Seq(
    (Option("u1"), Option(ts("2024-01-01 10:00:00")), 100L),
    (Option("u1"), Option(ts("2024-01-01 11:00:00")), 101L),
    (Option("u3"), Option(ts("2024-01-01 11:59:00")), 300L),
    (Option("u3"), Option(ts("2024-01-01 11:59:00")), 301L), // same (key, time)
    (None,         Option(ts("2024-01-01 09:00:00")), 400L), // null key: never matches
    (Option("u2"), None,                               500L) // null time: never matches
  ).toDF("user_r", "rtime", "val")

  private def asof(salt: Int = 1, tieBreak: Option[String] = None): Map[Long, Option[Long]] =
    Joins.asofJoin(leftDf, rightDf,
        leftKey = "user", leftTime = "ltime",
        rightKey = "user_r", rightTime = "rtime",
        payload = Seq("val"), tieBreak = tieBreak, saltBuckets = salt)
      .select("lid", "val").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap

  test("asofJoin: inclusive <= at the equal timestamp, latest-earlier otherwise") {
    val m = asof()
    assert(m(1L).contains(100L), "equal timestamp must match (inclusive <=)")
    assert(m(2L).contains(101L), "latest earlier right row wins, not the first")
  }

  test("asofJoin: no earlier right row and no-right-rows key give null payload, row kept") {
    val m = asof()
    assert(m.size == 5, "left-outer: every left row survives")
    assert(m(3L).isEmpty, "left row before all right rows must not match")
    // u2's only right row has a null timestamp — ANSI ASOF never
    // matches a null, so lid=4 must be unmatched, not matched to 500.
    assert(m(4L).isEmpty, "null right timestamp must never match")
  }

  test("asofJoin: ties among right rows resolve by tieBreak when given") {
    // Without tieBreak both 300/301 are admissible; with tieBreak on
    // val the LAST in ascending val order (301) is deterministic.
    assert(asof(tieBreak = Some("val"))(5L).contains(301L))
  }

  test("asofJoin: payload name colliding with a left column is rejected") {
    val badLeft = leftDf.withColumnRenamed("lid", "val")
    val e = intercept[IllegalArgumentException] {
      Joins.asofJoin(badLeft, rightDf, "user", "ltime", "user_r", "rtime", Seq("val"))
    }
    assert(e.getMessage.contains("collide"))
  }

  test("asofJoin: saltBuckets ∈ {1, 8} produce identical results") {
    assert(asof(salt = 1) == asof(salt = 8))
    assert(asof(salt = 8, tieBreak = Some("val"))(5L).contains(301L))
  }

  test("asofJoin: empty right side gives all-null payload; result invariant to partition count") {
    val emptyRight = rightDf.filter(lit(false))
    val m = Joins.asofJoin(leftDf.repartition(7), emptyRight, "user", "ltime",
        "user_r", "rtime", Seq("val"))
      .select("lid", "val").collect()
    assert(m.length == 5 && m.forall(_.isNullAt(1)))
    val one = Joins.asofJoin(leftDf.repartition(1), rightDf.repartition(1),
      "user", "ltime", "user_r", "rtime", Seq("val"), tieBreak = Some("val"))
      .select("lid", "val").collect().map(_.toSeq).sortBy(_.head.toString)
    val many = Joins.asofJoin(leftDf.repartition(13), rightDf.repartition(5),
      "user", "ltime", "user_r", "rtime", Seq("val"), tieBreak = Some("val"))
      .select("lid", "val").collect().map(_.toSeq).sortBy(_.head.toString)
    assert(one.toSeq == many.toSeq)
  }

  test("asofJoin plan: one window over a union — no join node, no cartesian") {
    val p = Joins.asofJoin(leftDf, rightDf, "user", "ltime", "user_r", "rtime", Seq("val"))
      .queryExecution.executedPlan.toString
    assert(p.contains("Window"), p.take(1500))
    assert(!p.contains("Join"), "as-of must be the union+window shape, not a join:\n" + p.take(1500))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  // ---- range join -------------------------------------------------

  private val HourUs = 3600L * 1000000L

  private def points: DataFrame = Seq(
    (10L, "u1", ts("2024-01-01 10:00:00")), // == interval start (inclusive)
    (11L, "u1", ts("2024-01-01 10:59:59")), // inside, same bin
    (12L, "u1", ts("2024-01-01 11:00:00")), // == interval end (exclusive)
    (13L, "u1", ts("2024-01-01 13:30:00")), // inside the >2-bin interval
    (14L, "u2", ts("2024-01-01 10:30:00")), // wrong key
    (15L, "u1", ts("2024-01-01 16:00:00"))  // inside zero-length interval? no
  ).toDF("pid", "p_user", "p_ts")

  private def intervals: DataFrame = Seq(
    (20L, "u1", ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")), // one bin
    (21L, "u1", ts("2024-01-01 12:30:00"), ts("2024-01-01 15:10:00")), // spans 4 bins
    (22L, "u1", ts("2024-01-01 16:00:00"), ts("2024-01-01 16:00:00"))  // zero-length
  ).toDF("iid", "i_user", "i_start", "i_end")

  private def rj(ps: DataFrame = points, is: DataFrame = intervals): Set[(Long, Long)] =
    Joins.rangeJoinBinned(ps, is, "p_user", "p_ts", "i_user", "i_start", "i_end", HourUs)
      .select("iid", "pid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("rangeJoinBinned: start inclusive, end exclusive at the exact bin boundary") {
    val got = rj()
    assert(got.contains((20L, 10L)), "point == start must match")
    assert(got.contains((20L, 11L)))
    assert(!got.exists(_._2 == 12L), "point == end must NOT match (end-exclusive)")
    assert(!got.exists(_._2 == 14L), "wrong key must not match")
  }

  test("rangeJoinBinned: interval spanning >2 bins catches its interior points") {
    assert(rj().contains((21L, 13L)))
  }

  test("rangeJoinBinned: zero-length interval matches nothing and explodes no bin range") {
    val got = rj()
    assert(!got.exists(_._1 == 22L), "end <= start interval must match nothing")
    // the clamp: a zero-length interval emits exactly ONE bin row, not
    // a descending sequence — count the exploded side directly
    val binRows = Joins.rangeJoinBinned(
        points.filter(lit(false)), intervals.filter(col("iid") === 22L),
        "p_user", "p_ts", "i_user", "i_start", "i_end", HourUs)
    assert(binRows.count() == 0)
  }

  test("rangeJoinBinned: result invariant to partition count") {
    val a = rj(points.repartition(1), intervals.repartition(1))
    val b = rj(points.repartition(11), intervals.repartition(3))
    assert(a == b)
  }

  test("rangeJoinBinned: mis-sized binUs fails fast with a sized error") {
    val e = intercept[Exception] {
      Joins.rangeJoinBinned(points, intervals, "p_user", "p_ts",
        "i_user", "i_start", "i_end", binUs = 1000L, maxBinsPerInterval = 100).count()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("maxBinsPerInterval")), e.toString)
  }

  test("rangeJoinBinned plan: equi hash join on (bin, key) — never a BNLJ/cartesian") {
    val p = Joins.rangeJoinBinned(points, intervals, "p_user", "p_ts",
        "i_user", "i_start", "i_end", HourUs)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(1500))
  }
}
