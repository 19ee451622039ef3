package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Hand-computed snapshot-diff cases: add/remove/change/unchanged
  * classification, null-text identity, and source attribution for a
  * document that moved sources (the q128 gate covers value parity at
  * corpus scale). */
class CorpusDiffSpec extends SparkSpecBase {
  import spark.implicits._

  test("diff classifies added/removed/changed/unchanged per source, " +
    "null text equals null text, moved docs count under today's source") {
    val prev = Seq(
      (1L, "unchanged text", "a"),       // unchanged
      (2L, "old text", "a"),             // changed (same source)
      (3L, "to be removed", "a"),        // removed
      (4L, null.asInstanceOf[String], "b"), // null == null -> unchanged
      (5L, "was null?", "b"),            // real -> null = changed
      (6L, "moving doc", "a")            // moves a -> c, same content
    ).toDF("doc_id", "text", "source")
    val now = Seq(
      (1L, "unchanged text", "a"),
      (2L, "new text", "a"),
      (4L, null.asInstanceOf[String], "b"),
      (5L, null.asInstanceOf[String], "b"),
      (6L, "moving doc", "c"),
      (7L, "brand new", "b")
    ).toDF("doc_id", "text", "source")
    val got = CorpusDiff.diff(prev, now)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    // source a: doc1 unchanged, doc2 changed, doc3 removed
    assert(got("a") == ((0L, 1L, 1L, 1L)), got.toString)
    // source b: doc4 unchanged (null==null), doc5 changed (real->null),
    // doc7 added
    assert(got("b") == ((1L, 0L, 1L, 1L)), got.toString)
    // source c: doc6 lives here TODAY, content unchanged
    assert(got("c") == ((0L, 0L, 0L, 1L)), got.toString)
    assert(got.keySet == Set("a", "b", "c"))
  }

  test("diff of a snapshot against itself is all-unchanged; against an " +
    "empty snapshot everything is added/removed") {
    val docs = Seq((1L, "x", "s"), (2L, "y", "t")).toDF("doc_id", "text", "source")
    val self = CorpusDiff.diff(docs, docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(self == Map("s" -> ((0L, 0L, 0L, 1L)), "t" -> ((0L, 0L, 0L, 1L))))
    val empty = docs.filter(lit(false))
    val allAdded = CorpusDiff.diff(empty, docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(allAdded == Map("s" -> 1L, "t" -> 1L))
    val allRemoved = CorpusDiff.diff(docs, empty).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(allRemoved == Map("s" -> 1L, "t" -> 1L))
  }
}
