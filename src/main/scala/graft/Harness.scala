package graft

import org.apache.spark.sql.SparkSession

/** Shared guard for harness scratch directories — the check-22
  * lesson, promoted to a harness-level invariant: append-mode landing
  * feeds and streaming checkpoints ACCUMULATE across runs of a reused
  * work directory, and the coupling is silent (persisted checkpoints
  * mark prior files processed; a deterministic corpus makes stale
  * rows value-identical) until a stream with a FRESH checkpoint
  * receives every prior run's leftovers as its batch 0 — exactly how
  * the composed-rehearsal CMS ledger first diverged.
  *
  * Policy: a harness NEVER starts on a non-empty work directory. If
  * the directory's name carries the library's scratch marker (its
  * last path segment starts with `graft`), stale content is WIPED
  * with a stderr note; anything else is REFUSED loudly — a work-dir
  * argument pointing at a non-scratch path (a testdata dir, a home
  * dir) must never be recursively deleted by a benchmark harness.
  */
object Harness {

  /** Guarantee `path` exists and is empty. Wipes a stale scratch dir
    * (last segment starts with `graft`), refuses anything else
    * non-empty, creates the path if absent. Returns `path`. */
  def freshWorkDir(spark: SparkSession, path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (f.exists(p)) {
      val entries = f.listStatus(p)
      if (entries.nonEmpty) {
        if (!p.getName.startsWith("graft"))
          sys.error(s"work directory $path is non-empty and does not look like " +
            "a graft scratch dir (last segment must start with 'graft'); " +
            "refusing to wipe it — point the harness at a scratch path.")
        System.err.println(s"[harness] wiping ${entries.length} stale entries " +
          s"under $path (reused work dir)")
        if (!f.delete(p, true)) sys.error(s"failed to wipe stale work dir $path")
      }
    }
    f.mkdirs(p)
    path
  }
}
