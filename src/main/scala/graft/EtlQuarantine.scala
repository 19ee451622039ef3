package graft

import java.nio.file.{Files, Path, Paths, StandardCopyOption, StandardOpenOption}

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper

/** Persistent quarantine ledger for the `etl-batch` driver loop —
  * the reference's crash-survivable bookkeeping (`gdc2xena.py:67,97-108`):
  *
  *   - `<root>/unfinished.json` — `{project: [dtype, ...]}`, rewritten
  *     after EVERY state change (temp file + atomic rename), so the
  *     record survives a killed process; deleted once empty, so a
  *     fully-recovered run leaves nothing behind.
  *   - `<root>/etl_<timestamp>.err` — per-run failure log, one
  *     timestamped `[WARNING]` block with the stack trace per failed
  *     dataset (the reference's `logging.basicConfig(filename=...)`
  *     + `logger.warning(msg, exc_info=True)`).
  *
  * An existing `unfinished.json` seeds the in-memory state, which is
  * both the `--resume` work list and the guarantee that pairs not yet
  * re-attempted when a resume itself dies stay recorded.
  */
final class EtlQuarantine(rootDir: String) {
  private val file: Path = Paths.get(rootDir, "unfinished.json")
  private val errFile: Path = Paths.get(rootDir,
    "etl_" + java.time.LocalDateTime.now(java.time.ZoneOffset.UTC)
      .format(java.time.format.DateTimeFormatter.ofPattern("yyyyMMdd-HHmmss")) + ".err")

  private val state = mutable.LinkedHashMap.empty[String, Vector[String]]
  if (Files.exists(file)) {
    val node = new ObjectMapper().readTree(Files.readString(file))
    node.properties().asScala.foreach { e =>
      state(e.getKey) = e.getValue.elements().asScala.map(_.asText()).toVector
    }
  }

  /** Quarantined (project, dtype) pairs, insertion-ordered. */
  def recorded: List[(String, String)] = synchronized {
    state.iterator.flatMap { case (p, ds) => ds.map(p -> _) }.toList
  }

  /** Record a failure: update `unfinished.json`, append the stack
    * trace to the per-run `.err` log. Synchronized (as is every
    * state mutator): `etl-batch --parallel` drives the ledger from N
    * worker threads, and an unsynchronized interleave could rewrite
    * the resume seed from a half-updated map or tear the .err append
    * ordering. */
  def failed(project: String, dtype: String, e: Throwable): Unit = synchronized {
    val ds = state.getOrElse(project, Vector.empty)
    if (!ds.contains(dtype)) state(project) = ds :+ dtype
    rewrite()
    val trace = new java.io.StringWriter()
    e.printStackTrace(new java.io.PrintWriter(trace))
    val stamp = java.time.LocalDateTime.now(java.time.ZoneOffset.UTC)
      .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
    Files.writeString(errFile,
      s"$stamp [WARNING]: No $dtype data for cohort $project.\n$trace",
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }

  /** Clear a recovered pair (a resume re-attempt that worked). */
  def succeeded(project: String, dtype: String): Unit = synchronized {
    state.get(project).filter(_.contains(dtype)).foreach { ds =>
      val rest = ds.filterNot(_ == dtype)
      if (rest.isEmpty) state.remove(project) else state(project) = rest
      rewrite()
    }
  }

  /** Temp-file + atomic rename: a crash mid-write can never leave a
    * torn `unfinished.json` (the resume seed) behind. */
  private def rewrite(): Unit = {
    if (state.isEmpty) { Files.deleteIfExists(file); return }
    val q = graft.io.JsonUtil.quote _
    val json = state.iterator
      .map { case (p, ds) => s"${q(p)}: ${ds.map(q).mkString("[", ", ", "]")}" }
      .mkString("{", ", ", "}")
    val tmp = file.resolveSibling(file.getFileName.toString + ".tmp")
    Files.writeString(tmp, json)
    Files.move(tmp, file, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }
}
