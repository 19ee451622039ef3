package graft

/** The refuse-or-wipe work-dir guard — the check-22 stale-state class
  * (append-mode landing feeds + persisted checkpoints silently feeding
  * a prior run's leftovers into a fresh stream's batch 0) made
  * impossible at the harness level. */
class HarnessSpec extends SparkSpecBase {

  test("freshWorkDir wipes a polluted graft scratch dir") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_guard").toString
    // pollute it the way a prior harness run would: a landing feed
    // file and a nested checkpoint dir
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(tmp, "part-0000.parquet"), "stale")
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(tmp, "ck_cur", "offsets"))
    assert(Harness.freshWorkDir(spark, tmp) == tmp)
    val after = new java.io.File(tmp).listFiles()
    assert(after != null && after.isEmpty,
      s"stale entries survived the guard: ${after.map(_.getName).toSeq}")
  }

  test("freshWorkDir refuses a non-empty dir without the scratch marker") {
    val outer = java.nio.file.Files.createTempDirectory("graft_guard_outer")
    val precious = outer.resolve("precious_data")
    java.nio.file.Files.createDirectories(precious)
    java.nio.file.Files.writeString(precious.resolve("keep.txt"), "do not delete")
    val e = intercept[RuntimeException](
      Harness.freshWorkDir(spark, precious.toString))
    assert(e.getMessage.contains("refusing to wipe"))
    assert(java.nio.file.Files.exists(precious.resolve("keep.txt")),
      "guard refused but the content is gone")
  }

  test("freshWorkDir creates a missing dir (and an empty one passes through)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_guard_new").toString
    val sub = s"$tmp/graft_child"
    assert(Harness.freshWorkDir(spark, sub) == sub)
    assert(new java.io.File(sub).isDirectory)
    // idempotent on the now-empty dir
    assert(Harness.freshWorkDir(spark, sub) == sub)
  }
}
