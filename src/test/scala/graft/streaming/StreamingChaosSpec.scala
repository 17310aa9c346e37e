package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** Chaos case for the staged-input streaming jobs' ordering contract
  * (r6 mandate #7): batch order is carried in file mtimes, and a bump
  * that silently fails to apply (setLastModified returns false — no
  * exception) must become a LOUD failure, because the downstream
  * symptom is an empty or partial result with no error whatsoever (the
  * flush sentinel ingested first pushes the watermark past every real
  * event → everything late-dropped).
  */
class StreamingChaosSpec extends AnyFunSuite {

  test("a failed mtime bump throws instead of letting the job return " +
    "an empty result") {
    // setLastModified returns false for a path that does not exist —
    // the same silent-false contract a read-only or mtime-rejecting
    // filesystem exhibits
    val gone = java.nio.file.Paths.get(
      "/tmp/graft_chaos_does_not_exist_" + System.nanoTime() + ".parquet")
    val e = intercept[IllegalStateException] {
      StreamingJobs.bumpMtimeOrFail(gone, System.currentTimeMillis(),
        "test consequence: watermark would late-drop rows")
    }
    assert(e.getMessage.contains("cannot set mtime"))
    assert(e.getMessage.contains("late-drop"))
  }

  test("a successful bump applies the requested mtime") {
    val f = java.nio.file.Files.createTempFile("graft_chaos_", ".parquet")
    try {
      val want = (System.currentTimeMillis() / 1000) * 1000 - 123000
      StreamingJobs.bumpMtimeOrFail(f, want, "unused")
      assert(f.toFile.lastModified() == want)
    } finally java.nio.file.Files.deleteIfExists(f): Unit
  }
}
