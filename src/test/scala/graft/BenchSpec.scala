package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the Bench stdout contract: the driver keeps only the final
  * ~2000 bytes of stdout and parses the LAST line. BENCH_r01/r03/r04
  * were all `parsed: null` because a per-query map shared the final
  * line and outgrew that window as the suite grew. These tests make the
  * regression impossible to reintroduce silently.
  */
class BenchSpec extends AnyFunSuite {

  test("final bench line stays far under the driver's 2000-byte tail window") {
    // Worst-plausible values: 5-digit totals, 3-digit failure count,
    // a long sf dir. Still must fit with an order of magnitude to spare.
    val line = Bench.finalLine(
      total = 99999.999, totalOk = 99999.999, nFailed = 999,
      sfDir = "/root/testdata/sf0.1", loadMax = 999.999,
      otherMax = 999.999, nHot = 999)
    val bytes = line.getBytes(java.nio.charset.StandardCharsets.UTF_8).length
    assert(bytes < 1024, s"final line is $bytes bytes: $line")
  }

  test("final bench line size is independent of the query count") {
    // The clip happened because the queries map rode on the final line.
    // The contract line must never mention queries, and its length must
    // not vary with how many queries SparkEntry declares.
    val line = Bench.finalLine(1.0, 1.0, 0, "/root/testdata/sf0.1")
    assert(!line.contains("\"queries\""))
    // signature takes scalars only — no per-query collection can leak in;
    // assert the rendered shape is exactly the driver contract keys
    val keys = "\"(\\w+)\":".r.findAllMatchIn(line).map(_.group(1)).toSeq
    assert(keys == Seq("metric", "value", "unit", "total_ok", "n_failed",
      "load_max", "other_max", "n_hot", "sf"))
  }

  test("final line is valid minimal JSON with the keys the driver parses") {
    val line = Bench.finalLine(64.9, 64.9, 0, "/tmp/x")
    assert(line.startsWith("{") && line.endsWith("}"))
    assert(line.contains("\"metric\":\"total\""))
    assert(line.contains("\"value\":64.900"))
    assert(line.contains("\"unit\":\"sec\""))
    assert(line.contains("\"n_failed\":0"))
  }

  test("current SparkEntry query count would have clipped the old format") {
    // Documentation-as-test: with >=73 queries at ~25 bytes/entry the old
    // single-line format exceeds 2000 bytes — which is WHY the map now
    // lives on its own earlier line. If the suite ever shrinks below the
    // window this still holds the design invariant (final line value-only).
    val n = SparkEntry.queries.size
    assert(n >= 73, s"query surface shrank to $n — update SURVEY coverage")
  }
}
