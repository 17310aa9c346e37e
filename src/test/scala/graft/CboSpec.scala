package graft

import graft.queries.CboQueries

/** Pins q71's claim: ANALYZE statistics flip the SAME un-hinted join
  * from sort-merge (size-only estimation: the dim's file size crosses
  * the broadcast threshold) to broadcast hash (CBO filter estimation:
  * two equality selectivities shrink the estimate far below it).
  * Runs at sf0.01 where the dim parquet is genuinely above the 64 KiB
  * pivot threshold.
  */
class CboSpec extends SparkTestBase {

  private val sf001 = "/root/testdata/sf0.01"

  test("without stats the filtered dim sort-merge joins; with stats it broadcasts") {
    val s = CboQueries.setupTables(spark, sf001)

    // sanity: the demo only demonstrates anything if the dim's raw
    // file size is ABOVE the threshold (otherwise both plans broadcast)
    val dimBytes = s.sql("DESCRIBE EXTENDED graft_cbo_dim")
      .collect().map(_.toSeq.map(String.valueOf))
      .find(r => r.head.contains("Statistics"))
    // table-level stats may be absent pre-ANALYZE; check the files
    val dimDir = new java.io.File(
      graft.queries.QueryDef.scratchDir("q71_cbo", sf001) + "/dim")
    val rawBytes = Option(dimDir.listFiles()).toSeq.flatten
      .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    assert(rawBytes > CboQueries.ThresholdBytes,
      s"dim file ($rawBytes B) not above threshold " +
        s"${CboQueries.ThresholdBytes}; demo is vacuous (stats row: $dimBytes)")

    val before = CboQueries.statsJoin(s)
      .queryExecution.executedPlan.toString
    assert(before.contains("SortMergeJoin") &&
      !before.contains("BroadcastHashJoin"),
      s"stats-less plan should SMJ (size-only estimate = file size):\n$before")

    CboQueries.analyze(s)
    val after = CboQueries.statsJoin(s)
      .queryExecution.executedPlan.toString
    assert(after.contains("BroadcastHashJoin"),
      s"analyzed plan should broadcast the filtered dim:\n$after")
  }
}
