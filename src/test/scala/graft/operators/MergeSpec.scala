package graft.operators

import graft.SparkTestBase

class MergeSpec extends SparkTestBase {
  import spark.implicits._

  test("merge: update replaces, delete removes, insert adds, untouched kept") {
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "v", "x")
    val changeset = Seq(
      (2L, "b", 99.0, false), // update
      (3L, "c", 0.0, true),   // delete
      (4L, "d", 40.0, false)  // insert
    ).toDF("k", "v", "x", "del")
    val got = Merge.merge(base, changeset, "k", deleteFlag = Some("del"))
      .as[(Long, String, Double)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, "a", 10.0), (2L, "b", 99.0), (4L, "d", 40.0)))
  }

  test("merge without a delete flag is a pure upsert") {
    val base = Seq((1L, 1.0), (2L, 2.0)).toDF("k", "x")
    val updates = Seq((2L, 9.0), (5L, 5.0)).toDF("k", "x")
    val got = Merge.merge(base, updates, "k")
      .as[(Long, Double)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, 1.0), (2L, 9.0), (5L, 5.0)))
  }

  test("same-key delete + update: update wins (documented precedence)") {
    val base = Seq((1L, 10.0), (2L, 20.0)).toDF("k", "x")
    val changeset = Seq((2L, 99.0, false), (2L, 0.0, true))
      .toDF("k", "x", "del")
    val got = Merge.merge(base, changeset, "k", deleteFlag = Some("del"))
      .as[(Long, Double)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, 10.0), (2L, 99.0)))
  }

  test("mergePartitioned prunes untouched partitions from scan and rewrite") {
    val root = java.nio.file.Files.createTempDirectory("graft_mergep_")
    val basePath = s"$root/base"
    val staging = s"$root/staging"
    // 5 date partitions × 4 keys
    val base = (0 until 20).map(i => (i.toLong, s"2024-01-0${i % 5 + 1}", i * 1.0))
      .toDF("k", "dt", "x")
    base.write.partitionBy("dt").parquet(basePath)

    // snapshot untouched-partition files before the merge
    def fileState(dt: String): Set[(String, Long, Long)] = {
      val d = new java.io.File(s"$basePath/dt=$dt")
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getName, f.length, f.lastModified)).toSet
    }
    val untouched = Seq("2024-01-01", "2024-01-04", "2024-01-05")
    val before = untouched.map(dt => dt -> fileState(dt)).toMap

    // changeset touches 2024-01-02 (update k=1) and 2024-01-03 (delete
    // k=2, insert k=100)
    val changeset = Seq(
      (1L, "2024-01-02", 999.0, false),
      (2L, "2024-01-03", 0.0, true),
      (100L, "2024-01-03", 7.0, false)
    ).toDF("k", "dt", "x", "del")

    // the scan mergePartitioned builds must partition-prune: only the
    // two affected directories survive the isin filter
    val prunedScan = spark.read.parquet(basePath)
      .filter($"dt".isin("2024-01-02", "2024-01-03"))
    val planStr = prunedScan.queryExecution.executedPlan.toString
    assert(planStr.contains("PartitionFilters") && planStr.contains("dt"),
      s"expected a partition filter on dt in:\n$planStr")
    assert(prunedScan.count() == 8)

    Merge.mergePartitioned(spark, basePath, changeset, "k", "dt", staging,
      deleteFlag = Some("del"))

    // untouched partitions keep their files byte-for-byte
    untouched.foreach { dt =>
      assert(fileState(dt) == before(dt), s"partition $dt was rewritten")
    }
    // merged content: update applied, delete gone, insert present,
    // untouched rows intact
    val after = spark.read.parquet(basePath)
      .as[(Long, Double, String)].collect()
      .map { case (k, x, dt) => (k, dt, x) }.toSet
    assert(after.contains((1L, "2024-01-02", 999.0)))
    assert(!after.exists(_._1 == 2L))
    assert(after.contains((100L, "2024-01-03", 7.0)))
    assert(after.size == 20 - 1 + 1 - 1 + 1) // -k1old +k1new cancel; -k2 +k100
    assert(after.contains((0L, "2024-01-01", 0.0)))
  }
}
