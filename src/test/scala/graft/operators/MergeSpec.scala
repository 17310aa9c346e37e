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

  test("mergePartitioned survives partition-column type inference (Date) " +
    "and still removes a truly emptied partition") {
    // r7 regression: the base read infers dt=2024-01-0X directory values
    // as DateType while the changeset carries them as raw JVM values;
    // comparing those with JVM equality marked EVERY affected partition
    // "emptied" and deleted the freshly merged data. Both sets must go
    // through the same Spark string cast.
    val root = java.nio.file.Files.createTempDirectory("graft_mergep_date_")
    val basePath = s"$root/base"
    val d1 = java.sql.Date.valueOf("2024-01-01")
    val d2 = java.sql.Date.valueOf("2024-01-02")
    val d3 = java.sql.Date.valueOf("2024-01-03")
    Seq((1L, d1, 1.0), (2L, d1, 2.0), (3L, d2, 3.0), (4L, d2, 4.0),
        (5L, d3, 5.0))
      .toDF("k", "dt", "x")
      .write.partitionBy("dt").parquet(basePath)

    val changeset = Seq(
      (1L, d1, 99.0, false), // update in a surviving partition
      (3L, d2, 0.0, true),   // delete...
      (4L, d2, 0.0, true)    // ...everything in dt=2024-01-02 → emptied
    ).toDF("k", "dt", "x", "del")

    Merge.mergePartitioned(spark, basePath, changeset, "k", "dt",
      s"$root/staging", deleteFlag = Some("del"))

    val after = spark.read.parquet(basePath)
      .selectExpr("k", "cast(dt as string)", "x")
      .as[(Long, String, Double)].collect().toSet
    // the update survived (this is what r7 destroyed)
    assert(after == Set(
      (1L, "2024-01-01", 99.0), (2L, "2024-01-01", 2.0),
      (5L, "2024-01-03", 5.0)))
    // the genuinely emptied partition's directory is gone
    assert(!new java.io.File(s"$basePath/dt=2024-01-02").exists())
    assert(new java.io.File(s"$basePath/dt=2024-01-01").exists())
  }

  test("mergePartitioned with an int partition column removes an emptied " +
    "partition and keeps the rest") {
    val root = java.nio.file.Files.createTempDirectory("graft_mergep_int_")
    val basePath = s"$root/base"
    Seq((1L, 10, 1.0), (2L, 10, 2.0), (3L, 20, 3.0), (4L, 30, 4.0))
      .toDF("k", "bucket", "x")
      .write.partitionBy("bucket").parquet(basePath)

    val changeset = Seq(
      (3L, 20, 0.0, true),  // empties bucket=20
      (2L, 10, 42.0, false) // update in bucket=10
    ).toDF("k", "bucket", "x", "del")

    Merge.mergePartitioned(spark, basePath, changeset, "k", "bucket",
      s"$root/staging", deleteFlag = Some("del"))

    val after = spark.read.parquet(basePath)
      .selectExpr("k", "cast(bucket as int)", "x")
      .as[(Long, Int, Double)].collect().toSet
    assert(after == Set((1L, 10, 1.0), (2L, 10, 42.0), (4L, 30, 4.0)))
    assert(!new java.io.File(s"$basePath/bucket=20").exists())
  }

  test("mergePartitioned includes null-partition base rows in the merge") {
    // ADVICE r7: isin never matches null, so null-partition base rows
    // previously never reached the merge; an all-deletes null changeset
    // would then delete the whole __HIVE_DEFAULT_PARTITION__ directory
    // without having read it.
    val root = java.nio.file.Files.createTempDirectory("graft_mergep_null_")
    val basePath = s"$root/base"
    Seq((1L, Some("a"), 1.0), (2L, None, 2.0), (3L, None, 3.0))
      .toDF("k", "p", "x")
      .write.partitionBy("p").parquet(basePath)

    // delete one null-partition key, update the other: the null
    // partition must participate and keep its surviving row
    val changeset = Seq(
      (2L, Option.empty[String], 0.0, true),
      (3L, Option.empty[String], 33.0, false)
    ).toDF("k", "p", "x", "del")

    Merge.mergePartitioned(spark, basePath, changeset, "k", "p",
      s"$root/staging", deleteFlag = Some("del"))

    val after = spark.read.parquet(basePath)
      .selectExpr("k", "p", "x")
      .as[(Long, Option[String], Double)].collect().toSet
    assert(after == Set((1L, Some("a"), 1.0), (3L, None, 33.0)))

    // and an all-deletes null changeset removes the default partition dir
    val wipeNull = Seq((3L, Option.empty[String], 0.0, true))
      .toDF("k", "p", "x", "del")
    Merge.mergePartitioned(spark, basePath, wipeNull, "k", "p",
      s"$root/staging2", deleteFlag = Some("del"))
    val after2 = spark.read.parquet(basePath)
      .as[(Long, Double, Option[String])].collect()
      .map { case (k, x, p) => (k, p, x) }.toSet
    assert(after2 == Set((1L, Some("a"), 1.0)))
    assert(!new java.io.File(
      s"$basePath/p=__HIVE_DEFAULT_PARTITION__").exists())
  }
}
