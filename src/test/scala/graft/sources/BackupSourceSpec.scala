package graft.sources

import graft.SparkTestBase
import graft.config.BackupConfig
import org.apache.spark.sql.functions._

/** The graftbackup DataSource V2 connector: layout round-trip, schema
  * inference, planning-time partition pruning, and column pruning into
  * the JSON decoder. */
class BackupSourceSpec extends SparkTestBase {

  private lazy val outDir: String = {
    val out = java.nio.file.Files
      .createTempDirectory("graft_backup_src").toString
    val cfg = BackupConfig(
      inputPath = s"$sf0001/events.parquet", outputPath = out,
      timeColumn = "ts", partitionColumn = "event_type",
      from = java.time.Instant.parse("2024-01-05T00:00:00Z"),
      to = java.time.Instant.parse("2024-01-25T00:00:00Z"))
    graft.operators.Backup.run(spark, cfg)
    out
  }

  test("short name resolves via DataSourceRegister and round-trips the rows") {
    val viaConnector = spark.read.format("graftbackup").load(outDir)
    val viaJson = spark.read.schema("event_id STRING").json(outDir)
    assert(viaConnector.count() == viaJson.count())
    // partition columns surface with directory values
    val types = viaConnector.select("event_type").distinct()
      .collect().map(_.getString(0)).toSet
    assert(types == Set("click", "view", "purchase", "signup", "error"))
  }

  test("schema inference: typed data fields + string partition columns") {
    val sch = spark.read.format("graftbackup").load(outDir).schema
    val byName = sch.fields.map(f => f.name -> f.dataType).toMap
    assert(byName("event_id") == org.apache.spark.sql.types.LongType)
    assert(byName("user_id") == org.apache.spark.sql.types.LongType)
    assert(byName("value") == org.apache.spark.sql.types.DoubleType)
    assert(byName("event_type") == org.apache.spark.sql.types.StringType)
    assert(byName("date_dir") == org.apache.spark.sql.types.StringType)
    // ts is the backup's formatted string, not a timestamp
    assert(byName("ts") == org.apache.spark.sql.types.StringType)
  }

  test("partition-equality filter prunes planned files to one directory") {
    val df = spark.read.format("graftbackup").load(outDir)
      .filter(col("event_type") === "click")
      .select(col("date_dir"))
    val scans = df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
        r.scan.asInstanceOf[BackupScan]
    }
    assert(scans.size == 1, "expected the graftbackup scan in the plan")
    val planned = scans.head.planInputPartitions()
      .map(_.asInstanceOf[BackupFilePartition])
    assert(planned.nonEmpty)
    assert(planned.forall(_.partValues("event_type") == "click"),
      "non-matching partitions must not be planned")
    val all = new BackupScan(outDir,
      scans.head.readSchema(), Seq("event_type", "date_dir"), Array.empty)
      .planInputPartitions()
    assert(planned.length < all.length,
      "pruned plan must cover fewer files than the full listing")
    // and the filter is reported as pushed
    assert(scans.head.description().contains("event_type"))
  }

  test("column pruning reaches the decoder; partition-only reads skip JSON") {
    val df = spark.read.format("graftbackup").load(outDir)
      .groupBy(col("event_type")).count()
    val scans = df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
        r.scan.asInstanceOf[BackupScan]
    }
    val names = scans.head.readSchema().fieldNames.toSet
    assert(names.subsetOf(Set("event_type")),
      s"partition-count query must read only the partition column: $names")
    // correctness of the no-parse fast path: counts match the source
    val counts = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val src = graft.Tables.events(spark, sf0001)
      .filter(col("ts") >= lit("2024-01-05 00:00:00").cast("timestamp") &&
        col("ts") <= lit("2024-01-25 00:00:00").cast("timestamp") &&
        col("event_type").isNotNull)
      .groupBy(col("event_type")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == src)
  }

  test("data fields decode with nulls and values intact") {
    val got = spark.read.format("graftbackup").load(outDir)
      .agg(sum(col("user_id")).cast("long"), count(col("props")))
      .collect().head
    val want = graft.Tables.events(spark, sf0001)
      .filter(col("ts") >= lit("2024-01-05 00:00:00").cast("timestamp") &&
        col("ts") <= lit("2024-01-25 00:00:00").cast("timestamp") &&
        col("event_type").isNotNull)
      .agg(sum(col("user_id")).cast("long"), count(col("props")))
      .collect().head
    assert(got == want)
  }
}
