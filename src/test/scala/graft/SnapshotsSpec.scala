package graft

import graft.operators.Snapshots
import org.apache.spark.sql.functions._

/** Pins q60's scale claims: an AS-OF read prunes to exactly one
  * snapshot's files at the partition level, and an in-flight
  * (uncommitted) snapshot directory is invisible to readers.
  */
class SnapshotsSpec extends SparkTestBase {

  private def scratch(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name)
    d.toFile.deleteOnExit()
    d.toString
  }

  test("as-of read resolves the right version and prunes other snapshots") {
    val root = scratch("snap_prune")
    val orders = Tables.orders(spark, sf0001)
      .select(col("o_orderkey"), col("o_orderstatus"))
    Snapshots.write(orders.filter(col("o_orderkey") % 2 === 0), root, 1)
    Snapshots.write(orders, root, 2)

    assert(Snapshots.versions(spark, root) == Seq(1L, 2L))

    val v1 = Snapshots.readAsOf(spark, root, 1)
    // resolution: future ask resolves to the latest committed version
    assert(Snapshots.readAsOf(spark, root, 99).count() == orders.count())
    assert(v1.count() == orders.filter(col("o_orderkey") % 2 === 0).count())

    // partition pruning: the v1 scan must not read version=2 files
    val scan = v1.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters"), scan)
    val files = v1.select(input_file_name()).distinct()
      .collect().map(_.getString(0))
    assert(files.nonEmpty && files.forall(_.contains("version=1")),
      s"scan touched non-v1 files: ${files.mkString(", ")}")
  }

  test("uncommitted snapshot directories are invisible") {
    val root = scratch("snap_commit")
    val orders = Tables.orders(spark, sf0001)
      .select(col("o_orderkey"), col("o_orderstatus"))
    Snapshots.write(orders, root, 1)
    // simulate an in-flight writer: version=2 exists but has no _SUCCESS
    Snapshots.write(orders.limit(1), root, 2)
    assert(new java.io.File(s"$root/version=2/_SUCCESS").delete())

    assert(Snapshots.versions(spark, root) == Seq(1L))
    // the AS-OF read of "latest" still resolves to the committed v1
    assert(Snapshots.readAsOf(spark, root, 99).count() == orders.count())
  }

  test("vacuum keeps the newest N, deletes older snapshots and stale " +
    "uncommitted directories, never the newest commit") {
    val root = scratch("snap_vacuum")
    val orders = Tables.orders(spark, sf0001)
      .select(col("o_orderkey"), col("o_orderstatus"))
    (Seq(1L, 3L, 4L)).foreach(v =>
      Snapshots.write(orders.limit(10 * v.toInt), root, v))
    // a crashed writer's half-written snapshot, older than the newest
    Snapshots.write(orders.limit(1), root, 2)
    assert(new java.io.File(s"$root/version=2/_SUCCESS").delete())

    val deleted = Snapshots.vacuum(spark, root, retain = 2)
    // committed 1 deleted; 2's uncommitted husk deleted (reported -1);
    // 3 and 4 retained
    assert(deleted.contains(1L), s"deleted=$deleted")
    assert(deleted.contains(-1L), s"uncommitted dir not vacuumed: $deleted")
    assert(Snapshots.versions(spark, root) == Seq(3L, 4L))
    assert(!new java.io.File(s"$root/version=1").exists())
    assert(!new java.io.File(s"$root/version=2").exists())
    // retained snapshots still read correctly
    assert(Snapshots.readAsOf(spark, root, 99).count() == 40)
    assert(Snapshots.readAsOf(spark, root, 3).count() == 30)
    // retention floor: retain=1 never deletes the newest commit
    Snapshots.vacuum(spark, root, retain = 1): Unit
    assert(Snapshots.versions(spark, root) == Seq(4L))
    intercept[IllegalArgumentException] {
      Snapshots.vacuum(spark, root, retain = 0)
    }
  }
}
