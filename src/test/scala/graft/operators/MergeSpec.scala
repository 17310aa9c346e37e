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
}
