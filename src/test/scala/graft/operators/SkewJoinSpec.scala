package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def fixture = {
    // one pathologically hot key + two normal keys
    val probe = ((1 to 900).map(i => ("hot", i.toLong)) ++
      (1 to 50).map(i => ("a", 1000L + i)) ++
      (1 to 50).map(i => ("b", 2000L + i))).toDF("k", "id")
    val build = Seq(("hot", 1), ("a", 2), ("b", 3)).toDF("k", "attr")
    (probe, build)
  }

  test("salted join is row-identical to the plain join") {
    val (probe, build) = fixture
    val salted = SkewJoin.saltedJoin(probe, build, "k", "id", r = 8)
      .select($"k", $"id", $"attr").as[(String, Long, Int)].collect().sorted
    val plain = probe.join(build, Seq("k"))
      .select($"k", $"id", $"attr").as[(String, Long, Int)].collect().sorted
    assert(salted.sameElements(plain))
  }

  test("the hot key's rows spread across multiple partitions") {
    val (probe, build) = fixture
    // AQE's size-based coalescing folds this tiny fixture back to one
    // partition and would mask the spread being asserted
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.get(coalesceKey)
    spark.conf.set(coalesceKey, "false")
    try {
      // force a shuffle join so partitioning is by the join key
      val plainSpread = probe.hint("shuffle_hash").join(build, Seq("k"))
        .filter($"k" === "hot")
        .rdd.mapPartitions(it => Iterator(it.size)).collect().count(_ > 0)
      val saltedSpread = SkewJoin
        .saltedJoin(probe.hint("shuffle_hash"), build, "k", "id", r = 8)
        .filter($"k" === "hot")
        .rdd.mapPartitions(it => Iterator(it.size)).collect().count(_ > 0)
      assert(plainSpread == 1, s"plain join should serialize the hot key, got $plainSpread")
      assert(saltedSpread > 1, s"salted join should spread the hot key, got $saltedSpread")
    } finally spark.conf.set(coalesceKey, prev)
  }
}
