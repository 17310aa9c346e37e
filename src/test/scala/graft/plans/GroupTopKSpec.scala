package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class GroupTopKSpec extends SparkTestBase {
  import spark.implicits._

  private val df = Seq(
    ("a", 1L, 10.0), ("a", 2L, 30.0), ("a", 3L, 20.0), ("a", 4L, 30.0),
    ("b", 5L, 5.0), ("b", 6L, 7.0),
    ("c", 7L, 1.0)
  ).toDF("g", "id", "score")

  test("matches the window-rank idiom, ties broken by id") {
    val got = GroupTopK.topK(df, Seq("g"), "score", k = 2, desc = true,
      tieBreak = "id")
      .select($"g", $"id").as[(String, Long)].collect().toSet
    // a: 30.0@id2, 30.0@id4 (tie -> lower ids win); b: 7.0, 5.0; c: 1.0
    assert(got == Set(("a", 2L), ("a", 4L), ("b", 6L), ("b", 5L), ("c", 7L)))
  }

  test("full-tie admission: k rows returned, all drawn from the tied set") {
    // The documented contract (GroupTopK.topK scaladoc): rows that tie
    // with the retained boundary on BOTH (orderCol, tieBreak) are
    // dropped arbitrarily — like row_number() — but the COUNT per group
    // must still be exactly k and every returned row must come from the
    // tied set. This spec pins that contract so the behavior can't
    // silently drift (ADVICE r04).
    val ties = Seq(
      ("g1", 1L, 9.0), ("g1", 1L, 9.0), ("g1", 1L, 9.0), ("g1", 1L, 9.0),
      ("g1", 0L, 5.0)
    ).toDF("g", "id", "score")
    val got = GroupTopK.topK(ties, Seq("g"), "score", k = 2, desc = true,
      tieBreak = "id")
      .select($"g", $"id", $"score").as[(String, Long, Double)].collect()
    assert(got.length == 2, s"expected exactly k=2 rows, got ${got.length}")
    assert(got.forall(r => r._2 == 1L && r._3 == 9.0),
      "a non-tied row displaced a boundary-tied row")
  }

  test("physical plan is partial+final GroupTopKExec with one exchange") {
    val plan = GroupTopK.topK(df, Seq("g"), "score", 1, desc = false,
      tieBreak = "id")
    plan.collect() // settle AQE
    val s = plan.queryExecution.executedPlan.toString
    assert(s.contains("GroupTopK"), s)
    // partial + final both present around the exchange
    assert("GroupTopK \\[".r.findAllIn(s).length >= 2, s)
    assert(s.contains("Exchange hashpartitioning"), s)
  }

  test("partial pass stays bounded under high group cardinality (flush path)") {
    // 10⁶ rows, ~every row its own group, all in few input partitions —
    // the shape the unguarded map OOMed on at scale. A tiny cap forces
    // thousands of mid-partition flushes; correctness must survive
    // because the final pass re-heaps the fragments.
    val key = GroupTopK.MaxPartialGroupsKey
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "64")
    try {
      val big = spark.range(0, 1000000, 1, 4)
        .selectExpr("id % 500000 AS g", "id", "CAST(id % 7 AS DOUBLE) AS score")
      val got = GroupTopK.topK(big, Seq("g"), "score", k = 1, desc = true,
        tieBreak = "id")
      // 500k groups of 2 rows {g, g+500000}; score = id%7 decides, tie -> lower id
      assert(got.count() == 500000L)
      val sample = got.filter($"g" < 100)
        .select($"g", $"id").as[(Long, Long)].collect().toMap
      (0L until 100L).foreach { g =>
        val (lo, hi) = (g, g + 500000L)
        val expected = if (hi % 7 > lo % 7) hi else if (lo % 7 > hi % 7) lo
          else math.min(lo, hi)
        assert(sample(g) == expected, s"group $g")
      }
    } finally {
      prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
    }
  }

  test("agrees with window rank on a real table") {
    val orders = graft.Tables.orders(spark, sf0001)
      .select($"o_orderpriority", $"o_orderkey", $"o_totalprice")
    val custom = GroupTopK.topK(orders, Seq("o_orderpriority"),
      "o_totalprice", k = 3, desc = true, tieBreak = "o_orderkey")
      .as[(String, Long, Double)].collect().toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"o_orderpriority")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    val idiom = orders.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3).drop("rn")
      .as[(String, Long, Double)].collect().toSet
    assert(custom == idiom)
  }
}
