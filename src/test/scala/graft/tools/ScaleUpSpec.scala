package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** The content transforms behind the scaled bench datasets: the whole
  * point of the permutations is that NO two copies share a transform
  * (a shared transform makes those copies exact twins and reinstates
  * the quadratic near-dup pair artifact the transforms exist to kill —
  * the first, periodic cut was measured at 115× LSH pairs for 10× data
  * at factor 100). These pin the injectivity and bijection properties
  * at the tool's maximum factor.
  */
class ScaleUpSpec extends AnyFunSuite {

  test("letter transform is a bijection of a–z for every copy") {
    for (i <- Seq(0, 1, 11, 12, 63, 64, 100, 999)) {
      val p = ScaleUp.permuted(i)
      assert(p.length == 26)
      assert(p.toSet == ('a' to 'z').toSet, s"copy $i not a bijection")
    }
  }

  test("copy 0 is the identity on both transforms") {
    assert(ScaleUp.permuted(0) == "abcdefghijklmnopqrstuvwxyz")
    assert(ScaleUp.dimPerm(0).toSeq == (0 until 64))
  }

  test("no two copies share a letter transform up to the factor cap") {
    val perms = (0 until 1000).map(ScaleUp.permuted)
    assert(perms.distinct.size == 1000)
    // the periodic-family failure mode, named: copies 12 apart differed
    // in the rotation cut only by i % 12, so 12 and 0 collided
    assert(perms(12) != perms(0) && perms(64) != perms(0))
  }

  test("no two copies share a dimension permutation up to the factor cap") {
    val perms = (0 until 1000).map(ScaleUp.dimPerm(_).toSeq)
    assert(perms.distinct.size == 1000)
    assert(perms.forall(p => p.sorted == (0 until 64)))
  }

  test("fisherYates is deterministic across calls") {
    assert(ScaleUp.fisherYates(64, 7).toSeq == ScaleUp.fisherYates(64, 7).toSeq)
    assert(ScaleUp.fisherYates(26, 3).toSeq != ScaleUp.fisherYates(26, 4).toSeq)
  }
}

/** End-to-end generator contract at factor 3 on the smallest fixture:
  * the probe's scaling claims rest on these three properties of the
  * replicas — row counts scale exactly, referential integrity holds
  * across copies (every fact key resolves in its own copy's dimension
  * slice), and content decorrelates (near-dup pairs scale ×factor,
  * never ×factor², and no pair crosses copies). */
class ScaleUpRunSpec extends graft.SparkTestBase {
  import org.apache.spark.sql.functions._

  private def withReplica[A](factor: Int)(f: String => A): A = {
    val d = java.nio.file.Files.createTempDirectory("graft_scaleup_spec")
    try { ScaleUp.run(spark, sf0001, d.toString, factor); f(d.toString) }
    finally {
      val s = java.nio.file.Files.walk(d)
      try s.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => { java.nio.file.Files.deleteIfExists(p): Unit })
      finally s.close()
    }
  }

  test("factor-3 replica: counts scale exactly, keys resolve, " +
    "near-dup pairs scale x3 with zero cross-copy pairs") {
    withReplica(3) { dst =>
      // row-count scaling: replicated tables x3, dims x1
      for (t <- Seq("customer", "supplier", "part", "orders", "lineitem",
        "events", "documents", "embeddings")) {
        val n0 = spark.read.parquet(s"$sf0001/$t.parquet").count()
        val n3 = spark.read.parquet(s"$dst/$t.parquet").count()
        assert(n3 == 3 * n0, s"$t: $n3 != 3 * $n0")
      }
      for (t <- Seq("region", "nation")) {
        assert(spark.read.parquet(s"$dst/$t.parquet").count() ==
          spark.read.parquet(s"$sf0001/$t.parquet").count(), t)
      }
      // referential integrity: every lineitem resolves an order and a
      // part IN ITS OWN COPY (same Offset band), orders resolve
      // customers — an anti-join must be empty
      val li = spark.read.parquet(s"$dst/lineitem.parquet")
      val ord = spark.read.parquet(s"$dst/orders.parquet")
      val part = spark.read.parquet(s"$dst/part.parquet")
      assert(li.join(ord, li("l_orderkey") === ord("o_orderkey"),
        "left_anti").count() == 0, "dangling l_orderkey")
      assert(li.join(part, li("l_partkey") === part("p_partkey"),
        "left_anti").count() == 0, "dangling l_partkey")
      assert(li.filter(
        (col("l_orderkey") / lit(ScaleUp.Offset)).cast("long") =!=
          (col("l_partkey") / lit(ScaleUp.Offset)).cast("long"))
        .count() == 0, "fact keys cross copy bands")
      // decorrelation: near-dup pairs scale exactly x3 and every pair
      // stays inside one copy band (cross-copy content is disjoint)
      val p0 = graft.dedup.Dedup.ngramJaccardPairs(
        spark.read.parquet(s"$sf0001/documents.parquet"), 10, 0.5)
        .count()
      val p3 = graft.dedup.Dedup.ngramJaccardPairs(
        spark.read.parquet(s"$dst/documents.parquet"), 10, 0.5)
      assert(p3.count() == 3 * p0, "near-dup pairs must scale x3")
      assert(p3.filter(
        (col("doc_a") / lit(ScaleUp.Offset)).cast("long") =!=
          (col("doc_b") / lit(ScaleUp.Offset)).cast("long"))
        .count() == 0, "a near-dup pair crossed copies")
    }
  }
}
