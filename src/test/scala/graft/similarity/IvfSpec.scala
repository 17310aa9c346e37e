package graft.similarity

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

class IvfSpec extends SparkTestBase {
  import spark.implicits._

  test("codebook is deterministic and well-formed") {
    val c1 = Ivf.centroids
    assert(c1.length == Ivf.K)
    assert(c1.forall(_.length == Ivf.Dim))
    // distinct centroids (Lloyd from distinct seeds on real data)
    assert(c1.map(_.toSeq).distinct.length == Ivf.K)
  }

  test("cell assignment matches the driver-side argmin") {
    val rows = Ivf.withCell(Tables.embeddings(spark, sf0001))
      .select($"vec_id", $"embedding", $"cell")
      .as[(Long, Array[Float], Int)].collect()
    assert(rows.nonEmpty)
    rows.take(100).foreach { case (id, emb, cell) =>
      var best = 0
      var bestD = Double.MaxValue
      for (c <- 0 until Ivf.K) {
        var acc = 0.0
        val cent = Ivf.centroids(c)
        for (i <- 0 until math.min(cent.length, emb.length)) {
          val d = emb(i).toDouble - cent(i); acc += d * d
        }
        if (acc < bestD) { bestD = acc; best = c }
      }
      assert(cell == best, s"vec $id: kernel $cell != reference $best")
    }
  }

  test("every cell assignment is covered and topK probes a cell subset") {
    val stats = Ivf.cellStats(Tables.embeddings(spark, sf0001))
      .as[(Int, Long)].collect()
    assert(stats.map(_._2).sum == 500)
    assert(stats.forall { case (c, _) => c >= 0 && c < Ivf.K })
    val top = Ivf.topK(spark, Tables.embeddings(spark, sf0001), 0, 10)
      .as[(Long, Double)].collect()
    assert(top.nonEmpty && top.length <= 10)
    assert(top.map(_._2).sliding(2).forall(p => p.head >= p.last))
    // IVF scores are exact cosines (same kernel as brute force)
    val exact = Ann.bruteForceTopK(spark,
      Tables.embeddings(spark, sf0001), 0, 499)
      .as[(Long, Double)].collect().toMap
    top.foreach { case (id, c) => assert(math.abs(exact(id) - c) < 1e-9) }
  }
}
