package graft.similarity

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** [[Ivf.semDedup]] — SemDeDup keep-first semantics within IVF cells. */
class SemDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def oneHot(i: Int): Array[Float] = {
    val a = new Array[Float](Ann.Dim)
    a(i) = 1.0f
    a
  }

  test("keep-first: only the later copy of a duplicated vector is reported") {
    // five mutually orthogonal vectors + one exact copy of vec 2.
    // Orthogonal cosines are 0, the copy's cosine is 1 — at a 0.9
    // threshold exactly one row can come back: the copy, charged to
    // its earlier original.
    val emb = (0 until 5).map(i => (i.toLong, oneHot(i))) :+ (5L, oneHot(2))
    val df = emb.toDF("vec_id", "embedding")
    val res = Ivf.semDedup(df, minCosine = 0.9)
      .select($"vec_id", $"max_cos", $"n_close")
      .as[(Long, Double, Long)].collect()
    assert(res.toSeq == Seq((5L, 1.0, 1L)), s"got ${res.toSeq}")
  }

  test("threshold is respected and evidence fields are consistent on the fixture") {
    val emb = graft.Tables.embeddings(spark, sf0001)
    val tau = 0.3
    val rows = Ivf.semDedup(emb, tau)
      .select($"vec_id", $"cell".cast("int"), $"max_cos", $"n_close")
      .as[(Long, Int, Double, Long)].collect()
    assert(rows.nonEmpty, "fixture must produce a non-trivial removed set")
    assert(rows.forall(_._3 >= tau), "max_cos below threshold reported")
    assert(rows.forall(_._4 >= 1L))
    // deterministic: bitwise-identical on a second run
    val again = Ivf.semDedup(emb, tau)
      .select($"vec_id", $"cell".cast("int"), $"max_cos", $"n_close")
      .as[(Long, Int, Double, Long)].collect()
    assert(rows.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("survivor set = corpus minus reported; first member of each cell survives") {
    val emb = graft.Tables.embeddings(spark, sf0001)
    val removed = Ivf.semDedup(emb, 0.3).select($"vec_id")
      .as[Long].collect().toSet
    val firstPerCell = Ivf.withCell(emb)
      .groupBy($"cell").agg(min($"vec_id").as("first_id"))
      .select($"first_id").as[Long].collect()
    // the lowest vec_id in a cell has no earlier neighbor, so it can
    // never be removed — keep-first is well-founded
    assert(firstPerCell.forall(id => !removed.contains(id)))
  }
}
