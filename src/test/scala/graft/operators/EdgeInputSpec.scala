package graft.operators

import graft.{SparkTestBase, Tables}
import graft.dedup.Dedup
import graft.similarity.{Ann, Ivf, Pq}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Degenerate-input contract: every operator façade must return an
  * EMPTY (or sane single-row) result on an empty input frame, never
  * throw — a library user points these at arbitrary tables, and "the
  * partition happened to be empty" is the most common production edge
  * there is. Schema is preserved by filtering the real fixture to zero
  * rows, so column types match the operators' expectations exactly. */
class EdgeInputSpec extends SparkTestBase {

  private def emptyOf(df: DataFrame): DataFrame = df.filter(lit(false))

  test("dedup chain: candidate pairs and clusters of an empty corpus " +
    "are empty") {
    val docs = emptyOf(Tables.documents(spark, sf0001))
    val pairs = Dedup.lshCandidatePairs(docs)
    assert(pairs.count() == 0)
    assert(Dedup.dupClusters(pairs).count() == 0)
  }

  test("similarity: brute/LSH/IVF/PQ top-k over an empty corpus are " +
    "empty, not errors") {
    val emb = emptyOf(Tables.embeddings(spark, sf0001))
    assert(Ann.bruteForceTopK(spark, emb, 0, 10).count() == 0)
    assert(Ivf.topK(spark, emb, 0, 10).count() == 0)
    assert(Pq.adcTopK(spark, emb, 0, 10).count() == 0)
    assert(Pq.ivfAdcTopK(spark, emb, 0, 10).count() == 0)
    assert(Pq.withCodes(emb).count() == 0)
    assert(Pq.distortionBySubspace(emb).count() == 0)
    assert(Ivf.cellStats(emb).count() == 0)
  }

  test("similarity: a query id absent from a NON-empty corpus yields " +
    "empty top-k") {
    val emb = Tables.embeddings(spark, sf0001)
    assert(Ann.bruteForceTopK(spark, emb, -1L, 10).count() == 0)
    assert(Pq.adcTopK(spark, emb, -1L, 10).count() == 0)
  }

  test("sessionize over an empty stream is empty") {
    val ev = emptyOf(Tables.events(spark, sf0001))
    assert(Sessionize.sessionCounts(ev, "user_id", "ts", "event_id", 1800)
      .count() == 0)
  }

  test("resample gap-fill over an empty stream is empty") {
    val ev = emptyOf(Tables.events(spark, sf0001))
    assert(Resample.gapFillLocf(ev).count() == 0)
  }
}
