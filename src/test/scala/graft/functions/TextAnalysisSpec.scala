package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkTestBase {
  import spark.implicits._

  test("fingerprint: exact polynomial fold") {
    DedupFunctions.register(spark)
    // "ab" → (0*31+97)*31+98 = 3105
    val fp = Seq("ab").toDF("text")
      .select(TextAnalysis.fingerprint("text")).as[Long].collect().head
    assert(fp == 3105L)
  }

  test("fingerprint is order-sensitive (rolling, not bag-of-chars)") {
    DedupFunctions.register(spark)
    val fps = Seq("ab", "ba").toDF("text")
      .select(TextAnalysis.fingerprint("text")).as[Long].collect()
    assert(fps(0) != fps(1))
  }

  test("langPred: marker argmax with priority tie-break") {
    val got = Seq(
      "the cat of a house and more",  // en markers
      "der hund und die katze ist",   // de markers
      "xyz qqq www"                   // no markers → und
    ).toDF("text")
      .select(TextAnalysis.langPred($"text")).as[String].collect()
    assert(got.sameElements(Array("en", "de", "und")))
  }

  test("quality score bounded [0,1] on fixture docs") {
    val scores = graft.Tables.documents(spark, sf0001)
      .select(TextAnalysis.qualityScore($"text")).as[Double].collect()
    assert(scores.forall(s => s >= 0.0 && s <= 1.0))
  }

  test("token counts: ws vs regex classes") {
    val df = Seq("hello world 42 x!").toDF("text")
    val (ws, re) = df.select(TextAnalysis.wsTokens($"text"),
      TextAnalysis.regexTokens($"text")).as[(Int, Long)].collect().head
    assert(ws == 4)
    // hello, world, 42, x, ! → 5
    assert(re == 5)
  }
}
