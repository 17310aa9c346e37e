package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** BPE vocabulary induction: an independent brute-force reference
  * implementation that must agree rule-for-rule with the distributed
  * operator. Since r12 x47/x49 ALSO have DuckDB oracles (unrolled CTE
  * layers — TextQueries.bpeVocabCtes); this spec stays as the
  * second, SQL-free line of evidence plus the adversarial cases
  * (repeated-symbol runs, surrogates, repartition invariance) the
  * fixture corpus may not exercise. */
class BpeSpec extends SparkTestBase {

  /** Independent reference: naive in-memory BPE over a word-count map.
    * Deliberately different shape from the operator (Scala collections,
    * per-word Vector scans) — agreement is evidence, not tautology. */
  private def refBpe(words: Map[String, Long], rounds: Int)
      : Seq[(Int, String, String, String, Long)] = {
    var vocab: Map[Vector[String], Long] = words.toSeq
      .map { case (w, c) =>
        w.map(_.toString).toVector -> c
      }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, String, Long)]
    for (step <- 1 to rounds) {
      val freqs = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        syms.sliding(2).foreach {
          case Vector(a, b) => freqs((a, b)) = freqs.getOrElse((a, b), 0L) + c
          case _ =>
        }
      }
      if (freqs.nonEmpty) {
        val ((l, r), f) = freqs.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
        out += ((step, l, r, l + r, f))
        vocab = vocab.toSeq.map { case (syms, c) =>
          val merged = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
              merged += l + r; i += 2
            } else { merged += syms(i); i += 1 }
          }
          merged.toVector -> c
        }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
      }
    }
    out.toSeq
  }

  private def rulesOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getAs[Int]("step"), r.getAs[String]("left"),
      r.getAs[String]("right"), r.getAs[String]("merged"),
      r.getAs[Long]("freq"))).toSeq.sortBy(_._1)

  test("strict leftmost merge on repeated-symbol runs (the replace() trap)") {
    import spark.implicits._
    // "aaaa"x3: pairs (a,a) freq 9 -> merge -> every word becomes aa aa
    // then (aa,aa) freq 3. A boundary-consuming replace() would leave
    // 'aa a a' and learn (aa,a) instead.
    val docs = Seq.fill(3)("aaaa").toDF("text")
    val got = rulesOf(BpeTrain.trainOnText(spark, docs, "text", 2))
    assert(got == Seq((1, "a", "a", "aa", 9L), (2, "aa", "aa", "aaaa", 3L)))
  }

  test("odd runs merge leftmost-first: aaa -> [aa, a]") {
    import spark.implicits._
    val docs = Seq("aaa aaa").toDF("text")
    // word 'aaa' x2 (two tokens): (a,a) freq 4 -> each becomes [aa, a],
    // next best pair is (aa,a) freq 2
    val got = rulesOf(BpeTrain.trainOnText(spark, docs, "text", 2))
    assert(got == Seq((1, "a", "a", "aa", 4L), (2, "aa", "a", "aaa", 2L)))
  }

  test("tie-break is lexicographic on (left, right)") {
    import spark.implicits._
    // 'ab' and 'cd' both freq 2 -> (a,b) wins the tie
    val docs = Seq("ab cd", "ab cd").toDF("text")
    val got = rulesOf(BpeTrain.trainOnText(spark, docs, "text", 1))
    assert(got == Seq((1, "a", "b", "ab", 2L)))
  }

  test("agrees rule-for-rule with the independent reference on the real " +
    "corpus") {
    val docs = graft.Tables.documents(spark, sf0001)
    val words = docs
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = refBpe(words, 8)
    val got = rulesOf(BpeTrain.trainOnText(spark, docs, "text", 8))
    assert(got == want)
    assert(got.length == 8)
    // frequencies are non-increasing is NOT guaranteed by BPE in
    // general, but every learned rule must have positive support
    assert(got.forall(_._5 > 0))
  }

  test("invariant under repartitioning") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sf0001).limit(200)
    val a = rulesOf(BpeTrain.trainOnText(spark, docs, "text", 4))
    val b = rulesOf(BpeTrain.trainOnText(spark, docs.repartition(13), "text", 4))
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("encodeStats agrees with an independent brute-force rule replay " +
    "over the real corpus") {
    val docs = graft.Tables.documents(spark, sf0001)
    val words = docs
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
    val rules = BpeTrain.train(spark, words, 8)
    val got = BpeTrain.encodeStats(docs, "text", rules)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    // brute force: split to code points, replay merges in rule order
    // with strict leftmost application (refBpe's applier shape)
    def applyRule(syms: Vector[String], l: String, r: String)
        : Vector[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
          out += l + r; i += 2
        } else { out += syms(i); i += 1 }
      }
      out.toVector
    }
    val texts = docs.select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    texts.foreach { case (id, text) =>
      val ws = text.split(" ", -1).filter(_.nonEmpty)
      val encoded = ws.map { w =>
        val base = {
          val buf = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < w.length) {
            val cp = w.codePointAt(i)
            buf += new String(Character.toChars(cp))
            i += Character.charCount(cp)
          }
          buf.toVector
        }
        val post = rules.sortBy(_.step).foldLeft(base)((s, m) =>
          applyRule(s, m.left, m.right))
        (base.length.toLong, post.length.toLong)
      }
      val nSym = encoded.map(_._1).sum
      val nTok = encoded.map(_._2).sum
      val want = (ws.length.toLong, nSym, nTok, (nSym - nTok) * 1000 / nSym)
      assert(got(id) == want, s"doc $id: got ${got(id)}, want $want")
    }
    // the learned vocabulary actually compresses the corpus
    assert(got.values.exists(_._4 > 0))
  }

  test("multi-code-point symbols split correctly") {
    val syms = graft.functions.BpeKernels.toSymbols(
      org.apache.spark.unsafe.types.UTF8String.fromString("aé😀b"))
    assert(syms.numElements() == 4) // a, é, 😀 (surrogate pair), b
    assert(syms.getUTF8String(2).toString == "😀")
  }
}
