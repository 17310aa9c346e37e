package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B for the range-join BIN WIDTH (r15 verdict #5): the
  * stats-derived default ([[graft.operators.RangeJoin.derivedBinSeconds]],
  * median interval span) against the hand-tuned q68/q69 constant
  * (3600 s) and bracketing widths, on the q68 interval×point and q69
  * overlap shapes at SPARK_GRAFT_SF_DIR. Each width is timed min-of-N
  * (SPARK_GRAFT_BIN_RUNS, default 3) over the FULL query shape
  * (harvest + join + aggregate), and the derived width's pre-pass cost
  * is inside its timing — the comparison is end-to-end honest.
  *
  * Run: SPARK_GRAFT_SF_DIR=/tmp/graft_sf1 sbt "runMain graft.tools.BinScale"
  */
object BinScale {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BIN_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.plans.GraftSparkExtensions())
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Bench.disableLocalChecksumSidecars(spark)
    import graft.operators.RangeJoin

    val ev = graft.Tables.events(spark, dir)
    val iv = ev.select(col("event_id").as("ivl_id"), col("event_type"),
      col("ts").as("s"),
      expr("ts + make_interval(0, 0, 0, 0, 0, " +
        "CAST(floor(least(greatest(value, 1), 60)) AS INT), 0)").as("e"))
    val pt = ev.select(col("event_id").as("pt_id"), col("ts").as("t"))

    def q68At(w: Option[Long]): Long = {
      val joined = w match {
        case Some(width) =>
          RangeJoin.binnedIntervalJoin(iv, pt, "s", "e", "t", width)
        case None => RangeJoin.binnedIntervalJoin(iv, pt, "s", "e", "t")
      }
      joined.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_pairs"))
        .collect().map(_.getLong(1)).sum
    }

    def ivls(tpe: String, id: String, sN: String, eN: String) =
      ev.filter(col("event_type") === tpe)
        .select(col("event_id").as(id), col("ts").as(sN),
          expr("ts + make_interval(0, 0, 0, 0, 0, " +
            "CAST(floor(least(greatest(value, 1), 60)) AS INT), 0)")
            .as(eN))
    val pu = ivls("purchase", "pu_id", "s1", "e1")
    val vw = ivls("view", "vw_id", "s2", "e2")
    def q69At(w: Option[Long]): Long = {
      val joined = w match {
        case Some(width) =>
          RangeJoin.binnedOverlapJoin(pu, vw, "s1", "e1", "s2", "e2", width)
        case None => RangeJoin.binnedOverlapJoin(pu, vw, "s1", "e1", "s2", "e2")
      }
      joined.groupBy(date_format(col("s1"), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("n_pairs"))
        .collect().map(_.getLong(1)).sum
    }

    def best(body: => Long): (Double, Long) = {
      var bestS = Double.MaxValue
      var rows = 0L
      (1 to runs).foreach { _ =>
        val t0 = System.nanoTime()
        rows = body
        bestS = math.min(bestS, (System.nanoTime() - t0) / 1e9)
      }
      (bestS, rows)
    }

    val derived68 = RangeJoin.derivedBinSeconds(iv, "s", "e")
    val derived69 = math.max(RangeJoin.derivedBinSeconds(pu, "s1", "e1"),
      RangeJoin.derivedBinSeconds(vw, "s2", "e2"))
    val widths = Seq(60L, 600L, 1800L, 3600L, 14400L)

    val out = new StringBuilder
    out.append(s"""{"tool":"BinScale","sf":"$dir","runs":$runs,""")
    out.append(s""""derived_w68":$derived68,"derived_w69":$derived69,""")
    val parts68 = widths.map { w =>
      val (s, n) = best(q68At(Some(w)))
      f""""q68_w$w":{"sec":$s%.3f,"rows":$n}"""
    } :+ {
      val (s, n) = best(q68At(None))
      f""""q68_derived":{"sec":$s%.3f,"rows":$n}"""
    }
    val parts69 = widths.map { w =>
      val (s, n) = best(q69At(Some(w)))
      f""""q69_w$w":{"sec":$s%.3f,"rows":$n}"""
    } :+ {
      val (s, n) = best(q69At(None))
      f""""q69_derived":{"sec":$s%.3f,"rows":$n}"""
    }
    out.append((parts68 ++ parts69).mkString(","))
    out.append("}")
    println(out.toString)
    spark.stop()
  }
}
