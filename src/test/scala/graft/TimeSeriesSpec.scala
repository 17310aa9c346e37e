package graft

import graft.queries.TimeSeriesQueries
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pins the semantics the q43–q46 oracles can't isolate on their own:
  * forward-fill behavior on gap rows, posexplode ordinals, the
  * schema-evolution NULL column, and — the load-bearing one — that
  * q46's two-phase distributed prefix scan equals a single global
  * running-sum window (the shape it replaces for scale).
  */
class TimeSeriesSpec extends SparkTestBase {

  test("q43: every gap row carries the last observed value forward") {
    val rows = TimeSeriesQueries.defs("q43_gapfill").fn(spark, sf0001).collect()
    assert(rows.nonEmpty)
    // grid is dense: per type, one row per hour between global lo/hi
    val types = rows.map(_.getString(0)).distinct
    val perType = rows.length / types.length
    types.foreach { t =>
      assert(rows.count(_.getString(0) == t) == perType, s"ragged grid for $t")
    }
    // replay the fill: walking buckets in order, a gap row's filled_value
    // must equal the previous non-gap row's sum_value (or the -1
    // sentinel before the first observation)
    types.foreach { t =>
      var lastObserved: Double = -1.0
      rows.filter(_.getString(0) == t).sortBy(_.getString(1)).foreach { r =>
        val wasGap = r.getBoolean(5)
        if (!wasGap) lastObserved = r.getDouble(3)
        assert(r.getDouble(4) == lastObserved,
          s"$t ${r.getString(1)}: filled=${r.getDouble(4)} vs $lastObserved")
      }
    }
    assert(rows.exists(_.getBoolean(5)), "fixture should contain gaps")
  }

  test("q44: posexplode ordinals are 0-based positions within the doc") {
    import spark.implicits._
    val df = Seq((1L, "alpha beta alpha")).toDF("doc_id", "text")
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "word")))
    assert(df.collect().map(r => (r.getInt(1), r.getString(2))).toSeq ==
      Seq((0, "alpha"), (1, "beta"), (2, "alpha")))
  }

  test("q45: v1 rows surface NULL for the evolved column, v2 rows keep it") {
    val out = TimeSeriesQueries.defs("q45_schema_evolution").fn(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val orders = Tables.orders(spark, sf0001)
    val nEven = orders.filter(col("o_orderkey") % 2 === 0).count()
    val nOdd = orders.filter(col("o_orderkey") % 2 === 1).count()
    assert(out("<pre-evolution>") == nEven)
    assert(out.filterNot(_._1 == "<pre-evolution>").values.sum == nOdd)
  }

  test("q46: two-phase prefix scan equals a single global running-sum window") {
    val events = Tables.events(spark, sf0001)
    val iv = events.select(col("event_id"), col("event_type"), col("ts").as("s"),
      expr("ts + make_interval(0, 0, 0, 0, 0, " +
        "CAST(floor(least(greatest(value, 1), 60)) AS INT), 0)").as("e"))
    val pts = iv.select(col("event_type"), col("s").as("t"),
        lit(1L).as("delta"), col("event_id"))
      .unionAll(iv.select(col("event_type"), col("e").as("t"),
        lit(-1L).as("delta"), col("event_id")))
    // the serial shape the two-phase scan must reproduce exactly
    val globalWin = Window.partitionBy(col("event_type"))
      .orderBy(col("t"), col("delta"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = pts.withColumn("conc", sum(col("delta")).over(globalWin))
      .groupBy(col("event_type"))
      .agg(max(col("conc")).as("peak_concurrency"),
        count(lit(1)).as("n_points"),
        sum(when(col("conc") === 0, 1L).otherwise(0L)).as("n_idle_points"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val actual = TimeSeriesQueries.defs("q46_concurrency").fn(spark, sf0001)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(actual == expected && actual.nonEmpty)
  }

  test("q96: anomaly flags equal a brute-force trailing-window z-test " +
    "(current row excluded, warm-up returns no verdict)") {
    val rows = TimeSeriesQueries.defs("q96_rolling_anomaly").fn(spark, sf0001)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getInt(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, series) =>
      val ordered = series.sortBy(_._2)
      ordered.zipWithIndex.foreach { case ((_, _, x, n, flag), i) =>
        val trail = ordered.slice(math.max(0, i - 20), i).map(_._3)
        assert(n == trail.length, "window size must count prior rows only")
        val want =
          if (trail.length < 5) 0
          else {
            val nn = trail.length.toLong
            val sx = trail.sum
            val sxx = trail.map(v => v * v).sum
            val dev = nn * x - sx
            if (dev * dev > 9L * (nn * sxx - sx * sx)) 1 else -1
          }
        assert(flag == want, s"row $i: got $flag, brute force $want")
      }
    }
    // the fixture actually exercises all three verdicts
    assert(rows.map(_._5).toSet == Set(-1, 0, 1))
  }

  test("q99: EWMA equals the brute-force weighted trailing sum, " +
    "renormalized over warm-up, one exact IEEE division") {
    val rows = TimeSeriesQueries.defs("q99_ewma").fn(spark, sf0001)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, series) =>
      val ordered = series.sortBy(_._2)
      ordered.zipWithIndex.foreach { case ((_, _, x, num, den, ewma), i) =>
        val trail = ordered.slice(math.max(0, i - 15), i + 1).map(_._3).reverse
        val wantNum = trail.zipWithIndex.map { case (v, lagI) =>
          v * (1L << (15 - lagI))
        }.sum
        val wantDen = trail.indices.map(lagI => 1L << (15 - lagI)).sum
        assert(num == wantNum, s"row $i: num $num != brute $wantNum")
        assert(den == wantDen, s"row $i: den $den != brute $wantDen")
        assert(ewma == wantNum.toDouble / wantDen.toDouble)
        // first row of every series is its own average
        if (i == 0) assert(ewma == x.toDouble)
      }
      // the fixture has series long enough to leave warm-up
      assert(ordered.length > 16)
      assert(ordered.drop(16).forall(_._5 == 65535L),
        "steady-state weight mass must be 2^16 - 1")
    }
  }

  test("q101: sequence encode + regex count equal a driver-side " +
    "recompute over (ts, event_id)-ordered events") {
    val rows = TimeSeriesQueries.defs("q101_event_seq_match")
      .fn(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(rows.nonEmpty)
    val evs = Tables.events(spark, sf0001)
      .filter(col("event_type").isNotNull && col("user_id").isNotNull)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getString(3)))
    val byUser = evs.groupBy(_._1)
    assert(rows.keySet == byUser.keySet)
    byUser.foreach { case (u, es) =>
      val seq = es.sortBy(e => (e._2.getTime, e._3))
        .map(_._4.substring(0, 1)).mkString
      val m = java.util.regex.Pattern.compile("vc*p").matcher(seq)
      var n = 0
      while (m.find()) n += 1
      val (nEvents, seqLen, nFunnel) = rows(u)
      assert(nEvents == es.length && seqLen == seq.length)
      assert(nFunnel == n, s"user $u: got $nFunnel, reference $n ($seq)")
    }
    // the fixture actually exercises the pattern
    assert(rows.values.map(_._3).sum > 0)
  }

  test("q102: conversion lags equal a driver-side first-signup → " +
    "first-purchase-after recompute, percentiles interpolated") {
    val Array(row) = TimeSeriesQueries.defs("q102_conversion_lag")
      .fn(spark, sf0001).collect()
    val (nSignups, nConverted, median, p90, rate) =
      (row.getLong(0), row.getLong(1), row.getDouble(2), row.getDouble(3),
        row.getDouble(4))
    val evs = Tables.events(spark, sf0001)
      .filter(col("user_id").isNotNull)
      .select(col("user_id"), col("ts"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getString(2)))
    def usOf(t: java.sql.Timestamp): Long =
      t.getTime / 1000 * 1000000L + t.getNanos / 1000
    val signup = evs.filter(_._3 == "signup").groupBy(_._1)
      .map { case (u, es) => u -> es.map(e => usOf(e._2)).min }
    val lags = signup.toSeq.flatMap { case (u, s) =>
      val ps = evs.filter(e => e._1 == u && e._3 == "purchase")
        .map(e => usOf(e._2)).filter(_ >= s)
      if (ps.isEmpty) None else Some(ps.min - s)
    }.sorted
    assert(nSignups == signup.size && nConverted == lags.length)
    assert(nConverted > 0 && nConverted <= nSignups)
    def pct(q: Double): Double = {
      val rank = (lags.length - 1) * q
      val lo = rank.toInt
      val frac = rank - lo
      val interp =
        if (lo + 1 < lags.length) lags(lo) + frac * (lags(lo + 1) - lags(lo))
        else lags(lo).toDouble
      BigDecimal(interp / 1e6)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(median == pct(0.5), s"median $median != ${pct(0.5)}")
    assert(p90 == pct(0.9), s"p90 $p90 != ${pct(0.9)}")
    assert(rate == nConverted.toDouble / nSignups.toDouble)
  }

  test("q103: sliding DAU/WAU equal the brute-force per-window distinct " +
    "sets; WAU >= DAU >= 0; every in-span day present") {
    val rows = TimeSeriesQueries.defs("q103_sliding_dau")
      .fn(spark, sf0001).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(rows.nonEmpty)
    val act = Tables.events(spark, sf0001)
      .filter(col("user_id").isNotNull)
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .distinct()
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val days = act.map(_._2)
    val (lo, hi) = (days.min, days.max)
    val span = Iterator.iterate(lo)(_.plusDays(1))
      .takeWhile(!_.isAfter(hi)).toSeq
    assert(rows.keySet == span.map(_.toString).toSet,
      "one output row per day in the activity span")
    span.foreach { w =>
      val wau = act.filter { case (_, d) =>
        !d.isAfter(w) && !d.isBefore(w.minusDays(6))
      }.map(_._1).distinct.length
      val dau = act.filter(_._2 == w).map(_._1).distinct.length
      val (gotDau, gotWau, stick) = rows(w.toString)
      assert(gotDau == dau && gotWau == wau, s"$w: ($gotDau,$gotWau) " +
        s"!= brute ($dau,$wau)")
      assert(gotWau >= gotDau && stick == dau.toDouble / wau.toDouble)
    }
  }
}
