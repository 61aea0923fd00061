package graft

import graft.queries.Behavior
import org.apache.spark.sql.functions.{col, to_date}

/** Mirrors for the round-7 §2.33 behavioral-analytics batch: each
  * query recomputed with plain Scala arithmetic under the same
  * rounding discipline on the collected sf0.001 fixture, plus the
  * non-vacuity checks (lift must straddle 1; credit shares must
  * actually split). */
class BehaviorSpec extends SparkSpec {

  private def r6(x: Double): Double = BigDecimal(x)
    .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q_wl_market_basket matches the support/confidence/lift mirror") {
    val out = Behavior.queries("q_wl_market_basket")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getDouble(6))).toMap
    assert(out.nonEmpty)
    // chance co-occurrence must be beaten somewhere and missed somewhere
    // — an all-1.0 lift column would assert nothing about association
    assert(out.values.exists(_._4 > 1.0) && out.values.exists(_._4 < 1.0))
    val brand = Tables(spark, sf, "part").select("p_partkey", "p_brand")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val ob = Tables(spark, sf, "lineitem")
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), brand(r.getLong(1)))).distinct
    val nOrders = ob.map(_._1).distinct.length.toLong
    val marg = ob.groupBy(_._2).map { case (b, xs) => b -> xs.length.toLong }
    val expect = ob.groupBy(_._1).toSeq.flatMap { case (_, xs) =>
      val bs = xs.map(_._2).sorted
      for (i <- bs.indices; j <- i + 1 until bs.length)
        yield (bs(i), bs(j))
    }.groupBy(identity).map { case ((a, b), xs) =>
      val (nAb, nA, nB) = (xs.length.toLong, marg(a), marg(b))
      (a, b) -> (nAb, nA, nB,
        r6((nAb.toDouble * nOrders) / (nA.toDouble * nB)),
        r6(nAb.toDouble / nA))
    }
    assert(out === expect)
  }

  test("q_ts_survival_km matches the product-limit mirror; curve decreasing, censoring real") {
    val out = Behavior.queries("q_ts_survival_km")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.nonEmpty)
    // independent replay: product-limit estimator in plain Scala over
    // the collected orders, same weekly grid / 365-day censor cutoff /
    // 1e-9 ln grid / exp-then-round-6 tail
    val od = Tables(spark, sf, "orders")
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("d"))
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val tend = od.map(_._2).max
    val cut = tend.minusDays(365)
    val cust = od.groupBy(_._1).values.map { xs =>
      val ds = xs.map(_._2)
      val (t0, t1) = (ds.min, ds.max)
      (java.time.temporal.ChronoUnit.DAYS.between(t0, t1) / 7,
        t1.isBefore(cut))
    }.toSeq
    val byW = cust.groupBy(_._1).map { case (w, xs) =>
      w -> (xs.size.toLong, xs.count(_._2).toLong)
    }
    val wks = byW.keys.toSeq.sorted
    var atRisk = cust.size.toLong
    var sln = BigDecimal(0)
    var hitZero = false
    val expect = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Double)]
    wks.foreach { w =>
      val (leave, d) = byW(w)
      if (d > 0) {
        if (d == atRisk) hitZero = true
        else sln += BigDecimal(r9(math.log(1.0 - d.toDouble / atRisk)))
        expect += ((w, atRisk, d,
          if (hitZero) 0.0 else r6(math.exp(sln.toDouble))))
      }
      atRisk -= leave
    }
    assert(out.toSeq === expect.toSeq)
    // the estimator's shape: survival non-increasing, within (0, 1],
    // risk set strictly decreasing across eventful weeks, and real
    // censoring present (otherwise KM degenerates to an ECDF and the
    // operator asserts nothing about censored lifetimes)
    assert(out.map(_._4).zip(out.map(_._4).tail).forall { case (a, b) => b <= a })
    assert(out.forall(r => r._4 >= 0.0 && r._4 <= 1.0))
    assert(out.map(_._2).zip(out.map(_._2).tail).forall { case (a, b) => b < a })
    assert(cust.exists(!_._2), "no censored customers — cutoff degenerate")
    assert(cust.exists(_._2), "no churned customers — cutoff degenerate")
    ()
  }

  private def r9(x: Double): Double = BigDecimal(x)
    .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q_ts_attribution_linear matches the equal-share mirror; shares split") {
    val out = Behavior.queries("q_ts_attribution_linear")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(out.nonEmpty)
    // non-vacuity: some click is credited by several purchases, and some
    // purchase splits its credit (a fractional share exists) — an
    // all-integer credit column would mean k never exceeded 1
    assert(out.values.exists(_._1 > 1))
    assert(out.values.exists(v => v._2 != math.floor(v._2)))
    val ev = Tables(spark, sf, "events")
      .select(org.apache.spark.sql.functions.col("event_id"),
        org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.col("event_type"),
        org.apache.spark.sql.functions.col("ts").cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val byUser = ev.toSeq.groupBy(_._2)
    val shares = byUser.values.toSeq.flatMap { rows =>
      val clicks = rows.filter(_._3 == "click")
      rows.filter(_._3 == "purchase").flatMap { p =>
        val touched = clicks.filter(c => c._1 < p._1 && p._4 - c._4 <= 604800L)
        touched.map(c => ((c._1, c._2), r6(1.0 / touched.length)))
      }
    }
    val expect = shares.groupBy(_._1).map { case (k, xs) =>
      k -> (xs.size.toLong,
        xs.map(s => BigDecimal(s._2)).sum.toDouble)
    }
    assert(out === expect)
  }

  test("q_ts_dtw matches the banded-DP mirror; warping beats lag-0") {
    val out = Behavior.queries("q_ts_dtw")(spark, sf).collect()
    assert(out.length === 1)
    val (n, l1, dtw, gain) = (out(0).getLong(0), out(0).getLong(1),
      out(0).getLong(2), out(0).getDouble(3))
    // the band contains the diagonal, so dtw ≤ l1 by construction; a
    // zero gain would mean the band never found a better alignment —
    // non-vacuous on this data (and a degenerate all-zero series would
    // zero l1 itself)
    assert(l1 > 0 && dtw > 0 && dtw <= l1 && gain > 0.0)
    val ev = Tables(spark, sf, "events")
      .select(org.apache.spark.sql.functions.col("ts").cast("long"),
        org.apache.spark.sql.functions.col("event_type"),
        org.apache.spark.sql.functions.col("value"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    def cents(v: Double): Long = BigDecimal(v * 100)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val hourly = ev.groupBy { case (es, _, _) => es - (es % 3600) }
      .toSeq.sortBy(_._1).map { case (_, xs) =>
        (xs.filter(_._2 == "purchase").map(x => cents(x._3)).sum,
          xs.filter(_._2 == "click").map(x => cents(x._3)).sum)
      }
    val a = hourly.map(_._1).toArray
    val b = hourly.map(_._2).toArray
    val m = a.length
    assert(n === m.toLong)
    val INF = 1000000000000000L
    var prev = Array.fill(m + 1)(INF); prev(0) = 0L
    for (i <- 1 to m) {
      val cur = Array.fill(m + 1)(INF)
      for (j <- math.max(1, i - 6) to math.min(m, i + 6))
        cur(j) = math.abs(a(i - 1) - b(j - 1)) +
          math.min(prev(j), math.min(prev(j - 1), cur(j - 1)))
      prev = cur
    }
    val mL1 = (0 until m).map(i => math.abs(a(i) - b(i))).sum
    assert(l1 === mL1 && dtw === prev(m))
    assert(gain === r6((mL1 - prev(m)).toDouble / mL1))
  }

  private def orderCents: Map[Long, (java.sql.Date, Long, Long)] = {
    val rows = Tables(spark, sf, "orders")
      .select(org.apache.spark.sql.functions.col("o_custkey"),
        org.apache.spark.sql.functions.col("o_orderdate").cast("date"),
        org.apache.spark.sql.functions.col("o_totalprice"))
      .collect()
      .map(r => (r.getLong(0), r.getDate(1), r.getDouble(2)))
    def cents(v: Double): Long = BigDecimal(v * 100)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    rows.groupBy(_._1).map { case (c, xs) =>
      c -> (xs.map(_._2).maxBy(_.getTime), xs.length.toLong,
        xs.map(x => cents(x._3)).sum)
    }
  }

  test("q_agg_gini matches the sorted-rank mirror; concentration is real") {
    val out = Behavior.queries("q_agg_gini")(spark, sf).collect()
    assert(out.length === 1)
    val (n, tot, gini, top1) = (out(0).getLong(0), out(0).getLong(1),
      out(0).getDouble(2), out(0).getDouble(3))
    assert(gini > 0.0 && gini < 1.0 && top1 > 0.0 && top1 < 1.0)
    val cents = orderCents.values.map(_._3).toSeq.sorted
    val m = cents.length
    assert(n === m.toLong && tot === cents.sum)
    val s1 = cents.zipWithIndex
      .map { case (x, i) => BigInt(i + 1) * BigInt(x) }.sum
    val mGini = r6((BigDecimal(2 * s1) - BigDecimal(m + 1) * BigDecimal(tot))
      .toDouble / (BigDecimal(m) * BigDecimal(tot)).toDouble)
    assert(gini === mGini)
    val top1Cents = cents.drop(m - m / 100).sum
    assert(top1 === r6(top1Cents.toDouble / tot))
  }

  test("q_wl_rfm matches the position-quintile mirror") {
    val out = Behavior.queries("q_wl_rfm")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) ->
        (r.getLong(3), r.getDouble(4))).toMap
    assert(out.size >= 5)
    val base = orderCents
    val maxd = base.values.map(_._1).maxBy(_.getTime)
    def days(a: java.sql.Date, b: java.sql.Date): Long =
      (a.toLocalDate.toEpochDay - b.toLocalDate.toEpochDay)
    val rows = base.toSeq.map { case (c, (lastd, freq, cents)) =>
      (c, days(maxd, lastd), freq, cents)
    }
    val nt = rows.length.toLong
    def quint[T](xs: Seq[(Long, T)])(implicit o: Ordering[T]): Map[Long, Int] =
      xs.sortBy { case (c, v) => (v, c) }.zipWithIndex.map { case ((c, _), i) =>
        c -> (math.min(4L, (5L * i) / nt).toInt + 1)
      }.toMap
    val qr = quint(rows.map(r => (r._1, r._2)))
    val qf = quint(rows.map(r => (r._1, r._3)))
    val qm = quint(rows.map(r => (r._1, r._4)))
    val expect = rows.groupBy(r => (6 - qr(r._1), qf(r._1), qm(r._1)))
      .map { case (k, xs) =>
        k -> (xs.length.toLong,
          r6(xs.map(_._4).sum.toDouble / xs.length / 100.0))
      }
    assert(out === expect)
  }

  test("q_wl_cohort_ltv matches the weekly-cohort mirror; curve is real") {
    val out = Behavior.queries("q_wl_cohort_ltv")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    // a curve needs multiple cohorts AND multiple ages (the monthly
    // form collapsed to one row on this corpus — the vacuity rule)
    assert(out.keys.map(_._1).toSet.size >= 2)
    assert(out.keys.map(_._2).max >= 1)
    val ev = Tables(spark, sf, "events")
      .select(org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.col("ts").cast("long"),
        org.apache.spark.sql.functions.col("event_type"),
        org.apache.spark.sql.functions.col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
      .filter(_._3 == "purchase")
    def cents(v: Double): Long = BigDecimal(v * 100)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val p = ev.map(e => (e._1, e._2 / 604800L, cents(e._4)))
    val coh = p.groupBy(_._1).map { case (u, xs) => u -> xs.map(_._2).min }
    val sizes = coh.values.groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
    val byAge = p.groupBy(r => (coh(r._1), r._2 - coh(r._1)))
      .map { case (k, xs) => k -> xs.map(_._3).sum }
    val expect = byAge.groupBy(_._1._1).flatMap { case (cw, xs) =>
      val sorted = xs.toSeq.sortBy(_._1._2)
      sorted.zipWithIndex.map { case (((_, age), rev), i) =>
        val cum = sorted.take(i + 1).map(_._2).sum
        (cw, age) -> (sizes(cw), rev, cum,
          r6(cum.toDouble / sizes(cw) / 100.0))
      }
    }
    assert(out === expect)
  }

  test("q_ts_holt_winters matches the seasonal-fold mirror; cycle is real") {
    val out = Behavior.queries("q_ts_holt_winters")(spark, sf).collect()
    assert(out.length === 1)
    val (n, level, trend, fc, amp) = (out(0).getLong(0), out(0).getDouble(1),
      out(0).getDouble(2), out(0).getDouble(3), out(0).getDouble(4))
    // a flat seasonal profile would mean the fold never updated a slot
    assert(n > 48 && amp > 0.0)
    val ev = Tables(spark, sf, "events")
      .select(org.apache.spark.sql.functions.col("ts").cast("long"),
        org.apache.spark.sql.functions.col("event_type"),
        org.apache.spark.sql.functions.col("value"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .filter(_._2 == "purchase")
    def cents(v: Double): Long = BigDecimal(v * 100)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val xs = ev.groupBy { case (es, _, _) => es - (es % 3600) }
      .toSeq.sortBy(_._1)
      .map { case (_, rows) => rows.map(r => cents(r._3)).sum.toDouble / 100.0 }
    assert(n === xs.length.toLong)
    var (lvl, tr) = (xs.head, 0.0)
    val sArr = Array.fill(24)(0.0)
    var i = 1
    xs.tail.foreach { x =>
      val slot = i % 24
      val sold = sArr(slot)
      val lvl2 = r6(0.2 * (x - sold) + 0.8 * (lvl + tr))
      val tr2 = r6(0.1 * (lvl2 - lvl) + 0.9 * tr)
      sArr(slot) = r6(0.3 * (x - lvl2) + 0.7 * sold)
      lvl = lvl2; tr = tr2; i += 1
    }
    assert(level === r6(lvl) && trend === r6(tr))
    assert(fc === r6(lvl + tr + sArr(i % 24)))
    assert(amp === r6(sArr.max - sArr.min))
  }

  test("q_wl_growth_mart matches the fused attribution+cohort mirror") {
    val out = Behavior.queries("q_wl_growth_mart")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getLong(5), r.getDouble(6))).toMap
    assert(out.size >= 2)
    // the attribution share must be a real rate somewhere (0 < rate < 1)
    assert(out.values.exists(v => v._4 > 0.0 && v._4 < 1.0))
    val ev = Tables(spark, sf, "events")
      .select(org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.col("event_id"),
        org.apache.spark.sql.functions.col("event_type"),
        org.apache.spark.sql.functions.col("ts").cast("long"),
        org.apache.spark.sql.functions.col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getDouble(4)))
    def cents(v: Double): Long = BigDecimal(v * 100)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val perUser = ev.groupBy(_._1).toSeq.flatMap { case (u, rows) =>
      val sorted = rows.sortBy(_._2)
      var lastClick: Option[Long] = None
      val ps = sorted.flatMap { case (_, _, tpe, es, v) =>
        val r = if (tpe == "purchase")
          Some((es / 604800L, cents(v),
            if (lastClick.exists(c => es - c <= 604800L)) 1L else 0L))
        else None
        if (tpe == "click") lastClick = Some(es)
        r
      }
      if (ps.isEmpty) None
      else Some((u, ps.map(_._1).min, ps.length.toLong,
        ps.map(_._3).sum, ps.map(_._2).sum))
    }
    val expect = perUser.groupBy(_._2).map { case (cw, xs) =>
      val (np, natt, cts) = (xs.map(_._3).sum, xs.map(_._4).sum,
        xs.map(_._5).sum)
      cw -> (xs.size.toLong, np, natt, r6(natt.toDouble / np), cts,
        r6(cts.toDouble / xs.size / 100.0))
    }
    assert(out === expect)
  }
}
