package graft

import graft.queries.Diag

/** Scala-mirror and conservation checks for the round-6 Diag batch
  * (the BasisSpec convention: recompute with plain Scala arithmetic on
  * the collected sf0.001 fixture — fine HERE, never in the queries). */
class DiagSpec extends SparkSpec {

  test("q_llm_gram_novelty: novel counts conserve the distinct-gram total") {
    val out = Diag.queries("q_llm_gram_novelty")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getLong(3) >= 0 && r.getLong(3) <= r.getLong(2)))
    val docs = Tables(spark, sf, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2).split(" ").toSeq))
    def grams(tk: Seq[String]): Set[String] =
      if (tk.length < 5) Set.empty else tk.sliding(5).map(_.mkString(" ")).toSet
    // every distinct gram is novel in EXACTLY one (its first) bucket
    val universe = docs.flatMap(d => grams(d._3)).toSet
    assert(out.map(_.getLong(3)).sum === universe.size.toLong,
      "sum of novel counts must equal the distinct-gram universe")
    // full mirror: per (source, bucket) counts from set arithmetic
    val firstDoc = docs.flatMap { case (id, _, tk) => grams(tk).map(_ -> id) }
      .groupBy(_._1).map { case (g, v) => g -> v.map(_._2).min }
    val expect = docs.flatMap { case (id, src, tk) =>
      // toSeq: mapping over the Set would DEDUPE the (bucket, flag) pairs
      grams(tk).toSeq.map(g => ((src, id / 100), firstDoc(g) == id))
    }.groupBy(_._1).map { case (k, v) =>
      k -> (v.length.toLong, v.count(_._2).toLong)
    }
    out.foreach { r =>
      val k = (r.getString(0), r.getLong(1))
      assert(expect(k) === ((r.getLong(2), r.getLong(3))), s"bucket $k")
    }
  }

  test("q_ts_kalman matches the scalar fold mirror; gain and variance bounded") {
    val out = Diag.queries("q_ts_kalman")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getDouble(3) > 0.0, "posterior variance must stay positive")
      assert(r.getDouble(4) > 0.0 && r.getDouble(4) < 1.0, "gain out of (0,1)")
    }
    val events = Tables(spark, sf, "events")
      .select("user_id", "event_id", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val byUser = events.groupBy(_._1).map { case (u, v) =>
      u -> v.sortBy(_._2)
    }
    val (q, rr, p0) = (4.0, 25.0, 100.0)
    val mirror = byUser.flatMap { case (u, rows) =>
      rows.indices.map { i =>
        val vs = rows.slice(math.max(0, i - 49), i + 1).map(_._3)
        val (x, p) = vs.tail.foldLeft((vs.head, p0)) { case ((x, p), z) =>
          val pp = p + q
          val k = pp / (pp + rr)
          (x + k * (z - x), (1.0 - k) * pp)
        }
        (rows(i)._2, (x, p))
      }
    }
    out.foreach { r =>
      val (x, p) = mirror(r.getLong(1))
      assert(r.getDouble(2) === x, s"x_hat at event ${r.getLong(1)}")
      assert(r.getDouble(3) === p, s"p_cov at event ${r.getLong(1)}")
    }
  }

  test("q_llm_filter_cascade chains exactly and matches sequential filtering") {
    val out = Diag.queries("q_llm_filter_cascade")(spark, sf).collect()
      .sortBy(_.getInt(0))
    assert(out.length === 3)
    // attrition must chain: stage k's n_in is stage k-1's n_kept
    assert(out(1).getLong(2) === out(0).getLong(3))
    assert(out(2).getLong(2) === out(1).getLong(3))
    assert(out.forall(r => r.getLong(3) <= r.getLong(2)))
    // independent formulation: apply the filters as successive queries
    import org.apache.spark.sql.functions._
    val docs = Tables(spark, sf, "documents")
      .withColumn("tk", graft.queries.U.textTokens)
      .withColumn("ntok", size(col("tk")))
      .withColumn("logit", graft.queries.U.qualityLogit)
    val s1 = docs.where(col("ntok").between(5, 500))
    val s2 = s1.where(col("lang").isin("en", "es", "de", "fr", "zh"))
    val s3 = s2.where(col("logit") > 0.0)
    assert(out(0).getLong(2) === docs.count())
    assert(out(0).getLong(3) === s1.count())
    assert(out(1).getLong(3) === s2.count())
    assert(out(2).getLong(3) === s3.count())
  }

  test("q_llm_preference_pairs: extremes match the mirror, margins positive") {
    val out = Diag.queries("q_llm_preference_pairs")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(6) > 0L, s"degenerate margin in group ${r.getString(0)}")
      assert(r.getLong(2) !== r.getLong(4), "chosen == rejected")
    }
    // mirror off an independent scoring path: run qualityE6 via SQL on
    // the collected docs and recompute extremes with plain Scala
    val scored = Tables(spark, sf, "documents")
      .select(org.apache.spark.sql.functions.col("source"),
        org.apache.spark.sql.functions.col("doc_id"),
        graft.queries.U.qualityE6.as("q")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byS = scored.groupBy(_._1)
    out.foreach { r =>
      val g = byS(r.getString(0))
      val chosen = g.minBy { case (_, id, q) => (-q, id) }
      val rejected = g.minBy { case (_, id, q) => (q, id) }
      assert(r.getLong(1) === g.length.toLong)
      assert((r.getLong(2), r.getLong(3)) === ((chosen._2, chosen._3)))
      assert((r.getLong(4), r.getLong(5)) === ((rejected._2, rejected._3)))
    }
  }

  test("q_dq_bootstrap_ci matches the Scala Poisson-bootstrap mirror exactly") {
    val out = Diag.queries("q_dq_bootstrap_ci")(spark, sf).collect()
      .sortBy(_.getLong(0))
    assert(out.length == 2, "both arms must report")
    // independent Scala mirror: same md5 fold, same hardcoded Poisson
    // thresholds, same nearest-rank percentile arithmetic
    def md5Fold(sIn: String, n: Int): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(sIn.getBytes("UTF-8")).map("%02x".format(_)).mkString
      hex.take(n).foldLeft(0L)((acc, c) =>
        acc * 16 + java.lang.Long.parseLong(c.toString, 16))
    }
    def pois(u: Long): Long =
      if (u < 367879) 0 else if (u < 735759) 1 else if (u < 919699) 2
      else if (u < 981012) 3 else if (u < 996340) 4 else if (u < 999406) 5
      else if (u < 999917) 6 else 7
    val users = Tables(spark, sf, "events")
      .where(org.apache.spark.sql.functions.col("event_type") === "purchase")
      .groupBy("user_id")
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.round(
          org.apache.spark.sql.functions.col("value") * 100).cast("long")).as("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byArm = users.groupBy { case (uid, _) => md5Fold(s"ab$uid", 13) % 2 }
    out.foreach { row =>
      val arm = row.getLong(0)
      val us = byArm(arm)
      assert(row.getLong(1) == us.length, "n_users")
      val mean = BigDecimal(us.map(_._2).sum.toDouble / (us.length * 100.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(row.getDouble(2) == mean, s"mean_value arm $arm")
      val ms = (0L until 64L).flatMap { b =>
        var sw = 0L; var ww = 0L
        us.foreach { case (uid, v) =>
          val w = pois(md5Fold(s"boot$b|$uid", 12) % 1000000)
          sw += w * v; ww += w
        }
        if (ww > 0) Some((BigDecimal(sw.toDouble / (ww * 100.0))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, b))
        else None
      }.sorted
      val nB = ms.length
      assert(row.getLong(5) == nB, "n_replicas")
      val lo = ms((nB * 25 + 999) / 1000 - 1)._1
      val hi = ms((nB * 975 + 999) / 1000 - 1)._1
      assert(row.getDouble(3) == lo, s"ci_lo arm $arm: ${row.getDouble(3)} vs $lo")
      assert(row.getDouble(4) == hi, s"ci_hi arm $arm: ${row.getDouble(4)} vs $hi")
      assert(lo <= mean && mean <= hi,
        s"point estimate outside its own CI (arm $arm): $lo $mean $hi")
    }
  }

  test("q_dq_ab_test matches the exact two-proportion mirror; rates non-degenerate") {
    val out = Diag.queries("q_dq_ab_test")(spark, sf).collect()
    assert(out.length === 1)
    val r = out(0)
    val (na, ca, nb, cb) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    // both arms populated, both rates strictly inside (0,1) — a
    // degenerate rate would zero the pooled variance (the vacuity rule)
    assert(na > 0 && nb > 0)
    assert(ca > 0 && ca < na && cb > 0 && cb < nb)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val users = Tables(spark, sf, "events")
      .select("user_id", "event_type").collect()
      .map(rr => (rr.getLong(0), rr.getString(1)))
      .groupBy(_._1).toSeq.map { case (u, v) =>
        (java.lang.Long.parseLong(md5hex("ab" + u).substring(0, 13), 16) % 2,
          if (v.count(_._2 == "purchase") >= 14) 1L else 0L)
      }
    val (aArm, bArm) = users.partition(_._1 == 0)
    assert(na === aArm.length.toLong && nb === bArm.length.toLong)
    assert(ca === aArm.map(_._2).sum && cb === bArm.map(_._2).sum)
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val (pa, pb) = (r6(ca.toDouble / na), r6(cb.toDouble / nb))
    val pp = (ca + cb).toDouble / (na + nb).toDouble
    val z = r6((pa - pb) /
      math.sqrt(pp * (1.0 - pp) * (1.0 / na + 1.0 / nb)))
    assert(r.getDouble(4) === pa && r.getDouble(5) === pb)
    assert(r.getDouble(6) === z)
  }

  test("q_dq_dp_release: noise matches the inverse-CDF mirror off the keyed draw") {
    val out = Diag.queries("q_dq_dp_release")(spark, sf).collect()
    assert(out.nonEmpty)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    out.foreach { r =>
      val (lang, n, noise, released) =
        (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3))
      val u = ((java.lang.Long.parseLong(
        md5hex("dp" + lang).substring(0, 13), 16) % 999999L) + 1L) / 1e6
      val expect = BigDecimal(-1.0 * math.signum(u - 0.5) *
        math.log(1.0 - 2.0 * math.abs(u - 0.5)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(noise === expect, s"noise for $lang")
      assert(math.abs(released - (n + noise)) < 1e-6)
      assert(n > 0)
    }
  }

  test("q_dq_ks_drift matches the exact sorted-merge KS mirror") {
    val out = Diag.queries("q_dq_ks_drift")(spark, sf).collect()
    assert(out.length === 1)
    val (nx, ny, dnum, atv, dstat) = (out(0).getLong(0), out(0).getLong(1),
      out(0).getLong(2), out(0).getLong(3), out(0).getDouble(4))
    assert(dstat > 0.0 && dstat < 1.0)
    val ev = Tables(spark, sf, "events")
      .select("event_type", "value").collect()
      .filter(r => r.getString(0) == "purchase" || r.getString(0) == "click")
      .map(r => (r.getString(0) == "purchase",
        math.round(r.getDouble(1) * 1e6)))
    val xs = ev.filter(_._1).map(_._2)
    val ys = ev.filterNot(_._1).map(_._2)
    assert(nx === xs.length.toLong && ny === ys.length.toLong)
    // exact D over all distinct pooled values, cross-multiplied integers
    val best = (xs ++ ys).distinct.sorted.map { v =>
      val dn = math.abs(xs.count(_ <= v).toLong * ny -
        ys.count(_ <= v).toLong * nx)
      (dn, v)
    }.maxBy { case (dn, v) => (dn, -v) }
    assert(dnum === best._1, "KS numerator")
    assert(atv === best._2, "attaining value")
    assert(dstat === dnum.toDouble / (nx * ny).toDouble)
  }

  test("q_dq_psi matches the binned mirror; counts conserve the samples") {
    val out = Diag.queries("q_dq_psi")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    // the report covers the FULL declared bin domain: a bin empty in
    // both samples still reports its smoothed psi_term
    assert(out.length === 10 && out.map(_._1).toSeq === (0L until 10L))
    val ev = Tables(spark, sf, "events")
      .select("event_type", "value").collect()
      .filter(r => r.getString(0) == "purchase" || r.getString(0) == "click")
      .map(r => (r.getString(0) == "purchase",
        math.round(r.getDouble(1) * 1e6)))
    // counts conserve both samples
    assert(out.map(_._2).sum === ev.count(_._1).toLong)
    assert(out.map(_._3).sum === ev.count(!_._1).toLong)
    // mirror: same gridBin formula, Laplace smoothing, per-bin term
    val lo = ev.map(_._2).min; val hi = ev.map(_._2).max
    def bin(v: Long): Long =
      if (hi <= lo) 9L
      else math.min(9L, math.floor((v - lo).toDouble / ((hi - lo).toDouble / 10)).toLong)
    val byBin = ev.groupBy(e => bin(e._2))
    val ta = ev.count(_._1).toLong; val tb = ev.count(!_._1).toLong
    def r9(x: Double) = BigDecimal(x)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    out.foreach { case (b, na, nb, pa, pb, term) =>
      val g = byBin.getOrElse(b, Array.empty[(Boolean, Long)])
      assert(na === g.count(_._1).toLong && nb === g.count(!_._1).toLong,
        s"bin $b counts")
      val mpa = (na + 1).toDouble / (ta + 10)
      val mpb = (nb + 1).toDouble / (tb + 10)
      assert(pa === r9(mpa) && pb === r9(mpb), s"bin $b proportions")
      assert(math.abs(term - (mpa - mpb) * math.log(mpa / mpb)) < 2e-9,
        s"bin $b term")
    }
    // drift direction is non-vacuous on this corpus: at least one bin
    // where the two distributions actually differ
    assert(out.exists { case (_, na, nb, _, _, _) => na != nb })
  }

  test("q_ts_xcorr: r bounded, lag-0 pairs complete, matches the closed-form mirror") {
    val out = Diag.queries("q_ts_xcorr")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(out.length === 6)
    out.foreach { case (_, n, r) =>
      assert(n > 2 && r >= -1.0 && r <= 1.0, s"degenerate row ($n, $r)")
    }
    // mirror off the hourly decimal sums
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def d6(xs: Iterable[Double]) = xs.map(BigDecimal(_)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
    val hourly = Tables(spark, sf, "events")
      .select("ts", "event_type", "value").collect()
      .map(r => (r.getTimestamp(0).getTime / 1000, r.getString(1), r.getDouble(2)))
      .map { case (s, t, v) => (s - s % 3600, t, v) }
      .groupBy(e => (e._1, e._2)).map { case ((hr, t), v) =>
        (hr, t) -> r6(d6(v.map(_._3)))
      }
    val p = hourly.collect { case ((hr, "purchase"), v) => hr -> v }
    val c = hourly.collect { case ((hr, "click"), v) => hr -> v }
    out.foreach { case (lag, n, r) =>
      val pairs = p.toSeq.flatMap { case (hr, x) =>
        c.get(hr - lag * 3600L).map(y => (x, y)) }
      assert(n === pairs.length.toLong, s"n_hours at lag $lag")
      val nn = n.toDouble
      val (sx, sy) = (d6(pairs.map(_._1)), d6(pairs.map(_._2)))
      val sxy = d6(pairs.map(pr => r6(pr._1 * pr._2)))
      val sxx = d6(pairs.map(pr => r6(pr._1 * pr._1)))
      val syy = d6(pairs.map(pr => r6(pr._2 * pr._2)))
      val expect = r6((nn * sxy - sx * sy) /
        math.sqrt((nn * sxx - sx * sx) * (nn * syy - sy * sy)))
      assert(math.abs(r - expect) < 2e-6, s"lag $lag: $r vs $expect")
    }
  }

  test("q_llm_zipf_fit: negative slope, matches the closed-form mirror") {
    val out = Diag.queries("q_llm_zipf_fit")(spark, sf).collect()
    assert(out.length === 1)
    val (n, slope, intercept) =
      (out(0).getLong(0), out(0).getDouble(1), out(0).getDouble(2))
    assert(slope < 0.0, "term frequencies must decay with rank")
    val tf = Tables(spark, sf, "documents").select("text").collect()
      .flatMap(_.getString(0).split(" ")).groupBy(identity)
      .map { case (t, v) => (t, v.length.toLong) }.toSeq
      .sortBy { case (t, c) => (-c, t) }.take(1000)
    assert(n === tf.length.toLong)
    def r9(x: Double) = BigDecimal(x)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val xy = tf.zipWithIndex.map { case ((_, c), i) =>
      (r9(math.log(i + 1.0)), r9(math.log(c.toDouble)))
    }
    def sum9(v: Seq[Double]) = v.map(BigDecimal(_)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
    val (sx, sy) = (sum9(xy.map(_._1)), sum9(xy.map(_._2)))
    val sxy = sum9(xy.map(p => r9(p._1 * p._2)))
    val sxx = sum9(xy.map(p => r9(p._1 * p._1)))
    val nn = n.toDouble
    val sl = (nn * sxy - sx * sy) / (nn * sxx - sx * sx)
    assert(math.abs(slope - BigDecimal(sl).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9, "slope mirror")
    assert(math.abs(intercept - BigDecimal((sy - sl * sx) / nn).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9, "intercept mirror")
  }

  test("q_dq_ab_welch matches the exact-moment mirror on the shared arms") {
    val out = graft.queries.Diag.queries("q_dq_ab_welch")(spark, sf).collect()
    assert(out.length === 1)
    val r = out(0)
    val (nA, nB) = (r.getLong(0), r.getLong(1))
    val (meanA, meanB, t, df) =
      (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
    // both arms populated with enough users for a variance
    assert(nA > 1 && nB > 1 && df > 1.0)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    def cents(v: Double): Long = BigDecimal(v * 100)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    def r6(x: Double): Double = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val users = Tables(spark, sf, "events")
      .select("user_id", "event_type", "value").collect()
      .map(rr => (rr.getLong(0), rr.getString(1), rr.getDouble(2)))
      .filter(_._2 == "purchase").groupBy(_._1).toSeq
      .map { case (u, v) =>
        (java.lang.Long.parseLong(md5hex("ab" + u).substring(0, 13), 16) % 2,
          v.map(x => cents(x._3)).sum)
      }
    val (aArm, bArm) = users.partition(_._1 == 0)
    def mom(xs: Seq[Long]): (Long, Long, BigInt) =
      (xs.size.toLong, xs.sum, xs.map(x => BigInt(x) * BigInt(x)).sum)
    val (na, s1a, s2a) = mom(aArm.map(_._2))
    val (nb, s1b, s2b) = mom(bArm.map(_._2))
    assert(nA === na && nB === nb)
    val ma = s1a.toDouble / na; val mb = s1b.toDouble / nb
    val va = (s2a.toDouble - s1a.toDouble * s1a / na) / (na - 1)
    val vb = (s2b.toDouble - s1b.toDouble * s1b / nb) / (nb - 1)
    val qa = va / na; val qb = vb / nb
    assert(meanA === r6(ma / 100.0) && meanB === r6(mb / 100.0))
    assert(t === r6((ma - mb) / math.sqrt(qa + qb)))
    assert(df === r6((qa + qb) * (qa + qb) /
      (qa * qa / (na - 1) + qb * qb / (nb - 1))))
  }

  test("q_dq_k_anonymity matches the QI-class mirror; mixed regime at gate scale") {
    def r6(x: Double): Double = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def cents(v: Double): Long = BigDecimal(v * 100)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val out = graft.queries.Diag.queries("q_dq_k_anonymity")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5), r.getLong(6),
        r.getLong(7))).toMap
    val rows = Tables(spark, sf, "customer")
      .select("c_mktsegment", "c_nationkey", "c_acctbal").collect()
      .map(r => (r.getString(0), r.getInt(1),
        math.floor(cents(r.getDouble(2)) / 250000.0).toLong))
    val expect = rows.groupBy(x => (x._1, x._2, x._3)).toSeq
      .map { case (k, v) => (k._1, v.length.toLong) }
      .groupBy(_._1).map { case (seg, cls) =>
        val ns = cls.map(_._2)
        val atRisk = ns.filter(_ < 5).sum
        seg -> (ns.sum, ns.size.toLong, ns.count(_ < 5).toLong, atRisk,
          r6(atRisk * 100.0 / ns.sum), ns.min, ns.max)
      }
    assert(out === expect)
    // 150-row fixture: every class is small — the honest tiny-data
    // answer; the regime that exercises BOTH branches is gate scale,
    // asserted directly on sf0.1 (15k customers → 2 risky classes of
    // 625, risk strictly between 0 and 100)
    val gate = graft.queries.Diag
      .queries("q_dq_k_anonymity")(spark, "/root/testdata/sf0.1")
      .agg(org.apache.spark.sql.functions.expr("sum(n_small)"),
        org.apache.spark.sql.functions.expr("sum(n_classes)"),
        org.apache.spark.sql.functions.expr("max(risk_pct)")).collect()(0)
    assert(gate.getLong(0) > 0 && gate.getLong(0) < gate.getLong(1))
    assert(gate.getDouble(2) > 0.0 && gate.getDouble(2) < 100.0)
  }

  test("q_dq_l_diversity matches the distinct-sensitive mirror; non-vacuous at bench scale") {
    def r6(x: Double): Double = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def cents(v: Double): Long = BigDecimal(v * 100)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val out = graft.queries.Diag.queries("q_dq_l_diversity")(spark, sf)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6),
        r.getLong(7), r.getLong(8))).toMap
    val rows = Tables(spark, sf, "customer")
      .select("c_nationkey", "c_acctbal", "c_mktsegment").collect()
      .map(r => (r.getInt(0),
        math.floor(cents(r.getDouble(1)) / 25000.0).toLong, r.getString(2)))
    val expect = rows.groupBy(x => (x._1, x._2)).toSeq
      .map { case (k, v) =>
        (k._1, v.length.toLong, v.map(_._3).distinct.length.toLong) }
      .groupBy(_._1).map { case (nat, cls) =>
        val exposed = cls.filter(_._3 < 3).map(_._2).sum
        val total = cls.map(_._2).sum
        nat -> (total, cls.size.toLong,
          cls.count(_._3 == 1).toLong, cls.count(_._3 < 3).toLong,
          exposed, r6(exposed * 100.0 / total),
          cls.map(_._3).min, cls.map(_._3).max)
      }
    assert(out === expect)
    // the $250 bracket keeps the risk predicate alive at bench scale
    // (the $2500 QI saturates to l=5 everywhere at sf0.1 — measured);
    // assert the mixed regime there: some exposure, not everything
    val gate = graft.queries.Diag
      .queries("q_dq_l_diversity")(spark, "/root/testdata/sf0.1")
      .agg(org.apache.spark.sql.functions.expr("sum(n_below)"),
        org.apache.spark.sql.functions.expr("sum(n_classes)"),
        org.apache.spark.sql.functions.expr("min(min_l)"),
        org.apache.spark.sql.functions.expr("max(max_l)")).collect()(0)
    assert(gate.getLong(0) > 0 && gate.getLong(0) < gate.getLong(1))
    assert(gate.getLong(2) < 3 && gate.getLong(3) === 5L)
  }
}
