package graft

import org.apache.spark.sql.functions._
import graft.queries.{Audit, Insights, U}

/** Invariant + local-mirror tests for the round-8 dataset-audit batch
  * (SURVEY §2.36). The driver's DuckDB gate proves hash equality; these
  * prove the SEMANTICS — recomputed from raw rows in plain Scala where
  * cheap — and the domain-completeness rule (full pair/bin/lang
  * domains, explicit zeros). */
class AuditSpec extends SparkSpec {

  test("q_llm_source_overlap: full pair matrix, bounded containment, mirrored pair") {
    val out = Audit.queries("q_llm_source_overlap")(spark, sf).collect()
    val srcs = Tables(spark, sf, "documents")
      .select("source").distinct().count().toInt
    assert(out.length === srcs * (srcs - 1) / 2, "full a<b pair matrix")
    out.foreach { r =>
      assert(r.getString(0) < r.getString(1), "a < b ordering")
      val (na, nb, sh, c) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(sh >= 0 && sh <= math.min(na, nb), "shared bounded by sides")
      assert(c >= 0.0 && c <= 1.0, "containment in [0,1]")
    }
    // non-vacuous: the shingle grain must actually cross sources
    assert(out.exists(_.getLong(4) > 0), "identically-zero overlap matrix")
    // mirror the single largest pair from raw text
    val top = out.maxBy(r => (r.getLong(4), r.getString(0)))
    def gramSet(src: String): Set[String] =
      Tables(spark, sf, "documents").where(col("source") === src)
        .select("text").collect().map(_.getString(0))
        .flatMap { t =>
          val tk = t.split(" ")
          (0 to tk.length - 5).map(i => tk.slice(i, i + 5).mkString(" "))
        }.toSet
    val (ga, gb) = (gramSet(top.getString(0)), gramSet(top.getString(1)))
    assert(top.getLong(2) === ga.size && top.getLong(3) === gb.size)
    assert(top.getLong(4) === ga.intersect(gb).size, "shared-gram mirror")
  }

  test("q_llm_js_divergence: full pair matrix, 0 ≤ JS ≤ ln 2, non-degenerate spread") {
    val out = Audit.queries("q_llm_js_divergence")(spark, sf).collect()
    val srcs = Tables(spark, sf, "documents")
      .select("source").distinct().count().toInt
    assert(out.length === srcs * (srcs - 1) / 2)
    val js = out.map(_.getDouble(2))
    assert(js.forall(v => v >= 0.0 && v <= math.log(2.0) + 1e-9),
      "JS out of its [0, ln 2] range")
    assert(js.distinct.length > 1, "constant JS across all pairs is vacuous")
  }

  test("q_dq_t_closeness: QI-domain output, EMD in [0,1], local mirror per class") {
    val out = Audit.queries("q_dq_t_closeness")(spark, sf).collect()
      .map(r => ((r.getString(0), r.getInt(1)), (r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out.nonEmpty && out.values.forall { case (_, e) =>
      e >= 0.0 && e <= 1.0 })
    // full local mirror: same gridBin, exact cum diffs
    val rows = Tables(spark, sf, "customer")
      .select(col("c_mktsegment"), col("c_nationkey"),
        expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("bal"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val lo = rows.map(_._3).min; val hi = rows.map(_._3).max
    def bin(v: Long): Long =
      if (hi <= lo) 9L
      else math.min(9L,
        math.floor((v - lo).toDouble / ((hi - lo).toDouble / 10)).toLong)
    val ng = rows.length.toLong
    val gcum = (0L to 9L).map { b =>
      b -> rows.count(r => bin(r._3) <= b).toLong }.toMap
    rows.groupBy(r => (r._1, r._2)).foreach { case (k, rs) =>
      val nc = rs.length.toLong
      val num = (0L to 9L).map { b =>
        math.abs(rs.count(r => bin(r._3) <= b).toLong * ng - gcum(b) * nc)
      }.sum
      val emd = BigDecimal(num.toDouble / (nc.toDouble * ng * 9))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(out(k)._1 === nc && math.abs(out(k)._2 - emd) < 1e-12,
        s"class $k EMD mirror")
    }
    assert(out.size === rows.groupBy(r => (r._1, r._2)).size)
  }

  test("q_dq_cramers_v: mirrored χ² with empty-cell terms, V in [0,1]") {
    val r = Audit.queries("q_dq_cramers_v")(spark, sf).collect()
    assert(r.length === 1)
    val row = r(0)
    val (n, nr, nc, chi2, dof, v) = (row.getLong(0), row.getLong(1),
      row.getLong(2), row.getDouble(3), row.getLong(4), row.getDouble(5))
    assert(dof === (nr - 1) * (nc - 1))
    assert(v >= 0.0 && v <= 1.0)
    // local mirror over the collected contingency, INCLUDING empty cells
    val oc = Tables(spark, sf, "orders")
      .join(Tables(spark, sf, "customer"),
        col("o_custkey") === col("c_custkey"))
      .select("c_mktsegment", "o_orderpriority").collect()
      .map(r2 => (r2.getString(0), r2.getString(1)))
    assert(n === oc.length.toLong)
    val cells = oc.groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    val rs = oc.groupBy(_._1).map { case (k, xs) => k -> xs.length.toLong }
    val cs = oc.groupBy(_._2).map { case (k, xs) => k -> xs.length.toLong }
    def r9(x: Double) = BigDecimal(x)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val terms = for (a <- rs.keys.toSeq; b <- cs.keys.toSeq) yield {
      val o = cells.getOrElse((a, b), 0L)
      val d = BigDecimal(o) * n - BigDecimal(rs(a)) * cs(b)
      r9((d * d).toDouble / (n.toDouble * rs(a) * cs(b)))
    }
    val chi2m = BigDecimal(terms.map(BigDecimal(_)).sum.toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(chi2 - chi2m) < 1e-9, s"chi2 $chi2 vs mirror $chi2m")
  }

  test("q_ts_pacf: one row, pacf1 ≡ rho1, rho1 mirrored from the hourly series") {
    val r = Audit.queries("q_ts_pacf")(spark, sf).collect()
    assert(r.length === 1)
    val row = r(0)
    assert(row.getDouble(1) === row.getDouble(4), "pacf at lag 1 IS rho1")
    // mirror rho1 from the exact hourly series, ZERO-FILLED over the
    // span (the declared value semantics: an empty hour is 0 revenue)
    val raw = Tables(spark, sf, "events")
      .where(col("event_type") === "purchase")
      .groupBy((col("ts").cast("long") - pmod(col("ts").cast("long"),
        lit(3600L))).as("hr"))
      .agg(U.dsum(col("value")).as("v"))
      .select(col("hr"), round(col("v"), 6).as("x"))
      .collect().map(rr => (rr.getLong(0), rr.getDouble(1))).toMap
    val xs = (raw.keys.min to raw.keys.max by 3600L)
      .map(h => h -> raw.getOrElse(h, 0.0)).toMap
    val n = xs.size
    val mu = xs.values.map(BigDecimal(_)).sum.toDouble / n
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def ck(k: Int): Double = xs.toSeq.flatMap { case (h, x) =>
      xs.get(h + k * 3600L).map(y => BigDecimal(r6((x - mu) * (y - mu))))
    }.sum.toDouble / n
    val rho1 = BigDecimal(ck(1) / ck(0))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(row.getDouble(1) - rho1) < 1e-9, "rho1 mirror")
    assert(row.getLong(0) === n.toLong)
  }

  test("q_ts_hurst: full m domain, H constant and in (0,1), chunks honest") {
    val out = Audit.queries("q_ts_hurst")(spark, sf).collect()
    assert(out.map(_.getInt(0)).toSeq === Seq(8, 16, 32, 64),
      "full m domain must report, empty sizes included")
    val hs = out.map(r => r.getDouble(5)).distinct
    assert(hs.length === 1, "H must be one constant across rows")
    assert(hs.head > 0.0 && hs.head < 1.0, s"implausible Hurst ${hs.head}")
    // avg R/S grows with m (long-memory monotonicity on surviving sizes)
    val rss = out.filter(_.getLong(1) > 0).map(_.getDouble(2))
    assert(rss.zip(rss.tail).forall { case (a, b) => b > a },
      "R/S must grow with window size")
  }

  test("q_graph_clustering_coeff: full bin domain; histogram mirrors the node frame") {
    val out = Insights.queries("q_graph_clustering_coeff")(spark, sf).collect()
    assert(out.map(_.getLong(0)).toSeq === (0L until 10L))
    val nodes = Insights.nodeTriangles(spark, sf).collect()
      .map(r => (r.getLong(1), r.getLong(2))).filter(_._1 >= 2)
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ccs = nodes.map { case (deg, tri) =>
      r6(2.0 * tri / (deg.toDouble * (deg - 1))) }
    val byBin = ccs.groupBy(c => math.min(9L, math.floor(c * 10).toLong))
    out.foreach { r =>
      val (b, n) = (r.getLong(0), r.getLong(1))
      assert(n === byBin.getOrElse(b, Array.empty[Double]).length.toLong,
        s"bin $b count")
    }
    assert(out.map(_.getLong(1)).sum === nodes.length.toLong)
    // triangles live somewhere: at least one node with cc > 0
    assert(ccs.exists(_ > 0.0), "vacuous clustering coefficients")
  }

  test("q_graph_assortativity: mirrored Pearson r over the co-purchase edges") {
    val r = Audit.queries("q_graph_assortativity")(spark, sf).collect()
    assert(r.length === 1)
    val (n, a) = (r(0).getLong(0), r(0).getDouble(1))
    assert(a >= -1.0 && a <= 1.0)
    val pairs = Tables(spark, sf, "orders")
      .join(Tables(spark, sf, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"),
        (col("l_suppkey") + U.supplierIdOffset).as("s"))
      .distinct().collect().map(rr => (rr.getLong(0), rr.getLong(1)))
    val edges = pairs.map(p => (p._1, p._2)) ++ pairs.map(p => (p._2, p._1))
    assert(n === edges.length.toLong)
    val deg = edges.groupBy(_._1).map { case (k, xs) => k -> xs.length.toLong }
    val ds = edges.map { case (u, v) => (deg(u), deg(v)) }
    val sx = ds.map(_._1).sum.toDouble; val sy = ds.map(_._2).sum.toDouble
    val sxx = ds.map(d => BigDecimal(d._1) * d._1).sum.toDouble
    val syy = ds.map(d => BigDecimal(d._2) * d._2).sum.toDouble
    val sxy = ds.map(d => BigDecimal(d._1) * d._2).sum.toDouble
    val vx = n * sxx - sx * sx; val vy = n * syy - sy * sy
    val rm = BigDecimal((n * sxy - sx * sy) / math.sqrt(vx * vy))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(a - rm) < 1e-9, s"assortativity $a vs mirror $rm")
  }

  test("q_agg_frequency_profile: moment inequalities hold per event type") {
    val out = Audit.queries("q_agg_frequency_profile")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (f0, f1, f2) = (r.getLong(1), r.getLong(2), r.getLong(3))
      val (si, h) = (r.getDouble(4), r.getDouble(5))
      // Cauchy–Schwarz: F2·F0 ≥ F1² ⇔ surprise index ≥ 1
      assert(f2 * f0 >= f1 * f1 && si >= 1.0 - 1e-9, "surprise below 1")
      // entropy of F0 support is at most ln(F0), at least 0
      assert(h >= -1e-9 && h <= math.log(f0.toDouble) + 1e-9,
        s"entropy $h out of [0, ln F0]")
    }
    // F1 recounts the raw stream
    val totals = Tables(spark, sf, "events").groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach(r => assert(r.getLong(2) === totals(r.getString(0))))
  }

  test("q_llm_dedup_audit: removal counts reconcile with the CC labels; full domain") {
    val out = Audit.queries("q_llm_dedup_audit")(spark, sf).collect()
    val srcs = Tables(spark, sf, "documents")
      .select("source").distinct().count()
    assert(out.length === srcs.toInt * 5, "full source × bin domain")
    val removed = graft.queries.Llm.ccLabels(spark, sf)
      .where(col("doc_id") =!= col("component_id")).count()
    assert(out.map(_.getLong(3)).sum === removed, "total removals reconcile")
    assert(out.map(_.getLong(2)).sum ===
      Tables(spark, sf, "documents").count(), "doc counts conserve")
    out.foreach { r =>
      assert(r.getLong(3) <= r.getLong(2), "removed bounded by docs")
    }
  }

  test("q_llm_heldout_ppl: full-mirror cross-entropy on one language") {
    val out = Audit.queries("q_llm_heldout_ppl")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    val langs = Tables(spark, sf, "documents")
      .select("lang").distinct().count()
    assert(out.size === langs.toInt, "full lang domain")
    out.values.foreach { case (n, h, ppl) =>
      assert(n > 0 && h > 0.0 && ppl >= 1.0, "degenerate perplexity row")
      assert(math.abs(ppl - BigDecimal(math.exp(h))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12,
        "ppl must be exp(h_nats) on the declared grid")
    }
    // full local mirror for 'de': same split, same add-1 bigram model
    def md5hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def side(id: Long): Long =
      java.lang.Long.parseLong(md5hex("cov" + id).substring(0, 13), 16) % 5
    val docs = Tables(spark, sf, "documents").where(col("lang") === "de")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ")))
    val train = docs.filter(d => side(d._1) < 4)
    val held = docs.filter(d => side(d._1) == 4)
    def bigrams(tk: Array[String]) = tk.sliding(2).filter(_.length == 2)
      .map(a => (a(0), a(1))).toSeq
    val c12 = train.flatMap(d => bigrams(d._2))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val c1 = c12.groupBy(_._1._1).map { case (k, v) => k -> v.values.sum }
    val v = train.flatMap(_._2).distinct.length.toLong
    def r9(x: Double) = BigDecimal(x)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val lps = held.flatMap(d => bigrams(d._2)).map { b =>
      BigDecimal(r9(math.log((c12.getOrElse(b, 0L) + 1).toDouble /
        (c1.getOrElse(b._1, 0L) + v))))
    }
    val hM = r9(-(lps.sum.toDouble) / lps.length)
    assert(out("de")._1 === lps.length.toLong, "held bigram count mirror")
    assert(math.abs(out("de")._2 - hM) < 1e-9, s"H mirror: ${out("de")._2} vs $hM")
  }

  test("q_ts_periodogram: full period domain, one peak, nonnegative power") {
    val out = Audit.queries("q_ts_periodogram")(spark, sf).collect()
    assert(out.map(_.getInt(0)).toSeq === Seq(6, 12, 24, 168))
    assert(out.forall(_.getDouble(2) >= 0.0))
    assert(out.count(_.getBoolean(3)) === 1, "exactly one peak flag")
    val peak = out.filter(_.getBoolean(3)).head
    assert(peak.getDouble(2) === out.map(_.getDouble(2)).max)
  }

  test("q_wl_disjunctive_revenue: bands mirror a local recount of the OR predicate") {
    val out = Audit.queries("q_wl_disjunctive_revenue")(spark, sf).collect()
    assert(out.map(_.getInt(0)).toSeq === Seq(1, 2, 3), "full band domain")
    val joined = Tables(spark, sf, "lineitem")
      .join(Tables(spark, sf, "part"), col("l_partkey") === col("p_partkey"))
      .select("p_brand", "p_size", "l_quantity").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
    def band(b: String, s: Int, q: Double): Option[Int] =
      if (Set("Brand#1", "Brand#2", "Brand#3")(b) && s >= 1 && s <= 15 &&
        q >= 1 && q <= 15) Some(1)
      else if (Set("Brand#11", "Brand#12", "Brand#13")(b) && s <= 25 &&
        q >= 10 && q <= 30) Some(2)
      else if (Set("Brand#21", "Brand#22", "Brand#23")(b) && s <= 35 &&
        q >= 25 && q <= 50) Some(3)
      else None
    val counts = joined.flatMap(j => band(j._1, j._2, j._3))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    out.foreach { r =>
      assert(r.getLong(1) === counts.getOrElse(r.getInt(0), 0L),
        s"band ${r.getInt(0)} count")
      assert(r.getDouble(2) >= 0.0)
    }
  }

  test("q_dq_simpson: pooled row consistent; slopes mirror exact moments") {
    val out = Audit.queries("q_dq_simpson")(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4)))
      .toMap
    val all = out("ALL")
    assert(all._2 === all._3 && !all._4, "ALL row must match pooled, no flip")
    out.foreach { case (_, (_, slope, pooled, flip)) =>
      assert(pooled === all._2, "one pooled slope everywhere")
      assert(flip === (math.signum(slope) != math.signum(pooled)))
    }
    // local mirror of one group's slope from exact moments
    val rows = Tables(spark, sf, "lineitem")
      .select("l_returnflag", "l_quantity", "l_extendedprice").collect()
      .map(r => (r.getString(0), math.round(r.getDouble(1)),
        math.round(r.getDouble(2) * 100)))
    def slopeOf(xs: Array[(String, Long, Long)]): Double = {
      val n = xs.length.toLong
      val sq = xs.map(_._2).sum; val sp = xs.map(_._3).sum
      val sqq = xs.map(x => x._2 * x._2).sum
      val spq = xs.map(x => BigDecimal(x._2) * x._3).sum.toDouble
      BigDecimal((n * spq - sq.toDouble * sp) /
        (n * sqq.toDouble - sq.toDouble * sq))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    rows.groupBy(_._1).foreach { case (g, xs) =>
      assert(math.abs(out(g)._2 - slopeOf(xs)) < 1e-9, s"group $g slope")
    }
    assert(math.abs(all._2 - slopeOf(rows)) < 1e-9, "pooled slope")
  }

  test("q_llm_class_rebalance: every class downsampled to the min; kept set mirrored") {
    val out = Audit.queries("q_llm_class_rebalance")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    def md5hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def hk(id: Long): Long =
      java.lang.Long.parseLong(md5hex("bal" + id).substring(0, 13), 16)
    val docs = Tables(spark, sf, "documents").select("doc_id", "lang")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val m = docs.groupBy(_._2).values.map(_.size).min.toLong
    docs.groupBy(_._2).foreach { case (lang, ds) =>
      val kept = ds.map(_._1).sortBy(id => (hk(id), id)).take(m.toInt)
      val (nb, nk, ks) = out(lang)
      assert(nb === ds.length.toLong && nk === m, s"$lang sizes")
      assert(ks === kept.sum, s"$lang kept-set identity diverged")
    }
  }

  test("q_llm_ngram_coverage: covered ≤ held, full lang domain, split is 80/20-ish") {
    val out = Audit.queries("q_llm_ngram_coverage")(spark, sf).collect()
    val langs = Tables(spark, sf, "documents")
      .select("lang").distinct().count()
    assert(out.length === langs.toInt, "full lang domain")
    out.foreach { r =>
      val (h, c) = (r.getLong(1), r.getLong(2))
      assert(c <= h, "covered cannot exceed held")
      if (h > 0) {
        val pct = r.getDouble(3)
        assert(pct >= 0.0 && pct <= 100.0)
      }
    }
    // non-vacuous: some held-out mass exists and coverage is not all-100
    assert(out.map(_.getLong(1)).sum > 0, "empty held-out split")
  }
}
