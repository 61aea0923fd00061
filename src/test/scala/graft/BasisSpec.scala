package graft

import graft.queries.Basis

/** Local-mirror and invariant checks for the round-6 Basis batch: the
  * distributed linear-algebra queries are recomputed with plain Scala
  * arithmetic following the SAME grid/rounding discipline (the CUSUM
  * Scala-mirror convention) on the collected sf0.001 fixture, and the
  * report/peel queries are checked against set-arithmetic ground truth.
  * Collecting the base tables is fine HERE (582 docs / 582 vectors /
  * ~1.5k edges) — the queries under test never do. */
class BasisSpec extends SparkSpec {

  private def embeddings(): Array[(Long, Array[Double])] =
    Tables(spark, sf, "embeddings").select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toArray))
      .sortBy(_._1)

  private def r6(x: Double): Double = BigDecimal(x)
    .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q_llm_embed_standardize matches the per-dim moment mirror") {
    val out = Basis.queries("q_llm_embed_standardize")(spark, sf).collect()
    val vecs = embeddings()
    assert(out.length === 20 * 64)
    // mirror: exact integer moments on the 1e-6 grid
    val grid = vecs.map { case (id, v) => (id, v.map(x => math.round(x * 1e6))) }
    val n = grid.length
    (0 until 64).foreach { d =>
      val g = grid.map(_._2(d))
      val sg = g.sum
      val sg2 = g.map(x => x * x).sum
      val mu = sg.toDouble / n
      val sd = math.sqrt(sg2.toDouble / n - mu * mu)
      val byVec = grid.filter(_._1 < 20).map { case (id, gv) =>
        (id, r6((gv(d) - mu) / sd))
      }.toMap
      out.filter(_.getInt(1) == d).foreach { r =>
        assert(r.getDouble(2) === byVec(r.getLong(0)),
          s"z mismatch at vec ${r.getLong(0)} dim $d")
      }
    }
  }

  test("q_llm_pca_power: unit norm, positive lambda, Rayleigh non-decreasing") {
    val out = Basis.queries("q_llm_pca_power")(spark, sf).collect()
      .sortBy(_.getInt(0))
    assert(out.length === 64)
    val v = out.map(_.getDouble(1))
    val lambda = out.head.getDouble(2)
    assert(math.abs(math.sqrt(v.map(x => x * x).sum) - 1.0) < 1e-4,
      "output direction is not unit-norm")
    assert(lambda > 0.0)
    // the power step must not DECREASE the Rayleigh quotient of the
    // second-moment operator: R(v2) ≥ R(v0) (v0 = 1/8·1)
    val xs = embeddings().map(_._2)
    def rayleigh(w: Array[Double]): Double = {
      val num = xs.map(x => math.pow(x.zip(w).map(p => p._1 * p._2).sum, 2)).sum
      num / w.map(x => x * x).sum
    }
    val v0 = Array.fill(64)(0.125)
    assert(rayleigh(v) >= rayleigh(v0) * (1.0 - 1e-9),
      s"power iteration lowered the Rayleigh quotient")
    // and the reported lambda is the operator norm estimate ‖Σxx·v1‖ on
    // the same grid — within rounding of the mirror's second-round norm
    val exact = (1 to 2).foldLeft(v0) { (w, _) =>
      val scores = xs.map(x => r6(x.zip(w).map(p => p._1 * p._2).sum))
      val prod = (0 until 64).map { d =>
        r6(xs.zip(scores).map { case (x, s) =>
          BigDecimal(x(d) * s).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        }.sum.toDouble)
      }.toArray
      val nrm = math.sqrt(prod.map(x => x * x).sum)
      prod.map(x => r6(x / nrm))
    }
    v.zip(exact).zipWithIndex.foreach { case ((a, b), d) =>
      assert(math.abs(a - b) < 2e-6, s"v[$d]: query $a vs mirror $b")
    }
  }

  test("q_llm_contamination_report matches set-arithmetic ground truth") {
    val out = Basis.queries("q_llm_contamination_report")(spark, sf).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getLong(0) % 97 == 0), "non-bench doc reported")
    assert(out.forall(r => r.getLong(2) >= 0 && r.getLong(2) <= r.getLong(1)))
    // the report must be non-vacuous in BOTH directions on this corpus:
    // some bench doc overlaps, some doesn't
    assert(out.exists(_.getLong(2) > 0) && out.exists(r => r.getLong(2) < r.getLong(1)))
    val docs = Tables(spark, sf, "documents").select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").toSeq))
    def grams(tk: Seq[String]): Set[String] =
      if (tk.length < 5) Set.empty
      else tk.sliding(5).map(_.mkString(" ")).toSet
    val train = docs.filter(_._1 % 97 != 0).flatMap(d => grams(d._2)).toSet
    out.foreach { r =>
      val g = grams(docs.find(_._1 == r.getLong(0)).get._2)
      assert(r.getLong(1) === g.size.toLong, s"n_grams for doc ${r.getLong(0)}")
      assert(r.getLong(2) === g.count(train.contains).toLong,
        s"n_hit for doc ${r.getLong(0)}")
    }
  }

  test("q_llm_mmr_rerank matches the greedy MMR mirror; picks are distinct") {
    val out = Basis.queries("q_llm_mmr_rerank")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val byQ = out.groupBy(_._1)
    assert(byQ.nonEmpty && byQ.values.forall(_.length == 5))
    byQ.values.foreach(v =>
      assert(v.map(_._3).distinct.length == 5, "duplicate pick"))
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val vecs = embeddings().toMap
    def dot(a: Array[Double], b: Array[Double]) =
      r6(a.zip(b).map(p => p._1 * p._2).sum)
    // candidate pull mirrors the PROBED semantics: each query's candidate
    // set is the vectors assigned to its 5 probed cells (the quantizer's
    // own geometry is independently oracled via q_llm_knn_graph_trained);
    // the greedy selection below stays a pure-Scala mirror
    val (probeF, candF) = graft.queries.Learn.trainedProbeFrames(spark, sf, 16, 5)
    val probed = probeF.select("qid", "probe").collect()
      .groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getInt(1)).toSet }
    val cellOf = candF.select("cid2", "ccell").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    byQ.foreach { case (qid, rows) =>
      val qe = vecs(qid)
      val cands = vecs.toSeq
        .filter { case (id, _) => id != qid && probed(qid).contains(cellOf(id)) }
        .map { case (id, v) => (id, dot(qe, v)) }
        .sortBy { case (id, s) => (-s, id) }.take(20)
      var sel = List(cands.head)
      (2 to 5).foreach { _ =>
        val pick = cands.filterNot(c => sel.exists(_._1 == c._1))
          .map { case (id, s) =>
            val mp = sel.map(x => dot(vecs(id), vecs(x._1))).max
            (id, r6(0.7 * s - 0.3 * mp))
          }.minBy { case (id, m) => (-m, id) }
        sel = sel :+ pick
      }
      rows.sortBy(_._2).zip(sel).foreach { case ((_, r, cid, sc), (eid, es)) =>
        assert(cid === eid, s"q$qid round $r picked $cid, mirror $eid")
        assert(math.abs(sc - es) < 2e-6, s"q$qid round $r score")
      }
    }
  }

  test("q_graph_hits matches the two-round mirror; scores ranked and bounded") {
    val out = Basis.queries("q_graph_hits")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(out.nonEmpty && out.length <= 20)
    assert(out.forall { case (_, a) => a > 0.0 && a <= 1.0 })
    assert(out.sliding(2).forall {
      case Array((n1, a1), (n2, a2)) => a1 > a2 || (a1 == a2 && n1 < n2)
      case _ => true
    }, "authorities must come out in (score desc, node) order")
    // mirror: the same two HITS rounds in Scala with the same rounding
    val oi = Tables(spark, sf, "orders")
      .join(Tables(spark, sf, "lineitem"),
        org.apache.spark.sql.functions.col("o_orderkey") ===
          org.apache.spark.sql.functions.col("l_orderkey"))
      .select("o_custkey", "l_suppkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1) + 1000000L))
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def d6(xs: Iterable[Double]) = xs.map(BigDecimal(_)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
    val deg = oi.groupBy(_._2).map { case (p, v) => p -> v.length.toLong }
    val n1 = math.sqrt(deg.values.map(d => (d * d).toDouble).sum)
    val a1 = deg.map { case (p, dg) => p -> r6(dg / n1) }
    val h1r = oi.groupBy(_._1).map { case (c, v) =>
      c -> r6(d6(v.map(e => a1(e._2)))) }
    val n2 = math.sqrt(h1r.values.map(h => h * h).sum)
    val h1 = h1r.map { case (c, h) => c -> r6(h / n2) }
    val a2r = oi.groupBy(_._2).map { case (p, v) =>
      p -> r6(d6(v.map(e => h1(e._1)))) }
    val n3 = math.sqrt(a2r.values.map(a => a * a).sum)
    val expect = a2r.map { case (p, a) => (p, r6(a / n3)) }.toSeq
      .sortBy { case (p, a) => (-a, p) }.take(20)
    out.zip(expect).foreach { case ((gn, ga), (en, ea)) =>
      assert(gn === en && math.abs(ga - ea) < 2e-6, s"node $gn: $ga vs $ea")
    }
  }

  test("q_graph_kcore_peel matches the set-arithmetic peel and is non-vacuous") {
    val out = Basis.queries("q_graph_kcore_peel")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.nonEmpty)
    val e0 = graft.queries.U.coPurchaseEdges(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def peel(e: Array[(Long, Long)]): Array[(Long, Long)] = {
      val deg = e.groupBy(_._1).map { case (k, v) => k -> v.length }
      val surv = deg.filter(_._2 >= 8).keySet
      e.filter(p => surv(p._1) && surv(p._2))
    }
    val e3 = peel(peel(peel(e0)))
    val expect = e3.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    assert(out === expect)
    // the ≥k filter must actually PEEL at this scale — a k below every
    // degree would leave the round structure untested (the vacuity rule)
    val all = e0.map(_._1).toSet
    assert(out.keySet.size < all.size,
      s"k=8 peeled nothing at sf0.001 (${all.size} nodes)")
  }
}
