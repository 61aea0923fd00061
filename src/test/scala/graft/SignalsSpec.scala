package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Functional invariants for the round-4 signals batch (queries/Signals)
  * beyond the DuckDB hash compare: CMS over/under bounds, AUC vs a
  * brute-force pair count, BM25 result soundness, Markov row-stochastic
  * shape, changelog-apply row accounting, covariance vs a direct
  * recompute, and the batch's plan guards (no global window, heap top-k,
  * broadcast probe joins). */
class SignalsSpec extends SparkSpec {

  test("q_agg_countmin: est >= exact always, overshoot within the CMS bound") {
    val out = SparkEntry.queries("q_agg_countmin")(spark, sf).collect()
    assert(out.length == 10)
    val nTokens = Tables(spark, sf, "documents")
      .select(explode(queries.U.textTokens).as("t")).count()
    out.foreach { r =>
      val (exact, est) = (r.getLong(1), r.getLong(2))
      assert(est >= exact, s"CMS underestimated ${r.getString(0)}")
      // ε = e/w ≈ 0.0425: the classic bound is probabilistic over hash
      // draws. The md5 hashes are fixed, but the DRIVER regenerates the
      // corpus between rounds, so a pathological regeneration could
      // collide heavy terms in one bucket without any code bug — allow
      // 2× headroom so only broken sketch geometry fails, not draw luck.
      assert(est - exact <= (2.0 * math.E / 64 * nTokens).toLong,
        s"CMS overshoot beyond 2eN for ${r.getString(0)}: $est vs $exact")
    }
  }

  test("q_agg_auc_rank equals the brute-force midrank pair count") {
    val rows = Tables(spark, sf, "events")
      .select(round(col("value") * 100).cast("long").as("c"),
        (col("event_type") === "purchase").cast("int").as("p"))
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    val pos = rows.filter(_._2 == 1).map(_._1)
    val neg = rows.filter(_._2 == 0).map(_._1)
    // midrank formulation, O(n log n): AUC = (ΣR⁺ − P(P+1)/2)/(P·N) with
    // tied scores taking the average rank — identical to the pairwise
    // wins + ties/2 count, without the O(P·N) loop that would OOM if
    // this spec ever ran against the 10× correctness-scale data.
    val midrank = rows.map(_._1).sorted.zipWithIndex
      .groupBy(_._1).map { case (v, g) =>
        v -> g.map(_._2 + 1L).sum.toDouble / g.length
      }
    val rPos = pos.map(midrank).sum
    val expected = (rPos - pos.length.toDouble * (pos.length + 1) / 2) /
      (pos.length.toDouble * neg.length)
    val r = SparkEntry.queries("q_agg_auc_rank")(spark, sf).collect().head
    assert(r.getLong(0) == pos.length && r.getLong(1) == neg.length)
    val auc = r.getDouble(3)
    assert(math.abs(auc - expected) < 1e-9, s"AUC $auc != $expected")
    assert(auc >= 0.0 && auc <= 1.0)
  }

  test("q_llm_bm25: top docs contain query terms, scores nonincreasing") {
    val out = SparkEntry.queries("q_llm_bm25")(spark, sf).collect()
    assert(out.nonEmpty && out.length <= 20)
    val scores = out.map(_.getDouble(2))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    val terms = Set("spark", "hash", "join")
    val texts = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach { r =>
      val toks = texts(r.getLong(0)).split(" ").toSet
      assert((toks & terms).nonEmpty, s"doc ${r.getLong(0)} matches no term")
      assert(r.getLong(1) == (toks & terms).size)
    }
  }

  test("q_llm_retrieval_ndcg equals a brute-force NDCG/MRR recompute") {
    val out = SparkEntry.queries("q_llm_retrieval_ndcg")(spark, sf).collect()
    assert(out.length == 10)
    val qts = Set("spark", "hash", "join")
    // ground-truth relevance straight from the raw corpus
    val rel = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> (r.getString(1).split(" ").toSet & qts).size)
      .filter(_._2 > 0).toMap
    // the declared ranking the eval grades (shared frame ⇒ must agree)
    val ranked = SparkEntry.queries("q_llm_bm25")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val r9 = (x: Double) =>
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    def contrib(g: Int, rank: Int): Double =
      r9(((1 << g) - 1).toDouble /
        r9(math.log(rank + 1.0) / math.log(2.0)))
    val idealRel = rel.toSeq.sortBy { case (id, g) => (-g, id) }
      .take(10).map(_._2)
    var (dcg, idcg) = (BigDecimal(0), BigDecimal(0))
    out.zipWithIndex.foreach { case (row, i) =>
      val rank = i + 1
      assert(row.getLong(0) == rank)
      val docId = row.getLong(1)
      assert(row.getLong(2) == rel(docId), s"rel drift for doc $docId")
      assert(row.getLong(2) == ranked(i)._2,
        "graded list diverges from the declared BM25 ranking")
      assert(row.getLong(3) == idealRel(i), s"ideal_rel drift at rank $rank")
      dcg += BigDecimal(contrib(rel(docId), rank))
      idcg += BigDecimal(contrib(idealRel(i), rank))
      assert(math.abs(row.getDouble(4) - dcg.toDouble) < 1e-9)
      assert(math.abs(row.getDouble(5) - idcg.toDouble) < 1e-9)
      val ndcg = r9(dcg.toDouble / idcg.toDouble)
      assert(math.abs(row.getDouble(6) - ndcg) < 1e-9)
      assert(row.getDouble(6) > 0.0 && row.getDouble(6) <= 1.0)
    }
    val firstFull = ranked.zipWithIndex
      .collectFirst { case ((_, nt), i) if nt == 3L => i + 1 }
    val mrr = firstFull.map(r => r9(1.0 / r)).getOrElse(0.0)
    assert(out.map(_.getDouble(7)).distinct.length == 1)
    assert(math.abs(out.head.getDouble(7) - mrr) < 1e-9)
  }

  test("q_ts_markov is row-stochastic and conserves transition count") {
    val out = SparkEntry.queries("q_ts_markov")(spark, sf).collect()
    val byFrom = out.groupBy(_.getString(0))
    byFrom.foreach { case (f, rs) =>
      val psum = rs.map(_.getDouble(3)).sum
      assert(math.abs(psum - 1.0) < 1e-6, s"row $f sums to $psum")
    }
    val ev = Tables(spark, sf, "events")
    val nEvents = ev.count()
    val nUsers = ev.select("user_id").distinct().count()
    assert(out.map(_.getLong(2)).sum == nEvents - nUsers,
      "every non-first event contributes exactly one transition")
  }

  test("q_cdc_apply_log: deletes drop, updates shift, inserts land") {
    val snap = Tables(spark, sf, "orders")
      .select(col("o_orderkey").as("k"), col("o_totalprice").as("price"))
    val nOrig = snap.count()
    val nDel = snap.where(pmod(col("k"), lit(17L)) === 3).count()
    val nIns = snap.where(pmod(col("k"), lit(23L)) === 7).count()
    val maxK = snap.agg(max("k")).collect().head.getLong(0)
    val out = SparkEntry.queries("q_cdc_apply_log")(spark, sf)
    assert(out.count() == nOrig - nDel + nIns)
    // an updated, non-deleted key carries exactly old + 10
    val updated = out.join(snap, out("o_orderkey") === snap("k"))
      .where(pmod(col("k"), lit(5L)) === 0 && pmod(col("k"), lit(17L)) =!= 3)
    assert(updated.where(col("o_totalprice") =!= col("price") + 10.0).count() == 0)
    // deleted keys are absent even when also updated (LWW: D has seq 2);
    // inserts live strictly above the snapshot's max key, and all of
    // them arrived
    assert(out.where(pmod(col("o_orderkey"), lit(17L)) === 3
      && col("o_orderkey") <= maxK).count() == 0)
    assert(out.where(col("o_orderkey") > maxK).count() == nIns)
  }

  test("q_agg_covariance matches var_pop/covar_pop on the 1e-9 grid") {
    val out = SparkEntry.queries("q_agg_covariance")(spark, sf).collect()
    assert(out.length == 36)
    val direct = Tables(spark, sf, "embeddings")
      .select(covar_pop(expr("CAST(embedding[2] AS DOUBLE)"),
        expr("CAST(embedding[5] AS DOUBLE)")).as("c"),
        var_pop(expr("CAST(embedding[3] AS DOUBLE)")).as("v"))
      .collect().head
    val c25 = out.find(r => r.getInt(0) == 2 && r.getInt(1) == 5).get.getDouble(2)
    val v33 = out.find(r => r.getInt(0) == 3 && r.getInt(1) == 3).get.getDouble(2)
    assert(math.abs(c25 - direct.getDouble(0)) < 1e-6)
    assert(math.abs(v33 - direct.getDouble(1)) < 1e-6)
    out.filter(r => r.getInt(0) == r.getInt(1))
      .foreach(r => assert(r.getDouble(2) >= 0.0, s"negative variance: $r"))
  }

  test("q_graph_label_prop: labels are node ids, bipartite sides converge") {
    val out = SparkEntry.queries("q_graph_label_prop")(spark, sf).collect()
    val ids = out.map(_.getLong(0)).toSet
    out.foreach(r => assert(ids.contains(r.getLong(1)),
      s"label ${r.getLong(1)} is not a node id"))
    // 3 rounds from self-labels: odd rounds adopt the other side's
    // majority, so labels concentrate — strictly fewer distinct labels
    // than nodes (the graph is connected enough in the fixture)
    assert(out.map(_.getLong(1)).distinct.length < out.length)
  }

  test("q_graph_modularity: bounded, conserves edge mass, beats random") {
    val r = SparkEntry.queries("q_graph_modularity")(spark, sf).collect().head
    val (nc, e2, q) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    assert(q >= -0.5 && q <= 1.0, s"modularity $q out of range")
    assert(e2 == Tables(spark, sf, "orders")
      .join(Tables(spark, sf, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .select("o_custkey", "l_suppkey").distinct().count() * 2,
      "directed edge mass != 2x distinct co-purchase incidence")
    val labels = SparkEntry.queries("q_graph_label_prop")(spark, sf).collect()
    assert(nc == labels.map(_.getLong(1)).distinct.length,
      "community count disagrees with the declared label frame")
    // the semi-synchronous update must at least kill the bipartite
    // oscillation (fully synchronous LPA measures exactly −0.5 here:
    // the two sides swap labels each round, every edge cross-community);
    // on this dense co-purchase fixture real structure is absent, so
    // LPA correctly converges to few communities with Q ≥ 0
    assert(q >= 0.0, s"bipartite oscillation resurfaced: $q")
  }

  test("q_graph_louvain: matches an independent Scala replay; improves modularity") {
    val out = SparkEntry.queries("q_graph_louvain")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // full 4-round semi-synchronous local-move replay from raw edges
    val edges = Tables(spark, sf, "orders")
      .join(Tables(spark, sf, "lineitem"), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"),
        (col("l_suppkey") + queries.U.supplierIdOffset).as("s"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val e = edges.flatMap { case (c, s) => Seq((c, s), (s, c)) }
    val deg = e.groupBy(_._1).map { case (n, g) => n -> g.length.toLong }
    val m2 = e.length.toLong
    var lbl = deg.keys.map(n => n -> n).toMap
    for (k <- 1 to 4) {
      val side = (n: Long) =>
        if (k % 2 == 1) n >= queries.U.supplierIdOffset
        else n < queries.U.supplierIdOffset
      val tot = lbl.toSeq.groupBy(_._2)
        .map { case (l, g) => l -> g.map(p => deg(p._1)).sum }
      val kic = e.filter(p => side(p._2))
        .groupBy(p => (p._2, lbl(p._1)))
        .map { case ((dst, cl), g) => (dst, cl) -> g.length.toLong }
      val upd = lbl.keys.filter(side).map { i =>
        val kd = deg(i); val cl = lbl(i)
        def gain(c: Long, k2: Long): BigInt =
          BigInt(m2) * k2 - BigInt(kd) *
            (if (c == cl) tot(c) - kd else tot(c))
        val gs = gain(cl, kic.getOrElse((i, cl), 0L))
        val cands = kic.collect { case ((d, c), k2) if d == i && c != cl =>
          (gain(c, k2), c) }
        val best = if (cands.isEmpty) None
          else Some(cands.maxBy { case (g, c) => (g, -c) })
        i -> (best match {
          case Some((g, c)) if g > gs => c
          case _ => cl
        })
      }.toMap
      lbl = lbl.map { case (i, l) => i -> upd.getOrElse(i, l) }
    }
    assert(out == lbl, "declared Louvain diverges from the Scala replay")
    // modularity: the greedy objective must land a real partition that
    // beats both random (Q > 0) and the label-propagation communities
    // it shares the graph with (LPA has no objective; Louvain climbs Q)
    def q(labels: Map[Long, Long]): Double = {
      val within = e.count { case (a, b) => labels(a) == labels(b) }.toDouble
      val dmass = labels.toSeq.groupBy(_._2)
        .map { case (_, g) => g.map(p => deg(p._1)).sum.toDouble }
      within / m2 - dmass.map(d => (d / m2) * (d / m2)).sum
    }
    val qLouvain = q(lbl)
    val qLpa = q(SparkEntry.queries("q_graph_label_prop")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)
    // the sf0.001 co-purchase graph is small and dense enough that one
    // community IS the greedy optimum (Q = 0, matching LPA) — so the
    // fixture asserts the ordering, and non-vacuity is proved at 10×
    assert(qLouvain >= 0.0, s"Louvain modularity $qLouvain negative")
    assert(qLouvain >= qLpa - 1e-9,
      f"greedy modularity $qLouvain%.4f below LPA's $qLpa%.4f")
    // 10× fixture: real structure exists and the greedy finds it —
    // many communities, strictly positive modularity
    val sf01 = "/root/testdata/sf0.01"
    val out01 = SparkEntry.queries("q_graph_louvain")(spark, sf01).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val e01 = Tables(spark, sf01, "orders")
      .join(Tables(spark, sf01, "lineitem"), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"),
        (col("l_suppkey") + queries.U.supplierIdOffset).as("s"))
      .distinct().collect()
      .flatMap(r => Seq((r.getLong(0), r.getLong(1)), (r.getLong(1), r.getLong(0))))
    val deg01 = e01.groupBy(_._1).map { case (n, g) => n -> g.length.toLong }
    val m01 = e01.length.toDouble
    val within01 = e01.count { case (a, b) => out01(a) == out01(b) } / m01
    val dm01 = out01.toSeq.groupBy(_._2)
      .map { case (_, g) => g.map(p => deg01(p._1)).sum / m01 }
    val q01 = within01 - dm01.map(d => d * d).sum
    val nc01 = out01.values.toSeq.distinct.length
    assert(nc01 > 1 && nc01 < out01.size,
      s"sf0.01 Louvain degenerate: $nc01 communities over ${out01.size} nodes")
    assert(q01 > 0.0, f"sf0.01 Louvain modularity $q01%.4f not positive")
  }

  test("q_graph_louvain_coarse: matches a Scala replay of the weighted level-2 move") {
    val lbl1 = SparkEntry.queries("q_graph_louvain")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val out = SparkEntry.queries("q_graph_louvain_coarse")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val e = Tables(spark, sf, "orders")
      .join(Tables(spark, sf, "lineitem"), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"),
        (col("l_suppkey") + queries.U.supplierIdOffset).as("s"))
      .distinct().collect()
      .flatMap(r => Seq((r.getLong(0), r.getLong(1)), (r.getLong(1), r.getLong(0))))
    // weighted community graph (self-loops carry internal mass)
    val ce = e.groupBy { case (a, b) => (lbl1(a), lbl1(b)) }
      .map { case (k, g) => k -> g.length.toLong }
    val wdeg = ce.toSeq.groupBy(_._1._1)
      .map { case (c, g) => c -> g.map(_._2).sum }
    val m2 = e.length.toLong
    val moved = wdeg.keys.map { i =>
      val cands = ce.collect { case ((cs, cd), w) if cs == i && cd != i =>
        (BigInt(m2) * w - BigInt(wdeg(i)) * wdeg(cd), cd) }
      i -> (if (cands.isEmpty) i
        else {
          val (g, cd) = cands.maxBy { case (g, c) => (g, -c) }
          if (g > 0) cd else i
        })
    }.toMap
    val want = lbl1.map { case (id, l) => id -> moved.getOrElse(l, l) }
    assert(out == want, "level-2 labels diverge from the Scala replay")
    // coarsening only merges: level-2 community count never exceeds
    // level 1, and every level-1 community maps to exactly one target
    assert(out.values.toSeq.distinct.length <= lbl1.values.toSeq.distinct.length)
    // non-vacuity at 10×: the move round actually merges communities
    val sf01 = "/root/testdata/sf0.01"
    val n1 = SparkEntry.queries("q_graph_louvain")(spark, sf01).collect()
      .map(_.getLong(1)).distinct.length
    val n2 = SparkEntry.queries("q_graph_louvain_coarse")(spark, sf01).collect()
      .map(_.getLong(1)).distinct.length
    assert(n2 < n1, s"level 2 merged nothing at 10×: $n1 -> $n2")
  }

  test("q_graph_conductance: brute recompute; bounds; edge-mass conservation") {
    val l2 = SparkEntry.queries("q_graph_louvain_coarse")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val e = Tables(spark, sf, "orders")
      .join(Tables(spark, sf, "lineitem"), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"),
        (col("l_suppkey") + queries.U.supplierIdOffset).as("s"))
      .distinct().collect()
      .flatMap(r => Seq((r.getLong(0), r.getLong(1)), (r.getLong(1), r.getLong(0))))
    val m2 = e.length.toLong
    val out = SparkEntry.queries("q_graph_conductance")(spark, sf).collect()
    assert(out.map(_.getLong(0)).toSet == l2.values.toSet,
      "one row per level-2 community")
    var volSum = 0L
    out.foreach { r =>
      val (c, nn, vol, cut, phi) = (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(nn == l2.count(_._2 == c))
      assert(vol == e.count(p => l2(p._1) == c), s"vol drift for $c")
      assert(cut == e.count(p => l2(p._1) == c && l2(p._2) != c),
        s"cut drift for $c")
      val want = if (cut == 0) 0.0
        else BigDecimal(cut.toDouble / math.min(vol, m2 - vol))
          .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(phi - want) < 1e-9, s"phi drift for $c")
      assert(phi >= 0.0 && phi <= 1.0)
      volSum += vol
    }
    // volumes partition the directed edge mass exactly
    assert(volSum == m2, s"sum of community volumes $volSum != 2m $m2")
    // cuts are symmetric over the both-direction list: total directed
    // cross-edge count is even
    assert(out.map(_.getLong(3)).sum % 2 == 0)
  }

  test("q_graph_louvain_full: guarded-convergence Scala replay; modularity >= level 2") {
    val out = SparkEntry.queries("q_graph_louvain_full")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val e = Tables(spark, sf, "orders")
      .join(Tables(spark, sf, "lineitem"), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"),
        (col("l_suppkey") + queries.U.supplierIdOffset).as("s"))
      .distinct().collect()
      .flatMap(r => Seq((r.getLong(0), r.getLong(1)), (r.getLong(1), r.getLong(0))))
    val deg = e.groupBy(_._1).map { case (n, g) => n -> g.length.toLong }
    val m2 = e.length.toLong
    // exact-integer Q·(2m)² of a membership over weighted edges (self-
    // loops count as within mass — a coarsened community's internal edges)
    def qnum(lb: Map[Long, Long], ew: Map[(Long, Long), Long],
        wd: Map[Long, Long], mm: Long): BigInt = {
      val within = ew.collect { case ((a, b), w) if lb(a) == lb(b) => w }.sum
      val dm = lb.toSeq.groupBy(_._2)
        .map { case (_, g) => g.map(p => BigInt(wd(p._1))).sum }
      BigInt(mm) * BigInt(within) - dm.map(d => d * d).sum
    }
    // one semi-synchronous weighted move round (self-loops excluded from
    // k_iC, included in wdeg) — the wRound replay
    def wround(lb: Map[Long, Long], ew: Map[(Long, Long), Long],
        wd: Map[Long, Long], mm: Long, k: Int): Map[Long, Long] = {
      val side = (n: Long) =>
        if (k % 2 == 1) n >= queries.U.supplierIdOffset
        else n < queries.U.supplierIdOffset
      val tot = lb.toSeq.groupBy(_._2)
        .map { case (l, g) => l -> g.map(p => wd(p._1)).sum }
      val kic = ew.toSeq
        .collect { case ((a, b), w) if a != b && side(b) => ((b, lb(a)), w) }
        .groupBy(_._1).map { case (k2, g) => k2 -> g.map(_._2).sum }
      lb.map { case (i, cl) =>
        if (!side(i)) i -> cl
        else {
          val kd = wd(i)
          def gain(c: Long, k2: Long): BigInt = BigInt(mm) * k2 -
            BigInt(kd) * (if (c == cl) tot(c) - kd else tot(c))
          val gs = gain(cl, kic.getOrElse((i, cl), 0L))
          val cands = kic.collect {
            case ((d, c), k2) if d == i && c != cl => (gain(c, k2), c) }
          if (cands.isEmpty) i -> cl
          else {
            val (g, c) = cands.maxBy { case (g2, c2) => (g2, -c2) }
            i -> (if (g > gs) c else cl)
          }
        }
      }
    }
    // phase 1: continue from the (already replay-proven) 4-round frame
    var lbl = SparkEntry.queries("q_graph_louvain")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ew1 = e.map(p => p -> 1L).toMap
    var qn = qnum(lbl, ew1, deg, m2)
    var k = 5
    var rej = 0
    while (k <= 4 + queries.Insights.FullR1Cap && rej < 2) {
      val cand = wround(lbl, ew1, deg, m2, k)
      val qc = qnum(cand, ew1, deg, m2)
      if (qc > qn) { lbl = cand; qn = qc; rej = 0 } else rej += 1
      k += 1
    }
    // levels: coarsen, guarded super-node rounds, relabel
    var nodeLbl = lbl
    var level = 1
    var levelAccepted = 1
    while (level <= queries.Insights.FullLevelCap && levelAccepted > 0) {
      val ce = e.groupBy { case (a, b) => (nodeLbl(a), nodeLbl(b)) }
        .map { case (p, g) => p -> g.length.toLong }
      val wd = ce.toSeq.groupBy(_._1._1)
        .map { case (c, g) => c -> g.map(_._2).sum }
      val mm = ce.values.sum
      var com = wd.keys.map(c => c -> c).toMap
      var qnC = qnum(com, ce, wd, mm)
      var kk = 1
      var rj = 0
      levelAccepted = 0
      while (kk <= queries.Insights.FullR2Cap && rj < 2) {
        val cand = wround(com, ce, wd, mm, kk)
        val qc = qnum(cand, ce, wd, mm)
        if (qc > qnC) { com = cand; qnC = qc; rj = 0; levelAccepted += 1 }
        else rj += 1
        kk += 1
      }
      nodeLbl = nodeLbl.map { case (id, l) => id -> com(l) }
      level += 1
    }
    assert(out == nodeLbl,
      "declared louvain_full diverges from the guarded Scala replay")
    // ΔQ = 0 at the stop: one more guarded round on the final coarsened
    // graph must not improve (the convergence claim, checked exactly)
    val ceF = e.groupBy { case (a, b) => (nodeLbl(a), nodeLbl(b)) }
      .map { case (p, g) => p -> g.length.toLong }
    val wdF = ceF.toSeq.groupBy(_._1._1)
      .map { case (c, g) => c -> g.map(_._2).sum }
    val mmF = ceF.values.sum
    val comF = wdF.keys.map(c => c -> c).toMap
    val qF = qnum(comF, ceF, wdF, mmF)
    (1 to 2).foreach { kk =>
      assert(qnum(wround(comF, ceF, wdF, mmF, kk), ceF, wdF, mmF) <= qF,
        s"convergence claim broken: round $kk still improves Q")
    }
    // quality: the converged partition never scores below the fixed
    // two-level pair, on BOTH gate corpora, through the declared entries
    def modOf(name: String, d: String): Double =
      queries.Insights.modularityOf(spark, d,
        SparkEntry.queries(name)(spark, d).select(col("id"), col("lbl")))
    for (d <- Seq(sf, "/root/testdata/sf0.01")) {
      val qFull = modOf("q_graph_louvain_full", d)
      val qCoarse = modOf("q_graph_louvain_coarse", d)
      assert(qFull >= qCoarse - 1e-12,
        f"louvain_full Q $qFull%.6f below the two-level pair's $qCoarse%.6f at $d")
      assert(qFull >= 0.0)
    }
  }

  test("q_dq_benford: 9 digits, shares sum to 1, counts conserve") {
    val out = SparkEntry.queries("q_dq_benford")(spark, sf).collect()
    assert(out.map(_.getInt(0)).toSeq.sorted == (1 to 9),
      "every first digit 1..9 must appear exactly once")
    val n = Tables(spark, sf, "orders").count()
    assert(out.map(_.getLong(1)).sum == n)
    assert(math.abs(out.map(_.getDouble(2)).sum - 1.0) < 1e-6)
    // Benford expectation itself sums to 1 over digits 1..9
    val bp = (1 to 9).map(dd => math.log10(1.0 + 1.0 / dd)).sum
    assert(math.abs(bp - 1.0) < 1e-12)
  }

  test("q_wl_dataset_card: one row, internally consistent") {
    val r = SparkEntry.queries("q_wl_dataset_card")(spark, sf).collect().head
    val nDocs = r.getLong(0)
    assert(nDocs == Tables(spark, sf, "documents").count())
    assert(math.abs(r.getDouble(2) * nDocs - r.getLong(1)) < 1e-3)
    assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    assert(r.getDouble(5) >= 0.0 && r.getDouble(5) < 1.0)
    assert(r.getDouble(6) >= 0.0 && r.getDouble(6) <= math.log(5.0) / math.log(2.0))
  }

  test("q_llm_span_corruption: mask counts and digest change with content") {
    val out = SparkEntry.queries("q_llm_span_corruption")(spark, sf).collect()
    val docs = Tables(spark, sf, "documents").count()
    assert(out.length == docs)
    out.foreach { r =>
      val (nTok, nMasked) = (r.getInt(1), r.getInt(2))
      assert(nMasked >= 0 && nMasked <= nTok)
    }
    // ~25% of positions masked in aggregate (2-token spans, 1-in-4 pick)
    val frac = out.map(_.getInt(2).toDouble).sum / out.map(_.getInt(1).toDouble).sum
    assert(frac > 0.15 && frac < 0.35, s"masked fraction $frac")
    // deterministic
    val again = SparkEntry.queries("q_llm_span_corruption")(spark, sf).collect()
    assert(out.map(_.getString(3)).toSeq == again.map(_.getString(3)).toSeq)
  }

  test("q_join_bloom_prune: probe below the exchange, result = plain join") {
    val df = SparkEntry.queries("q_join_bloom_prune")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"),
      s"dim must stay on the shuffle path (the scenario is 'too big to broadcast'):\n$plan")
    // the Bloom probe must prune the fact side BEFORE its exchange —
    // anchor on the FACT side's hashpartitioning exchange specifically
    // (a bare indexOf("Exchange") would match whichever exchange prints
    // first and go vacuous if the aggregate ever needs its own)
    val exchangeIdx = plan.indexOf("Exchange hashpartitioning(o_custkey")
    val probeIdx = plan.indexOf("UDF")
    assert(exchangeIdx >= 0, s"fact-side exchange not found:\n$plan")
    assert(probeIdx > exchangeIdx,
      s"bloom probe filter should sit below (after, in tree print) the fact exchange:\n$plan")
    // bloom transparency: false positives die in the join — equality
    // with the plain (unpruned) join, not just similarity
    val plain = Tables(spark, sf, "orders")
      .join(Tables(spark, sf, "customer")
        .where(col("c_mktsegment") === "BUILDING"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_custkey")
      .agg(count(lit(1)).as("n_orders"),
        queries.U.dsum(col("o_totalprice")).as("total"))
      .orderBy(col("total").desc, col("c_custkey")).limit(20)
      .collect().toSeq
    assert(df.collect().toSeq == plain)
  }

  test("signals plan guards: heap top-k, broadcast probes, keyed windows") {
    val bm25 = SparkEntry.queries("q_llm_bm25")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(bm25.contains("TakeOrderedAndProject"),
      s"BM25 top-20 should be a heap, not a global sort:\n$bm25")
    val cms = SparkEntry.queries("q_agg_countmin")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(cms.contains("BroadcastHashJoin"),
      s"CMS probe should join the broadcast sketch:\n$cms")
    // AUC + the LWW window: every WindowExec carries a partition key
    // (the global sweep in PlanSpec also covers these — this pins the
    // specific construction)
    Seq("q_agg_auc_rank", "q_cdc_apply_log", "q_ts_markov").foreach { n =>
      val qe = SparkEntry.queries(n)(spark, sf).queryExecution
      val bad = qe.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.isEmpty => w
      }
      assert(bad.isEmpty, s"$n has a single-partition window")
    }
  }
}
