package graft

import org.apache.spark.sql.functions._
import graft.queries.Refine

/** Per-operator invariants for the §2.27 batch (PQ ANN, importance
  * resampling, CUSUM, fertility) — the properties the global
  * determinism/plan sweeps cannot show. */
class RefineSpec extends SparkSpec {

  private def grid(): Map[Long, Array[Long]] =
    Tables(spark, sf, "embeddings")
      .select(col("vec_id"), expr(
        "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT))")
        .as("g"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray)
      .toMap

  private def l2sq(a: Array[Long], b: Array[Long]): BigInt =
    a.zip(b).map { case (x, y) => BigInt(x - y) * BigInt(x - y) }.sum

  test("q_llm_simsearch_pq: structure — ranks dense, no self-match, exact d2x non-decreasing, d2x true") {
    val out = Refine.queries("q_llm_simsearch_pq")(spark, sf).collect()
    val g = grid()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getLong(0) != r.getLong(1)), "no self-neighbors")
    // the declared form re-ranks by EXACT grid L2² — every emitted d2x
    // must equal the brute-force distance, not an ADC estimate
    out.foreach { r =>
      assert(BigInt(r.getLong(2)) == l2sq(g(r.getLong(0)), g(r.getLong(1))),
        s"d2x for (${r.getLong(0)}, ${r.getLong(1)}) is not the exact distance")
    }
    out.groupBy(_.getLong(0)).values.foreach { rs =>
      val sorted = rs.sortBy(_.getInt(3))
      assert(sorted.map(_.getInt(3)).toSeq === (1 to rs.length), "dense ranks")
      val d2s = sorted.map(_.getLong(2))
      assert(d2s.zip(d2s.tail).forall { case (a, b) => a <= b },
        "exact re-rank distance must be non-decreasing in rank")
    }
  }

  test("q_llm_simsearch_pq: shortlist-rerank recall@3 vs exact L2 truth; shortlist is the binding stage") {
    val g = grid()
    val qids = g.keys.filter(_ < 32).toSeq
    // exact L2² top-3 per query (brute force on the ≤500-vector fixture)
    val truth: Map[Long, Set[Long]] = qids.map { q =>
      q -> g.filter(_._1 != q).toSeq
        .map { case (c, v) => (l2sq(g(q), v), c) }
        .sortBy(identity).take(3).map(_._2).toSet
    }.toMap
    val pq = Refine.queries("q_llm_simsearch_pq")(spark, sf)
      .select("qid", "cid").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val hits = qids.map(q => (truth(q) & pq.getOrElse(q, Set.empty)).size).sum
    val recall = hits.toDouble / (3.0 * qids.size)
    // declared serving form (8×16 codes → ADC shortlist-200 → exact
    // re-rank): a truth neighbor is missed ONLY if ADC ranks it below
    // 200 of ~500 fixture candidates — the re-rank stage itself is
    // exact. Measured 0.99 at sf0.001, 1.00 at sf0.01, 0.865 at sf0.1;
    // random-200 shortlisting would land ~0.4. Gate at 0.6 — far above
    // chance, comfortably below measured.
    assert(recall >= 0.6, f"PQ recall@3 $recall%.3f below the 0.6 floor")
    // every returned candidate must actually have survived an exact
    // comparison: its distance can never beat the true 1st neighbor
    val pqd = Refine.queries("q_llm_simsearch_pq")(spark, sf).collect()
    pqd.foreach { r =>
      val best = g.filter(_._1 != r.getLong(0))
        .map { case (_, v) => l2sq(g(r.getLong(0)), v) }.min
      assert(BigInt(r.getLong(2)) >= best)
    }
  }

  test("q_llm_simsearch_pq_probe: results live in probed cells only; probes >= cells recovers exhaustive; rule pinned") {
    // probe-budget growth rule (round 13: 2·√cells − 3, anchored so
    // every gate scale pins 5 — 2·√16 − 3 exactly), then ∝ √cells —
    // the ladder the recall table measures
    assert(Refine.probesForCells(16) === 5)
    assert(Refine.probesForCells(128) === 20)
    assert(Refine.probesForCells(2048) === 88)
    val grid16 = Seq(16, 64, 256, 1024, 4096).map(Refine.probesForCells)
    assert(grid16.zip(grid16.tail).forall { case (a, b) => a <= b })
    // shortlist growth rule (round 13: 50·√cells, anchored so every
    // gate scale pins the 200 the DuckDB mirrors encode)
    assert(Refine.shortlistFor(16) === 200)
    assert(Refine.shortlistFor(64) === 400)
    assert(Refine.shortlistFor(128) === 566)
    assert(Refine.shortlistFor(2048) === 2263)
    val sls = Seq(16, 64, 256, 1024, 4096).map(Refine.shortlistFor)
    assert(sls.zip(sls.tail).forall { case (a, b) => a <= b })
    // a vacuous restriction (probes = cells) must reproduce the
    // exhaustive declared form exactly — same pipeline, same answers
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    val vacuous = rows(Refine.pqRerank(spark, sf, Refine.SHORTLIST, 16,
      Refine.M, Refine.KPQ, 16))
    val exhaustive = rows(Refine.queries("q_llm_simsearch_pq")(spark, sf))
    assert(vacuous === exhaustive,
      "probes = cells must be exactly the exhaustive form")
    // the declared probed entry: every returned candidate's coarse cell
    // is one of its query's 5 nearest cells (recomputed driver-side
    // with exact BigInt distances and the (d2, cid) tie-break)
    val out = Refine.queries("q_llm_simsearch_pq_probe")(spark, sf).collect()
    assert(out.nonEmpty)
    val cent = queries.Learn.trainedCentFrame(spark, sf, 16).collect()
      .map(r => r.getInt(0) -> r.getSeq[Long](1).toArray).toMap
    val g = grid()
    def near5(q: Array[Long]): Set[Int] =
      cent.toSeq.map { case (cid, c) => (l2sq(q, c), cid) }
        .sortBy(identity).take(5).map(_._2).toSet
    val cellOf = cent.keys.toSeq.sorted
    def assigned(v: Array[Long]): Int =
      cent.toSeq.map { case (cid, c) => (l2sq(v, c), cid) }.min._2
    out.foreach { r =>
      val (qid, cid) = (r.getLong(0), r.getLong(1))
      assert(near5(g(qid)).contains(assigned(g(cid))),
        s"candidate $cid of query $qid lives outside the probed cells")
    }
    assert(cellOf.nonEmpty) // keep the val used
  }

  test("q_llm_simsearch_pq: declared quantizer-growth rule — 16 cells at every gate scale, ∝N beyond") {
    // the declared entry derives coarse cells from corpus size; the rule
    // must resolve to 16 wherever the fixed-16 DuckDB mirror runs (any
    // gate scale) and reproduce the measured probe grid beyond it —
    // 2k → 16 (sf0.1 anchor), 20k → 128 (×10), 200k → 2048 (×100)
    assert(Refine.cellsFor(spark, sf) === 16,
      "fixture corpus must resolve to the oracle's 16-cell geometry")
    assert(Refine.cellsForCount(125L) === 16)
    assert(Refine.cellsForCount(2000L) === 16)
    assert(Refine.cellsForCount(20000L) === 128)
    assert(Refine.cellsForCount(200000L) === 2048)
    // monotone non-decreasing in N: a bigger corpus never gets a
    // coarser quantizer
    val grid = Seq(100L, 1000L, 5000L, 50000L, 500000L, 5000000L)
      .map(Refine.cellsForCount)
    assert(grid.zip(grid.tail).forall { case (a, b) => a <= b })
  }

  test("q_ts_cusum: matches an independent Scala fold over the same windows") {
    val rows = Tables(spark, sf, "events")
      .select("user_id", "event_id", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // the query's grid-exact mean: exact decimal sum / count, rounded 6
    val mu = Tables(spark, sf, "events")
      .agg(round(graft.queries.U.davg(col("value")), 6)).first().getDouble(0)
    val k = Refine.SLACK.toDouble
    val h = Refine.THRESH.toDouble
    val expect = rows.groupBy(_._1).flatMap { case (_, es) =>
      val ordered = es.sortBy(_._2)
      ordered.indices.map { i =>
        val win = ordered.slice(math.max(0, i - 49), i + 1).map(_._3)
        var (hi, lo, cr) = (0.0, 0.0, 0.0)
        win.foreach { v =>
          hi = math.max(0.0, hi + (v - mu) - k)
          lo = math.max(0.0, lo + (mu - v) - k)
          if (hi > h || lo > h) cr += 1.0
        }
        (ordered(i)._2,
          (math.rint(hi * 1e6) / 1e6, math.rint(lo * 1e6) / 1e6, cr.toLong))
      }
    }
    val got = Refine.queries("q_ts_cusum")(spark, sf).collect()
      .map(r => r.getLong(1) -> ((r.getDouble(2), r.getDouble(3), r.getLong(4))))
      .toMap
    assert(got.size === rows.length)
    expect.foreach { case (eid, (ehi, elo, ecr)) =>
      val (ghi, glo, gcr) = got(eid)
      assert(math.abs(ghi - ehi) < 2e-6 && math.abs(glo - elo) < 2e-6,
        s"event $eid: cusum ($ghi,$glo) != expected ($ehi,$elo)")
      assert(gcr === ecr, s"event $eid: crossings $gcr != $ecr")
    }
    // the fixture must actually exercise the threshold: at least one
    // window crosses somewhere, and at least one does not
    val crs = got.values.map(_._3)
    assert(crs.exists(_ > 0) && crs.exists(_ == 0),
      "fixture exercises neither/both sides of the threshold")
  }

  test("q_ts_cusum fold: constructed drift fixture crosses exactly when expected") {
    // mean 0, slack 12.5, threshold 100: twenty +20 deviations push s⁺ by
    // 7.5 each (s⁺ = 7.5n), crossing while 7.5n > 100 → steps 14..20 = 7
    // crossings, s⁺ = 150 at the end of the drift; the flat tail (v = mu)
    // decays s⁺ by 12.5/step: 137.5, 125, 112.5 still cross (3 more),
    // 100.0 does not (strict >), so 10 total and s⁺ ends at 25
    val drift = (1 to 20).map(_ => "20.0") ++ (1 to 10).map(_ => "0.0")
    val st = spark.sql(
      s"SELECT ${Refine.cusumFold(s"array(${drift.mkString(",")})", "0.0")} AS st")
      .first().getSeq[Double](0)
    assert(st(2) === 10.0, s"expected 10 crossings, got ${st(2)}")
    assert(st(0) === 25.0, "tail decay must bring s⁺ back to 25")
    assert(st(1) === 0.0, "one-sided drift must leave s⁻ at zero")
    // symmetric: pure negative drift crosses on the low side only
    val neg = (1 to 20).map(_ => "-20.0")
    val st2 = spark.sql(
      s"SELECT ${Refine.cusumFold(s"array(${neg.mkString(",")})", "0.0")} AS st")
      .first().getSeq[Double](0)
    assert(st2(2) === 7.0 && st2(0) === 0.0 && st2(1) === 150.0)
  }

  test("q_llm_importance_resample: kept mix is closer to target than the raw mix") {
    val out = Refine.queries("q_llm_importance_resample")(spark, sf).collect()
    val target = Map("en" -> 0.25, "es" -> 0.25, "de" -> 0.2,
      "fr" -> 0.15, "zh" -> 0.15)
    assert(out.map(_.getString(0)).toSet === target.keySet,
      "output must cover exactly the target-mix languages")
    val nDocs = out.map(r => r.getString(0) -> r.getLong(1)).toMap
    val nKept = out.map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(target.keys.forall(l => nKept(l) <= nDocs(l)), "kept ≤ docs per lang")
    assert(out.map(_.getLong(3)).max === 1000000L,
      "the most under-represented language must keep everything (p = 1e6)")
    def tv(shares: Map[String, Double]): Double =
      target.map { case (l, t) => math.abs(shares(l) - t) }.sum / 2
    val totD = nDocs.values.sum.toDouble
    val totK = nKept.values.sum.toDouble
    val tvBefore = tv(nDocs.map { case (l, n) => l -> n / totD })
    val tvAfter = tv(nKept.map { case (l, n) => l -> n / totK })
    assert(tvAfter < tvBefore,
      f"resampling must move the mix toward target (TV $tvBefore%.3f → $tvAfter%.3f)")
    assert(tvAfter < 0.1, f"kept mix TV distance $tvAfter%.3f too far from target")
  }

  test("q_llm_temperature_mix: p = sqrt(min/cnt) exactly; kept set matches the draw") {
    import org.apache.spark.sql.functions.col
    val out = Refine.queries("q_llm_temperature_mix")(spark, sf).collect()
    val docs = Tables(spark, sf, "documents").select(col("doc_id"), col("lang"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val cnt = docs.groupBy(_._2).map { case (l, g) => l -> g.length.toLong }
    assert(out.map(_.getString(0)).toSet == cnt.keySet, "one row per observed language")
    val mn = cnt.values.min
    def md5(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def draw(id: Long): Long =
      java.lang.Long.parseLong(md5(s"tm$id").take(13), 16) % 1000000L
    out.foreach { r =>
      val (l, nd, pE6, nKept) =
        (r.getString(0), r.getLong(1), r.getLong(4), r.getLong(5))
      assert(nd == cnt(l))
      // the α=0.5 closed form, recomputed independently
      assert(pE6 == math.round(math.sqrt(mn.toDouble / nd.toDouble) * 1e6),
        s"p_e6 drift for $l")
      // kept count = exact replay of the deterministic draw
      val want = docs.count { case (id, dl) => dl == l && draw(id) < pE6 }
      assert(nKept == want, s"kept-count drift for $l: $nKept vs $want")
    }
    // the rarest language is kept whole; temperature flattens the mix:
    // q ratios are the square root of the share ratios (monotone, compressed)
    assert(out.map(_.getLong(4)).max == 1000000L)
    val en = out.find(_.getString(0) == "en").get
    val fr = out.find(_.getString(0) == "fr").get
    val shareRatio = en.getLong(2).toDouble / fr.getLong(2)
    val qRatio = en.getLong(3).toDouble / fr.getLong(3)
    assert(qRatio > 1.0 && qRatio < shareRatio,
      f"q must compress the dominant/rare ratio (share $shareRatio%.2f, q $qRatio%.2f)")
    assert(math.abs(qRatio - math.sqrt(shareRatio)) < 0.01,
      "q ratio must be the square root of the share ratio at α = 0.5")
  }

  test("q_llm_tokenizer_fertility: ratio identities hold per language") {
    val out = Refine.queries("q_llm_tokenizer_fertility")(spark, sf).collect()
    assert(out.nonEmpty)
    val total = Tables(spark, sf, "documents").count()
    assert(out.map(_.getLong(1)).sum === total, "per-lang docs sum to corpus")
    out.foreach { r =>
      val (ws, sw) = (r.getLong(2), r.getLong(3))
      val (fert, tokChars) = (r.getLong(4), r.getLong(5))
      // every whitespace token has ≥ 1 char, subwords are ceil(chars/4):
      // 4·sw ≥ chars ≥ ws, so fertility ≥ 0.25 and chars/token ≥ 1
      assert(4 * sw >= ws, s"${r.getString(0)}: 4·subwords < whitespace tokens")
      assert(fert >= 250000L, s"${r.getString(0)}: fertility below the ¼ floor")
      assert(tokChars >= 1000000L, s"${r.getString(0)}: < 1 char per token")
      assert(fert === sw * 1000000L / ws, "fertility is the exact floor ratio")
    }
  }
}
