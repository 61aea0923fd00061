package graft

import org.apache.spark.sql.functions._
import graft.queries.{Corpus, Learn, Workloads}

/** Semantic properties of the round-5 corpus-model batch — each query's
  * oracle proves cross-engine equality; these prove the SEMANTICS are the
  * ones claimed (coverage curves monotone, BPE round 1 ≡ the declared
  * pair scan, the Holt fold ≡ a driver-side reference recurrence, tiers
  * partition evenly, negatives never share a label). */
class CorpusSpec extends SparkSpec {

  test("vocab coverage: curve monotone in V, ratios bounded by 100%") {
    val out = Corpus.queries("q_llm_vocab_coverage")(spark, sf).collect()
    assert(out.nonEmpty && out.length <= 3)
    val sorted = out.sortBy(_.getInt(0))
    sorted.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getLong(1) <= b.getLong(1), "covered tokens must grow with V")
        assert(a.getLong(2) <= b.getLong(2), "covered types must grow with V")
      case _ => ()
    }
    sorted.foreach { r =>
      assert(r.getLong(3) >= 0 && r.getLong(3) <= 1000000L)
      assert(r.getLong(4) >= 0 && r.getLong(4) <= 1000000L)
    }
  }

  test("bpe_train round 1 reproduces the declared pair-scan's top pair") {
    val train = Corpus.queries("q_llm_bpe_train")(spark, sf).collect()
    assert(train.length == 3)
    // rounds are distinct merges (a re-merged pair would mean the apply
    // step failed to consume its winner)
    assert(train.map(r => (r.getString(1), r.getString(2))).distinct.length == 3)
    val r1 = train.find(_.getInt(0) == 1).get
    val top = Learn.queries("q_llm_bpe_pairs")(spark, sf)
      .where(col("rank") === 1).first()
    assert(r1.getString(1) + r1.getString(2) === top.getString(1),
      "round-1 winner must equal the pair scan's rank-1 pair")
    assert(r1.getLong(3) === top.getLong(2))
  }

  test("bpe_apply: every token joined, merges strictly compress") {
    val out = Corpus.queries("q_llm_bpe_apply")(spark, sf).collect()
    assert(out.nonEmpty)
    val totalTokens = Tables(spark, sf, "documents")
      .select(explode(split(col("text"), " "))).count()
    // the vocab join must cover the whole corpus (inner join loses
    // nothing because sym is built from the same tokenizer)
    assert(out.map(_.getLong(1)).sum == totalTokens)
    out.foreach { r =>
      assert(r.getLong(3) < r.getLong(2),
        s"merges must strictly compress ${r.getString(0)}")
      assert(r.getLong(4) > 0 && r.getLong(4) < 1000000L)
    }
  }

  test("kneser-ney: ≤50 rows, probabilities in (0, 1]") {
    val out = Corpus.queries("q_llm_kneser_ney")(spark, sf).collect()
    assert(out.nonEmpty && out.length <= 50)
    out.foreach { r =>
      val p = r.getDouble(3)
      assert(p > 0.0 && p <= 1.0 + 1e-9, s"p_kn out of range: $p")
    }
  }

  test("weighted sample: exact k rows, quality-biased vs the corpus mean") {
    // sf0.01: 500 docs — the sample must be a strict, biased subset
    // (at sf0.001 k ≥ N and the sample degenerates to the whole corpus)
    val d = "/root/testdata/sf0.01"
    val out = Corpus.queries("q_sample_weighted")(spark, d).collect()
    assert(out.length == 100)
    val sampleMean = out.map(_.getLong(1)).sum.toDouble / out.length
    val corpusMean = Tables(spark, d, "documents")
      .select(graft.queries.U.qualityE6.as("q"))
      .agg(avg("q")).first().getDouble(0)
    assert(sampleMean > corpusMean,
      s"weighted sample not quality-biased: $sampleMean <= $corpusMean")
  }

  test("holt fold is bit-identical to a driver-side reference recurrence") {
    val ev = Tables(spark, sf, "events").select("user_id", "event_id", "value")
    val uid = ev.groupBy("user_id").count()
      .orderBy(col("count").desc, col("user_id")).first().getLong(0)
    val vals = ev.where(col("user_id") === uid).orderBy("event_id")
      .collect().map(_.getDouble(2))
    val out = Corpus.queries("q_ts_holt")(spark, sf)
      .where(col("user_id") === uid).orderBy("event_id").collect()
    assert(out.length == vals.length)
    vals.indices.foreach { i =>
      val win = vals.slice(math.max(0, i - 49), i + 1)
      var l = win.head
      var t = 0.0
      win.tail.foreach { v =>
        val l2 = v * 0.5 + (l + t) * 0.5
        t = (l2 - l) * 0.25 + t * 0.75
        l = l2
      }
      assert(out(i).getDouble(2) == l && out(i).getDouble(3) == t,
        s"row $i diverges from the reference fold")
    }
  }

  test("curriculum: tiers partition the corpus evenly and in quality order") {
    val out = Corpus.queries("q_llm_curriculum")(spark, sf).cache()
    assert(out.count() == Tables(spark, sf, "documents").count())
    val sizes = out.groupBy("tier").count().collect()
      .map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(sizes.keySet.subsetOf(Set(1, 2, 3, 4)))
    assert(sizes.values.max - sizes.values.min <= 1,
      s"quartile sizes must differ by at most 1: $sizes")
    val b = out.groupBy("tier").agg(min("q").as("lo"), max("q").as("hi"))
      .orderBy("tier").collect()
    b.sliding(2).foreach {
      case Array(x, y) =>
        assert(x.getLong(2) <= y.getLong(1),
          "tier quality ranges must not invert")
      case _ => ()
    }
    assert(out.where(col("shard") < 0 || col("shard") > 7).count() == 0)
    out.unpersist()  // shared CacheManager: don't leak the declared plan
    ()
  }

  test("hard negatives: never same-label, ≤3 per anchor, dot-ranked") {
    val out = Learn.queries("q_llm_hard_negatives")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getInt(2) != r.getInt(3),
      s"same-label pair leaked: $r"))
    out.groupBy(_.getLong(0)).values.foreach { rs =>
      assert(rs.length <= 3)
      val byRank = rs.sortBy(_.getInt(5)).map(_.getDouble(4))
      byRank.sliding(2).foreach { w =>
        if (w.length == 2) assert(w(0) >= w(1), "dots must rank descending")
      }
    }
  }

  test("min-cost supplier: argmin agrees with an independent plain-min pass") {
    val d = sf
    val out = Workloads.queries("q_wl_min_cost_supplier")(spark, d).cache()
    assert(out.count() > 0)
    // independent shape: plain min + equality join back + min suppkey
    val eur = Tables(spark, d, "supplier")
      .join(broadcast(Tables(spark, d, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables(spark, d, "region")
        .where(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"))
    val offers = Tables(spark, d, "lineitem")
      .join(broadcast(eur), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables(spark, d, "part")
        .where(col("p_type") === "LARGE").select("p_partkey")),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"), col("l_suppkey"),
        expr("""(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                 * 100) div CAST(l_quantity AS BIGINT)""").as("cost_e4"))
      .cache()
    val mins = offers.groupBy("l_partkey").agg(min("cost_e4").as("mc"))
    val winners = offers.join(mins, Seq("l_partkey"))
      .where(col("cost_e4") === col("mc"))
      .groupBy("l_partkey")
      .agg(first(col("mc")).as("mc"), min("l_suppkey").as("ws"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    out.collect().foreach { r =>
      val (mc, ws) = winners(r.getLong(0))
      assert(r.getLong(2) == mc && r.getLong(3) == ws,
        s"argmin diverges for part ${r.getLong(0)}")
    }
    offers.unpersist()
    out.unpersist()  // shared CacheManager: don't leak the declared plan
    ()
  }

  test("unigram_lm matches the plain-Scala Viterbi mirror; pieces gain mass") {
    def r9(x: Double): Double = BigDecimal(x)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val out = graft.queries.Corpus.queries("q_llm_unigram_lm")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    // corpus word frequencies
    val words = Tables(spark, sf, "documents").select("text").collect()
      .flatMap(_.getString(0).split(" ")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, v) => w -> v.length.toLong }
    // candidate substrings (len 1..4), weighted by word freq
    val subs = words.toSeq.flatMap { case (w, f) =>
      (for { i <- 0 until w.length; l <- 1 to math.min(4, w.length - i) }
        yield w.substring(i, i + l)).map(_ -> f)
    }.groupBy(_._1).map { case (p, v) => p -> v.map(_._2).sum }
    val singles = subs.filter(_._1.length == 1)
    val multis = subs.filter(_._1.length >= 2).toSeq
      .sortBy { case (p, c) => (-c, p) }.take(48)
    val vocab = singles ++ multis
    val vt = vocab.values.sum
    val lp = vocab.map { case (p, c) => p -> r9(math.log(c.toDouble / vt)) }
    // Viterbi with the declared candidate order (k = 1..4, ties to
    // the shortest last piece via first-match)
    def segment(w: String): Seq[String] = {
      val best = Array.fill(w.length + 1)(0.0)
      val bp = Array.fill(w.length + 1)(0)
      for (i <- 1 to w.length) {
        val cands = (1 to 4).map { k =>
          if (i - k >= 0)
            best(i - k) + lp.getOrElse(w.substring(i - k, i), -1e9)
          else -1e18
        }
        val b = cands.max
        best(i) = b
        bp(i) = i - (cands.indexWhere(_ == b) + 1)
      }
      var pos = w.length
      var acc = List.empty[String]
      while (pos > 0) { acc = w.substring(bp(pos), pos) :: acc; pos = bp(pos) }
      acc
    }
    val eCnt = words.toSeq.flatMap { case (w, f) =>
      segment(w).map(_ -> f)
    }.groupBy(_._1).map { case (p, v) => p -> v.map(_._2).sum }
    val et = eCnt.values.sum
    val expect = eCnt.toSeq.sortBy { case (p, c) => (-c, p) }.take(30)
      .map { case (p, c) =>
        (p, c, 1000000L * vocab(p) / vt, 1000000L * c / et) }
    assert(out.toSeq === expect)
    // non-vacuity: multi-char pieces must appear in the report AND the
    // EM must shift mass (some posterior ≠ prior)
    assert(out.exists(_._1.length >= 2), "no multi-char piece survived")
    assert(out.exists(r => r._3 != r._4), "EM step moved no mass")
  }
}
