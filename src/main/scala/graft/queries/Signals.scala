package graft.queries

import graft.Tables
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import U._

/** SURVEY §2 round-4 signals batch: retrieval scoring (BM25), a count-min
  * frequency sketch, an exact distributed ranking metric (AUC), embedding
  * covariance, event-transition estimation, changelog apply, and the
  * hashing-trick featurizer.
  *
  * Same discipline as the rest of the inventory: libm outputs (ln/log2)
  * are pinned to the 1e-9 grid BEFORE any order-sensitive sum (the
  * ppl_proxy rule), money/score sums ride exact decimals, every heap is
  * TakeOrdered (never a global sort), every prefix sum is the
  * gridBin + broadcast-offsets + per-bucket-window construction (never a
  * single-partition window), and every dim that joins a fact side is
  * counted-small and broadcast.
  */
object Signals {

  /** BM25 hyperparameters (the Robertson defaults). */
  private val K1 = 1.2
  private val B = 0.75

  /** The fixed demo query — three mid-frequency corpus terms. */
  private val QueryTerms = Seq("spark", "hash", "join")

  /** The declared BM25 top-20 ranking (doc_id, n_terms, score) — the one
    * frame both `q_llm_bm25` and its grading twin `q_llm_retrieval_ndcg`
    * walk, so the evaluated ranking cannot drift from the declared ranker.
    * See the q_llm_bm25 entry comment for the plan discipline.
    */
  private def bm25Ranked(s: org.apache.spark.sql.SparkSession,
                         d: String): org.apache.spark.sql.DataFrame = {
    val docs = Tables(s, d, "documents")
      .select(col("doc_id"), size(textTokens).as("dl"))
    val stats = docs.agg(count(lit(1)).as("n"), sum("dl").as("sdl"))
    val tf = Tables(s, d, "documents")
      .select(col("doc_id"), explode(textTokens).as("term"))
      .where(col("term").isin(QueryTerms: _*))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val idf = tf.groupBy("term").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(stats))
      .select(col("term"),
        round(log((col("n") - col("df") + 0.5) / (col("df") + 0.5) + 1.0), 9)
          .as("idf"))
    tf.join(broadcast(idf), "term")
      .join(docs.hint("shuffle_hash"), "doc_id")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        round(col("idf") * (col("tf") * (K1 + 1.0)) /
          (col("tf") + lit(K1) * (lit(1.0 - B) + lit(B) *
            (col("dl") * col("n")).cast("double") / col("sdl"))), 9)
          .as("ts_term"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"),
        sum(col("ts_term").cast("decimal(18,9)")).cast("double").as("score"))
      .orderBy(col("score").desc, col("doc_id")).limit(20)
  }

  /** Per-rank NDCG contribution on the exactness grid: gain 2^rel−1 is an
    * exact integer (rel ≤ 3), the log2 discount is libm ⇒ rounded to the
    * 1e-9 grid BEFORE the division (the ppl_proxy rule), and the quotient
    * is rounded again so both engines sum identical grid points. */
  private def dcgContrib(relCol: String, rankCol: String): Column =
    round(expr(s"CAST(shiftleft(1L, CAST($relCol AS INT)) - 1L AS DOUBLE)") /
      round(log(2.0, col(rankCol).cast("double") + 1.0), 9), 9)

  val queries: Map[String, Q] = Map(
    // BM25 retrieval scoring — the lexical ranking function under every
    // search-based curation / decontamination pass. Per-(doc, term) tf
    // comes from one linear explode FILTERED to the query terms before
    // the shuffle (the probe set is tiny, so the grouped frame is
    // ~|query|·|matching docs|); df and the corpus stats (N, Σdl) are
    // one-row/3-row broadcast dims. idf = ln((N−df+0.5)/(df+0.5)+1) is
    // libm ⇒ rounded to the 1e-9 grid per TERM (3 rows) before scoring;
    // the per-term partial score is rounded again before the per-doc
    // DECIMAL(18,9) sum so partition order can't perturb the emitted
    // double. Top-20 via a TakeOrdered heap. Linear in corpus size at
    // any scale; the only shuffle is the (doc, term) group-by.
    "q_llm_bm25" -> ((s, d) => bm25Ranked(s, d)),

    // Retrieval-quality grading of the DECLARED BM25 ranking — the eval
    // side the ranker was missing (a curation pipeline that searches its
    // corpus publishes NDCG@k/MRR next to the ranker, not just scores).
    // Ground truth is the term-coverage grade rel = |distinct query terms
    // present| ∈ {1,2,3} — derived from the corpus itself, so the metric
    // is deterministic and engine-portable. The actual list is the shared
    // bm25Ranked frame (rank = its own (score desc, doc_id) order); the
    // ideal list is the rel-descending top-10 over ALL matched docs via a
    // TakeOrdered heap — never a global sort; the matched-doc frame is the
    // same query-filtered explode BM25 walks, ∝ |matching docs| ≪ N.
    // Gains 2^rel−1 are exact integers; log2 discounts round to the 1e-9
    // grid before dividing (dcgContrib); cumulative DCG/IDCG ride
    // DECIMAL(18,9) sums over a ≤10-row rank window (dim-bounded by the
    // heaps — the arm-partitioned-window rule, not a data-sized window);
    // NDCG@r = round(dcg/idcg, 9). MRR = 1/rank of the first fully
    // relevant (rel=3) doc in the top-20, 0.0 when absent — a 1-row
    // broadcast. Every frame after the two heaps is KB-scale at any N.
    "q_llm_retrieval_ndcg" -> ((s, d) => {
      // ranks are WINDOWLESS broadcast triangle joins over the ≤20-row
      // heap outputs (the bpe_pairs discipline — a ranking function's
      // constant partition key gets stripped by the optimizer, so no
      // global-window-free row_number spec survives); the cumulative
      // DCG/IDCG aggregate windows pin the non-foldable rank*0 key
      // instead (the llm_mix rule — aggregate windows keep it), so the
      // whole query plans zero single-partition windows
      val r20 = bm25Ranked(s, d)
      val ranked = r20.join(broadcast(
          r20.select(col("doc_id").as("d2"), col("score").as("s2"))),
          col("s2") > col("score") ||
            (col("s2") === col("score") && col("d2") < col("doc_id")),
          "left")
        .groupBy("doc_id", "n_terms", "score")
        .agg((count(col("d2")) + 1L).as("rank"))
      val actual = ranked.where(col("rank") <= 10)
        .select(col("rank"), col("doc_id"), col("n_terms").as("rel"))
      val relAll = Tables(s, d, "documents")
        .select(col("doc_id"), explode(textTokens).as("term"))
        .where(col("term").isin(QueryTerms: _*))
        .groupBy("doc_id").agg(countDistinct("term").as("rel"))
      val i10 = relAll.orderBy(col("rel").desc, col("doc_id")).limit(10)
      val ideal = i10.join(broadcast(
          i10.select(col("doc_id").as("d2"), col("rel").as("r2"))),
          col("r2") > col("rel") ||
            (col("r2") === col("rel") && col("d2") < col("doc_id")),
          "left")
        .groupBy(col("doc_id"), col("rel"))
        .agg((count(col("d2")) + 1L).as("rank"))
        .select(col("rank"), col("rel").as("ideal_rel"))
      val mrr = ranked.where(col("n_terms") === 3)
        .agg(min("rank").as("fr"))
        .select(coalesce(round(lit(1.0) / col("fr"), 9), lit(0.0)).as("mrr"))
      // 0·length(doc_id) — the llm_mix constant-but-not-foldable key,
      // anchored on the NULLABLE doc_id (rank = count+1 is non-nullable,
      // so any expression over it folds to a literal and gets stripped).
      // If a future optimizer folds nullable 0·length too, the partition
      // spec silently drops — the ≤10-row result is unchanged, but the
      // zero-single-partition-window plan claim regresses; the Window x2
      // entry in PLANS.lock is the tripwire that catches that diff.
      val wc = Window
        .partitionBy(length(col("doc_id").cast("string")) * lit(0))
        .orderBy("rank")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      actual.join(ideal, "rank")
        .withColumn("dcg", sum(dcgContrib("rel", "rank")
          .cast("decimal(18,9)")).over(wc).cast("double"))
        .withColumn("idcg", sum(dcgContrib("ideal_rel", "rank")
          .cast("decimal(18,9)")).over(wc).cast("double"))
        .withColumn("ndcg", round(col("dcg") / col("idcg"), 9))
        .crossJoin(broadcast(mrr))
        .select(col("rank"), col("doc_id"), col("rel"), col("ideal_rel"),
          col("dcg"), col("idcg"), col("ndcg"), col("mrr"))
        .orderBy("rank")
    }),

    // Count-min sketch — the mergeable point-frequency summary (the CMS
    // of Cormode & Muthukrishnan) joining the HLL (q_agg_sketch_merge)
    // and KLL-style (q_agg_quantile_merge) rollups in the sketch family.
    // The sketch is 4 hash rows × 64 buckets = 256 cells. The token
    // stream collapses to (term, count) FIRST — one partial+final agg,
    // each executor's map side folding its local stream — and the 4-way
    // hash explode then runs over VOCAB rows, not token rows (measured
    // 10.2 s → explode-dominated before this collapse at ×100; vocab ≪
    // tokens on any real corpus). Cell merge is weighted add — exactly
    // how a 1000-executor rollup composes. Estimates for the 10
    // heaviest terms (TakeOrdered heap) probe the broadcast sketch:
    // est = min over the 4 rows, and CMS guarantees est ≥ exact with
    // ≤ εN overshoot (SignalsSpec asserts both). Hashes are
    // md5-derived ⇒ bit-identical in DuckDB, so even the sketch cells
    // are oracle-comparable.
    "q_agg_countmin" -> ((s, d) => {
      val tc = Tables(s, d, "documents")
        .select(explode(textTokens).as("term"))
        .groupBy("term").agg(count(lit(1)).as("tc"))
      val bucket = (j: String) => expr(
        s"${hexFold(s"md5(concat('cm', CAST($j AS STRING), '|', term))", 12)} % 64")
      val cells = tc.select(col("term"), col("tc"),
          explode(expr("sequence(0, 3)")).as("j"))
        .select(col("j"), bucket("j").as("bkt"), col("tc"))
        .groupBy("j", "bkt").agg(sum("tc").as("cell"))
      val probes = tc.select(col("term"), col("tc").as("exact_cnt"))
        .orderBy(col("exact_cnt").desc, col("term")).limit(10)
      probes.select(col("term"), col("exact_cnt"),
          explode(expr("sequence(0, 3)")).as("j"))
        .select(col("term"), col("exact_cnt"), col("j"), bucket("j").as("bkt"))
        .join(broadcast(cells), Seq("j", "bkt"))
        .groupBy("term", "exact_cnt").agg(min(col("cell")).as("cm_est"))
        .orderBy(col("exact_cnt").desc, col("term"))
    }),

    // Exact AUC (Mann-Whitney U with midrank tie handling) — the ranking
    // metric every quality-classifier gate reports, computed WITHOUT a
    // global sort: scores collapse to exact integer cents, per-score
    // (pos, neg) counts shuffle once, and the global neg-below-score
    // prefix uses the distributed-rank construction (32 gridBin range
    // buckets + broadcast prefix offsets + per-bucket windows — the
    // q_win_ntile_pct pattern), so every stage stays parallel at any N.
    // The statistic is pure integer arithmetic — U2 = Σ_s pos(s)·
    // (2·negBelow(s) + neg(s)) is twice the U sum with ties counted
    // half — and only the final AUC division touches floats, rounded to
    // the 1e-9 grid. Label = purchase events; score = the event value.
    "q_agg_auc_rank" -> ((s, d) => {
      val g = Tables(s, d, "events")
        .select(round(col("value") * 100).cast("long").as("cents"),
          (col("event_type") === "purchase").cast("long").as("pos"))
        .groupBy("cents")
        .agg(sum("pos").as("pc"), sum(lit(1L) - col("pos")).as("nc"))
      val bounds = g.agg(min("cents").as("lo"), max("cents").as("hi"))
      val binned = g.crossJoin(broadcast(bounds))
        .withColumn("b", U.gridBin(col("cents").cast("double"),
          col("lo").cast("double"), col("hi").cast("double"), 32))
      val offs = U.prefixOffsets(
        binned.groupBy("b").agg(sum("nc").as("bnc")), "b", "bnc")
        .select(col("b"), col("off"))
      val w = Window.partitionBy("b").orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, -1)
      binned.join(broadcast(offs), "b")
        .withColumn("nb", col("off") + coalesce(sum("nc").over(w), lit(0L)))
        .agg(sum("pc").as("pos_n"), sum("nc").as("neg_n"),
          sum(col("pc") * (lit(2L) * col("nb") + col("nc"))).as("u2"))
        .select(col("pos_n"), col("neg_n"), col("u2"),
          round(col("u2").cast("double") /
            (lit(2.0) * col("pos_n") * col("neg_n")), 9).as("auc"))
    }),

    // Covariance matrix of the first 8 embedding dimensions — the
    // single-pass Σx/Σxy moment aggregation under PCA/whitening. All 45
    // sums (8 first moments + 36 + n) ride ONE partial+final aggregate
    // over one scan — the vectors never shuffle — then a stack() of the
    // single result row reshapes to (i, j, cov) rows. Per-row products
    // are rounded to the 1e-9 grid before the DECIMAL(28,9) sum (the
    // ppl_proxy rule: float→double widening is exact in both engines,
    // the product is one IEEE op, and early rounding pins the grid);
    // cov = sij/n − (si/n)(sj/n) in pinned double order, rounded 1e-9.
    "q_agg_covariance" -> ((s, d) => {
      val pairs = for { i <- 0 until 8; j <- i until 8 } yield (i, j)
      val e = Tables(s, d, "embeddings")
      val sums = e.agg(count(lit(1)).as("n"),
        (0 until 8).map(i => sum(expr(
          s"CAST(round(CAST(embedding[$i] AS DOUBLE), 9) AS DECIMAL(28,9))"))
          .as(s"s_$i")) ++
        pairs.map { case (i, j) => sum(expr(
          s"""CAST(round(CAST(embedding[$i] AS DOUBLE)
              * CAST(embedding[$j] AS DOUBLE), 9) AS DECIMAL(28,9))"""))
          .as(s"s_${i}_$j") }: _*)
      val stacked = pairs.map { case (i, j) =>
        s"""$i, $j, round(CAST(s_${i}_$j AS DOUBLE) / n
            - (CAST(s_$i AS DOUBLE) / n) * (CAST(s_$j AS DOUBLE) / n), 9)"""
      }.mkString(", ")
      sums.select(expr(
          s"stack(${pairs.size}, $stacked) AS (i, j, cov)"))
        .orderBy("i", "j")
    }),

    // First-order Markov transition matrix over each user's event-type
    // sequence — the user-journey model behind funnel and next-action
    // analysis. One lag window per user (a single hash shuffle, O(1)
    // state per row), then a |types|² aggregate; the row-marginal dim
    // (≤ |types| rows) broadcasts back for the transition probability.
    // cnt and tot are exact longs; p is one integer-ratio division
    // rounded to the 1e-9 grid.
    "q_ts_markov" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("event_id")
      val trans = Tables(s, d, "events")
        .select(col("user_id"), col("event_id"), col("event_type").as("to_t"))
        .withColumn("from_t", lag(col("to_t"), 1).over(w))
        .where(col("from_t").isNotNull)
        .groupBy("from_t", "to_t").agg(count(lit(1)).as("cnt"))
      val marg = trans.groupBy("from_t").agg(sum("cnt").as("tot"))
      trans.join(broadcast(marg), "from_t")
        .select(col("from_t"), col("to_t"), col("cnt"),
          round(col("cnt").cast("double") / col("tot"), 9).as("p"))
        .orderBy("from_t", "to_t")
    }),

    // Changelog apply — the CDC companion to q_cdc_snapshot_diff: a
    // deterministic synthetic op log (seq-stamped Update / Delete /
    // Insert rows over the orders snapshot) collapses to one winner per
    // key via LAST-WRITER-WINS (row_number over seq DESC inside each
    // key's hash bucket — per-key window, fully parallel), then applies
    // in ONE full-outer equi-join: U/I rewrite the price, D drops the
    // row, untouched keys pass through. Overlapping ops on one key
    // (k≡0 mod 5 AND k≡3 mod 17 gets both a U and a later D) resolve by
    // seq, which is the point of the LWW collapse. Insert keys offset by
    // the snapshot's ACTUAL max key (a broadcast 1-row dim), never a
    // constant — a fixed 1e7 offset silently collides with real keys on
    // any input whose key space outgrows it (the ×100 replica's strided
    // orderkeys reach ~6e7), turning inserts into phantom updates.
    // Linear: one window shuffle over the log + one join shuffle, both
    // on the key.
    "q_cdc_apply_log" -> ((s, d) => {
      val snap = Tables(s, d, "orders")
        .select(col("o_orderkey").as("k"), col("o_totalprice").as("price"))
      val mx = snap.agg(max("k").as("mx"))
      val log = snap.where(pmod(col("k"), lit(5L)) === 0)
        .select(col("k"), lit(1L).as("seq"), lit("U").as("op"),
          (col("price") + 10.0).as("np"))
        .unionByName(snap.where(pmod(col("k"), lit(17L)) === 3)
          .select(col("k"), lit(2L).as("seq"), lit("D").as("op"),
            lit(null).cast("double").as("np")))
        .unionByName(snap.where(pmod(col("k"), lit(23L)) === 7)
          .crossJoin(broadcast(mx))
          .select((col("k") + col("mx") + 1L).as("k"), lit(1L).as("seq"),
            lit("I").as("op"), col("price").as("np")))
      val lww = log.withColumn("rn", row_number().over(
          Window.partitionBy("k").orderBy(col("seq").desc, col("op"))))
        .where(col("rn") === 1).select("k", "op", "np")
      snap.join(lww, Seq("k"), "full_outer")
        .where(col("op").isNull || col("op") =!= "D")
        .select(col("k").as("o_orderkey"),
          when(col("op").isNull, col("price")).otherwise(col("np"))
            .as("o_totalprice"))
        .orderBy("o_orderkey")
    }),

    // Hashing-trick featurizer — the fixed-width, vocabulary-free
    // text→vector map (Weinberger et al.) used when a 10⁸-term vocab
    // can't be a dim table: bucket = md5-fold(term) mod 32, per-doc
    // bucket counts in sparse (doc, bucket, cnt) form. Map-side explode
    // + one group-by — linear, no vocab state anywhere. The doc_id mod 7
    // filter only bounds the ORACLE output; the featurization itself
    // has no driver-side anything to cap.
    "q_llm_feature_hash" -> ((s, d) =>
      Tables(s, d, "documents")
        .where(pmod(col("doc_id"), lit(7L)) === 0)
        .select(col("doc_id"), explode(textTokens).as("term"))
        .select(col("doc_id"),
          expr(s"${hexFold("md5(concat('fh', term))", 12)} % 32").as("bucket"))
        .groupBy("doc_id", "bucket").agg(count(lit(1)).as("cnt"))
        .orderBy("doc_id", "bucket"))
  )

  /** The BM25 oracle's shared CTE chain (docs → stats → tf → idf → sc →
    * ranked) — one text, two oracles, mirroring the shared bm25Ranked
    * frame on the Spark side. */
  private def bm25OracleCtes: String = {
    val terms = QueryTerms.map(t => s"'$t'").mkString(", ")
    s"""docs AS (SELECT doc_id, len(string_split(text, ' ')) AS dl
             FROM documents),
         st AS (SELECT COUNT(*) AS n, CAST(SUM(dl) AS BIGINT) AS sdl FROM docs),
         tf AS (SELECT doc_id, term, COUNT(*) AS tf
           FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                 FROM documents)
           WHERE term IN ($terms) GROUP BY doc_id, term),
         idf AS (SELECT term,
             round(ln((n - df + 0.5) / (df + 0.5) + 1.0), 9) AS idf
           FROM (SELECT term, COUNT(*) AS df FROM tf GROUP BY term), st),
         sc AS (SELECT tf.doc_id,
             round(idf * (tf * ${K1 + 1.0}) /
               (tf + $K1 * (${1.0 - B} + $B *
                 CAST(dl * n AS DOUBLE) / sdl)), 9) AS ts_term
           FROM tf JOIN idf USING (term) JOIN docs USING (doc_id), st),
         ranked AS (SELECT doc_id, COUNT(*) AS n_terms,
             CAST(SUM(CAST(ts_term AS DECIMAL(18,9))) AS DOUBLE) AS score
           FROM sc GROUP BY doc_id
           ORDER BY score DESC, doc_id LIMIT 20)"""
  }

  val oracle: Map[String, String] = Map(
    "q_llm_bm25" ->
      s"""WITH $bm25OracleCtes
         SELECT doc_id, n_terms, score FROM ranked
         ORDER BY score DESC, doc_id""",

    "q_llm_retrieval_ndcg" ->
      s"""WITH $bm25OracleCtes,
         rk AS (SELECT doc_id, n_terms AS rel,
             ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rank
           FROM ranked),
         relall AS (SELECT doc_id, COUNT(DISTINCT term) AS rel FROM tf
           GROUP BY doc_id),
         ideal AS (SELECT ROW_NUMBER() OVER (ORDER BY rel DESC, doc_id)
             AS rank, rel AS ideal_rel
           FROM (SELECT * FROM relall ORDER BY rel DESC, doc_id LIMIT 10)),
         mrr AS (SELECT COALESCE(round(CAST(1.0 AS DOUBLE) / MIN(rank), 9),
             CAST(0.0 AS DOUBLE)) AS mrr FROM rk WHERE rel = 3),
         c AS (SELECT r.rank, r.doc_id, r.rel, i.ideal_rel,
             round(CAST((1 << r.rel) - 1 AS DOUBLE)
               / round(log2(r.rank + 1), 9), 9) AS g,
             round(CAST((1 << i.ideal_rel) - 1 AS DOUBLE)
               / round(log2(r.rank + 1), 9), 9) AS ig
           FROM rk r JOIN ideal i USING (rank) WHERE r.rank <= 10),
         w AS (SELECT rank, doc_id, rel, ideal_rel,
             CAST(SUM(CAST(g AS DECIMAL(18,9))) OVER (ORDER BY rank)
               AS DOUBLE) AS dcg,
             CAST(SUM(CAST(ig AS DECIMAL(18,9))) OVER (ORDER BY rank)
               AS DOUBLE) AS idcg
           FROM c)
         SELECT rank, doc_id, rel, ideal_rel, dcg, idcg,
           round(dcg / idcg, 9) AS ndcg, mrr
         FROM w, mrr ORDER BY rank""",

    "q_agg_countmin" ->
      s"""WITH tok AS (SELECT unnest(string_split(text, ' ')) AS term
             FROM documents),
         cells AS (SELECT j,
             ${oHexFold("md5('cm' || j::VARCHAR || '|' || term)", 12)} % 64
               AS bkt, COUNT(*) AS cell
           FROM tok CROSS JOIN (SELECT unnest(range(0, 4)) AS j)
           GROUP BY 1, 2),
         probes AS (SELECT term, COUNT(*) AS exact_cnt FROM tok
           GROUP BY term ORDER BY exact_cnt DESC, term LIMIT 10),
         pb AS (SELECT term, exact_cnt, j,
             ${oHexFold("md5('cm' || j::VARCHAR || '|' || term)", 12)} % 64
               AS bkt
           FROM probes CROSS JOIN (SELECT unnest(range(0, 4)) AS j))
         SELECT term, exact_cnt, MIN(cell) AS cm_est
         FROM pb JOIN cells USING (j, bkt)
         GROUP BY term, exact_cnt ORDER BY exact_cnt DESC, term""",

    "q_agg_auc_rank" ->
      """WITH e AS (SELECT CAST(round(value * 100) AS BIGINT) AS cents,
             CAST(event_type = 'purchase' AS BIGINT) AS pos FROM events),
         g AS (SELECT cents, CAST(SUM(pos) AS BIGINT) AS pc,
             CAST(SUM(1 - pos) AS BIGINT) AS nc FROM e GROUP BY cents),
         w AS (SELECT pc, nc, COALESCE(CAST(SUM(nc) OVER (ORDER BY cents
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
             0) AS nb FROM g)
         SELECT CAST(SUM(pc) AS BIGINT) AS pos_n,
           CAST(SUM(nc) AS BIGINT) AS neg_n,
           CAST(SUM(pc * (2 * nb + nc)) AS BIGINT) AS u2,
           round(CAST(SUM(pc * (2 * nb + nc)) AS DOUBLE) /
             (2.0 * SUM(pc) * SUM(nc)), 9) AS auc
         FROM w""",

    "q_agg_covariance" -> {
      val pairs = for { i <- 0 until 8; j <- i until 8 } yield (i, j)
      val firsts = (0 until 8).map(i =>
        s"""SUM(CAST(round(CAST(embedding[${i + 1}] AS DOUBLE), 9)
            AS DECIMAL(28,9))) AS s_$i""").mkString(", ")
      val seconds = pairs.map { case (i, j) =>
        s"""SUM(CAST(round(CAST(embedding[${i + 1}] AS DOUBLE)
            * CAST(embedding[${j + 1}] AS DOUBLE), 9)
            AS DECIMAL(28,9))) AS s_${i}_$j""" }.mkString(", ")
      val rows = pairs.map { case (i, j) =>
        s"""SELECT $i AS i, $j AS j, round(CAST(s_${i}_$j AS DOUBLE) / n
            - (CAST(s_$i AS DOUBLE) / n) * (CAST(s_$j AS DOUBLE) / n), 9)
            AS cov FROM t""" }.mkString(" UNION ALL ")
      s"""WITH t AS (SELECT COUNT(*) AS n, $firsts, $seconds
            FROM embeddings)
          $rows ORDER BY i, j"""
    },

    "q_ts_markov" ->
      """WITH tr AS (SELECT from_t, event_type AS to_t FROM (
             SELECT event_type, LAG(event_type, 1) OVER (
               PARTITION BY user_id ORDER BY event_id) AS from_t
             FROM events) WHERE from_t IS NOT NULL),
         c AS (SELECT from_t, to_t, COUNT(*) AS cnt FROM tr
               GROUP BY from_t, to_t),
         m AS (SELECT from_t, CAST(SUM(cnt) AS BIGINT) AS tot FROM c
               GROUP BY from_t)
         SELECT from_t, to_t, cnt, round(CAST(cnt AS DOUBLE) / tot, 9) AS p
         FROM c JOIN m USING (from_t) ORDER BY from_t, to_t""",

    "q_cdc_apply_log" ->
      """WITH snap AS (SELECT o_orderkey AS k, o_totalprice AS price
             FROM orders),
         mx AS (SELECT MAX(k) AS mx FROM snap),
         log AS (
           SELECT k, 1 AS seq, 'U' AS op, price + 10.0 AS np FROM snap
             WHERE k % 5 = 0
           UNION ALL
           SELECT k, 2, 'D', NULL FROM snap WHERE k % 17 = 3
           UNION ALL
           SELECT k + mx + 1, 1, 'I', price FROM snap, mx WHERE k % 23 = 7),
         lww AS (SELECT k, op, np FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY k
               ORDER BY seq DESC, op) AS rn FROM log) WHERE rn = 1)
         SELECT COALESCE(s.k, l.k) AS o_orderkey,
           CASE WHEN l.op IS NULL THEN s.price ELSE l.np END AS o_totalprice
         FROM snap s FULL JOIN lww l ON s.k = l.k
         WHERE l.op IS NULL OR l.op <> 'D'
         ORDER BY o_orderkey""",

    "q_llm_feature_hash" ->
      s"""SELECT doc_id,
           ${oHexFold("md5('fh' || term)", 12)} % 32 AS bucket,
           COUNT(*) AS cnt
         FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
               FROM documents WHERE doc_id % 7 = 0)
         GROUP BY doc_id, bucket ORDER BY doc_id, bucket"""
  )
}
