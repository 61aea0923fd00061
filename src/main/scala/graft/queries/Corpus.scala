package graft.queries

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import U._

/** Round-5 batch (SURVEY §2.25): corpus/tokenizer-model operators — the
  * steps between "cleaned documents" and "training batches" that round 4's
  * dedup/quality/packing families feed into.
  *
  * Scale notes, per operator:
  *  - vocab_coverage: token counts are ONE shuffle over terms; the
  *    coverage curve is computed entirely on the capped top-1000 frame
  *    (constant-size triangle rank join, the bpe_pairs construction) plus
  *    one broadcast of the 1-row corpus totals. Linear in tokens.
  *  - kneser_ney: bigram counts + three keyed marginal aggregates, all
  *    partial-agg shuffles on w1/w2 — linear in bigram tokens; marginals
  *    are vocab-bounded and join back on their own keys (equi-joins, no
  *    broadcast needed — at web scale the bigram TYPE table itself is
  *    huge, the bigram-LM lesson from q_llm_bigram_lm).
  *  - sample_weighted: the Efraimidis–Spirakis one-pass shape — a map
  *    computes each row's exponential key from a deterministic md5
  *    uniform, then TakeOrdered's per-partition heaps keep k rows per
  *    partition and the driver merges k. No global sort, no shuffle of
  *    the data itself, any N.
  *  - ts_holt: identical window shape to q_ts_ewma (trailing 50 rows per
  *    user key); the 2-component [level, trend] fold state rides a
  *    DOUBLE[] accumulator because DuckDB v1.0 list_reduce corrupts
  *    STRUCT accumulators (multi-field dependencies read stale fields —
  *    probed during this round's design) while LIST accumulators fold
  *    correctly.
  */
object Corpus {

  /** Vocabulary budget curve points (tokens covered by a top-V vocab). */
  private val vocabSizes = Seq(100, 300, 1000)

  /** BPE training rounds (merge → recount → merge …). */
  private val bpeRounds = 3

  /** DuckDB fragments of the unigram Viterbi step — built from the SAME
    * k = 1..4 candidate template as the Spark side (i is `e[1]`, the
    * [x]-wrapped fold item; acc is the flattened (score, bp) pair list,
    * 1-based). Kept as code, not prose, so the two engines' DP cannot
    * drift: the only differences are 1-based subscripts and the map
    * lookup spelling. */
  private def oUgCand(k: Int): String =
    s"""CASE WHEN CAST(e[1] AS INT) - $k >= 0 THEN
          acc[2 * (CAST(e[1] AS INT) - $k) + 1] +
          coalesce(m[substring(word, CAST(e[1] AS INT) - $k + 1, $k)][1],
            CAST(-1e9 AS DOUBLE))
        ELSE CAST(-1e18 AS DOUBLE) END"""
  private lazy val oUgBest =
    s"greatest(${(1 to 4).map(oUgCand).mkString(", ")})"
  private lazy val oUgBp =
    s"""CASE WHEN $oUgBest = ${oUgCand(1)} THEN CAST(e[1] AS INT) - 1
             WHEN $oUgBest = ${oUgCand(2)} THEN CAST(e[1] AS INT) - 2
             WHEN $oUgBest = ${oUgCand(3)} THEN CAST(e[1] AS INT) - 3
             ELSE CAST(e[1] AS INT) - 4 END"""

  /** Pair counts over space-joined symbol states `toks` weighted by word
    * frequency — the recount step of every BPE round. */
  private def bpePairCounts(wf: org.apache.spark.sql.DataFrame) =
    wf.select(col("freq"), expr("split(toks, ' ')").as("tk"))
      .select(col("freq"), explode(expr(
        """CASE WHEN size(tk) < 2 THEN array()
           ELSE transform(sequence(1, size(tk) - 1),
                  i -> named_struct('l', tk[i-1], 'r', tk[i])) END""")).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("freq")).as("cnt"))

  /** The distinct-word vocabulary with char-split symbol states — round 0
    * of BPE training; `word` rides along so trained states can join back
    * to the corpus (bpe_apply). */
  private def bpeWords(s: org.apache.spark.sql.SparkSession, d: String) =
    graft.Tables(s, d, "documents")
      .select(explode(textTokens).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .select(col("word"), expr(
        "array_join(transform(sequence(1, length(word)), i -> substring(word, i, 1)), ' ')")
        .as("toks"), col("freq"))

  /** Run `bpeRounds` merge rounds; returns (per-round winner frames,
    * final per-word symbol states). */
  private def bpeLoop(s: org.apache.spark.sql.SparkSession, d: String)
      : (Seq[org.apache.spark.sql.DataFrame], org.apache.spark.sql.DataFrame) = {
    var wf = bpeWords(s, d)
    val merges = (1 to bpeRounds).map { r =>
      // lazy checkpoint: the 1-row winner feeds BOTH the output union
      // and the next round's merge map; without it round 3's plan
      // re-derives rounds 1-2 once per consumer
      val b = bpePairCounts(wf)
        .orderBy(col("cnt").desc, col("l"), col("r")).limit(1)
        .localCheckpoint(false)
      wf = bpeApply(wf, b)
      b.select(lit(r).as("merge_round"), col("l"), col("r"), col("cnt"))
    }
    (merges, wf)
  }

  /** Greedy left-to-right application of the broadcast winning pair (l, r)
    * to every word's symbol state: fold the symbol list into a
    * space-joined string, replacing each `… l` suffix followed by `r` with
    * the merged symbol `lr`. Token-level suffix equality (`acc = l` or
    * `acc` ends in ` l`) is what makes the merge NON-OVERLAPPING: after
    * 'a a' → 'aa' the last token is 'aa', not 'a', so 'a a a' becomes
    * 'aa a' exactly as a real BPE trainer merges. */
  private def bpeApply(wf: org.apache.spark.sql.DataFrame,
      best: org.apache.spark.sql.DataFrame) =
    wf.crossJoin(broadcast(best))
      .select(col("word"), expr(
        """aggregate(split(toks, ' '), '',
             (acc, c) -> CASE
               WHEN (acc = l OR endswith(acc, concat(' ', l))) AND c = r
               THEN concat(substring(acc, 1, length(acc) - length(l)), l, r)
               ELSE CASE WHEN acc = '' THEN c
                         ELSE concat(acc, ' ', c) END END)""").as("toks"),
        col("freq"))

  val queries: Map[String, Q] = Map(

    // Vocabulary coverage / OOV curve: what fraction of corpus tokens (and
    // of distinct types) does a top-V frequency vocabulary cover, for the
    // budget ladder V ∈ {100, 300, 1000}? The tokenizer-budget planning
    // query every vocab decision starts from. Ranks are computed on the
    // capped top-1000 frame with the WINDOWLESS broadcast triangle join
    // (rank(t) = #rows sorting at-or-before t — the bpe_pairs
    // construction; a bare row_number() here would be the single-partition
    // window PlanSpec bans). Coverage ratios are exact integer micro-units
    // (floor div) — no float, no rounding divergence.
    "q_llm_vocab_coverage" -> ((s, d) => {
      val tf = Tables(s, d, "documents")
        .select(explode(textTokens).as("term"))
        .groupBy("term").agg(count(lit(1)).as("cnt"))
        .localCheckpoint(false)
      val tot = tf.agg(sum(col("cnt")).as("tot_tok"),
        count(lit(1)).as("tot_types"))
      val top = tf.orderBy(col("cnt").desc, col("term")).limit(1000)
        .localCheckpoint(false)
      val ranked = top.join(
          broadcast(top.select(col("cnt").as("c2"), col("term").as("t2"))),
          col("c2") > col("cnt") ||
            (col("c2") === col("cnt") && col("t2") <= col("term")))
        .groupBy("term", "cnt").agg(count(lit(1)).as("rank"))
      ranked
        .select(col("cnt"), col("rank"),
          explode(array(vocabSizes.map(v => lit(v)): _*)).as("vocab_size"))
        .where(col("rank") <= col("vocab_size"))
        .groupBy("vocab_size")
        .agg(sum(col("cnt")).as("covered_tokens"),
          count(lit(1)).as("covered_types"))
        .crossJoin(broadcast(tot))
        .select(col("vocab_size"), col("covered_tokens"), col("covered_types"),
          expr("(1000000 * covered_tokens) div tot_tok").as("token_cov_e6"),
          expr("(1000000 * covered_types) div tot_types").as("type_cov_e6"))
        .orderBy("vocab_size")
    }),

    // Kneser–Ney smoothed bigram probabilities (absolute discount
    // d = 0.75) for the corpus's top-50 bigrams — the n-gram-LM step up
    // from q_llm_bigram_lm's raw MLE: P(w2|w1) interpolates the
    // discounted bigram estimate with the CONTINUATION probability (how
    // many distinct contexts w2 follows, not how often — the KN insight
    // that makes "Francisco" rare outside "San _"). The probability is
    // one fixed-order libm-free IEEE expression over exact integer
    // marginals ⇒ bit-identical cross-engine (the qualityLogit
    // discipline); output rounded to the 1e-9 grid anyway.
    "q_llm_kneser_ney" -> ((s, d) => {
      val c12 = Tables(s, d, "documents")
        .select(textTokens.as("tk"))
        .select(explode(expr(
          """CASE WHEN size(tk) < 2 THEN array()
             ELSE transform(sequence(1, size(tk) - 1),
                    i -> named_struct('w1', tk[i-1], 'w2', tk[i])) END""")).as("b"))
        .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
        .groupBy("w1", "w2").agg(count(lit(1)).as("c"))
        .localCheckpoint(false)
      val left = c12.groupBy("w1")
        .agg(sum(col("c")).as("c1"), count(lit(1)).as("nfollow"))
      val cont = c12.groupBy("w2").agg(count(lit(1)).as("nprec"))
      val types = c12.agg(count(lit(1)).as("ntypes"))
      c12.join(left, "w1").join(cont, "w2")
        .crossJoin(broadcast(types))
        .select(col("w1"), col("w2"), col("c"),
          round(
            expr("greatest(CAST(c AS DOUBLE) - 0.75, 0.0) / CAST(c1 AS DOUBLE)") +
            expr("(0.75 * CAST(nfollow AS DOUBLE) / CAST(c1 AS DOUBLE))") *
            expr("(CAST(nprec AS DOUBLE) / CAST(ntypes AS DOUBLE))"), 9).as("p_kn"))
        .orderBy(col("c").desc, col("w1"), col("w2")).limit(50)
    }),

    // Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-ES):
    // each doc draws a deterministic uniform u from md5(doc_id) and is
    // ranked by ln(u)/w (monotone in u^(1/w)); the global top-100 of that
    // key IS an exact weighted sample without replacement. Weights are
    // the shared qualityE6 score (quality-proportional sampling, the
    // data-mixing primitive). ln() is the one libm call: both engines
    // evaluate it on the SAME double, and selection could only diverge if
    // two keys at the cutoff sat within an ulp (md5-derived keys are
    // ~1e-3 apart at this k/N; the output key is grid-rounded besides).
    // u ∈ (0, 1]: the +1 on the 13-hex-digit fold excludes ln(0).
    "q_sample_weighted" -> ((s, d) =>
      Tables(s, d, "documents")
        .select(col("doc_id"), col("text"))
        .withColumn("w_e6", qualityE6)
        .withColumn("u", expr(
          s"(CAST(${hexFold("md5(concat('ws', CAST(doc_id AS STRING)))", 13)} AS DOUBLE) + 1.0)" +
            " / 4503599627370496.0"))
        .select(col("doc_id"), col("w_e6"),
          expr("ln(u) / (CAST(w_e6 AS DOUBLE) / 1000000.0)").as("es_key"))
        .orderBy(col("es_key").desc, col("doc_id")).limit(100)
        .select(col("doc_id"), col("w_e6"), round(col("es_key"), 9).as("es_key"))),

    // Curriculum ordering: every doc gets a difficulty TIER (quartile of
    // the shared qualityE6 score, ascending — hardest first is tier 4)
    // and an interleaved SHARD within its tier — the "order the corpus
    // easy→hard, then stripe each phase across workers" step a curriculum
    // training schedule needs. Exact global quartiles WITHOUT a global
    // window: the q_win_ntile_pct construction (U.gridBin equi-width
    // buckets over broadcast bounds → U.prefixOffsets triangle join →
    // per-bucket window), then tier and tier-position are pure integer
    // arithmetic on the global pos — bit-identical to NTILE, at any N,
    // with bucket count scaling with the cluster.
    "q_llm_curriculum" -> ((s, d) => {
      val docs = Tables(s, d, "documents")
        .select(col("doc_id"), qualityE6.as("q"))
      val bounds = docs.agg(min("q").as("lo"), max("q").as("hi"),
        count(lit(1)).as("ntot"))
      val bucketed = docs.crossJoin(broadcast(bounds))
        .withColumn("b", gridBin(col("q"), col("lo"), col("hi"), 32))
      val offs = prefixOffsets(
        bucketed.groupBy("b").agg(count(lit(1)).as("cnt")), "b", "cnt")
        .select("b", "off")
      val wb = Window.partitionBy("b").orderBy("q", "doc_id")
      bucketed.join(broadcast(offs), "b")
        .withColumn("pos", col("off") + row_number().over(wb))
        .withColumn("qq", expr("ntot div 4"))
        .withColumn("rr", expr("ntot % 4"))
        .withColumn("tier", expr(
          """CAST(CASE WHEN pos <= rr * (qq + 1) THEN (pos + qq) div (qq + 1)
                  ELSE rr + (pos - rr * (qq + 1) + qq - 1) div qq END AS INT)"""))
        .withColumn("tier_pos", expr(
          """pos - (CASE WHEN tier <= rr + 1 THEN (tier - 1) * (qq + 1)
                    ELSE rr * (qq + 1) + (tier - 1 - rr) * qq END)"""))
        .select(col("doc_id"), col("q"), col("tier"), col("tier_pos"),
          expr("CAST((tier_pos - 1) % 8 AS INT)").as("shard"))
        .orderBy("doc_id")
    }),

    // BPE tokenizer TRAINING — the full merge loop, not just the pair
    // scan (q_llm_bpe_pairs is the one-round selection step): 3 rounds of
    // count adjacent symbol pairs (weighted by word frequency) → pick the
    // global argmax (cnt desc, pair asc tiebreak — a 1-row TakeOrdered) →
    // broadcast the winner and greedily re-merge every word's symbol
    // string → recount. The corpus compresses to its DISTINCT-word
    // vocabulary before any character work (the classic trainer
    // optimization — per-round cost is vocab-sized, not corpus-sized),
    // each recount is one partial-agg shuffle over pairs, and the merge
    // itself is a map with a 1-row broadcast: the pagerank-style
    // driver-loop shape, linear per round at any corpus size. Output: the
    // 3 learned merges in order with their support counts.
    "q_llm_bpe_train" -> ((s, d) =>
      bpeLoop(s, d)._1.reduce(_ unionAll _).orderBy("merge_round")),

    // APPLY the learned merges back to the corpus — the tokenizer
    // evaluation step: per source, how many symbols did the 3 merges
    // save? The trained per-word states (vocab-sized, `word` keyed) join
    // the corpus's (source, token) stream on the word key — a plain
    // equi-join, build side vocab-bounded (broadcastable when the vocab
    // is small, keyed shuffle when it is web-scale; the join key is the
    // honest choice either way). Savings are exact integer micro-units.
    "q_llm_bpe_apply" -> ((s, d) => {
      val sym = bpeLoop(s, d)._2
        .select(col("word"),
          length(col("word")).cast("long").as("n_before"),
          expr("size(split(toks, ' '))").cast("long").as("n_after"))
      // fanOut (r14): tokenize+probe runs at the scan's partition count
      // (1 at fixture scale) — the corpus side of the vocab join was a
      // single-core explode+probe pass.
      fanOut(Tables(s, d, "documents"))
        .select(col("source"), explode(textTokens).as("word"))
        .join(sym, "word")
        .groupBy("source")
        .agg(count(lit(1)).as("n_words"),
          sum(col("n_before")).as("symbols_before"),
          sum(col("n_after")).as("symbols_after"))
        .select(col("source"), col("n_words"), col("symbols_before"),
          col("symbols_after"),
          expr("(1000000 * (symbols_before - symbols_after)) div symbols_before")
            .as("saved_e6"))
        .orderBy("source")
    }),

    // Holt linear-trend smoothing (double exponential smoothing,
    // α = 1/2, β = 1/4) per user over the trailing-50 event window — the
    // level+trend upgrade of q_ts_ewma, with a one-step-ahead forecast.
    // Same window shape (keyed, constant 50-row state per output row ⇒
    // linear); the fold state is the DOUBLE[2] [level, trend] vector,
    // seeded [first value, 0]. Every step is the same fixed-order IEEE
    // expression in both engines ⇒ bit-identical outputs, no grid needed
    // (the ewma precedent; α, β are exact binary fractions so the scale
    // factors themselves are exact too).
    "q_ts_holt" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("event_id")
        .rowsBetween(-49, Window.currentRow)
      Tables(s, d, "events")
        .withColumn("vs", collect_list(col("value")).over(w))
        .withColumn("st", expr(
          """aggregate(
               CASE WHEN size(vs) < 2 THEN CAST(array() AS ARRAY<DOUBLE>)
                    ELSE slice(vs, 2, size(vs) - 1) END,
               array(vs[0], CAST(0.0 AS DOUBLE)),
               (acc, v) -> array(
                 v * 0.5 + (acc[0] + acc[1]) * 0.5,
                 ((v * 0.5 + (acc[0] + acc[1]) * 0.5) - acc[0]) * 0.25
                   + acc[1] * 0.75))"""))
        .select(col("user_id"), col("event_id"),
          col("st")(0).as("level"), col("st")(1).as("trend"),
          (col("st")(0) + col("st")(1)).as("fc1"))
        .orderBy("event_id")
    }),

    // Unigram-LM tokenizer E-step (SURVEY §2.34) — the SentencePiece
    // sibling of the BPE family: seed a piece vocabulary (every
    // single character for coverage + the top-48 multi-char substrings
    // ≤ 4 chars by corpus-weighted count), Viterbi-segment every
    // DISTINCT word under log-probabilities, and report the EM
    // expected piece counts with the prior → posterior probability
    // update — the statistic one EM iteration renormalizes.
    // Scale shape: the corpus reduces to the distinct-word frame ONCE
    // (vocab-scale, the bpe_words discipline); the piece vocabulary is
    // KB-scale and rides a 1-row broadcast MAP into the per-word DP;
    // the Viterbi fold is O(len·4) per word with a flat ARRAY<DOUBLE>
    // accumulator of (score, backpointer) pairs — the holt_winters
    // homogeneous-fold encoding, mirrored verbatim in DuckDB's
    // list_reduce (list-prepended init, [x]-wrapped items); the
    // backtrace is a second bounded fold prepending boundaries until
    // position 0. EXACTNESS: log-probs on the 1e-9 grid, every DP
    // score rounded to the grid per step (identical operand order both
    // engines ⇒ identical doubles ⇒ identical argmax; ties break to
    // the SHORTEST last piece via the fixed j = i−1 … i−4 CASE order);
    // probabilities reported as exact integer micro-units
    // (1e6·cnt div total), never a float division.
    "q_llm_unigram_lm" -> ((s, d) => {
      val wf = Tables(s, d, "documents")
        .select(explode(textTokens).as("word"))
        .where(length(col("word")) > 0)
        .groupBy("word").agg(count(lit(1)).as("freq"))
      // candidate pieces: all substrings len 1..4, corpus-weighted
      val subs = wf.select(col("freq"), explode(expr(
          """flatten(transform(sequence(1, length(word)),
               i -> transform(sequence(i, least(length(word), i + 3)),
                 j -> substring(word, i, j - i + 1))))""")).as("piece"))
        .groupBy("piece").agg(sum(col("freq")).as("cnt"))
      val singles = subs.where(length(col("piece")) === 1)
      val multis = subs.where(length(col("piece")) >= 2)
        .orderBy(col("cnt").desc, col("piece")).limit(48)
      val vocab = singles.unionAll(multis).localCheckpoint(false)
      val tot = vocab.agg(sum(col("cnt")).as("vt"))
      val lm = vocab.crossJoin(broadcast(tot))
        .select(col("piece"), col("cnt"),
          expr("round(ln(CAST(cnt AS DOUBLE) / vt), 9)").as("lp"))
      val m = lm.agg(map_from_entries(
          sort_array(collect_list(struct(col("piece"), col("lp")))))
          .as("m"))
      // Viterbi DP: dp = [b0, j0, b1, j1, …] flattened (score, bp)
      val cand = (1 to 4).map { k =>
        s"""CASE WHEN i - $k >= 0 THEN
              element_at(acc, 2 * (i - $k) + 1) +
              coalesce(element_at(m, substring(word, i - $k + 1, $k)),
                CAST(-1e9 AS DOUBLE))
            ELSE CAST(-1e18 AS DOUBLE) END"""
      }
      val best = s"greatest(${cand.mkString(", ")})"
      val bp = s"""CASE WHEN $best = ${cand(0)} THEN i - 1
                        WHEN $best = ${cand(1)} THEN i - 2
                        WHEN $best = ${cand(2)} THEN i - 3
                        ELSE i - 4 END"""
      val seg = wf.crossJoin(broadcast(m))
        .withColumn("dp", expr(
          s"""aggregate(sequence(1, length(word)),
                array(CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE)),
                (acc, i) -> concat(acc,
                  array($best, CAST($bp AS DOUBLE))))"""))
        .withColumn("bounds", expr(
          """aggregate(sequence(1, length(word)),
               array(CAST(length(word) AS DOUBLE)),
               (acc, x) -> CASE WHEN acc[0] <= 0.0 THEN acc
                 ELSE concat(
                   array(element_at(dp, 2 * CAST(acc[0] AS INT) + 2)),
                   acc) END)"""))
        .select(col("word"), col("freq"), explode(expr(
          """transform(sequence(1, size(bounds) - 1),
               t -> substring(word, CAST(bounds[t - 1] AS INT) + 1,
                 CAST(bounds[t] AS INT) - CAST(bounds[t - 1] AS INT)))"""))
          .as("piece"))
      val eCnt = seg.groupBy("piece").agg(sum(col("freq")).as("e_cnt"))
      val eTot = eCnt.agg(sum(col("e_cnt")).as("et"))
      eCnt.join(lm.select(col("piece"), col("cnt")), "piece")
        .crossJoin(broadcast(tot)).crossJoin(broadcast(eTot))
        .select(col("piece"), col("e_cnt"),
          expr("1000000 * cnt div vt").as("prior_e6"),
          expr("1000000 * e_cnt div et").as("post_e6"))
        .orderBy(col("e_cnt").desc, col("piece")).limit(30)
    })
  )

  /** DuckDB mirror of one BPE round: pair recount over `w{k-1}` → winner
    * `b{k}` → merged states `w{k}`. The merge fold is a VARCHAR
    * accumulator (homogeneous with the symbol elements — the list_reduce
    * type rule), seed '' prepended. */
  private def oBpeRound(k: Int): String =
    s"""p$k AS (SELECT s.tk[i] AS l, s.tk[i+1] AS r,
             CAST(SUM(s.freq) AS BIGINT) AS cnt
           FROM (SELECT string_split(toks, ' ') AS tk, freq FROM w${k - 1}) s,
             unnest(range(1, greatest(len(s.tk), 1))) AS t(i)
           GROUP BY l, r),
         b$k AS (SELECT l, r, cnt FROM p$k ORDER BY cnt DESC, l, r LIMIT 1),
         w$k AS (SELECT word, list_reduce(list_prepend('', string_split(toks, ' ')),
             (acc, c) -> CASE
               WHEN (acc = l OR ends_with(acc, ' ' || l)) AND c = r
               THEN substring(acc, 1, length(acc) - length(l)) || l || r
               ELSE CASE WHEN acc = '' THEN c
                         ELSE acc || ' ' || c END END) AS toks, freq
           FROM w${k - 1}, b$k)"""

  /** Shared CTE prefix: distinct-word vocab + char-split states + the
    * `bpeRounds` unrolled merge rounds, ending at `w$bpeRounds`. */
  private def oBpeChain: String =
    s"""wd AS (SELECT word, COUNT(*) AS freq
             FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
             GROUP BY word),
         w0 AS (SELECT word, array_to_string(list_transform(range(1, length(word) + 1),
                  i -> substring(word, i, 1)), ' ') AS toks, freq
                FROM wd),
         ${(1 to bpeRounds).map(oBpeRound).mkString(",\n         ")}"""

  val oracle: Map[String, String] = Map(
    "q_llm_bpe_train" ->
      s"""WITH $oBpeChain
         SELECT merge_round, l, r, cnt FROM (
           ${(1 to bpeRounds).map(k =>
             s"SELECT $k AS merge_round, l, r, cnt FROM b$k")
             .mkString(" UNION ALL ")})
         ORDER BY merge_round""",

    "q_llm_bpe_apply" ->
      s"""WITH $oBpeChain,
         sym AS (SELECT word, CAST(length(word) AS BIGINT) AS n_before,
                   CAST(len(string_split(toks, ' ')) AS BIGINT) AS n_after
                 FROM w$bpeRounds),
         dw AS (SELECT source, unnest(string_split(text, ' ')) AS word
                FROM documents)
         SELECT source, COUNT(*) AS n_words,
           CAST(SUM(n_before) AS BIGINT) AS symbols_before,
           CAST(SUM(n_after) AS BIGINT) AS symbols_after,
           (1000000 * (CAST(SUM(n_before) AS BIGINT)
              - CAST(SUM(n_after) AS BIGINT)))
             // CAST(SUM(n_before) AS BIGINT) AS saved_e6
         FROM dw JOIN sym USING (word)
         GROUP BY source ORDER BY source""",

    "q_llm_vocab_coverage" ->
      s"""WITH tf AS (SELECT term, COUNT(*) AS cnt
             FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
             GROUP BY term),
         tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS tot_tok,
                   COUNT(*) AS tot_types FROM tf),
         top AS (SELECT term, cnt FROM tf ORDER BY cnt DESC, term LIMIT 1000),
         r AS (SELECT a.term, a.cnt, COUNT(*) AS rank
               FROM top a JOIN top b
                 ON b.cnt > a.cnt OR (b.cnt = a.cnt AND b.term <= a.term)
               GROUP BY a.term, a.cnt),
         c AS (SELECT v, CAST(SUM(cnt) AS BIGINT) AS covered_tokens,
                 COUNT(*) AS covered_types
               FROM r, unnest(${vocabSizes.mkString("[", ", ", "]")}) AS t(v)
               WHERE rank <= v GROUP BY v)
         SELECT CAST(v AS INT) AS vocab_size, covered_tokens, covered_types,
           (1000000 * covered_tokens) // tot_tok AS token_cov_e6,
           (1000000 * covered_types) // tot_types AS type_cov_e6
         FROM c, tot ORDER BY vocab_size""",

    "q_llm_curriculum" ->
      s"""WITH k AS (SELECT doc_id, $oQualityE6 AS q FROM documents),
         r AS (SELECT doc_id, q,
                 CAST(NTILE(4) OVER (ORDER BY q, doc_id) AS INT) AS tier
               FROM k),
         t AS (SELECT doc_id, q, tier,
                 ROW_NUMBER() OVER (PARTITION BY tier ORDER BY q, doc_id) AS tier_pos
               FROM r)
         SELECT doc_id, q, tier, tier_pos,
           CAST((tier_pos - 1) % 8 AS INT) AS shard
         FROM t ORDER BY doc_id""",

    "q_llm_kneser_ney" ->
      """WITH tk AS (SELECT string_split(text, ' ') AS tk FROM documents),
         b AS (SELECT tk[i] AS w1, tk[i+1] AS w2
               FROM tk, unnest(range(1, greatest(len(tk), 1))) AS t(i)),
         c12 AS (SELECT w1, w2, COUNT(*) AS c FROM b GROUP BY w1, w2),
         lft AS (SELECT w1, CAST(SUM(c) AS BIGINT) AS c1,
                   COUNT(*) AS nfollow FROM c12 GROUP BY w1),
         ct AS (SELECT w2, COUNT(*) AS nprec FROM c12 GROUP BY w2),
         nt AS (SELECT COUNT(*) AS ntypes FROM c12)
         SELECT c12.w1, c12.w2, c,
           round(greatest(CAST(c AS DOUBLE) - 0.75, 0.0) / CAST(c1 AS DOUBLE)
             + (0.75 * CAST(nfollow AS DOUBLE) / CAST(c1 AS DOUBLE))
               * (CAST(nprec AS DOUBLE) / CAST(ntypes AS DOUBLE)), 9) AS p_kn
         FROM c12 JOIN lft USING (w1) JOIN ct USING (w2), nt
         ORDER BY c DESC, w1, w2 LIMIT 50""",

    "q_sample_weighted" ->
      s"""WITH k AS (SELECT doc_id,
             $oQualityE6 AS w_e6,
             (CAST(${oHexFold("md5('ws' || CAST(doc_id AS VARCHAR))", 13)} AS DOUBLE) + 1.0)
               / 4503599627370496.0 AS u
           FROM documents)
         SELECT doc_id, w_e6,
           round(ln(u) / (CAST(w_e6 AS DOUBLE) / 1000000.0), 9) AS es_key
         FROM k
         ORDER BY ln(u) / (CAST(w_e6 AS DOUBLE) / 1000000.0) DESC, doc_id
         LIMIT 100""",

    // list accumulator, NOT struct: DuckDB v1.0 list_reduce reads stale
    // fields from STRUCT accumulators with cross-field dependencies
    // (probed: a fib fold returns (6,6) instead of (5,3)); DOUBLE[]
    // accumulators fold correctly. Elements lift to 1-lists so the
    // accumulator and element types unify, seed prepended (ewma pattern).
    "q_ts_holt" ->
      """WITH w AS (SELECT user_id, event_id,
             list(value) OVER (PARTITION BY user_id ORDER BY event_id
               ROWS BETWEEN 49 PRECEDING AND CURRENT ROW) AS vs
           FROM events),
         f AS (SELECT user_id, event_id,
             list_reduce(
               list_prepend([vs[1], 0.0],
                 list_transform(vs[2:], x -> [x])),
               (acc, e) -> [e[1] * 0.5 + (acc[1] + acc[2]) * 0.5,
                 ((e[1] * 0.5 + (acc[1] + acc[2]) * 0.5) - acc[1]) * 0.25
                   + acc[2] * 0.75]) AS st
           FROM w)
         SELECT user_id, event_id, st[1] AS level, st[2] AS trend,
           st[1] + st[2] AS fc1
         FROM f ORDER BY event_id""",

    // Engine note: DuckDB 1.0's optimizer mis-binds lambda variables
    // when a list_reduce-produced column feeds ANOTHER lambda through
    // CTE inlining (observed: the backtrace fold read a different
    // row's DP — 'customer' segmented as a 5-char word). The oracle
    // therefore (a) fences the DP fold behind a max()/GROUP BY
    // aggregate (a real materialization barrier) and (b) walks the
    // backtrace with a RECURSIVE CTE + window pairing — plain
    // expressions only, no lambda composition. Same arithmetic, same
    // result; the Spark side keeps the two-fold form (Catalyst HOFs
    // bind correctly).
    "q_llm_unigram_lm" ->
      s"""WITH RECURSIVE wf AS (SELECT word, COUNT(*) AS freq FROM (
             SELECT unnest(string_split(text, ' ')) AS word FROM documents)
           WHERE length(word) > 0 GROUP BY word),
         subs AS (SELECT piece, CAST(SUM(freq) AS BIGINT) AS cnt FROM (
             SELECT freq, unnest(flatten(list_transform(
                 range(1, length(word) + 1),
                 i -> list_transform(
                   range(i, least(length(word), i + 3) + 1),
                   j -> substring(word, i, j - i + 1))))) AS piece
             FROM wf) GROUP BY piece),
         multis AS (SELECT * FROM subs WHERE length(piece) >= 2
             ORDER BY cnt DESC, piece LIMIT 48),
         vocab AS (SELECT * FROM subs WHERE length(piece) = 1
             UNION ALL SELECT * FROM multis),
         tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS vt FROM vocab),
         lm AS (SELECT piece, cnt,
             round(ln(CAST(cnt AS DOUBLE) / vt), 9) AS lp
           FROM vocab, tot),
         mp AS (SELECT MAP(list(piece ORDER BY piece),
             list(lp ORDER BY piece)) AS m FROM lm),
         dpw AS (SELECT word, freq, m,
             list_reduce(
               list_prepend([CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE)],
                 list_transform(range(1, length(word) + 1),
                   i -> [CAST(i AS DOUBLE)])),
               (acc, e) -> list_concat(acc,
                 [$oUgBest, CAST($oUgBp AS DOUBLE)])) AS dp
           FROM wf, mp),
         dpf AS (SELECT word, freq, max(dp) AS dp FROM dpw
             GROUP BY word, freq),
         bt AS (
           SELECT word, freq, CAST(length(word) AS INT) AS pos FROM dpf
           UNION ALL
           SELECT b.word, b.freq,
             CAST(d.dp[2 * b.pos + 2] AS INT) AS pos
           FROM bt b JOIN dpf d USING (word) WHERE b.pos > 0),
         sb AS (SELECT word, freq, pos,
             lead(pos) OVER (PARTITION BY word ORDER BY pos) AS nxt
           FROM bt),
         seg AS (SELECT word, freq,
             substring(word, pos + 1, nxt - pos) AS piece
           FROM sb WHERE nxt IS NOT NULL),
         ec AS (SELECT piece, CAST(SUM(freq) AS BIGINT) AS e_cnt
             FROM seg GROUP BY piece),
         et AS (SELECT CAST(SUM(e_cnt) AS BIGINT) AS et FROM ec)
         SELECT piece, e_cnt,
           1000000 * cnt // vt AS prior_e6,
           1000000 * e_cnt // et AS post_e6
         FROM ec JOIN lm USING (piece), tot, et
         ORDER BY e_cnt DESC, piece LIMIT 30"""
  )
}
