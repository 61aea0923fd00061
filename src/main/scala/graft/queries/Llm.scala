package graft.queries

import graft.Tables
import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import U._

/** SURVEY §2.11 — LLM-data-pipeline operators (the north star).
  *
  * Scale posture: every operator is shuffle-parallel relational code — no
  * collect(), no driver loops. The similarity search uses an exact
  * broadcast-cross-join over a capped query set for oracle correctness;
  * the documented at-scale path is LSH bucketing (MinHashLSH for Jaccard
  * here; BucketedRandomProjectionLSH for cosine in Extras), which turns
  * the O(N·Q) scan into a bucket-local join.
  */
object Llm {

  private def toks = split(col("text"), " ")

  val queries: Map[String, Q] = Map(
    // The heritage MapReduce query (Dean & Ghemawat §1): word count.
    "q_llm_wordcount" -> ((s, d) =>
      Tables(s, d, "documents")
        .select(explode(toks).as("word"))
        .groupBy("word").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("word"))
        .limit(50)),

    "q_llm_dedup_exact" -> ((s, d) =>
      Tables(s, d, "documents")
        .groupBy(md5(trim(lower(col("text")))).as("text_hash"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .orderBy("keep_id")),

    // MinHash-LSH near-dup candidates over unigram token sets, exact
    // Jaccard distance on the candidate pairs. Fixed seed => deterministic;
    // never oracled (LSH recall is probabilistic). Capped to doc_id < 300
    // so the candidate volume stays bounded at every sf.
    "q_llm_dedup_near" -> ((s, d) => {
      val docs = Tables(s, d, "documents")
        .where(col("doc_id") < 300)
        .select(col("doc_id"), toks.as("tokens"))
      val tf = new HashingTF().setInputCol("tokens").setOutputCol("features")
        .setNumFeatures(1024).setBinary(true)
      val feat = tf.transform(docs)
      val mh = new MinHashLSH().setInputCol("features").setOutputCol("hashes")
        .setNumHashTables(8).setSeed(42L)
      val model = mh.fit(feat)
      model.approxSimilarityJoin(feat, feat, 0.3, "dist")
        .select(col("datasetA.doc_id").as("id_a"),
          col("datasetB.doc_id").as("id_b"),
          round(lit(1.0) - col("dist"), 4).as("jaccard"))
        .where(col("id_a") < col("id_b"))
        .orderBy("id_a", "id_b")
    }),

    // Exact cosine top-k (cosine ≡ dot: embeddings are L2-normalized).
    // Query set is broadcast; graft_dot is the codegen'd Catalyst
    // expression (same left-to-right accumulation as the HOF fold), and
    // round(·,6) absorbs the engines' summation-order ulp drift.
    "q_llm_simsearch_topk" -> ((s, d) => {
      graft.functions.GraftFunctions.register(s)
      val emb = Tables(s, d, "embeddings")
      val qs = emb.where(col("label") === 0 && col("vec_id") < 100)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"))
      val cand = emb.select(col("vec_id").as("cid"), col("embedding").as("ce"))
      val dot = expr("round(graft_dot(qe, ce), 6)")
      val w = Window.partitionBy("qid").orderBy(col("dot").desc, col("cid"))
      broadcast(qs).crossJoin(cand)
        .where(col("qid") =!= col("cid"))
        .select(col("qid"), col("cid"), dot.as("dot"))
        .withColumn("rnk", row_number().over(w))
        .where(col("rnk") <= 5)
        .orderBy("qid", "rnk")
    }),

    "q_llm_text_stats" -> ((s, d) =>
      Tables(s, d, "documents")
        .groupBy("lang", "source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          (sum(col("n_chars")).cast("double") / count(lit(1))).as("avg_chars"),
          sum(size(toks).cast("long")).as("sum_tokens"),
          sum(size(array_distinct(toks)).cast("long")).as("sum_distinct"),
          (sum(size(array_distinct(toks)).cast("long")).cast("double")
            / sum(size(toks).cast("long"))).as("ttr"))
        .orderBy("lang", "source")),

    "q_llm_tfidf" -> ((s, d) => {
      val docs = Tables(s, d, "documents")
      val tok = docs.select(col("lang"), col("doc_id"), explode(toks).as("term"))
      val tf = tok.groupBy("lang", "term").agg(count(lit(1)).as("tf"))
      val dfT = tok.groupBy("term").agg(countDistinct(col("doc_id")).as("df"))
      val n = docs.agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("lang").orderBy(col("tfidf").desc, col("term"))
      tf.join(dfT, "term").crossJoin(broadcast(n))
        .select(col("lang"), col("term"),
          round(col("tf") * log(col("n").cast("double") / col("df").cast("double")), 6)
            .as("tfidf"))
        .withColumn("rnk", row_number().over(w))
        .where(col("rnk") <= 10)
        .orderBy("lang", "rnk")
    }),

    "q_llm_ngrams" -> ((s, d) => {
      val w = Window.partitionBy("lang").orderBy(col("cnt").desc, col("trigram"))
      Tables(s, d, "documents")
        // materialize the token array once; indexing a lambda-bound column
        // is O(1), whereas calling split() inside the lambda re-tokenizes
        // the document per n-gram (O(len²) — measured 85 s at sf0.1).
        .withColumn("tk", split(col("text"), " "))
        .select(col("lang"), explode(expr(
          """transform(slice(tk, 1, greatest(size(tk) - 2, 0)),
               (x, i) -> concat_ws(' ', x, tk[i + 1], tk[i + 2]))"""))
          .as("trigram"))
        .groupBy("lang", "trigram").agg(count(lit(1)).as("cnt"))
        .withColumn("rnk", row_number().over(w))
        .where(col("rnk") <= 20)
        .orderBy("lang", "rnk")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_llm_wordcount" ->
      """SELECT word, COUNT(*) AS cnt
         FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
         GROUP BY word ORDER BY cnt DESC, word LIMIT 50""",

    "q_llm_dedup_exact" ->
      """SELECT md5(trim(lower(text))) AS text_hash,
           MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
         FROM documents GROUP BY text_hash ORDER BY keep_id""",

    "q_llm_simsearch_topk" ->
      """WITH scored AS (
           SELECT q.vec_id AS qid, c.vec_id AS cid,
             round(list_sum(list_transform(range(1, 65),
               i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE))), 6) AS dot
           FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
           WHERE q.label = 0 AND q.vec_id < 100),
         r AS (SELECT qid, cid, dot,
                 CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dot DESC, cid) AS INT) AS rnk
               FROM scored)
         SELECT qid, cid, dot, rnk FROM r WHERE rnk <= 5 ORDER BY qid, rnk""",

    "q_llm_text_stats" ->
      """SELECT lang, source, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS sum_tokens,
           CAST(SUM(len(list_distinct(string_split(text, ' ')))) AS BIGINT) AS sum_distinct,
           CAST(SUM(len(list_distinct(string_split(text, ' ')))) AS DOUBLE)
             / CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS ttr
         FROM documents GROUP BY lang, source ORDER BY lang, source""",

    "q_llm_tfidf" ->
      """WITH tok AS (SELECT lang, doc_id, unnest(string_split(text, ' ')) AS term
                      FROM documents),
         tf AS (SELECT lang, term, COUNT(*) AS tf FROM tok GROUP BY lang, term),
         df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY term),
         n AS (SELECT COUNT(*) AS n FROM documents),
         s AS (SELECT lang, term,
                 round(tf * ln(CAST(n AS DOUBLE) / CAST(df AS DOUBLE)), 6) AS tfidf
               FROM tf JOIN df USING (term) CROSS JOIN n),
         r AS (SELECT lang, term, tfidf,
                 CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY tfidf DESC, term) AS INT) AS rnk
               FROM s)
         SELECT lang, term, tfidf, rnk FROM r WHERE rnk <= 10 ORDER BY lang, rnk""",

    "q_llm_ngrams" ->
      """WITH tg AS (SELECT lang,
             unnest(list_transform(range(1, len(string_split(text, ' ')) - 1),
               i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i + 1]
                    || ' ' || string_split(text, ' ')[i + 2])) AS trigram
           FROM documents),
         c AS (SELECT lang, trigram, COUNT(*) AS cnt FROM tg GROUP BY lang, trigram),
         r AS (SELECT lang, trigram, cnt,
                 CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY cnt DESC, trigram) AS INT) AS rnk
               FROM c)
         SELECT lang, trigram, cnt, rnk FROM r WHERE rnk <= 20 ORDER BY lang, rnk"""
  )
}
