package graft

import org.apache.spark.sql.functions._

/** Semantic invariants for the §2.14 training-data curation operators —
  * properties the DuckDB hash compare can't express (coverage,
  * reconstruction, conservation laws). */
class PipelineSpec extends SparkSpec {

  private def q(name: String) = queries.Pipeline.queries(name)(spark, sf)

  test("chunking covers every token: last chunk ends exactly at n_tokens") {
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
    val last = q("q_llm_chunk")
      .groupBy("doc_id")
      .agg(max(col("start_tok") + col("n_tok") - 1).as("covered"),
        min(col("start_tok")).as("first_start"))
    val bad = last.join(docs, "doc_id")
      .where(col("covered") =!= col("n") || col("first_start") =!= 1)
      .count()
    assert(bad == 0)
  }

  test("chunk stride: consecutive chunks overlap by size - stride tokens") {
    val rows = q("q_llm_chunk")
      .where(col("doc_id") === 0).orderBy("chunk_id")
      .select("start_tok").collect().map(_.getInt(0))
    assert(rows.zip(rows.drop(1)).forall { case (a, b) => b - a == 24 })
  }

  test("packing conserves offsets: start_off is the running sum per source") {
    val p = q("q_llm_pack").collect()
    p.groupBy(_.getString(1)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getLong(0))
      var off = 0L
      sorted.foreach { r =>
        assert(r.getLong(3) == off, s"doc ${r.getLong(0)}")
        off += r.getInt(2)
      }
    }
    // seq ids: a doc spans [first_seq, last_seq] and never goes backwards
    assert(p.forall(r => r.getLong(5) >= r.getLong(4)))
  }

  test("repetition metrics are valid micro-fractions") {
    val r = q("q_llm_repetition").collect()
    assert(r.nonEmpty)
    assert(r.forall { x =>
      val d = x.getLong(1); val t = x.getLong(2)
      d >= 0 && d <= 1000000 && t > 0 && t <= 1000000
    })
  }

  test("decontamination excludes the benchmark set and flags = (n_shared > 0)") {
    val r = q("q_llm_decontaminate").collect()
    assert(r.forall(_.getLong(0) % 97 != 0))
    assert(r.forall(x => x.getBoolean(2) == (x.getLong(1) > 0)))
  }

  test("vocab pruning conserves tokens: kept + dropped = n_tokens") {
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
    val bad = q("q_llm_vocab_prune").join(docs, "doc_id")
      .where(col("n_kept") + col("n_dropped") =!= col("n")).count()
    assert(bad == 0)
  }

  test("pii scrub redacts exactly the synthesized email and phone") {
    val r = q("q_llm_pii_scrub").collect()
    assert(r.forall(x => x.getInt(1) == 1 && x.getInt(2) == 1))
    // digest differs from the unscrubbed text's digest (redaction happened)
    val clean = Tables(spark, sf, "documents")
      .select(col("doc_id"), md5(col("text")).as("m")).collect()
      .map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(r.forall(x => x.getString(3) != clean(x.getLong(0))))
  }

  test("orc roundtrip preserves the supplier table exactly") {
    val rt = q("q_source_orc_roundtrip").collect()
    val src = Tables(spark, sf, "supplier").orderBy("s_suppkey").collect()
    assert(rt.toSeq == src.toSeq)
  }
}
