package graft

import org.apache.spark.sql.functions._
import graft.queries.Learn

class LearnSpec extends SparkSpec {

  test("q_llm_cluster_kmeans: clusters partition the vectors; deterministic") {
    val out = Learn.queries("q_llm_cluster_kmeans")(spark, sf).cache()
    val total = Tables(spark, sf, "embeddings").count()
    assert(out.agg(sum("n")).first().getLong(0) === total)
    assert(out.count() <= 8 && out.count() > 1)
    assert(out.where(col("n") <= 0 || col("centroid_l1") <= 0).count() === 0)
    // fixed seeds + integer arithmetic: a second run is bit-identical
    val again = Learn.queries("q_llm_cluster_kmeans")(spark, sf)
    assert(out.collect().toSeq === again.collect().toSeq)
  }

  test("q_llm_bpe_pairs: ranked top-30 with a verifiable champion count") {
    val out = Learn.queries("q_llm_bpe_pairs")(spark, sf).collect()
    assert(out.length === 30)
    assert(out.map(_.getInt(0)).toSeq === (1 to 30))
    val cnts = out.map(_.getLong(2))
    assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b })
    assert(out.forall(_.getString(1).length === 2))
    // independent recount of the champion pair, no vocabulary
    // compression; bound as a Column (not interpolated into SQL text) so
    // a pair containing a quote can't break the expression
    val champ = out.head.getString(1)
    val direct = Tables(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .where(length(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")).as("p"))
      .where(col("p") === lit(champ))
      .count()
    assert(direct === out.head.getLong(2))
  }
}
