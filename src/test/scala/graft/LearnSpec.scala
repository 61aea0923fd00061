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
    // independent recount of the champion pair, no vocabulary compression
    val champ = out.head.getString(1)
    val direct = Tables(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .select(expr(s"size(filter(sequence(1, greatest(length(w) - 1, 1)), " +
        s"i -> length(w) >= 2 AND substring(w, i, 2) = '$champ'))").as("k"))
      .agg(sum("k")).first().getLong(0)
    assert(direct === out.head.getLong(2))
  }
}
