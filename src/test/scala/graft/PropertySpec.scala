package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** SURVEY §5.3 — algebraic invariants on generated micro-tables.
  * (scalacheck drives generation directly; the scalatest bridge artifact
  * is not in the offline cache.) */
class PropertySpec extends SparkSpec {

  import queries.U._

  private def df(rows: Seq[(String, Double)]) = {
    import spark.implicits._
    rows.toDF("k", "v")
  }

  test("aggregation is a homomorphism over union (combiner correctness)") {
    val gen = Gen.listOfN(40, Gen.zip(Gen.oneOf("a", "b", "c"), Gen.choose(-100.0, 100.0)))
    (1 to 5).foreach { i =>
      val xs = gen.apply(Gen.Parameters.default, Seed(i.toLong)).get
      val ys = gen.apply(Gen.Parameters.default, Seed(i.toLong + 100)).get
      val whole = df(xs ++ ys).groupBy("k").agg(dsum(col("v")).as("s"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val partsDf = df(xs).groupBy("k").agg(sum(col("v").cast(D)).as("p"))
        .union(df(ys).groupBy("k").agg(sum(col("v").cast(D)).as("p")))
      val merged = partsDf.groupBy("k").agg(sum(col("p")).cast("double").as("s"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(whole == merged, s"seed $i")
    }
  }

  test("exact dedup is idempotent") {
    val d1 = queries.Llm.queries("q_llm_dedup_exact")(spark, sf)
    val once = d1.collect()
    // dedup of the survivors keeps every survivor (all hashes distinct)
    assert(once.map(_.getString(0)).distinct.length == once.length)
  }

  test("top-k is a prefix of the full sort") {
    val topk = queries.Windows.queries("q_topk_global")(spark, sf)
      .collect().map(_.getLong(0)).toSeq
    val full = Tables(spark, sf, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .select("o_orderkey").collect().map(_.getLong(0)).take(100).toSeq
    assert(topk == full)
  }

  test("approx_count_distinct within 5% of exact") {
    val approx = queries.Aggs.queries("q_agg_approx_distinct")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables(spark, sf, "events")
      .groupBy("event_type").agg(countDistinct(col("user_id")).as("u"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, e) =>
      val a = approx(k)
      assert(math.abs(a - e) <= math.max(1L, (e * 0.05).toLong),
        s"$k: approx $a vs exact $e")
    }
  }

  test("MinHash-LSH candidates: exact Jaccard confirms every reported pair") {
    val pairs = queries.Llm.queries("q_llm_dedup_near")(spark, sf)
      .limit(50).collect()
    val toks = Tables(spark, sf, "documents").where(col("doc_id") < 300)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    pairs.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      val (sa, sb) = (toks(a), toks(b))
      val j = sa.intersect(sb).size.toDouble / sa.union(sb).size
      // LSH reports distance on 1024-dim hashed sets; exact Jaccard on raw
      // token sets can only be >= the hashed-collision version
      assert(j >= 0.65, s"pair ($a,$b) exact Jaccard $j < 0.65")
    }
  }

  test("window rank equals self-join count equivalence on a micro table") {
    val rows = Seq(("p", 10.0, 1L), ("p", 20.0, 2L), ("p", 20.0, 3L), ("q", 5.0, 4L))
    import spark.implicits._
    val t = rows.toDF("g", "x", "id")
    val viaWindow = t.select(col("g"), col("id"),
      rank().over(org.apache.spark.sql.expressions.Window
        .partitionBy("g").orderBy(col("x").desc)).as("r"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
    // rank(x) = 1 + #{y in same group : y.x > x.x}
    val viaJoin = rows.map { case (g, x, id) =>
      (g, id) -> (1 + rows.count(o => o._1 == g && o._2 > x))
    }.toMap
    assert(viaWindow == viaJoin)
  }
}
