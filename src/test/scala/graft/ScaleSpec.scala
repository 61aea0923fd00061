package graft

import org.apache.spark.sql.functions._

/** The ×F replica must preserve per-key/per-window DENSITY — the property
  * that makes the scaling probe measure operators, not collision
  * artifacts. Sharp check: at factor 2, every linear query's output grows
  * exactly ×2 and no cross-copy pair exists anywhere. */
class ScaleSpec extends SparkSpec {

  private lazy val dir: String = {
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_scale_x2"
    Scale.gen(spark, sf, out, 2)
    out
  }

  test("gen preserves schemas and multiplies fact row counts exactly") {
    Seq("orders", "lineitem", "events", "documents", "embeddings").foreach { t =>
      val a = Tables(spark, sf, t)
      val b = Tables(spark, dir, t)
      assert(b.schema === a.schema, s"$t schema drifted")
      assert(b.count() === 2 * a.count(), s"$t not exactly doubled")
    }
    Seq("region", "nation", "customer", "supplier", "part").foreach { t =>
      assert(Tables(spark, dir, t).count() === Tables(spark, sf, t).count())
    }
  }

  test("per-window density is invariant: range join and dedup outputs scale exactly x2") {
    // cross-copy pairs would make these grow faster than x2
    Seq("q_join_theta_range", "q_llm_dedup_exact", "q_llm_dedup_simhash",
        "q_mr_inverted_index").foreach { name =>
      val a = SparkEntry.queries(name)(spark, sf).count()
      val b = SparkEntry.queries(name)(spark, dir).count()
      // the inverted index is per distinct WORD: the shared vocabulary
      // stays put, the second copy adds exactly its one suffix token
      val want = if (name == "q_mr_inverted_index") a + 1 else 2 * a
      assert(b === want, s"$name: $a -> $b")
    }
  }

  test("events keep strict event_id <-> ts co-ordering after replication") {
    val ev = Tables(spark, dir, "events")
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("event_id")
    val inversions = ev
      .withColumn("prev_us", lag("us", 1).over(w))
      .where(col("prev_us").isNotNull && col("us") < col("prev_us"))
      .count()
    assert(inversions === 0L)
  }
}
