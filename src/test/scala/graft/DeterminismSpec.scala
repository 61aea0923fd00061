package graft

/** SURVEY §5.2 — every declared query must be non-empty, schema-stable and
  * run-to-run deterministic (catches unordered output before the driver's
  * DuckDB hash compare does). */
class DeterminismSpec extends SparkSpec {

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name is non-empty and deterministic at sf0.001") {
      val r1 = fn(spark, sf)
      val schema1 = r1.schema
      val rows1 = r1.collect()
      assert(rows1.nonEmpty, s"$name returned 0 rows")
      val r2 = fn(spark, sf)
      assert(r2.schema == schema1, s"$name schema changed between runs")
      val rows2 = r2.collect()
      assert(rows1.length == rows2.length, s"$name row count changed")
      rows1.zip(rows2).zipWithIndex.foreach { case ((a, b), i) =>
        assert(a == b, s"$name row $i differs between runs: $a vs $b")
      }
    }
  }

  test("oracleSql keys are a subset of queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
