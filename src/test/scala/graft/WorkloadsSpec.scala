package graft

import org.apache.spark.sql.functions._
import graft.queries.Workloads

/** Second-formulation checks for the round-5 TPC-H workload shapes: each
  * declared plan (semi-join / algebrized correlated agg / broadcast
  * scalar + anti-join) is compared against the straightforward SQL a
  * reference implementation would write (EXISTS / correlated scalar
  * subqueries / NOT EXISTS), run by Spark's own subquery machinery — an
  * in-engine oracle independent of the plan shape under test. */
class WorkloadsSpec extends SparkSpec {

  private def views(): Unit =
    Seq("customer", "orders", "lineitem", "part").foreach(t =>
      Tables(spark, sf, t).createOrReplaceTempView(t))

  test("q_wl_order_priority ≡ the EXISTS formulation") {
    views()
    val declared = Workloads.queries("q_wl_order_priority")(spark, sf).collect()
    assert(declared.nonEmpty)
    val sql = spark.sql(
      """SELECT o_orderpriority, COUNT(*) AS order_count
         FROM orders o
         WHERE o_orderdate >= TIMESTAMP '1997-01-01'
           AND o_orderdate < TIMESTAMP '1997-04-01'
           AND EXISTS (SELECT 1 FROM lineitem l
                       WHERE l.l_orderkey = o.o_orderkey
                         AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAYS)
         GROUP BY o_orderpriority ORDER BY o_orderpriority""").collect()
    assert(declared.toSeq === sql.toSeq)
  }

  test("q_wl_small_qty_revenue ≡ the correlated-subquery formulation") {
    views()
    val declared = Workloads.queries("q_wl_small_qty_revenue")(spark, sf).collect()
    assert(declared.length === 1)
    // the classic Q17 text, kept on exact integers: qty < avg/5 written
    // as qty·5·cnt < sum so no float average enters the predicate
    val sql = spark.sql(
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / 7.0
             AS avg_yearly
         FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
         WHERE p.p_brand = 'Brand#4' AND p.p_size < 6
           AND CAST(l.l_quantity AS BIGINT) * 5
               * (SELECT COUNT(*) FROM lineitem l2
                  WHERE l2.l_partkey = l.l_partkey)
             < (SELECT SUM(CAST(l2.l_quantity AS BIGINT)) FROM lineitem l2
                WHERE l2.l_partkey = l.l_partkey)""").collect()
    assert(declared.toSeq === sql.toSeq)
  }

  test("q_wl_idle_customers ≡ the NOT EXISTS formulation, and is non-empty") {
    views()
    val declared = Workloads.queries("q_wl_idle_customers")(spark, sf).collect()
    assert(declared.nonEmpty, "idle-customers must be non-vacuous at sf0.001")
    assert(declared.map(_.getLong(1)).sum > 0)
    val sql = spark.sql(
      """WITH c AS (SELECT c_custkey, c_mktsegment, c_acctbal FROM customer
           WHERE c_mktsegment IN ('BUILDING', 'MACHINERY', 'AUTOMOBILE')),
         ab AS (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
                  / COUNT(*) AS ab FROM c WHERE c_acctbal > 0)
         SELECT c_mktsegment, COUNT(*) AS n_cust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS total_bal
         FROM c, ab
         WHERE c_acctbal > ab
           AND NOT EXISTS (SELECT 1 FROM orders o
                           WHERE o.o_custkey = c.c_custkey
                             AND o.o_orderdate >= TIMESTAMP '2000-01-01')
         GROUP BY c_mktsegment ORDER BY c_mktsegment""").collect()
    assert(declared.toSeq === sql.toSeq)
  }
}
