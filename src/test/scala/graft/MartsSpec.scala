package graft

import graft.queries.Marts

/** Second-formulation checks for the round-6 TPC-H workload shapes
  * (the WorkloadsSpec convention): each declared broadcast/algebrized
  * plan is compared against the straightforward SQL text run by Spark's
  * own subquery machinery — an in-engine oracle independent of the plan
  * shape under test — plus the structural invariants the SQL can't see.
  */
class MartsSpec extends SparkSpec {

  private def views(): Unit =
    Seq("customer", "orders", "lineitem", "part", "supplier", "nation",
      "region").foreach(t => Tables(spark, sf, t).createOrReplaceTempView(t))

  private val oRev = "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))"

  test("q_wl_volume_shipping ≡ the flat 8-way join formulation") {
    views()
    val declared = Marts.queries("q_wl_volume_shipping")(spark, sf).collect()
    assert(declared.nonEmpty)
    val sql = spark.sql(
      s"""SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INT) AS yr,
           CAST(SUM($oRev) AS DOUBLE) AS rev
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation sn ON s_nationkey = sn.n_nationkey
         JOIN nation cn ON c_nationkey = cn.n_nationkey
         JOIN region sr ON sn.n_regionkey = sr.r_regionkey
         JOIN region cr ON cn.n_regionkey = cr.r_regionkey
         WHERE sr.r_name = 'EUROPE' AND cr.r_name = 'EUROPE'
           AND sn.n_nationkey <> cn.n_nationkey
           AND l_shipdate >= TIMESTAMP '1997-01-01'
           AND l_shipdate < TIMESTAMP '1999-01-01'
         GROUP BY supp_nation, cust_nation, yr
         ORDER BY supp_nation, cust_nation, yr""").collect()
    assert(declared.toSeq === sql.toSeq)
  }

  test("q_wl_market_share: shares in (0,1), local ≤ total, ≡ SQL") {
    views()
    val declared = Marts.queries("q_wl_market_share")(spark, sf).collect()
    assert(declared.nonEmpty)
    declared.foreach { r =>
      val (local, total, share) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(local > 0 && local <= total, s"degenerate share row $r")
      assert(share > 0.0 && share < 1.0, s"vacuous share $share")
    }
    val sql = spark.sql(
      s"""WITH m AS (
           SELECT CAST(year(o_orderdate) AS INT) AS yr, $oRev AS rev,
             CASE WHEN sr.r_name = 'EUROPE' THEN 1 ELSE 0 END AS is_local
           FROM lineitem
           JOIN orders ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           JOIN nation cn ON c_nationkey = cn.n_nationkey
           JOIN region cr ON cn.n_regionkey = cr.r_regionkey
           JOIN part ON l_partkey = p_partkey
           JOIN supplier ON l_suppkey = s_suppkey
           JOIN nation sn ON s_nationkey = sn.n_nationkey
           JOIN region sr ON sn.n_regionkey = sr.r_regionkey
           WHERE cr.r_name = 'EUROPE' AND p_type = 'ECONOMY'
             AND o_orderdate >= TIMESTAMP '1996-01-01'
             AND o_orderdate < TIMESTAMP '1999-01-01'),
         g AS (SELECT yr,
             CAST(SUM(CASE WHEN is_local = 1 THEN rev
               ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE) AS local_rev,
             CAST(SUM(rev) AS DOUBLE) AS total_rev
           FROM m GROUP BY yr)
         SELECT yr, local_rev, total_rev, local_rev / total_rev AS share
         FROM g ORDER BY yr""").collect()
    assert(declared.toSeq === sql.toSeq)
  }

  test("q_wl_cust_distribution: counts partition the customer set, ≡ SQL") {
    views()
    val declared = Marts.queries("q_wl_cust_distribution")(spark, sf).collect()
    assert(declared.nonEmpty)
    val nCust = Tables(spark, sf, "customer").count()
    assert(declared.map(_.getLong(1)).sum === nCust,
      "every customer must land in exactly one c_count bucket")
    val sql = spark.sql(
      """WITH cc AS (
           SELECT c_custkey, COUNT(o_orderkey) AS c_count
           FROM customer LEFT JOIN orders ON c_custkey = o_custkey
             AND o_orderpriority <> '1-URGENT'
           GROUP BY c_custkey)
         SELECT c_count, COUNT(*) AS custdist
         FROM cc GROUP BY c_count
         ORDER BY custdist DESC, c_count DESC""").collect()
    assert(declared.toSeq === sql.toSeq)
  }

  test("q_wl_top_supplier carries the true max and surfaces every tie") {
    views()
    val declared = Marts.queries("q_wl_top_supplier")(spark, sf).collect()
    assert(declared.nonEmpty)
    val per = spark.sql(
      s"""SELECT l_suppkey, CAST(SUM($oRev) AS DOUBLE) AS total_rev
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1997-01-01'
           AND l_shipdate < TIMESTAMP '1997-04-01'
         GROUP BY l_suppkey""").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val m = per.values.max
    assert(declared.forall(_.getDouble(2) == m))
    assert(declared.map(_.getLong(0)).toSet ===
      per.filter(_._2 == m).keySet, "tie set mismatch")
  }

  test("q_wl_bracket_revenue = the sum of its three disjoint brackets") {
    views()
    val declared = Marts.queries("q_wl_bracket_revenue")(spark, sf).collect()
    assert(declared.length === 1)
    // brands are disjoint, so the OR must decompose additively — a
    // double-counted or dropped bracket breaks this identity
    def bracket(brand: String, szHi: Int, qLo: Int, qHi: Int): java.math.BigDecimal =
      spark.sql(
        s"""SELECT SUM($oRev) AS rev
           FROM lineitem JOIN part ON l_partkey = p_partkey
           WHERE p_brand = '$brand' AND p_size BETWEEN 1 AND $szHi
             AND l_quantity BETWEEN $qLo AND $qHi""").collect()(0).getDecimal(0)
    val total = bracket("Brand#1", 15, 1, 20)
      .add(bracket("Brand#2", 20, 10, 30))
      .add(bracket("Brand#3", 25, 20, 40))
    assert(declared(0).getDouble(0) === total.doubleValue())
  }

  test("q_wl_forecast_revenue and q_wl_product_profit ≡ their SQL texts") {
    views()
    val fc = Marts.queries("q_wl_forecast_revenue")(spark, sf).collect()
    val fcSql = spark.sql(
      """SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6)))
             AS DOUBLE) AS rev_delta
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1997-01-01'
           AND l_shipdate < TIMESTAMP '1998-01-01'
           AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24""").collect()
    assert(fc.toSeq === fcSql.toSeq)
    assert(fc(0).getDouble(0) > 0.0)

    val pp = Marts.queries("q_wl_product_profit")(spark, sf).collect()
    assert(pp.nonEmpty)
    val ppSql = spark.sql(
      """SELECT n_name, CAST(year(o_orderdate) AS INT) AS yr,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
             - 0.5 * p_retailprice * l_quantity AS DECIMAL(18,6))) AS DOUBLE)
             AS profit
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN part ON l_partkey = p_partkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation ON s_nationkey = n_nationkey
         WHERE p_name LIKE '%widget%'
         GROUP BY n_name, yr ORDER BY n_name, yr""").collect()
    assert(pp.toSeq === ppSql.toSeq)
  }
}
