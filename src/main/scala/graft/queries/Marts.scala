package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._
import U._

/** Round-6 composite workloads (SURVEY §2.17, batch 3): the remaining
  * classic decision-support shapes this schema can express without a
  * partsupp table — TPC-H Q6/Q7/Q8/Q9/Q13/Q15/Q19 analogues. Together
  * with Workloads.scala this closes the expressible TPC-H surface
  * (Q11/Q16/Q20 need partsupp; Q12 needs l_shipmode/commit dates).
  *
  * Scale notes (same posture as Workloads.scala): every dim broadcasts,
  * the one fact-fact join rides orderkey, revenue/profit aggregates go
  * through the exact-decimal dsum grid, disjunctive predicates stay in
  * one scan pass, and the "max of an aggregate" correlation is a 1-row
  * broadcast — never a re-scan. No global windows anywhere.
  */
object Marts {

  private val revenue = col("l_extendedprice") * (lit(1) - col("l_discount"))
  private val oRev = "l_extendedprice * (1 - l_discount)"

  /** nation ⋈ region, one broadcastable (nationkey, n_name) frame per
    * region — shared by the Q7/Q8 shapes so both sides of a two-region
    * query provably filter identically. */
  private def regionNations(s: org.apache.spark.sql.SparkSession, d: String,
      region: String) =
    Tables(s, d, "nation")
      .join(broadcast(Tables(s, d, "region").where(col("r_name") === region)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))

  val queries: Map[String, Q] = Map(

    // Q6 shape — forecast-revenue delta: the pure scan-aggregate. Every
    // predicate (ship-year band, discount band, quantity cap) pushes to
    // the parquet scan; the one output row is an exact decimal sum of
    // price·discount. At 100 TB this is the query that measures pushdown
    // + scan throughput and nothing else — no join, no shuffle beyond
    // the 1-row final aggregate merge.
    "q_wl_forecast_revenue" -> ((s, d) =>
      Tables(s, d, "lineitem")
        .where(col("l_shipdate") >= ts("1997-01-01") &&
          col("l_shipdate") < ts("1998-01-01") &&
          col("l_discount").between(0.03, 0.07) && col("l_quantity") < 24)
        .agg(dsum(col("l_extendedprice") * col("l_discount")).as("rev_delta"))),

    // Q7 shape — cross-border volume shipping within one region: revenue
    // between every DISTINCT pair of EUROPE nations (supplier side ≠
    // customer side), by ship year. The two nation-region dims collapse
    // to one broadcast frame each (supplier ~KB, customer-keyed ~MB at
    // any scale — both dims, both broadcast); the orders×lineitem join
    // is the only fact shuffle and rides the orderkey. Output is
    // dim-bounded: |EUROPE|² pairs × 2 years.
    "q_wl_volume_shipping" -> ((s, d) => {
      val eur = regionNations(s, d, "EUROPE")
      val sup = Tables(s, d, "supplier")
        .join(broadcast(eur), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_nationkey").as("sn_key"),
          col("n_name").as("supp_nation"))
      val cust = Tables(s, d, "customer")
        .join(broadcast(eur), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_nationkey").as("cn_key"),
          col("n_name").as("cust_nation"))
      Tables(s, d, "lineitem")
        .where(col("l_shipdate") >= ts("1997-01-01") &&
          col("l_shipdate") < ts("1999-01-01"))
        .join(Tables(s, d, "orders").select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey") &&
          col("sn_key") =!= col("cn_key"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("int").as("yr"))
        .agg(dsum(revenue).as("rev"))
        .orderBy("supp_nation", "cust_nation", "yr")
    }),

    // Q8 shape — regional market share: of all ECONOMY-part revenue sold
    // to EUROPE customers per order year, the share supplied from WITHIN
    // the region. The two-level aggregate (conditional numerator over
    // the same exact-decimal rows as the denominator) runs in ONE pass —
    // no second scan for the numerator — and the local/foreign flag is a
    // broadcast-dim lookup on the supplier side. Three output rows, each
    // carrying the exact sums AND the derived share.
    "q_wl_market_share" -> ((s, d) => {
      val eurKeys = regionNations(s, d, "EUROPE").select("n_nationkey")
      val cust = Tables(s, d, "customer")
        .join(broadcast(eurKeys), col("c_nationkey") === col("n_nationkey"))
        .select("c_custkey")
      val sup = Tables(s, d, "supplier")
        .join(broadcast(eurKeys.withColumnRenamed("n_nationkey", "eu_key")),
          col("s_nationkey") === col("eu_key"), "left")
        .select(col("s_suppkey"),
          col("eu_key").isNotNull.cast("int").as("is_local"))
      val eco = Tables(s, d, "part").where(col("p_type") === "ECONOMY")
        .select("p_partkey")
      val zeroD = lit(0).cast(D)
      Tables(s, d, "lineitem")
        .join(broadcast(eco), col("l_partkey") === col("p_partkey"))
        .join(Tables(s, d, "orders")
            .where(col("o_orderdate") >= ts("1996-01-01") &&
              col("o_orderdate") < ts("1999-01-01")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .groupBy(year(col("o_orderdate")).cast("int").as("yr"))
        .agg(
          sum(when(col("is_local") === 1, revenue.cast(D)).otherwise(zeroD))
            .cast("double").as("local_rev"),
          dsum(revenue).as("total_rev"))
        .select(col("yr"), col("local_rev"), col("total_rev"),
          (col("local_rev") / col("total_rev")).as("share"))
        .orderBy("yr")
    }),

    // Q9 shape — product-line profit by supplier nation and year. This
    // schema has no partsupp.ps_supplycost, so unit cost is proxied as
    // half the part's retail price — the same fixed-rational discipline
    // as every house cost model (per-row expression exact on the decimal
    // grid, no float accumulate). Part + supplier + nation all broadcast;
    // the orders join rides orderkey. Output is dim-bounded
    // (nations × years).
    "q_wl_product_profit" -> ((s, d) => {
      val widgets = Tables(s, d, "part")
        .where(col("p_name").contains("widget"))
        .select("p_partkey", "p_retailprice")
      val supNat = Tables(s, d, "supplier")
        .join(broadcast(Tables(s, d, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name"))
      Tables(s, d, "lineitem")
        .join(broadcast(widgets), col("l_partkey") === col("p_partkey"))
        .join(Tables(s, d, "orders").select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(supNat), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("n_name"), year(col("o_orderdate")).cast("int").as("yr"))
        .agg(dsum(revenue - lit(0.5) * col("p_retailprice") * col("l_quantity"))
          .as("profit"))
        .orderBy("n_name", "yr")
    }),

    // Q13 shape — customer order-count distribution: the canonical
    // outer-join-then-double-aggregate. The priority filter lands INSIDE
    // the left join (customers with only urgent orders count 0, they
    // don't disappear); first aggregate keys on custkey, second on the
    // count itself — output bounded by max orders/customer. At scale the
    // orders side shuffles once on custkey; customers ride the same key.
    "q_wl_cust_distribution" -> ((s, d) => {
      val ord = Tables(s, d, "orders")
        .where(col("o_orderpriority") =!= "1-URGENT")
        .select("o_custkey", "o_orderkey")
      Tables(s, d, "customer").select("c_custkey")
        .join(ord, col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // Q15 shape — top supplier(s) by quarter revenue: the "= (SELECT
    // MAX(...))" correlation algebrized to a 1-row broadcast max joined
    // back against the per-supplier aggregate (ties all surface, the Q15
    // view semantics). Equality holds exactly because both sides come off
    // the same decimal grid. One keyed shuffle on suppkey; supplier dim
    // broadcasts for the name.
    "q_wl_top_supplier" -> ((s, d) => {
      val r = Tables(s, d, "lineitem")
        .where(col("l_shipdate") >= ts("1997-01-01") &&
          col("l_shipdate") < ts("1997-04-01"))
        .groupBy("l_suppkey")
        .agg(dsum(revenue).as("total_rev"))
      r.crossJoin(broadcast(r.agg(max(col("total_rev")).as("m"))))
        .where(col("total_rev") === col("m"))
        .join(broadcast(Tables(s, d, "supplier").select("s_suppkey", "s_name")),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_rev"))
        .orderBy("s_suppkey")
    }),

    // Q19 shape — bracketed-discount revenue: three (brand, size-band,
    // quantity-band) brackets OR-ed into ONE residual predicate over a
    // single broadcast part join — the disjunction never forks the scan
    // into three passes, and the size brackets prune the broadcast side
    // while the quantity brackets stay in the join residual.
    "q_wl_bracket_revenue" -> ((s, d) => {
      val pt = Tables(s, d, "part")
        .where(col("p_brand").isin("Brand#1", "Brand#2", "Brand#3") &&
          col("p_size").between(1, 25))
        .select("p_partkey", "p_brand", "p_size")
      Tables(s, d, "lineitem")
        .join(broadcast(pt), col("l_partkey") === col("p_partkey") && (
          (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
            col("l_quantity").between(1, 20)) ||
          (col("p_brand") === "Brand#2" && col("p_size").between(1, 20) &&
            col("l_quantity").between(10, 30)) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(1, 25) &&
            col("l_quantity").between(20, 40))))
        .agg(dsum(revenue).as("rev"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q_wl_forecast_revenue" ->
      s"""SELECT ${oDsum("l_extendedprice * l_discount")} AS rev_delta
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1997-01-01'
           AND l_shipdate < TIMESTAMP '1998-01-01'
           AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24""",

    "q_wl_volume_shipping" ->
      s"""SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INT) AS yr, ${oDsum(oRev)} AS rev
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
         ORDER BY supp_nation, cust_nation, yr""",

    "q_wl_market_share" ->
      """WITH m AS (
           SELECT CAST(year(o_orderdate) AS INT) AS yr,
             CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)) AS rev,
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
         FROM g ORDER BY yr""",

    "q_wl_product_profit" ->
      s"""SELECT n_name, CAST(year(o_orderdate) AS INT) AS yr,
           ${oDsum("l_extendedprice * (1 - l_discount) - 0.5 * p_retailprice * l_quantity")}
             AS profit
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN part ON l_partkey = p_partkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation ON s_nationkey = n_nationkey
         WHERE p_name LIKE '%widget%'
         GROUP BY n_name, yr ORDER BY n_name, yr""",

    "q_wl_cust_distribution" ->
      """WITH cc AS (
           SELECT c_custkey, COUNT(o_orderkey) AS c_count
           FROM customer LEFT JOIN orders ON c_custkey = o_custkey
             AND o_orderpriority <> '1-URGENT'
           GROUP BY c_custkey)
         SELECT c_count, COUNT(*) AS custdist
         FROM cc GROUP BY c_count
         ORDER BY custdist DESC, c_count DESC""",

    "q_wl_top_supplier" ->
      s"""WITH r AS (
           SELECT l_suppkey, ${oDsum(oRev)} AS total_rev
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1997-01-01'
             AND l_shipdate < TIMESTAMP '1997-04-01'
           GROUP BY l_suppkey),
         mx AS (SELECT MAX(total_rev) AS m FROM r)
         SELECT s_suppkey, s_name, total_rev
         FROM r JOIN supplier ON l_suppkey = s_suppkey, mx
         WHERE total_rev = m ORDER BY s_suppkey""",

    "q_wl_bracket_revenue" ->
      s"""SELECT ${oDsum(oRev)} AS rev
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
                AND l_quantity BETWEEN 1 AND 20)
            OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 20
                AND l_quantity BETWEEN 10 AND 30)
            OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 25
                AND l_quantity BETWEEN 20 AND 40)"""
  )
}
