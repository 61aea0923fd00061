package graft.queries

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import U._

/** Round-7 additions, batch 4 (SURVEY §2.33): behavioral analytics —
  * the co-occurrence and credit-assignment reports a commerce/events
  * pipeline ships on top of the raw facts. Market-basket association
  * rules (support/confidence/lift at the brand level — the classic
  * "customers who bought X also bought Y"), and linear multi-touch
  * attribution (every prior click inside the window shares the
  * purchase credit equally — the fairer sibling of §2.30's last-touch
  * rule, reported per click).
  *
  * Exactness posture: house rules — all counts exact BIGINTs, every
  * ratio one rounded IEEE division (identical operand order in both
  * engines), credit shares on the 1e-6 grid summed as exact decimals.
  */
object Behavior {

  /** Per-order sorted distinct brand set — ONE shuffle builds the
    * basket frame all three consumers (pairs, marginals, total) reduce;
    * the set is bounded by the 25-brand dimension, so the arrays stay
    * KB-scale however large the order. Lazily localCheckpointed (the
    * kcore intra-query discipline) so the consumers share the
    * materialized frame instead of re-running the shuffle. The first
    * formulation self-joined a distinct (order, brand) incidence on the
    * order key — same answer, but a second full shuffle of the ×N
    * incidence; measured 67 s at ×100 vs ~2× less for this form. */
  private def orderBrandSets(s: org.apache.spark.sql.SparkSession,
      d: String) =
    Tables(s, d, "lineitem")
      .join(broadcast(Tables(s, d, "part")
        .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_orderkey"))
      .agg(sort_array(array_distinct(collect_list(col("p_brand"))))
        .as("bs"))
      .localCheckpoint(false)

  val queries: Map[String, Q] = Map(

    // Kaplan–Meier survival over customer ORDER lifetimes (round 13) —
    // the product-limit estimator every retention/churn report is built
    // on: a customer's lifetime = weeks between first and last order
    // (the actuarial WEEKLY lifetable grid — binning bounds the time
    // axis to span/7 rows by construction, the scale knob), churn
    // observed iff the last order predates the corpus end by >365 days
    // (otherwise the lifetime is CENSORED — still at risk, exactly what
    // KM exists to handle). S(w) = Π_{w'≤w} (1 − d_{w'}/n_risk(w'))
    // over eventful weeks. Plan shape: one customer-keyed agg (∝orders
    // in, ∝customers out), then EVERYTHING runs on the ≤span/7-row
    // weekly frame — n_risk via the windowless prefixOffsets triangle
    // (never a single-partition window), the cumulative log-survival
    // via a second bounded triangle. Exactness: counts exact BIGINTs;
    // each ln(1 − d/n) rounded to the 1e-9 grid BEFORE the exact
    // DECIMAL cumulative sum (the zipf/entropy libm rule); survival =
    // round(exp(·), 6) — the established heldout_ppl pattern — with
    // the d = n_risk absorbing state pinned to exactly 0.0 (ln(0) is
    // engine-divergent, so the zero never passes through a log).
    "q_ts_survival_km" -> ((s, d) => {
      val o = Tables(s, d, "orders")
      val tend = o.agg(max(col("o_orderdate")).as("tend"))
      val cust = o.groupBy("o_custkey")
        .agg(min(col("o_orderdate")).as("t0"), max(col("o_orderdate")).as("t1"))
        .crossJoin(broadcast(tend))
        // all calendar arithmetic in DATE space on BOTH sides of the
        // oracle (o_orderdate is a timestamp column; comparing a raw
        // timestamp against a date re-promotes to midnight and the two
        // engines would disagree on boundary-day time components)
        .select(expr("CAST(datediff(t1, t0) AS BIGINT) div 7").as("wk"),
          (to_date(col("t1")) < date_sub(to_date(col("tend")), 365))
            .cast("long").as("churn"))
      val total = cust.agg(count(lit(1)).as("n_total"))
      val byW = cust.groupBy("wk")
        .agg(count(lit(1)).as("leave"), sum(col("churn")).as("d"))
      val risk = prefixOffsets(byW.select(col("wk"), col("leave")), "wk", "leave")
        .join(byW.select("wk", "d"), "wk")
        .crossJoin(broadcast(total))
        .select(col("wk"), col("d"), (col("n_total") - col("off")).as("n_risk"))
        .where(col("d") > 0)
      val terms = risk.select(col("wk"), col("d"), col("n_risk"),
        expr("""CAST(CASE WHEN d < n_risk
             THEN round(ln(1.0D - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE)), 9)
             ELSE 0.0D END AS DECIMAL(18,9))""").as("lnterm"),
        (col("d") === col("n_risk")).cast("int").as("iszero"))
      terms
        .join(broadcast(terms.select(col("wk").as("w2"),
          col("lnterm").as("l2"), col("iszero").as("z2"))),
          col("w2") <= col("wk"))
        .groupBy("wk", "d", "n_risk")
        .agg(sum(col("l2")).as("slnp"), max(col("z2")).as("hit0"))
        .select(col("wk"), col("n_risk"), col("d").as("n_churn"),
          when(col("hit0") === 1, lit(0.0))
            .otherwise(round(exp(col("slnp").cast("double")), 6))
            .as("survival"))
        .orderBy("wk")
    }),

    // Market-basket association rules at the brand level: for every
    // brand pair (a < b), the orders containing both (support), the
    // a→b confidence, and the lift n·supp(ab)/(supp(a)·supp(b)) — the
    // "bought together more than chance" score. Brands (25) bound the
    // pair space to ≤300 rows, so the report is dim-bounded while the
    // work stays linear: one broadcast part join + ONE order-keyed
    // shuffle builds the per-order sorted brand set, the pairs explode
    // MAP-SIDE from the bounded array (per-order fan ≤ C(25,2), never
    // all-pairs across orders), and marginals/total reduce the same
    // checkpointed frame; two broadcast marginal joins finish the
    // report. Lift/confidence are exact-integer operands through IEEE
    // products in ONE declared order (n_ab·n_orders then n_a·n_b —
    // double products stay exact below 2^53; past that both engines
    // compute the identical rounding, so the hash still matches).
    "q_wl_market_basket" -> ((s, d) => {
      val ob = orderBrandSets(s, d)
      val tot = ob.agg(count(lit(1)).as("n_orders"))
      val marg = ob.select(explode(col("bs")).as("brand"))
        .groupBy("brand").agg(count(lit(1)).as("n_br"))
      ob.select(explode(expr(
          """flatten(transform(bs, (x, i) ->
               transform(slice(bs, i + 2, size(bs)),
                 y -> named_struct('a', x, 'b', y))))""")).as("p"))
        .groupBy(col("p.a").as("brand_a"), col("p.b").as("brand_b"))
        .agg(count(lit(1)).as("n_ab"))
        .join(broadcast(marg.select(col("brand").as("brand_a"),
          col("n_br").as("n_a"))), "brand_a")
        .join(broadcast(marg.select(col("brand").as("brand_b"),
          col("n_br").as("n_b"))), "brand_b")
        .crossJoin(broadcast(tot))
        .select(col("brand_a"), col("brand_b"), col("n_ab"),
          col("n_a"), col("n_b"),
          round((col("n_ab").cast("double") * col("n_orders")) /
            (col("n_a").cast("double") * col("n_b")), 6).as("lift"),
          round(col("n_ab").cast("double") / col("n_a"), 6).as("conf_ab"))
        .orderBy("brand_a", "brand_b")
    }),

    // Linear multi-touch attribution: every click strictly PRIOR to a
    // purchase (event_id order — the §2.30 co-ordering rule) within
    // the 7-day window gets an equal 1/k share of that purchase's
    // credit; the report sums each click's shares — the number a
    // marketing dashboard ranks channels by. Shapes: purchases join
    // clicks on the USER equi-key with the window as a band residual
    // (per-user fan, bounded by the window — the density rule: if
    // per-user traffic explodes at 100 TB, the theta_range day-binning
    // pattern applies unchanged), a per-PURCHASE partitioned count
    // window for k, and one keyed sum of the 1e-6-grid credit shares
    // as exact decimals. Clicks crediting nothing drop out (inner
    // join); output ∝ credited clicks.
    "q_ts_attribution_linear" -> ((s, d) => {
      val ev = Tables(s, d, "events")
      val p = ev.where(col("event_type") === "purchase")
        .select(col("event_id").as("p_eid"), col("user_id"),
          epochS(col("ts")).as("p_ts"))
      val c = ev.where(col("event_type") === "click")
        .select(col("event_id").as("c_eid"), col("user_id").as("c_uid"),
          epochS(col("ts")).as("c_ts"))
      p.join(c.hint("shuffle_hash"), col("user_id") === col("c_uid") &&
          col("c_eid") < col("p_eid") &&
          col("p_ts") - col("c_ts") <= 604800L)
        .withColumn("k", count(lit(1)).over(Window.partitionBy("p_eid")))
        .select(col("c_eid"), col("c_uid"),
          round(lit(1.0) / col("k"), 6).as("credit"))
        .groupBy(col("c_eid").as("click_event_id"),
          col("c_uid").as("user_id"))
        .agg(count(lit(1)).as("n_purchases"),
          dsum(col("credit")).as("credit"))
        .orderBy("click_event_id")
    }),

    // Banded dynamic-time-warping distance (Sakoe–Chiba radius 6)
    // between the hourly purchase-cents and click-cents series — "do
    // the two series follow the same shape, allowing small phase
    // shifts": the alignment-tolerant companion to q_ts_xcorr's fixed
    // lags (xcorr asks "which lag correlates"; DTW prices the best
    // LOCAL alignment). ENTIRELY integer: per-hour exact cent sums
    // (one events aggregate — the xcorr hourly frame with conditional
    // sums), |a−b| step costs, BIGINT DP. The DP keeps only the
    // 14-wide band row (a leading guard cell + offsets i−6..i+6), so
    // the fold is O(span·band) — NEVER the O(span²) full-matrix row
    // (which also turns the append-built row quadratic per step).
    // The series length is calendar-bounded (8 760 h/yr) — not ×N —
    // so the single-task fold over the 1-row frame is the right
    // plan; if the span itself explodes, segment-parallel DTW with
    // boundary stitching is the scale path (noted, not needed here).
    // Out-of-band/boundary cells carry an INF sentinel (1e15: above
    // any real path cost ≤ span·max|Δcents|, far below BIGINT
    // overflow even after band-edge accumulation). Output: the DTW
    // distance, the lag-0 L1 distance (the band contains the
    // diagonal, so dtw ≤ l1 by construction), and the warp gain
    // (l1−dtw)/l1 — the "how much does alignment explain" scalar.
    "q_ts_dtw" -> ((s, d) => {
      val INF = "CAST(1000000000000000 AS BIGINT)"
      val hourly = Tables(s, d, "events")
        .groupBy((epochS(col("ts")) - pmod(epochS(col("ts")), lit(3600L)))
          .as("hr"))
        .agg(
          sum(when(col("event_type") === "purchase",
            round(col("value") * 100).cast("long")).otherwise(0L)).as("pa"),
          sum(when(col("event_type") === "click",
            round(col("value") * 100).cast("long")).otherwise(0L)).as("ca"))
      hourly.agg(
          expr("transform(array_sort(collect_list(struct(hr, pa))), s -> s.pa)")
            .as("a"),
          expr("transform(array_sort(collect_list(struct(hr, ca))), s -> s.ca)")
            .as("b"),
          count(lit(1)).as("n"))
        .select(col("n").as("n_hours"),
          expr(s"""aggregate(sequence(1, CAST(n AS INT)), CAST(0 AS BIGINT),
               (acc, i) -> acc + abs(element_at(a, i) - element_at(b, i)))""")
            .as("l1_lag0"),
          expr(s"""element_at(
             aggregate(
               sequence(1, CAST(n AS INT)),
               concat(array_repeat($INF, 7), array(CAST(0 AS BIGINT)),
                 array_repeat($INF, 6)),
               (prev, i) -> aggregate(
                 sequence(0, 12),
                 array($INF),
                 (row, o) -> concat(row, array(
                   IF(i - 6 + o < 1 OR i - 6 + o > n, $INF,
                      abs(element_at(a, i) - element_at(b, i - 6 + o)) +
                      least(
                        IF(o > 11, $INF, element_at(prev, o + 3)),
                        element_at(prev, o + 2),
                        element_at(row, size(row)))))))),
             8)""").as("dtw"))
        .select(col("n_hours"), col("l1_lag0"), col("dtw"),
          when(col("l1_lag0") === 0, lit(0.0))
            .otherwise(round((col("l1_lag0") - col("dtw")).cast("double") /
              col("l1_lag0"), 6)).as("warp_gain"))
    }),

    // Holt–Winters additive seasonal smoothing over the hourly
    // purchase-value series (α=0.2, β=0.1, γ=0.3, period 24 h) — the
    // seasonal completion of the trailing-state family (EWMA → Holt →
    // CUSUM → Kalman → HW): level + trend + a 24-slot daily seasonal
    // profile, folded in ONE pass over the calendar-bounded hourly
    // frame (the DTW series discipline). State is a 27-wide double
    // array [i, level, trend, s0..s23]; every assignment rounds to the
    // 1e-6 grid (the Kalman step-template rule — identical IEEE inputs
    // ⇒ identical rounds ⇒ the engines cannot drift however many steps
    // run). Seed: level = first obs, trend 0, flat seasonals. Output:
    // the fitted state and the one-step forecast level+trend+s_next,
    // plus the seasonal amplitude (max−min slot) — the "is there a
    // daily cycle" scalar.
    "q_ts_holt_winters" -> ((s, d) => {
      val hourly = Tables(s, d, "events")
        .where(col("event_type") === "purchase")
        .groupBy((epochS(col("ts")) - pmod(epochS(col("ts")), lit(3600L)))
          .as("hr"))
        .agg(sum(round(col("value") * 100).cast("long")).as("pc"))
      hourly.agg(
          expr("transform(array_sort(collect_list(struct(hr, pc))), s -> CAST(s.pc AS DOUBLE) / 100.0)")
            .as("xs"),
          count(lit(1)).as("n"))
        .select(col("n").as("n_hours"), expr(
          """aggregate(
               slice(xs, 2, CAST(n AS INT) - 1),
               concat(array(1.0D, element_at(xs, 1), 0.0D),
                 array_repeat(0.0D, 24)),
               (acc, x) -> concat(
                 array(
                   element_at(acc, 1) + 1.0D,
                   round(0.2D * (x - element_at(acc,
                       (CAST(element_at(acc, 1) AS INT) % 24) + 4))
                     + 0.8D * (element_at(acc, 2) + element_at(acc, 3)), 6),
                   round(0.1D * (round(0.2D * (x - element_at(acc,
                         (CAST(element_at(acc, 1) AS INT) % 24) + 4))
                       + 0.8D * (element_at(acc, 2) + element_at(acc, 3)), 6)
                       - element_at(acc, 2))
                     + 0.9D * element_at(acc, 3), 6)),
                 transform(sequence(0, 23), k ->
                   IF(k = CAST(element_at(acc, 1) AS INT) % 24,
                      round(0.3D * (x - round(0.2D * (x - element_at(acc,
                            (CAST(element_at(acc, 1) AS INT) % 24) + 4))
                          + 0.8D * (element_at(acc, 2) + element_at(acc, 3)), 6))
                        + 0.7D * element_at(acc,
                            (CAST(element_at(acc, 1) AS INT) % 24) + 4), 6),
                      element_at(acc, k + 4)))))""").as("st"))
        .select(col("n_hours"),
          expr("round(element_at(st, 2), 6)").as("level"),
          expr("round(element_at(st, 3), 6)").as("trend"),
          expr("""round(element_at(st, 2) + element_at(st, 3)
              + element_at(st, (CAST(element_at(st, 1) AS INT) % 24) + 4), 6)""")
            .as("forecast_next"),
          expr("round(array_max(slice(st, 4, 24)) - array_min(slice(st, 4, 24)), 6)")
            .as("season_amplitude"))
    }),

    // Gini coefficient of customer revenue + the top-1% revenue share —
    // the concentration report behind "how skewed is our customer
    // base" (and, at 100 TB, "how skewed is this JOIN KEY"): G =
    // (2·Σ rank·x − (n+1)·Σx) / (n·Σx) over ascending exact-cent
    // revenues. Global ranks WITHOUT a global window: the ntile/
    // curriculum distributed-rank construction (gridBin equi-width
    // buckets over broadcast bounds → prefixOffsets triangle → per-bin
    // windows); equal values make rank assignment arbitrary but Σ
    // rank·x is tie-invariant, so the tiebreak (custkey) affects
    // nothing. Σ rank·x accumulates in DECIMAL(38,0) (rank·cents
    // overflows BIGINT sums once n·max(rank·x) passes 2^63 — the
    // ks_drift overflow lesson applied PREEMPTIVELY), and the final
    // ratio is one rounded IEEE division of exact operands.
    "q_agg_gini" -> ((s, d) => {
      val rev = Tables(s, d, "orders")
        .groupBy(col("o_custkey"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      val bounds = rev.agg(min("cents").as("lo"), max("cents").as("hi"),
        count(lit(1)).as("ntot"))
      val bucketed = rev.crossJoin(broadcast(bounds))
        .withColumn("b", gridBin(col("cents"), col("lo"), col("hi"), 32))
      val bc = bucketed.groupBy("b").agg(count(lit(1)).as("cnt"))
      val offs = prefixOffsets(bc, "b", "cnt").select("b", "off")
      val wb = Window.partitionBy("b").orderBy("cents", "o_custkey")
      bucketed.join(broadcast(offs), "b")
        .withColumn("pos", col("off") + row_number().over(wb))
        .agg(count(lit(1)).as("n"),
          sum(col("cents")).as("total_cents"),
          sum(col("pos").cast(DEC38) * col("cents")).as("s1"),
          sum(when(col("pos") > col("ntot") - expr("ntot div 100"),
            col("cents")).otherwise(0L)).as("top1_cents"))
        .select(col("n"), col("total_cents"),
          round((lit(2).cast(DEC38) * col("s1") -
            (col("n") + 1).cast(DEC38) * col("total_cents")).cast("double") /
            (col("n").cast(DEC38) * col("total_cents")).cast("double"), 6)
            .as("gini"),
          round(col("top1_cents").cast("double") / col("total_cents"), 6)
            .as("top1_share"))
    }),

    // RFM segmentation — the classic customer triage (Recency ×
    // Frequency × Monetary quintiles) every CRM/BI pipeline ships:
    // per customer, days since last order (vs the corpus max date),
    // order count, and exact-cent revenue; each dimension scored 1–5
    // by POSITION quintile (q = ⌊5·(pos−1)/n⌋+1 — equal-width by rank,
    // deterministic under the custkey tiebreak; R inverted so 5 =
    // most recent, the RFM convention), segments reported with size
    // and an exact mean revenue. Three applications of the SAME
    // distributed-rank construction as q_agg_gini (never a global
    // window), joined back on the customer key, one ≤125-row segment
    // aggregate.
    "q_wl_rfm" -> ((s, d) => {
      val maxd = Tables(s, d, "orders")
        .agg(max(col("o_orderdate").cast("date")).as("maxd"))
      val base = Tables(s, d, "orders")
        .groupBy(col("o_custkey").as("c"))
        .agg(max(col("o_orderdate").cast("date")).as("lastd"),
          count(lit(1)).as("freq"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
        .crossJoin(broadcast(maxd))
        .select(col("c"), datediff(col("maxd"), col("lastd")).as("rec"),
          col("freq"), col("cents"))
        .localCheckpoint(false)
      def quint(v: String): org.apache.spark.sql.DataFrame = {
        val df = base.select(col("c"), col(v))
        val bounds = df.agg(min(col(v)).as("lo"), max(col(v)).as("hi"),
          count(lit(1)).as("ntot"))
        val bucketed = df.crossJoin(broadcast(bounds))
          .withColumn("b", gridBin(col(v), col("lo"), col("hi"), 32))
        val bc = bucketed.groupBy("b").agg(count(lit(1)).as("cnt"))
        val offs = prefixOffsets(bc, "b", "cnt").select("b", "off")
        val wb = Window.partitionBy("b").orderBy(v, "c")
        bucketed.join(broadcast(offs), "b")
          .withColumn("pos", col("off") + row_number().over(wb))
          .select(col("c"),
            (expr("least(4, (5 * (pos - 1)) div ntot)") + 1).cast("int")
              .as(s"q_$v"))
      }
      base.join(quint("rec"), "c").join(quint("freq"), "c")
        .join(quint("cents"), "c")
        .select(col("c"), col("cents"),
          (lit(6) - col("q_rec")).as("r_score"),
          col("q_freq").as("f_score"), col("q_cents").as("m_score"))
        .groupBy("r_score", "f_score", "m_score")
        .agg(count(lit(1)).as("n_customers"),
          sum(col("cents")).as("cents"))
        .select(col("r_score"), col("f_score"), col("m_score"),
          col("n_customers"),
          round(col("cents").cast("double") / col("n_customers") / 100.0, 6)
            .as("avg_revenue"))
        .orderBy("r_score", "f_score", "m_score")
    }),

    // Cohort LTV curves — the companion to q_ts_retention_cohort that
    // reports MONEY instead of presence: users cohorted by first-
    // purchase WEEK (epoch-week index — calendar months are vacuous on
    // this corpus, whose events span ~one month at every SF; weeks
    // give a real multi-cohort, multi-age curve), each cohort's
    // revenue accumulated by age (weeks since acquisition); avg_ltv =
    // cumulative cents / cohort size is the curve a growth dashboard
    // overlays per cohort. Shapes: one purchases pass → per-user first
    // week (keyed agg) → join back on the USER key → a (cohort, age)
    // aggregate whose output is calendar-bounded, so the running-total
    // window and the size join ride a bounded frame (the per-cohort
    // cumsum is a partitioned window over weeks, not data). Exact
    // integer cents throughout; one rounded division at the end.
    "q_wl_cohort_ltv" -> ((s, d) => {
      val p = Tables(s, d, "events")
        .where(col("event_type") === "purchase")
        .select(col("user_id"),
          expr("CAST(ts AS BIGINT) div 604800").as("m"),
          round(col("value") * 100).cast("long").as("cents"))
      val coh = p.groupBy("user_id").agg(min(col("m")).as("cm"))
      val sz = coh.groupBy("cm").agg(count(lit(1)).as("cohort_size"))
      val wc = Window.partitionBy("cm").orderBy("age")
        .rowsBetween(Window.unboundedPreceding, 0)
      p.join(coh, "user_id")
        .groupBy(col("cm"), (col("m") - col("cm")).as("age"))
        .agg(sum(col("cents")).as("rev_cents"))
        .join(broadcast(sz), "cm")
        .withColumn("cum_cents", sum(col("rev_cents")).over(wc))
        .select(col("cm").as("cohort_w"), col("age"), col("cohort_size"),
          col("rev_cents"), col("cum_cents"),
          round(col("cum_cents").cast("double") / col("cohort_size") / 100.0,
            6).as("avg_ltv"))
        .orderBy("cohort_w", "age")
    }),

    // Growth mart — the composed cohort dashboard (the
    // q_wl_curation_pipeline proof applied to the behavioral family):
    // per first-purchase-week cohort, size, purchase count, the share
    // of purchases carrying a prior click inside the 7-day window (the
    // §2.30 attribution carry-forward), total revenue, and revenue per
    // user — attribution + cohorting + LTV FUSED into one plan with
    // ONE events scan: the user-partitioned carry-forward window and
    // the per-user first-week aggregate ride the same user_id
    // shuffle, the cohort rollup is calendar-bounded. Exact integers
    // end-to-end; two rounded divisions in the report.
    "q_wl_growth_mart" -> ((s, d) => {
      val wPrev = Window.partitionBy("user_id").orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val p = Tables(s, d, "events")
        .withColumn("ck_ts",
          max(when(col("event_type") === "click", epochS(col("ts"))))
            .over(wPrev))
        .where(col("event_type") === "purchase")
        .select(col("user_id"),
          expr("CAST(ts AS BIGINT) div 604800").as("m"),
          round(col("value") * 100).cast("long").as("cents"),
          (col("ck_ts").isNotNull &&
            (epochS(col("ts")) - col("ck_ts")) <= 604800L)
            .cast("long").as("attributed"))
      val perUser = p.groupBy("user_id")
        .agg(min(col("m")).as("cohort_w"), count(lit(1)).as("n_p"),
          sum(col("attributed")).as("n_att"),
          sum(col("cents")).as("cents"))
      perUser.groupBy("cohort_w")
        .agg(count(lit(1)).as("cohort_size"),
          sum(col("n_p")).as("n_purchases"),
          sum(col("n_att")).as("n_attributed"),
          sum(col("cents")).as("revenue_cents"))
        .select(col("cohort_w"), col("cohort_size"), col("n_purchases"),
          col("n_attributed"),
          round(col("n_attributed").cast("double") / col("n_purchases"), 6)
            .as("attribution_rate"),
          col("revenue_cents"),
          round(col("revenue_cents").cast("double") / col("cohort_size")
            / 100.0, 6).as("revenue_per_user"))
        .orderBy("cohort_w")
    })
  )

  val oracle: Map[String, String] = Map(
    // the triangle cumulatives mirror as ordered window sums — exact
    // DECIMAL lnterm sum, the same 1e-9 ln grid and round(exp, 6) tail
    "q_ts_survival_km" ->
      """WITH b AS (SELECT MAX(o_orderdate) AS tend FROM orders),
         u AS (SELECT o_custkey, MIN(o_orderdate) AS t0,
                 MAX(o_orderdate) AS t1
               FROM orders GROUP BY o_custkey),
         c AS (SELECT date_diff('day', CAST(t0 AS DATE), CAST(t1 AS DATE)) // 7 AS wk,
                 CASE WHEN CAST(t1 AS DATE) < CAST(tend AS DATE) - 365
                   THEN 1 ELSE 0 END AS churn
               FROM u, b),
         tot AS (SELECT COUNT(*) AS n_total FROM c),
         w AS (SELECT wk, COUNT(*) AS lv, CAST(SUM(churn) AS BIGINT) AS d
               FROM c GROUP BY wk),
         r AS (SELECT wk, d,
                 CAST(n_total - COALESCE(SUM(lv) OVER (ORDER BY wk
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS n_risk
               FROM w, tot),
         e AS (SELECT wk, d, n_risk,
                 CAST(CASE WHEN d < n_risk
                   THEN round(ln(1.0 - CAST(d AS DOUBLE) / n_risk), 9)
                   ELSE 0.0 END AS DECIMAL(18,9)) AS lnterm,
                 CASE WHEN d = n_risk THEN 1 ELSE 0 END AS iszero
               FROM r WHERE d > 0),
         f AS (SELECT wk, n_risk, d AS n_churn,
                 SUM(lnterm) OVER (ORDER BY wk) AS slnp,
                 MAX(iszero) OVER (ORDER BY wk) AS hit0
               FROM e)
         SELECT wk, n_risk, n_churn,
           CASE WHEN hit0 = 1 THEN 0.0
                ELSE round(exp(CAST(slnp AS DOUBLE)), 6) END AS survival
         FROM f ORDER BY wk""",

    "q_wl_market_basket" ->
      """WITH ob AS (SELECT DISTINCT l.l_orderkey AS okey,
             p.p_brand AS brand
           FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
         tot AS (SELECT COUNT(DISTINCT okey) AS n_orders FROM ob),
         marg AS (SELECT brand, COUNT(*) AS n_br FROM ob GROUP BY brand),
         pr AS (SELECT a.brand AS brand_a, b.brand AS brand_b,
               COUNT(*) AS n_ab
             FROM ob a JOIN ob b
               ON a.okey = b.okey AND a.brand < b.brand
             GROUP BY a.brand, b.brand)
         SELECT brand_a, brand_b, CAST(n_ab AS BIGINT) AS n_ab,
           CAST(ma.n_br AS BIGINT) AS n_a, CAST(mb.n_br AS BIGINT) AS n_b,
           round((CAST(n_ab AS DOUBLE) * n_orders)
             / (CAST(ma.n_br AS DOUBLE) * mb.n_br), 6) AS lift,
           round(CAST(n_ab AS DOUBLE) / ma.n_br, 6) AS conf_ab
         FROM pr
         JOIN marg ma ON pr.brand_a = ma.brand
         JOIN marg mb ON pr.brand_b = mb.brand, tot
         ORDER BY brand_a, brand_b""",

    "q_ts_attribution_linear" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
             epoch_ms(ts) // 1000 AS es
           FROM events),
         t AS (SELECT c.event_id AS c_eid, c.user_id,
               COUNT(*) OVER (PARTITION BY p.event_id) AS k
             FROM e p JOIN e c
               ON p.user_id = c.user_id AND c.event_id < p.event_id
                 AND p.es - c.es <= 604800
             WHERE p.event_type = 'purchase' AND c.event_type = 'click'),
         cr AS (SELECT c_eid, user_id, round(1.0 / k, 6) AS credit FROM t)
         SELECT c_eid AS click_event_id, user_id,
           COUNT(*) AS n_purchases,
           CAST(SUM(CAST(credit AS DECIMAL(18,6))) AS DOUBLE) AS credit
         FROM cr GROUP BY c_eid, user_id ORDER BY click_event_id""",

    // the DP twin folds LIST-valued accumulators; the [i]-wrapped index
    // lists keep list_reduce's element type equal to the accumulator
    // type (DuckDB's fold has no separate init-type slot — the
    // list_prepend(seed, …) convention, lifted to lists)
    "q_ts_dtw" ->
      """WITH es AS (SELECT (epoch_ms(ts) // 1000) AS s, event_type, value
           FROM events),
         hourly AS (SELECT s - (s % 3600) AS hr,
             CAST(SUM(CASE WHEN event_type = 'purchase'
               THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
               AS BIGINT) AS pa,
             CAST(SUM(CASE WHEN event_type = 'click'
               THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
               AS BIGINT) AS ca
           FROM es GROUP BY hr),
         ser AS (SELECT list(pa ORDER BY hr) AS a, list(ca ORDER BY hr) AS b,
               COUNT(*) AS n
             FROM hourly),
         dp AS (SELECT n,
             list_reduce(
               list_prepend(
                 [CAST(1000000000000000 AS BIGINT), 1000000000000000,
                  1000000000000000, 1000000000000000, 1000000000000000,
                  1000000000000000, 1000000000000000, 0,
                  1000000000000000, 1000000000000000, 1000000000000000,
                  1000000000000000, 1000000000000000, 1000000000000000],
                 list_transform(range(1, n + 1), i -> [CAST(i AS BIGINT)])),
               (prev, iw) -> list_reduce(
                 list_prepend([CAST(1000000000000000 AS BIGINT)],
                   list_transform(range(0, 13), o -> [CAST(o AS BIGINT)])),
                 (row, ow) -> list_append(row,
                   CASE WHEN iw[1] - 6 + ow[1] < 1 OR iw[1] - 6 + ow[1] > n
                     THEN CAST(1000000000000000 AS BIGINT)
                     ELSE abs(a[iw[1]] - b[iw[1] - 6 + ow[1]]) +
                       least(
                         CASE WHEN ow[1] > 11
                           THEN CAST(1000000000000000 AS BIGINT)
                           ELSE prev[ow[1] + 3] END,
                         prev[ow[1] + 2],
                         row[len(row)])
                     END))) AS fin
           FROM ser),
         l1 AS (SELECT n,
             CAST(list_sum(list_transform(range(1, n + 1),
               i -> abs(a[i] - b[i]))) AS BIGINT) AS l1_lag0
           FROM ser)
         SELECT l1.n AS n_hours, l1.l1_lag0, CAST(dp.fin[8] AS BIGINT) AS dtw,
           CASE WHEN l1.l1_lag0 = 0 THEN CAST(0 AS DOUBLE)
             ELSE round(CAST(l1.l1_lag0 - dp.fin[8] AS DOUBLE) / l1.l1_lag0, 6)
             END AS warp_gain
         FROM dp, l1""",

    // the HW fold twin: 1-based list indices match Spark's element_at
    // positions exactly, so the step arithmetic copies verbatim; the
    // [x]-wrap keeps list_reduce type-homogeneous (the DTW convention)
    "q_ts_holt_winters" ->
      """WITH es AS (SELECT (epoch_ms(ts) // 1000) AS s, value
           FROM events WHERE event_type = 'purchase'),
         hourly AS (SELECT s - (s % 3600) AS hr,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS pc
           FROM es GROUP BY hr),
         ser AS (SELECT list(CAST(pc AS DOUBLE) / 100.0 ORDER BY hr) AS xs,
               COUNT(*) AS n
             FROM hourly),
         dp AS (SELECT n,
             list_reduce(
               list_prepend(
                 list_concat([1.0, xs[1], 0.0],
                   list_transform(range(0, 24), k -> 0.0)),
                 list_transform(xs[2:], x -> [x])),
               (acc, xw) -> list_concat(
                 [acc[1] + 1.0,
                  round(0.2 * (xw[1] - acc[(CAST(acc[1] AS INT) % 24) + 4])
                    + 0.8 * (acc[2] + acc[3]), 6),
                  round(0.1 * (round(0.2 * (xw[1]
                        - acc[(CAST(acc[1] AS INT) % 24) + 4])
                      + 0.8 * (acc[2] + acc[3]), 6) - acc[2])
                    + 0.9 * acc[3], 6)],
                 list_transform(range(0, 24), k ->
                   CASE WHEN k = CAST(acc[1] AS INT) % 24
                     THEN round(0.3 * (xw[1] - round(0.2 * (xw[1]
                           - acc[(CAST(acc[1] AS INT) % 24) + 4])
                         + 0.8 * (acc[2] + acc[3]), 6))
                       + 0.7 * acc[(CAST(acc[1] AS INT) % 24) + 4], 6)
                     ELSE acc[k + 4] END))) AS st
           FROM ser)
         SELECT n AS n_hours,
           round(st[2], 6) AS level,
           round(st[3], 6) AS trend,
           round(st[2] + st[3] + st[(CAST(st[1] AS INT) % 24) + 4], 6)
             AS forecast_next,
           round(list_aggregate(st[4:27], 'max')
             - list_aggregate(st[4:27], 'min'), 6) AS season_amplitude
         FROM dp""",

    // the oracle ranks with a plain global window — allowed on the
    // DuckDB side (it is the REFERENCE, not the distributed plan);
    // Σ rank·x is tie-invariant so the two rank constructions agree
    "q_agg_gini" ->
      """WITH rev AS (SELECT o_custkey,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
           FROM orders GROUP BY o_custkey),
         t0 AS (SELECT COUNT(*) AS ntot FROM rev),
         r AS (SELECT cents,
               row_number() OVER (ORDER BY cents, o_custkey) AS pos
             FROM rev),
         t AS (SELECT COUNT(*) AS n,
               CAST(SUM(cents) AS BIGINT) AS total_cents,
               SUM(CAST(pos AS DECIMAL(38,0)) * cents) AS s1,
               CAST(SUM(CASE WHEN pos > ntot - ntot // 100 THEN cents
                 ELSE 0 END) AS BIGINT) AS top1_cents
             FROM r, t0 GROUP BY ntot)
         SELECT n, total_cents,
           round(CAST(CAST(2 AS DECIMAL(38,0)) * s1
               - CAST(n + 1 AS DECIMAL(38,0)) * total_cents AS DOUBLE)
             / CAST(CAST(n AS DECIMAL(38,0)) * total_cents AS DOUBLE), 6)
             AS gini,
           round(CAST(top1_cents AS DOUBLE) / total_cents, 6) AS top1_share
         FROM t""",

    "q_wl_rfm" ->
      """WITH maxd AS (SELECT max(CAST(o_orderdate AS DATE)) AS maxd
           FROM orders),
         base AS (SELECT o_custkey AS c,
             max(CAST(o_orderdate AS DATE)) AS lastd, COUNT(*) AS freq,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
           FROM orders GROUP BY o_custkey),
         b2 AS (SELECT c, date_diff('day', lastd, maxd) AS rec, freq, cents
           FROM base, maxd),
         t0 AS (SELECT COUNT(*) AS ntot FROM b2),
         qr AS (SELECT c, CAST(least(4, (5 * (row_number()
               OVER (ORDER BY rec, c) - 1)) // ntot) + 1 AS INT) AS q_rec
             FROM b2, t0),
         qf AS (SELECT c, CAST(least(4, (5 * (row_number()
               OVER (ORDER BY freq, c) - 1)) // ntot) + 1 AS INT) AS q_freq
             FROM b2, t0),
         qm AS (SELECT c, CAST(least(4, (5 * (row_number()
               OVER (ORDER BY cents, c) - 1)) // ntot) + 1 AS INT) AS q_cents
             FROM b2, t0)
         SELECT (6 - q_rec) AS r_score, q_freq AS f_score,
           q_cents AS m_score, COUNT(*) AS n_customers,
           round(CAST(SUM(cents) AS DOUBLE) / COUNT(*) / 100.0, 6)
             AS avg_revenue
         FROM b2 JOIN qr USING (c) JOIN qf USING (c) JOIN qm USING (c)
         GROUP BY r_score, f_score, m_score
         ORDER BY r_score, f_score, m_score""",

    "q_wl_cohort_ltv" ->
      """WITH p AS (SELECT user_id,
             (epoch_ms(ts) // 1000) // 604800 AS m,
             CAST(round(value * 100) AS BIGINT) AS cents
           FROM events WHERE event_type = 'purchase'),
         coh AS (SELECT user_id, min(m) AS cm FROM p GROUP BY user_id),
         sz AS (SELECT cm, COUNT(*) AS cohort_size FROM coh GROUP BY cm),
         ba AS (SELECT coh.cm, p.m - coh.cm AS age,
               CAST(SUM(cents) AS BIGINT) AS rev_cents
             FROM p JOIN coh USING (user_id) GROUP BY coh.cm, age),
         w AS (SELECT cm, age, rev_cents,
               CAST(SUM(rev_cents) OVER (PARTITION BY cm ORDER BY age
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS cum_cents
             FROM ba)
         SELECT w.cm AS cohort_w, age, cohort_size, rev_cents, cum_cents,
           round(CAST(cum_cents AS DOUBLE) / cohort_size / 100.0, 6)
             AS avg_ltv
         FROM w JOIN sz USING (cm) ORDER BY cohort_w, age""",

    "q_wl_growth_mart" ->
      """WITH w AS (SELECT user_id, event_id, event_type,
             epoch_ms(ts) // 1000 AS es,
             (epoch_ms(ts) // 1000) // 604800 AS m,
             CAST(round(value * 100) AS BIGINT) AS cents,
             max(CASE WHEN event_type = 'click'
                   THEN epoch_ms(ts) // 1000 END)
               OVER (PARTITION BY user_id ORDER BY event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS ck_ts
           FROM events),
         p AS (SELECT user_id, m, cents,
               CAST(coalesce(ck_ts IS NOT NULL
                 AND es - ck_ts <= 604800, FALSE) AS BIGINT) AS attributed
             FROM w WHERE event_type = 'purchase'),
         u AS (SELECT user_id, min(m) AS cohort_w, COUNT(*) AS n_p,
               CAST(SUM(attributed) AS BIGINT) AS n_att,
               CAST(SUM(cents) AS BIGINT) AS cents
             FROM p GROUP BY user_id)
         SELECT cohort_w, COUNT(*) AS cohort_size,
           CAST(SUM(n_p) AS BIGINT) AS n_purchases,
           CAST(SUM(n_att) AS BIGINT) AS n_attributed,
           round(CAST(SUM(n_att) AS DOUBLE) / SUM(n_p), 6)
             AS attribution_rate,
           CAST(SUM(cents) AS BIGINT) AS revenue_cents,
           round(CAST(SUM(cents) AS DOUBLE) / COUNT(*) / 100.0, 6)
             AS revenue_per_user
         FROM u GROUP BY cohort_w ORDER BY cohort_w"""
  )
}
