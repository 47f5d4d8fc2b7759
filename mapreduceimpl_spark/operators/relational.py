"""Relational operator suite over the fixture star schema.

The reference has NO relational surface beyond hash-grouped count
(SURVEY.md §2.2-2.8: filters, projections, joins, windows, sorts, set
ops are all `absent`); this module supplies it Spark-first.  Each
function is a declarative DataFrame plan: Catalyst handles predicate
pushdown, column pruning, join strategy (broadcast for the small dims),
and AQE handles skew/coalescing at runtime.

Determinism rules (oracle + 100 TB correctness):
- double sums go through DECIMAL (``dec_sum``) → partition-order-free;
- every top-k / ranking ORDER BY carries a unique tiebreaker key;
- computed integers are cast to BIGINT, timestamps to STRING/DATE at
  the output edge so results are engine-portable.

Each ``q_*`` takes a dict of table-name → DataFrame (from
``sources.load_tables``) so the same plan runs on any storage binding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from mapreduceimpl_spark.functions import dec_avg, dec_sum, revenue

# ---------------------------------------------------------------------------
# filters / projections  (SURVEY §2.2 P2-P3)
# ---------------------------------------------------------------------------


def q_filter_project(t: dict[str, DataFrame]) -> DataFrame:
    """Filter + computed projection; predicate and columns reach the scan."""
    li = t["lineitem"]
    return (
        li.filter((F.col("l_quantity") > 45) & (F.col("l_discount") >= 0.05))
        .select(
            "l_orderkey",
            F.col("l_linenumber").cast("long").alias("l_linenumber"),
            "l_quantity",
            revenue().alias("rev"),
        )
    )


def q_scalar_case_date(t: dict[str, DataFrame]) -> DataFrame:
    """CASE-WHEN bucketing x date-part extraction + aggregation
    (merged from the round-1 scalar_case + scalar_date entries so both
    scalar families share one driver-verified catalog slot)."""
    o = t["orders"]
    bucket = (
        F.when(F.col("o_totalprice") < 1000, "small")
        .when(F.col("o_totalprice") < 10000, "medium")
        .otherwise("large")
    )
    return (
        o.select(
            bucket.alias("bucket"),
            F.year("o_orderdate").cast("long").alias("yr"),
            F.month("o_orderdate").cast("long").alias("mo"),
        )
        .groupBy("bucket", "yr", "mo")
        .agg(F.count("*").alias("cnt"))
    )


# ---------------------------------------------------------------------------
# aggregations  (SURVEY §2.4 A3/A5/A6)
# ---------------------------------------------------------------------------


def q_pricing_summary(t: dict[str, DataFrame]) -> DataFrame:
    """TPC-H Q1 shape: multi-aggregate GROUP BY with partial aggregation.

    The reference's flagship count (``test.go:13-81``) generalized to
    sums/avgs; decimal-routed so the result is shuffle-order-free.
    """
    li = t["lineitem"]
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dec_sum("l_quantity").alias("sum_qty"),
            dec_sum("l_extendedprice").alias("sum_base_price"),
            dec_sum(revenue()).alias("sum_disc_price"),
            dec_avg("l_quantity").alias("avg_qty"),
            dec_avg("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def q_agg_multikey(t: dict[str, DataFrame]) -> DataFrame:
    """Multi-key, multi-aggregate GROUP BY, including sample
    stddev/variance (merged from the round-1 stats_stddev entry).
    Moments are rounded to 6 decimals: parallel vs single-pass moment
    accumulation differs at ~1e-16 relative — far below 6 decimals."""
    li = t["lineitem"]
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("cnt"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        dec_sum("l_extendedprice").alias("sum_price"),
        F.round(F.stddev_samp("l_discount"), 6).alias("sd_disc"),
        F.round(F.var_samp("l_discount"), 6).alias("var_disc"),
        F.round(F.stddev_samp("l_tax"), 6).alias("sd_tax"),
    )


def q_agg_distinct(t: dict[str, DataFrame]) -> DataFrame:
    o, c = t["orders"], t["customer"]
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("o_custkey").alias("n_cust"),
            F.count("*").alias("n_orders"),
        )
    )


def q_distinct(t: dict[str, DataFrame]) -> DataFrame:
    c = t["customer"]
    return c.select("c_mktsegment", F.col("c_nationkey").cast("long").alias("c_nationkey")).distinct()


def q_agg_rollup(t: dict[str, DataFrame]) -> DataFrame:
    """ROLLUP over the region→nation hierarchy (broadcast dim joins)."""
    c, n, r = t["customer"], t["nation"], t["region"]
    joined = c.join(broadcast(n), c.c_nationkey == n.n_nationkey).join(
        broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return joined.rollup("r_name", "n_name").agg(
        F.count("*").alias("cnt"),
        dec_sum("c_acctbal").alias("sum_bal"),
    )


def q_agg_cube(t: dict[str, DataFrame]) -> DataFrame:
    li = t["lineitem"]
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("cnt"),
        dec_sum("l_quantity").alias("sum_qty"),
    )


def q_grouping_sets(t: dict[str, DataFrame]) -> DataFrame:
    """GROUPING SETS via the SQL surface (Spark SQL == engine API too)."""
    t["orders"].createOrReplaceTempView("_gs_orders")
    spark = t["orders"].sparkSession
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
        FROM _gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


def q_agg_approx(t: dict[str, DataFrame]) -> DataFrame:
    """HLL approximate distinct — no exact oracle (driver rows-only check)."""
    li = t["lineitem"]
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.01).alias("approx_parts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )


# ---------------------------------------------------------------------------
# joins  (SURVEY §2.3 — all absent in the reference)
# ---------------------------------------------------------------------------


def q_join_inner(t: dict[str, DataFrame]) -> DataFrame:
    o, c = t["orders"], t["customer"]
    return (
        o.join(c, o.o_custkey == c.c_custkey, "inner")
        .filter(F.col("o_totalprice") > 50000)
        .select("o_orderkey", "c_name", "c_mktsegment", "o_totalprice")
    )


def q_join_left(t: dict[str, DataFrame]) -> DataFrame:
    """Left outer + per-customer order count (0 for order-less customers)."""
    o, c = t["orders"], t["customer"]
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


def q_join_semi(t: dict[str, DataFrame]) -> DataFrame:
    o, c = t["orders"], t["customer"]
    big = o.filter(F.col("o_totalprice") > 100000)
    return c.join(big, c.c_custkey == big.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


def q_join_anti(t: dict[str, DataFrame]) -> DataFrame:
    """Customers with no high-value order (anti join against a filtered
    build side — every customer has *some* order in the fixture)."""
    o, c = t["orders"], t["customer"]
    big = o.filter(F.col("o_totalprice") > 80000)
    return c.join(big, c.c_custkey == big.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


def q_join_full(t: dict[str, DataFrame]) -> DataFrame:
    """Full outer join of per-nation customer vs supplier counts."""
    c = t["customer"].groupBy("c_nationkey").agg(F.count("*").alias("n_cust"))
    s = t["supplier"].groupBy("s_nationkey").agg(F.count("*").alias("n_supp"))
    return (
        c.join(s, c.c_nationkey == s.s_nationkey, "full_outer")
        .select(
            F.coalesce(c.c_nationkey, s.s_nationkey).cast("long").alias("nationkey"),
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        )
    )


def q_join_cross(t: dict[str, DataFrame]) -> DataFrame:
    """Cartesian product of the two smallest dims (bounded: 5 x 25)."""
    r, n = t["region"], t["nation"]
    return r.crossJoin(n.select("n_name")).select("r_name", "n_name")


def q_join_broadcast(t: dict[str, DataFrame]) -> DataFrame:
    """Explicit broadcast hint: dim tables never shuffle the fact side."""
    c, n = t["customer"], t["nation"]
    return (
        c.join(broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("n_cust"), dec_sum("c_acctbal").alias("sum_bal"))
    )


def q_join_theta(t: dict[str, DataFrame]) -> DataFrame:
    """Mixed equi+theta join: equi key prunes, theta predicate filters."""
    li, p = t["lineitem"], t["part"]
    return (
        li.join(p, (li.l_partkey == p.p_partkey) & (li.l_quantity > p.p_size))
        .groupBy("p_brand")
        .agg(F.count("*").alias("cnt"), dec_sum(revenue()).alias("rev"))
    )


def q_shipping_priority(t: dict[str, DataFrame]) -> DataFrame:
    """TPC-H Q3 shape: 3-way join, agg, deterministic top-10."""
    c = t["customer"].filter(F.col("c_mktsegment") == "BUILDING")
    o = t["orders"]
    li = t["lineitem"]
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey")
        .agg(dec_sum(revenue()).alias("rev"))
        .orderBy(F.desc("rev"), F.asc("o_orderkey"))  # unique tiebreaker
        .limit(10)
    )


def q_local_supplier_volume(t: dict[str, DataFrame]) -> DataFrame:
    """TPC-H Q5 shape: 6-way star join; fixed dims broadcast, facts shuffle once.

    Broadcast hints only on nation/region (fixed 25/5-row tables).
    customer/supplier scale linearly with SF, so they carry NO hint:
    at fixture scale the 10 MB AQE/autoBroadcast threshold still
    broadcasts them (plan-tested), while at 100x their multi-GB size
    degrades gracefully to a shuffled join instead of an OOM-by-hint.
    """
    c, o, li = t["customer"], t["orders"], t["lineitem"]
    s, n, r = t["supplier"], t["nation"], t["region"]
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dec_sum(revenue()).alias("rev"))
    )


# ---------------------------------------------------------------------------
# windows  (SURVEY §2.5 — absent in the reference)
# ---------------------------------------------------------------------------


def q_volume_shipping(t: dict[str, DataFrame]) -> DataFrame:
    """TPC-H Q7 shape: supplier-nation x customer-nation trade volume
    by ship year, restricted to one nation pair.

    Only the 25-row nation splits carry broadcast hints;
    customer/supplier are SF-scaled and left to the autoBroadcast
    threshold + AQE (hinting them OOMs executors at 100x — VERDICT r4).
    """
    li, o, c = t["lineitem"], t["orders"], t["customer"]
    s, n = t["supplier"], t["nation"]
    n1 = broadcast(n.select(F.col("n_nationkey").alias("sk"), F.col("n_name").alias("supp_nation")))
    n2 = broadcast(n.select(F.col("n_nationkey").alias("ck"), F.col("n_name").alias("cust_nation")))
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n1, F.col("s_nationkey") == F.col("sk"))
        .join(n2, F.col("c_nationkey") == F.col("ck"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return joined.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year")
    ).agg(dec_sum(revenue()).alias("rev"))


def q_returned_items(t: dict[str, DataFrame]) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by returned-item revenue.

    nation keeps its broadcast hint (25 rows); customer is SF-scaled so
    the threshold + AQE decide (hint removed per VERDICT r4).
    """
    li, o, c, n = t["lineitem"], t["orders"], t["customer"], t["nation"]
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dec_sum(revenue()).alias("rev"))
        .orderBy(F.desc("rev"), F.asc("c_custkey"))
        .limit(20)
    )


def funnel_stages(e: DataFrame) -> DataFrame:
    """Per-user funnel stage frame: (user_id, first_view, first_click,
    first_purchase) under the strict-ordering rule ``q_funnel``
    aggregates — factored out so the streaming twin's equality test
    compares against the exact batch semantics.  See ``q_funnel`` for
    the single-shuffle posture."""
    w = Window.partitionBy("user_id")
    staged = (
        e.withColumn(
            "first_view",
            F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w),
        )
        .withColumn(
            "first_click",
            F.min(
                F.when(
                    (F.col("event_type") == "click") & (F.col("ts") > F.col("first_view")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "first_purchase",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") > F.col("first_click")),
                    F.col("ts"),
                )
            ).over(w),
        )
    )
    return staged.groupBy("user_id").agg(
        F.max("first_view").alias("first_view"),
        F.max("first_click").alias("first_click"),
        F.max("first_purchase").alias("first_purchase"),
    )


def q_funnel(t: dict[str, DataFrame]) -> DataFrame:
    """Ordered event funnel per user: first view -> first click after
    that view -> first purchase after that click; counts per stage.

    Single-shuffle formulation: all three stage computations are
    full-partition window mins over the SAME user_id partitioning, so
    the events table is shuffled exactly once (a join-per-stage
    formulation shuffles the fact table once per stage — 3x the I/O at
    100 TB).  The per-user groupBy then reuses that partitioning, and
    only one row per user reaches the final global count.
    """
    per_user = funnel_stages(t["events"])
    return per_user.agg(
        F.count("*").alias("n_users"),
        F.count("first_view").alias("n_viewed"),
        F.count("first_click").alias("n_clicked_after_view"),
        F.count("first_purchase").alias("n_purchased_after_click"),
    )


def q_window_rank(t: dict[str, DataFrame]) -> DataFrame:
    """Top-3 orders per customer: rank + row_number with unique
    tiebreak, plus a value-based RANGE frame count (merged from the
    round-1 window_range_frame entry — same o_custkey partitioning, so
    both window specs share one Exchange)."""
    o = t["orders"]
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    # Round 11 (optimization, guide §2.4): the RANGE frame orders by
    # o_totalprice DESC so its required sort [custkey, totalprice DESC]
    # is a PREFIX of the rank window's [custkey, totalprice DESC,
    # orderkey ASC] — EnsureRequirements drops the second full Sort of
    # orders (plan: 2 Sorts -> 1).  A symmetric +/-1000 RANGE frame
    # counts the same row set under either sort direction, so
    # n_similar_price is unchanged (collect-equality at sf0.1 + oracle,
    # whose SQL keeps the ASC spelling).
    wr = (
        Window.partitionBy("o_custkey")
        .orderBy(F.desc("o_totalprice"))
        .rangeBetween(-1000, 1000)
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("long").alias("rn"),
            F.rank().over(w).cast("long").alias("rnk"),
            F.count("*").over(wr).alias("n_similar_price"),
        )
        .filter(F.col("rn") <= 3)
    )


def q_window_analytics(t: dict[str, DataFrame]) -> DataFrame:
    """One-pass per-user window analytics over events: LAG deltas,
    running/moving counts, ntile, first/last value, percent_rank and
    cume_dist (merged from the round-1 window_lag + window_running +
    window_firstlast entries).  Every spec shares the same
    (user_id; ts, event_id) partitioning and ordering, so Catalyst
    plans ONE Exchange + ONE Sort for all eleven window columns.

    Counts (not float sums) keep the frame aggregation engine-portable.
    """
    e = t["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    w3 = w.rowsBetween(-2, 0)
    full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return e.select(
        "user_id",
        "event_id",
        "value",
        F.lag("value", 1).over(w).alias("prev_value"),
        (F.col("value") - F.coalesce(F.lag("value", 1).over(w), F.lit(0.0))).alias("delta"),
        F.count("*").over(run).alias("running_n"),
        F.count("*").over(w3).alias("window3_n"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.first("event_type").over(full).alias("first_type"),
        F.last("event_type").over(full).alias("last_type"),
        F.round(F.percent_rank().over(w), 8).alias("pr"),
        F.round(F.cume_dist().over(w), 8).alias("cd"),
    )


# ---------------------------------------------------------------------------
# sorts / limits / top-k  (SURVEY §2.6)
# ---------------------------------------------------------------------------


def q_sort_limit(t: dict[str, DataFrame]) -> DataFrame:
    """Global top-k: Spark plans TakeOrderedAndProject (no full sort)."""
    o = t["orders"]
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(25)
    )


# ---------------------------------------------------------------------------
# set operations  (SURVEY §2.7)
# ---------------------------------------------------------------------------


def q_set_union(t: dict[str, DataFrame]) -> DataFrame:
    """Union-of-shards parity (``test.go:53-65``): split, union, re-agg."""
    o = t["orders"]
    lo = o.filter(F.col("o_orderkey") % 2 == 0)
    hi = o.filter(F.col("o_orderkey") % 2 == 1)
    return (
        lo.unionByName(hi)
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("cnt"))
    )


def q_set_intersect(t: dict[str, DataFrame]) -> DataFrame:
    """Customers that are both big spenders and recent purchasers."""
    o = t["orders"]
    big = o.filter(F.col("o_totalprice") > 50000).select("o_custkey")
    recent = o.filter(F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp")).select("o_custkey")
    return big.intersect(recent)


def q_set_except(t: dict[str, DataFrame]) -> DataFrame:
    o = t["orders"]
    any_cust = o.select("o_custkey")
    big = o.filter(F.col("o_totalprice") > 50000).select("o_custkey")
    return any_cust.exceptAll(big).groupBy("o_custkey").agg(F.count("*").alias("cnt"))


def q_set_ops(t: dict[str, DataFrame]) -> DataFrame:
    """All four set operators in one tagged, value-checked result
    (merged from the round-1 set_union / set_intersect / set_except /
    set_intersect_all entries so the whole §2.7 family shares one
    driver-verified catalog slot).  Each branch keeps its full value
    output, aligned to (op, key, cnt)."""
    union_part = q_set_union(t).select(
        F.lit("union_all").alias("op"),
        F.col("o_orderstatus").alias("key"),
        F.col("cnt"),
    )
    inter = q_set_intersect(t).select(
        F.lit("intersect").alias("op"),
        F.col("o_custkey").cast("string").alias("key"),
        F.lit(1).cast("long").alias("cnt"),
    )
    inter_all = q_set_intersect_all(t).select(
        F.lit("intersect_all").alias("op"),
        F.col("o_custkey").cast("string").alias("key"),
        F.col("cnt"),
    )
    exc = q_set_except(t).select(
        F.lit("except_all").alias("op"),
        F.col("o_custkey").cast("string").alias("key"),
        F.col("cnt"),
    )
    return union_part.unionByName(inter).unionByName(inter_all).unionByName(exc)


# ---------------------------------------------------------------------------
# scalar functions  (SURVEY §2.8)
# ---------------------------------------------------------------------------


def q_scalar_string(t: dict[str, DataFrame]) -> DataFrame:
    """String scalar functions + LIKE/prefix/suffix/contains predicates
    (merged from the round-1 like_patterns entry — one projection pass
    over part exercises the whole §2.8 string surface)."""
    p = t["part"]
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_u"),
        F.substring("p_name", 1, 8).alias("name8"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
        F.length("p_name").cast("long").alias("name_len"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.col("p_name").like("%gold%").alias("has_gold"),
        F.col("p_type").startswith("STANDARD").alias("is_standard"),
        F.col("p_name").endswith("d").alias("ends_d"),
        F.col("p_brand").contains("#1").alias("brand1x"),
    )


def q_scalar_math_date(t: dict[str, DataFrame]) -> DataFrame:
    """Math scalar functions + date arithmetic in one projection over
    lineitem x orders (merged from the round-1 scalar_math + date_arith
    entries).  round() is demoed on an irrational value (sqrt) —
    money-like values hit exact decimal halfway points where Spark
    (HALF_UP) and other engines (round-half-even/away) legitimately
    differ."""
    li, o = t["lineitem"], t["orders"]
    return li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        F.col("l_linenumber").cast("long").alias("l_linenumber"),
        F.abs(F.col("l_quantity") - 25.0).alias("dev"),
        F.floor(F.col("l_extendedprice") / 100.0).cast("long").alias("price_h"),
        F.floor(F.col("l_discount") * 100).cast("long").alias("disc_pct"),
        F.ceil(F.col("l_tax") * 100).cast("long").alias("tax_pct"),
        (F.col("l_orderkey") % 7).cast("long").alias("mod7"),
        F.round(F.sqrt("l_quantity"), 3).alias("sqrt_qty"),
        F.datediff("l_shipdate", "o_orderdate").cast("long").alias("ship_delay_days"),
        F.date_add(F.col("o_orderdate"), 30).cast("string").alias("promise_date"),
    )


def q_json_extract(t: dict[str, DataFrame]) -> DataFrame:
    """JSON prop extraction from ``events.props`` (``{"k": int}``)."""
    e = t["events"]
    return (
        e.select(
            "event_type",
            F.get_json_object("props", "$.k").cast("long").alias("k"),
        )
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


# ---------------------------------------------------------------------------
# time / sessionization (batch analogues of the streaming operators)
# ---------------------------------------------------------------------------


def q_events_tumbling(t: dict[str, DataFrame]) -> DataFrame:
    """Tumbling 1-hour windowed aggregation (batch form of §2.10)."""
    e = t["events"]
    return (
        e.groupBy(
            F.date_trunc("hour", "ts").cast("string").alias("hour"),
            "event_type",
        )
        .agg(F.count("*").alias("cnt"), dec_sum("value").alias("sum_value"))
    )


def q_events_sessionize(t: dict[str, DataFrame]) -> DataFrame:
    """Gap-based sessionization (30-min inactivity) via window cumsum —
    the classic streaming session-window computed in batch."""
    e = t["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # fractional epoch seconds (cast, not unix_timestamp: that floors to
    # whole seconds and the fixture has microsecond components)
    ts_sec = F.col("ts").cast("double")
    gap = ts_sec - F.lag(ts_sec, 1).over(w)
    with_new = e.select(
        "user_id",
        "event_id",
        "ts",
        F.when(gap.isNull() | (gap > 1800), 1).otherwise(0).alias("is_new"),
    )
    with_sess = with_new.select(
        "user_id",
        "event_id",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("session_id"),
    )
    return with_sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events")
    )


def q_set_intersect_all(t: dict[str, DataFrame]) -> DataFrame:
    """INTERSECT ALL (multiset semantics, vs the distinct INTERSECT)."""
    o = t["orders"]
    big = o.filter(F.col("o_totalprice") > 20000).select("o_custkey")
    recent = o.filter(
        F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp")
    ).select("o_custkey")
    return big.intersectAll(recent).groupBy("o_custkey").agg(F.count("*").alias("cnt"))


def q_null_handling(t: dict[str, DataFrame]) -> DataFrame:
    """NULL semantics: nullif-derived nulls, null-skipping aggregates,
    coalesce, and null-safe equality counting."""
    li = t["lineitem"]
    d = F.nullif(F.col("l_discount"), F.lit(0.0))
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n_rows"),
        F.count(d).alias("n_discounted"),
        F.sum(F.when(d.isNull(), 1).otherwise(0)).cast("long").alias("n_zero_disc"),
        F.sum(F.coalesce(d, F.lit(0.0)).cast("decimal(28,4)")).cast("double").alias("sum_disc"),
        F.sum((d.eqNullSafe(F.lit(0.05))).cast("long")).alias("n_exactly_5pct"),
    )


def q_subquery_corr(t: dict[str, DataFrame]) -> DataFrame:
    """Correlated scalar subquery (Catalyst decorrelates to a join):
    orders 50% above their customer's decimal-exact average."""
    t["orders"].createOrReplaceTempView("_sq_orders")
    spark = t["orders"].sparkSession
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM _sq_orders o
        WHERE o_totalprice > 1.5 * (
          SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(28,4))) AS DOUBLE) / COUNT(*)
          FROM _sq_orders o2 WHERE o2.o_custkey = o.o_custkey
        )
        """
    )


def q_array_agg(t: dict[str, DataFrame]) -> DataFrame:
    """Array aggregation with deterministic ordering, emitted as a
    string (engine-portable rendering of ARRAY values)."""
    o = t["orders"]
    return (
        o.select("o_custkey", F.year("o_orderdate").cast("long").alias("yr"))
        .groupBy("o_custkey")
        .agg(
            F.concat_ws(",", F.sort_array(F.collect_list("yr"))).alias("yrs"),
            F.count("*").alias("n_orders"),
        )
    )


def q_percentile(t: dict[str, DataFrame]) -> DataFrame:
    """Exact interpolated percentiles (SortAggregate path).  l_quantity
    is integer-valued, so the interpolation points are binary-exact."""
    li = t["lineitem"]
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.25)").alias("p25"),
        F.expr("percentile(l_quantity, 0.5)").alias("p50"),
        F.expr("percentile(l_quantity, 0.75)").alias("p75"),
        F.count("*").alias("n"),
    )


def q_pivot(t: dict[str, DataFrame]) -> DataFrame:
    """Pivot order counts: status values become columns."""
    o = t["orders"]
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .count()
        .na.fill(0, ["O", "F", "P"])
    )


def q_sample_hash(t: dict[str, DataFrame]) -> DataFrame:
    """Reproducible 1/16 sampling by content hash — the portable,
    rerun-stable alternative to rand()-based sampling for pipeline
    debugging at scale."""
    d = t["documents"]
    return d.filter(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) == "0"
    ).select("doc_id", "lang", "source")


def q_events_sliding(t: dict[str, DataFrame]) -> DataFrame:
    """Batch sliding windows (1h window, 15min slide): each event lands
    in 4 windows, generated by epoch-grid arithmetic."""
    e = t["events"]
    slot = F.floor(F.col("ts").cast("double") / 900).cast("long")
    windows = e.select(
        "event_type",
        F.explode(F.sequence(slot - 3, slot)).alias("start_slot"),
    )
    return (
        windows.select(
            F.timestamp_seconds(F.col("start_slot") * 900).cast("string").alias("window_start"),
            "event_type",
        )
        .groupBy("window_start", "event_type")
        .agg(F.count("*").alias("cnt"))
    )


def q_asof_join(t: dict[str, DataFrame]) -> DataFrame:
    """As-of join: each 'click' event matched to the latest prior-or-equal
    'view' event of the same user.

    Spark lacks a native ASOF JOIN; the scale-safe formulation is a
    SINGLE window pass — union both event kinds in one stream ordered
    by (ts, views-first), carry ``last(view ts, ignorenulls)`` forward,
    then keep the clicks.  One Exchange on user_id, strictly linear.
    (The round-1 range-join + row_number formulation materialized
    V x C rows per user before discarding — a skew amplifier for power
    users at 100 TB.)  Views sort before clicks at equal ts so a
    same-timestamp view still matches (the <= semantics of ASOF).
    DuckDB's native ``ASOF JOIN`` semantics are the oracle.
    """
    e = t["events"].filter(F.col("event_type").isin("view", "click"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(
            "ts",
            F.when(F.col("event_type") == "view", 0).otherwise(1),
            "event_id",
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    last_view = F.last(
        F.when(F.col("event_type") == "view", F.col("ts")), ignorenulls=True
    ).over(w)
    return (
        e.withColumn("matched_view_ts", last_view.cast("string"))
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            "matched_view_ts",
        )
    )


def q_asof_join_forward(t: dict[str, DataFrame]) -> DataFrame:
    """Forward as-of join — ``q_asof_join``'s direction complement
    (pandas ``merge_asof(direction='forward')``): each 'click' matched
    to the EARLIEST at-or-after 'view' of the same user (the "next
    touchpoint" shape: what did the user see next).

    Same single-window formulation, scanned from the future backward:
    order ts DESCENDING with views before clicks at equal ts (so a
    same-timestamp view still matches, the >= semantics), carry
    ``last(view ts, ignorenulls)`` — in a descending scan that running
    last IS the smallest view ts at-or-after the click.  One Exchange
    on user_id, strictly linear; no V x C range-join expansion.
    """
    e = t["events"].filter(F.col("event_type").isin("view", "click"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(
            F.desc("ts"),
            F.when(F.col("event_type") == "view", 0).otherwise(1),
            F.desc("event_id"),
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    next_view = F.last(
        F.when(F.col("event_type") == "view", F.col("ts")), ignorenulls=True
    ).over(w)
    return (
        e.withColumn("matched_view_ts", next_view.cast("string"))
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            "matched_view_ts",
        )
    )


def q_events_session_native(t: dict[str, DataFrame]) -> DataFrame:
    """Gap-based sessionization via Spark's NATIVE session_window
    operator (30-min inactivity gap) — the same operator Structured
    Streaming uses for stateful session windows, here in batch.  Spark
    merges an event into the open session iff its ts < previous ts +
    gap (sessions are [start, end) intervals); session end = last
    event ts + gap.

    Complements ``q_events_sessionize`` (the portable cumsum
    formulation): this entry proves the native operator itself against
    a DuckDB replica of those exact merge semantics.
    """
    e = t["events"]
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes").alias("sw"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").cast("string").alias("session_start"),
            F.col("sw.end").cast("string").alias("session_end"),
            "n_events",
        )
    )


def range_join(
    probe: DataFrame,
    intervals: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    start_col: str = "w_start",
    end_col: str = "w_end",
    how: str = "inner",
) -> DataFrame:
    """Interval-overlap (range) join: probe rows matched to interval rows
    of the same key where ``start <= ts <= end``.

    The reference engine has no range join (SURVEY §2.3 lists joins as
    absent); time-series stores (e.g. TimescaleDB / kdb) make it a
    primitive.  Spark-first formulation: the EQUI keys carry the join —
    Catalyst plans a hash/sort-merge join on ``keys`` and applies the
    range predicate as a join filter — so the shuffle is keyed and
    uniform, never a cartesian.  At 100 TB the per-key interval list is
    the small side (one row per key x bucket), so AQE usually picks a
    broadcast; an unkeyed range join (pure interval overlap, no equi
    key) should instead bucket both sides by coarse time epoch first,
    which is exactly what ``q_range_join`` does by deriving bounded
    per-(user, day) intervals.
    """
    # alias both sides: probe and intervals usually derive from the SAME
    # scan, and unqualified probe[k] == intervals[k] is ambiguous lineage
    # (Spark warns "trivially true equals predicate")
    p, iv = probe.alias("_rj_probe"), intervals.alias("_rj_iv")
    cond = (F.col(f"_rj_probe.{ts_col}") >= F.col(f"_rj_iv.{start_col}")) & (
        F.col(f"_rj_probe.{ts_col}") <= F.col(f"_rj_iv.{end_col}")
    )
    for k in keys:
        cond = (F.col(f"_rj_probe.{k}") == F.col(f"_rj_iv.{k}")) & cond
    keep = [p[c] for c in probe.columns] + [
        iv[c] for c in intervals.columns if c not in keys
    ]
    return p.join(iv, cond, how).select(*keep)


def q_range_join(t: dict[str, DataFrame]) -> DataFrame:
    """Purchases attributed to same-user browsing windows via range join.

    Intervals = per (user, day) the [first, last] 'view' timestamp;
    probe = 'purchase' events; a purchase inside the window counts
    toward that (user, day).  Output is re-aggregated so results are
    set-deterministic (no row-order sensitivity).
    """
    e = t["events"]
    iv = (
        e.filter(F.col("event_type") == "view")
        .groupBy(
            "user_id",
            F.date_trunc("day", "ts").cast("date").cast("string").alias("day"),
        )
        .agg(F.min("ts").alias("w_start"), F.max("ts").alias("w_end"))
    )
    p = e.filter(F.col("event_type") == "purchase").select("user_id", "ts", "value")
    j = range_join(p, iv, keys=["user_id"])
    return j.groupBy("user_id", "day").agg(
        F.count("*").alias("n_purchases"), dec_sum("value").alias("sum_value")
    )


def q_hypertable_rollup(t: dict[str, DataFrame]) -> DataFrame:
    """Hierarchical time rollup (hypertable-style continuous aggregate):
    one pass produces day, day+hour, day+hour+quarter-hour, and grand
    totals via ROLLUP over NESTED time buckets.

    TimescaleDB materializes each granularity separately; with nested
    time dimensions a single ROLLUP is strictly hierarchical, so Spark
    computes all four grains in ONE shuffle (Expand emits 4 rows per
    input, partial agg collapses them map-side before the exchange).
    Grain is labeled from NULL-ness of the bucket columns (ts is never
    NULL in the fixture, so NULL bucket == rolled-up level).
    """
    e = t["events"]
    day = F.date_trunc("day", "ts").cast("date").cast("string").alias("day")
    hour = F.hour("ts").cast("long").alias("hour")
    q15 = F.floor(F.minute("ts") / 15).cast("long").alias("q15")
    rolled = e.rollup(day, hour, q15).agg(
        F.count("*").alias("cnt"), dec_sum("value").alias("sum_value")
    )
    grain = (
        F.when(F.col("day").isNull(), "total")
        .when(F.col("hour").isNull(), "day")
        .when(F.col("q15").isNull(), "hour")
        .otherwise("quarter")
    )
    return rolled.select("day", "hour", "q15", grain.alias("grain"), "cnt", "sum_value")


def q_retention_cohorts(t: dict[str, DataFrame]) -> DataFrame:
    """Cohort retention matrix: users grouped by first-active week,
    counted in each subsequent week they return.

    The product-analytics staple (cohort_week x week_offset -> users).
    Two keyed shuffles: per-user MIN(week) for the cohort, then the
    distinct (user, week) activity set joins its cohort and
    aggregates.  Both weeks are Monday-truncated so offsets are exact
    multiples of 7 days; every computed column lands as date-string /
    BIGINT for engine portability.
    """
    e = t["events"]
    week = F.date_trunc("week", "ts").cast("date")
    first = e.groupBy("user_id").agg(F.min(week).alias("cohort_week"))
    active = e.select("user_id", week.alias("week")).distinct()
    j = active.join(first, "user_id")
    return (
        j.groupBy(
            F.col("cohort_week").cast("string").alias("cohort_week"),
            (F.datediff("week", "cohort_week") / 7).cast("long").alias("week_offset"),
        )
        .agg(F.count("*").alias("n_users"))
    )


def q_user_features(t: dict[str, DataFrame]) -> DataFrame:
    """As-of trailing-window feature aggregation — the feature-store
    shape: one row per user with activity counts/sums over 7-day and
    30-day windows trailing a fixed as-of date, plus recency.

    ONE pass over events (conditional aggregates — no per-window
    re-scan, no join), one shuffle on user_id.  At 100 TB this is the
    canonical daily feature-materialization job; every window is a
    CASE inside the same partial aggregate, so adding windows costs
    zero extra shuffles.  The as-of date is a parameter pinned here so
    the result is deterministic for the oracle.
    """
    # events dated AFTER the as-of date must not leak into any window
    # (days_back < 7 alone would admit negative values) — harmless on
    # this fixture, load-bearing when the as-of date is mid-history
    e = t["events"].filter(F.col("ts").cast("date") <= F.lit("2024-01-31").cast("date"))
    days_back = F.datediff(F.lit("2024-01-31").cast("date"), F.col("ts").cast("date"))
    is_purchase = F.col("event_type") == "purchase"

    def cnt(cond: F.Column) -> F.Column:
        return F.sum(F.when(cond, 1).otherwise(0)).cast("long")

    return e.groupBy("user_id").agg(
        cnt(days_back < 7).alias("n_events_7d"),
        cnt(days_back < 30).alias("n_events_30d"),
        cnt(is_purchase & (days_back < 7)).alias("n_purchases_7d"),
        cnt(is_purchase & (days_back < 30)).alias("n_purchases_30d"),
        dec_sum(
            F.when(is_purchase & (days_back < 30), F.col("value")).otherwise(0.0)
        ).alias("purchase_value_30d"),
        F.min(days_back).cast("long").alias("last_seen_days"),
    )


def q_scalar_map(t: dict[str, DataFrame]) -> DataFrame:
    """MAP-typed scalar surface (§2.8 array/map/json row): build a map
    per nation, then read it back via element_at / map_keys /
    map_values / size / map_concat / transform_values.  Every OUTPUT
    is a plain scalar (maps never leave the plan) so the oracle —
    which computes the same results directly — compares values, not
    engine-specific map renderings.
    """
    n, r = t["nation"], t["region"]
    base = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "n_name", "r_name"
    )
    m = F.create_map(
        F.lit("nation"), F.col("n_name"),
        F.lit("region"), F.col("r_name"),
    )
    m2 = F.map_concat(m, F.create_map(F.lit("planet"), F.lit("earth")))
    upper = F.transform_values(m2, lambda _, v: F.upper(v))
    return base.select(
        F.col("n_nationkey").cast("long").alias("n_nationkey"),
        F.element_at(m, "nation").alias("nation"),
        F.element_at(m2, "planet").alias("planet"),
        F.size(m2).cast("long").alias("n_keys"),
        F.concat_ws(",", F.array_sort(F.map_keys(m2))).alias("keys_sorted"),
        F.concat_ws(",", F.array_sort(F.map_values(upper))).alias("vals_upper_sorted"),
    )


# ---------------------------------------------------------------------------
# TPC-H optimizer-shape breadth (round 4) — shapes the reference has no
# relational surface for (SURVEY §2.2-2.4 all `absent`), chosen to
# exercise distinct Catalyst strategies: EXISTS-semi aggregation,
# scan-only agg, conditional two-way counts, outer-join distribution,
# conditional ratio, NOT-IN blacklist + distinct count, OR-of-ANDs
# pushdown, and correlated double-EXISTS (semi + anti on the same key
# with a non-equi conjunct).  The fixture schema lacks
# l_commitdate/l_receiptdate/l_shipmode/partsupp/c_phone, so the Q4 /
# Q12 / Q16 / Q21 / Q22 shapes substitute equivalent predicates over
# the columns that exist; the PLAN shape (what the optimizer must do)
# is the point, not the TPC-H literal.
# ---------------------------------------------------------------------------


def q_priority_returns(t: dict[str, DataFrame]) -> DataFrame:
    """TPC-H Q4 shape: order-priority count over EXISTS(lineitem ...).

    The EXISTS becomes a LEFT SEMI join — at 100 TB the semi join
    dedups on the fly (no exploding multi-match fan-out), and the
    orders-side date filter is pushed to the scan.
    """
    o, li = t["orders"], t["lineitem"]
    in_window = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    returned = li.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        in_window.join(returned, o.o_orderkey == returned.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


def q_forecast_revenue(t: dict[str, DataFrame]) -> DataFrame:
    """TPC-H Q6 shape: scan-only filtered aggregate — every predicate
    reaches the parquet scan (PushedFilters), no join, no groupBy
    shuffle: partial sums combine map-side into one row."""
    li = t["lineitem"]
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(dec_sum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))
    )


def q_shipmode_priority(t: dict[str, DataFrame]) -> DataFrame:
    """TPC-H Q12 shape (shipmode -> ship-year): per ship-year counts of
    high- vs low-priority orders as conditional sums — one fact
    shuffle, orders broadcast-joined if small else shuffled once."""
    li, o = t["lineitem"], t["orders"]
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
        )
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.year("l_shipdate").cast("long").alias("ship_yr"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


def q_customer_distribution(t: dict[str, DataFrame]) -> DataFrame:
    """TPC-H Q13 shape: distribution of per-customer order counts via a
    LEFT OUTER join (customers with zero qualifying orders must appear
    with c_count = 0) and a second aggregation over the first."""
    c, o = t["customer"], t["orders"]
    qualifying = o.filter(F.col("o_orderpriority") != "4-NOT SPECIFIED")
    per_cust = (
        c.join(qualifying, c.c_custkey == qualifying.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


def q_promo_revenue(t: dict[str, DataFrame]) -> DataFrame:
    """TPC-H Q14 shape: promo-revenue percentage — conditional numerator
    over a common denominator, part dim broadcast, one row out.
    Both sums are decimal-routed, the ratio rounded to 6 decimals so
    the result is shuffle-order-free."""
    li, p = t["lineitem"], t["part"]
    promo_rev = dec_sum(
        F.when(F.col("p_type") == "PROMO", revenue()).otherwise(F.lit(0.0))
    )
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))
        )
        .join(p, li.l_partkey == p.p_partkey)
        .agg(
            F.round(100.0 * promo_rev / dec_sum(revenue()), 6).alias("promo_pct")
        )
    )


def q_parts_supplier_relation(t: dict[str, DataFrame]) -> DataFrame:
    """TPC-H Q16 shape (lineitem as the part-supplier association):
    distinct supplier count per (brand, type, size) for parts outside
    one brand/type, excluding blacklisted suppliers via NOT IN -> LEFT
    ANTI join.  The distinct-count shuffles on the grouping key only
    after the anti join has pruned rows."""
    li, p, s = t["lineitem"], t["part"], t["supplier"]
    parts = p.filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size") <= 25)
    )
    blacklist = s.filter(F.col("s_acctbal") < 1500).select("s_suppkey")
    return (
        li.join(blacklist, li.l_suppkey == blacklist.s_suppkey, "left_anti")
        .join(parts, li.l_partkey == parts.p_partkey)
        .groupBy("p_brand", "p_type", F.col("p_size").cast("long").alias("p_size"))
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def q_discounted_revenue(t: dict[str, DataFrame]) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR of conjunct groups mixing
    part and lineitem predicates.  Catalyst extracts the common
    part-join key and pushes the disjunction's column bounds
    (p_size <= 15, l_quantity <= 30) below the join."""
    li, p = t["lineitem"], t["part"]
    joined = li.join(p, li.l_partkey == p.p_partkey)
    clause = (
        (
            (F.col("p_brand") == "Brand#1")
            & (F.col("p_size").between(1, 5))
            & (F.col("l_quantity").between(1, 11))
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & (F.col("p_size").between(1, 10))
            & (F.col("l_quantity").between(10, 20))
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & (F.col("p_size").between(1, 15))
            & (F.col("l_quantity").between(20, 30))
        )
    )
    return joined.filter(clause).agg(dec_sum(revenue()).alias("revenue"))


def q_waiting_suppliers(t: dict[str, DataFrame]) -> DataFrame:
    """TPC-H Q21 shape: suppliers whose line was returned in a
    multi-supplier finished order where NO other supplier's line was
    returned — correlated EXISTS (semi) + NOT EXISTS (anti) on the
    same order key with a supplier-inequality conjunct.

    Both probes reuse the same lineitem projection; the semi/anti
    joins shuffle on l_orderkey so all three legs co-partition — one
    key's worth of shuffles, not three independent plans.
    """
    li, o, s = t["lineitem"], t["orders"], t["supplier"]
    lines = li.select("l_orderkey", "l_suppkey", "l_returnflag")
    finished = o.filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    l1 = (
        lines.filter(F.col("l_returnflag") == "R")
        .join(finished, F.col("l_orderkey") == F.col("o_orderkey"))
        .select("l_orderkey", "l_suppkey")
    )
    l2 = lines.select(
        F.col("l_orderkey").alias("o2_orderkey"), F.col("l_suppkey").alias("o2_suppkey")
    )
    l3 = (
        lines.filter(F.col("l_returnflag") == "R")
        .select(
            F.col("l_orderkey").alias("o3_orderkey"),
            F.col("l_suppkey").alias("o3_suppkey"),
        )
    )
    waited = (
        l1.join(
            l2,
            (F.col("l_orderkey") == F.col("o2_orderkey"))
            & (F.col("l_suppkey") != F.col("o2_suppkey")),
            "left_semi",
        ).join(
            l3,
            (F.col("l_orderkey") == F.col("o3_orderkey"))
            & (F.col("l_suppkey") != F.col("o3_suppkey")),
            "left_anti",
        )
    )
    return (
        waited.join(s, waited.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(10)
    )


def q_sales_opportunity(t: dict[str, DataFrame]) -> DataFrame:
    """TPC-H Q22 shape: customers above the average positive account
    balance (uncorrelated scalar subquery -> broadcast one-row join)
    with no URGENT order (anti join), grouped by nation.

    Q22's literal anti side is "no orders at all"; every fixture
    customer has orders, which would make the result (and its hash
    check) trivially empty — so the anti join keys on the selective
    URGENT subset instead.  Plan shape is identical: scalar-subquery
    threshold, then an anti join against a filtered orders scan."""
    c, o, n = t["customer"], t["orders"], t["nation"]
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(dec_avg("c_acctbal").alias("avg_bal"))
    )
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    rich = (
        c.join(broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(urgent, c.c_custkey == urgent.o_custkey, "left_anti")
    )
    return (
        rich.join(broadcast(n), rich.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("numcust"),
            dec_sum("c_acctbal").alias("totacctbal"),
        )
    )


def q_min_cost_supplier(t: dict[str, DataFrame]) -> DataFrame:
    """TPC-H Q2 shape: for each part in a size slice, the supplier(s)
    whose minimum observed unit price is the lowest for that part —
    the correlated ``= (SELECT MIN ...)`` pattern.

    The fixture has no partsupp table, so unit cost is derived from
    shipped lines (extendedprice/quantity, rounded before comparison
    so the equality is engine-portable).  Spark-first formulation:
    per-(part, supplier) MIN, then a per-part window MIN and an
    equality filter — one shuffle on l_partkey carries both the
    pair-level aggregate and the window, no self-join, no correlated
    re-scan per outer row.
    """
    li, p, s = t["lineitem"], t["part"], t["supplier"]
    # floor(x*1e4 + 0.5)/1e4, not round(): Spark rounds doubles
    # HALF_UP, DuckDB half-to-even — at sf0.1 six unit prices landed
    # exactly on a .00005 boundary and split the engines.  floor is
    # bit-identical everywhere given the same IEEE quotient.
    unit = F.col("l_extendedprice") / F.col("l_quantity")
    cost = F.floor(unit * 10000.0 + 0.5) / 10000.0
    pair = (
        li.filter(F.col("l_quantity") > 0)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(cost).alias("cost"))
    )
    best = pair.withColumn(
        "best_cost", F.min("cost").over(Window.partitionBy("l_partkey"))
    ).filter(F.col("cost") == F.col("best_cost"))
    sized = p.filter(F.col("p_size") <= 10)
    return (
        best.join(sized, best.l_partkey == sized.p_partkey)
        .join(s, best.l_suppkey == s.s_suppkey)
        .select("p_partkey", "p_name", "s_name", "cost")
    )


def q_revenue_share(t: dict[str, DataFrame]) -> DataFrame:
    """TPC-H Q11 shape: per-supplier revenue HAVING share-of-total
    above a threshold — group-aggregate filtered by an uncorrelated
    scalar aggregate of the same data.  The one-row threshold
    broadcasts; the fact shuffles once on l_suppkey.

    TPC-H's Q11 fraction is 0.0001/SF — itself scaled by data size —
    so a fixed fraction goes empty as suppliers multiply.  The
    scale-free equivalent used here: suppliers 5% above the MEAN
    supplier revenue, computed from the per-supplier aggregate itself
    (|suppliers| rows, decimal-routed so the mean is order-free)."""
    li, s = t["lineitem"], t["supplier"]
    # Round 11 (optimization, guide §2.4): the explicit isNotNull makes
    # the per-supplier aggregate subtree IDENTICAL under both consumers.
    # Without it, the supplier join infers isnotnull(l_suppkey) on the
    # output branch only, the two subtrees no longer canonicalize
    # equal, exchange reuse cannot fire, and the fact table was scanned
    # and partially aggregated TWICE (executed plan: ReusedExchange=0,
    # 2 lineitem scans -> now 1; l_suppkey is a TPC-H FK, never null,
    # so the threshold mean is unchanged — oracle green).
    per_supp = (
        li.filter(F.col("l_suppkey").isNotNull())
        .groupBy("l_suppkey")
        .agg(dec_sum(revenue()).alias("value"))
    )
    threshold = per_supp.agg(
        (dec_avg("value") * F.lit(1.05)).alias("threshold")
    )
    kept = per_supp.join(broadcast(threshold)).filter(
        F.col("value") > F.col("threshold")
    )
    return (
        kept.join(s, kept.l_suppkey == s.s_suppkey)
        .select("s_name", F.round("value", 4).alias("value"))
    )


def q_top_supplier(t: dict[str, DataFrame]) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with the maximum quarterly revenue
    — aggregate view + uncorrelated MAX-of-aggregate subquery.  The
    revenue aggregate is computed once and reused for both the MAX and
    the final filter (Spark: one plan, the one-row MAX broadcasts)."""
    li, s = t["lineitem"], t["supplier"]
    # explicit isNotNull for the same exchange-reuse reason as
    # q_revenue_share (round 11): both consumers of ``rev`` must see
    # an identical subtree or the fact is scanned twice
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
            & F.col("l_suppkey").isNotNull()
        )
        .groupBy("l_suppkey")
        .agg(dec_sum(revenue()).alias("total_revenue"))
    )
    top = rev.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        rev.join(broadcast(top))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", F.round("total_revenue", 4).alias("total_revenue"))
    )


def q_small_qty_revenue(t: dict[str, DataFrame]) -> DataFrame:
    """TPC-H Q17 shape: revenue from lines whose quantity is below
    0.2x the part's average quantity — correlated per-group AVG
    subquery.  Spark-first: the per-part average is one aggregate on
    l_partkey joined back to the brand slice (exactly Catalyst's
    decorrelation of the subquery), with the avg side aggregated
    BEFORE the join so the join input is |parts| rows, not |lineitem|.
    """
    li, p = t["lineitem"], t["part"]
    avg_qty = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        dec_avg("l_quantity").alias("avg_qty")
    )
    brand = p.filter(F.col("p_brand") == "Brand#3")
    lines = li.join(brand, li.l_partkey == brand.p_partkey)
    return (
        lines.join(avg_qty, lines.l_partkey == avg_qty.a_partkey)
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(F.round(dec_sum("l_extendedprice") / 7.0, 4).alias("avg_yearly"))
    )


def q_large_orders(t: dict[str, DataFrame]) -> DataFrame:
    """TPC-H Q18 shape: orders whose total line quantity exceeds a
    threshold (group-HAVING subquery), joined back to orders+customer,
    top-100 by total price.  The HAVING aggregate shuffles on
    l_orderkey; the surviving keys (rare) then ride a keyed join —
    at 100 TB the join probe side is already reduced to the heavy
    orders only."""
    li, o, c = t["lineitem"], t["orders"], t["customer"]
    heavy = (
        li.groupBy("l_orderkey")
        .agg(dec_sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 150)
    )
    return (
        o.join(heavy, o.o_orderkey == heavy.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


def q_heavy_shippers(t: dict[str, DataFrame]) -> DataFrame:
    """TPC-H Q20 shape: suppliers who shipped more than a threshold
    quantity of small parts in a year — IN over a grouped-HAVING
    subquery becomes a LEFT SEMI join against the aggregated key set.
    The aggregate prunes to few suppliers before touching the supplier
    dim, so the semi probe is tiny regardless of fact size."""
    li, p, s = t["lineitem"], t["part"], t["supplier"]
    small = p.filter(F.col("p_size") <= 15)
    shippers = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(small, li.l_partkey == small.p_partkey)
        .groupBy("l_suppkey")
        .agg(dec_sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 800)
        .select("l_suppkey")
    )
    return (
        s.join(shippers, s.s_suppkey == shippers.l_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
    )


def q_next_event_pairs(t: dict[str, DataFrame]) -> DataFrame:
    """Training-example construction over the event stream: for each
    event, the previous three event types in the same user's timeline
    (lag-1..3 context) and the current type as the label — the
    next-event-prediction dataset shape.

    One window shuffle on user_id with the (ts, event_id) unique
    tiebreak; rows without a full 3-event history keep NULL context
    slots (the consumer decides whether to pad or drop).  At 100 TB
    this is the same single-Exchange lag pipeline as sessionization —
    linear per partition, no self-join against the history.
    """
    e = t["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        "event_id",
        F.lag("event_type", 3).over(w).alias("ctx3"),
        F.lag("event_type", 2).over(w).alias("ctx2"),
        F.lag("event_type", 1).over(w).alias("ctx1"),
        F.col("event_type").alias("label"),
    )


def q_corr_analysis(t: dict[str, DataFrame]) -> DataFrame:
    """Bivariate statistics per group: Pearson correlation, sample
    covariance, and the least-squares slope of extendedprice on
    quantity — the analytics completion of agg_multikey's univariate
    moments.  All three are single-pass distributed aggregates
    (partial moment tuples combine map-side); rounded so the parallel
    vs sequential accumulation difference (~1e-16 relative) vanishes.
    """
    li = t["lineitem"]
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("covar_qty_price"),
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias("slope_price_qty"),
    )


def q_price_histogram(t: dict[str, DataFrame]) -> DataFrame:
    """Fixed-width histogram of order totals: 10 x 50k buckets with an
    overflow bucket — the distribution-profiling scan every dataset
    audit starts with.  Bucketing is explicit floor arithmetic (not a
    percentile): a pure scan-side projection, one tiny aggregate."""
    o = t["orders"]
    bucket = F.least(F.lit(9), F.floor(F.col("o_totalprice") / 50000.0)).cast("long")
    return (
        o.groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").alias("n_orders"),
            dec_sum("o_totalprice").alias("sum_price"),
        )
    )


def q_timeseries_gapfill(t: dict[str, DataFrame]) -> DataFrame:
    """Hypertable gap filling + last-observation-carried-forward (the
    TimescaleDB ``time_bucket_gapfill`` + ``locf`` shape): every hour
    of each user's active span appears exactly once, missing hours get
    cnt = 0 and the carried-forward last observed hourly sum.

    Scale: the hourly aggregate is one keyed shuffle; the per-user
    hour grid is a narrow sequence-explode of the (user, lo, hi) span
    table (|users| rows in, span-hours rows out — never a global
    cross join against a calendar dim); the fill join is keyed on
    (user, bucket) and the LOCF window rides the same user
    partitioning.
    """
    e = t["events"]
    hourly = (
        e.groupBy("user_id", F.date_trunc("hour", F.col("ts")).alias("bucket"))
        .agg(F.count("*").alias("cnt"), dec_sum("value").alias("sum_value"))
    )
    spans = hourly.groupBy("user_id").agg(
        F.min("bucket").alias("lo"), F.max("bucket").alias("hi")
    )
    grid = spans.select(
        "user_id",
        F.explode(
            F.sequence(F.col("lo"), F.col("hi"), F.expr("interval 1 hour"))
        ).alias("bucket"),
    )
    filled = grid.join(hourly, ["user_id", "bucket"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return filled.select(
        "user_id",
        F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
        F.coalesce("cnt", F.lit(0)).alias("cnt"),
        F.last("sum_value", ignorenulls=True).over(w).alias("sum_value_locf"),
    )


def q_monthly_growth(t: dict[str, DataFrame]) -> DataFrame:
    """Month-over-month revenue growth: monthly aggregate then lag
    ratio — the standard KPI/reporting shape.

    The growth window is GLOBAL (orderBy without partitionBy), which
    is correct here because its input is the already-aggregated
    |months| rows, not the fact table — a single-partition pass over
    dozens of rows.  Never apply this shape to raw facts; aggregate
    first (as here) or partition the window.
    """
    o = t["orders"]
    monthly = (
        o.groupBy(
            F.year("o_orderdate").cast("long").alias("yr"),
            F.month("o_orderdate").cast("long").alias("mo"),
        )
        .agg(dec_sum("o_totalprice").alias("rev"), F.count("*").alias("n_orders"))
    )
    w = Window.orderBy("yr", "mo")
    prev = F.lag("rev").over(w)
    return monthly.select(
        "yr", "mo", "rev", "n_orders",
        F.round((F.col("rev") - prev) / prev, 6).alias("mom_growth"),
    )


def q_market_share(t: dict[str, DataFrame]) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's market for a
    part type, by order year — conditional-sum-over-sum on the same
    grouped rows (TPC-H's ``sum(case when nation = X ...)/sum(...)``).

    Plan shape: every dimension (part slice, supplier, customer,
    nation x2, region) broadcasts; the lineitem->orders join is the
    only fact-fact shuffle, and the ECONOMY part filter prunes the
    fact FIRST via the broadcast-hash join, so the shuffled side is
    already the sliced market, not all of lineitem.  Share is a
    per-group ratio of two decimal-routed sums — no second pass and
    no join back, which is what keeps Q8 one aggregation at 100 TB.
    """
    li, o, c = t["lineitem"], t["orders"], t["customer"]
    s, n, r = t["supplier"], t["nation"], t["region"]
    n_cust = n.join(
        broadcast(r.filter(F.col("r_name") == "EUROPE")),
        n.n_regionkey == r.r_regionkey,
    ).select(F.col("n_nationkey").alias("cust_nk"))
    n_supp = n.select(
        F.col("n_nationkey").alias("supp_nk"), F.col("n_name").alias("supp_nation")
    )
    econ_parts = t["part"].filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    market = (
        li.join(econ_parts, li.l_partkey == F.col("p_partkey"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(broadcast(n_cust), F.col("c_nationkey") == F.col("cust_nk"))
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(broadcast(n_supp), F.col("s_nationkey") == F.col("supp_nk"))
    )
    rev = revenue()
    target = F.when(F.col("supp_nation") == "NATION_7", rev).otherwise(F.lit(0.0))
    return (
        market.groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            dec_sum(target).alias("nation_rev"),
            dec_sum(rev).alias("total_rev"),
        )
        .select(
            "o_year",
            "nation_rev",
            "total_rev",
            F.round(F.col("nation_rev") / F.col("total_rev"), 6).alias("mkt_share"),
        )
    )


def q_product_profit(t: dict[str, DataFrame]) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and year for parts
    matching a name pattern (``p_name LIKE '%bolt%'``).

    The fixture has no partsupp, so supply cost is derived as 60% of
    the part's retail price per unit (same adaptation family as Q2's
    shipped-line unit cost).  Per-line profit is rounded via the
    portable floor(x*1e4+0.5)/1e4 BEFORE the decimal sum: profit
    mixes two double products and Spark/DuckDB must agree at the
    .00005 cast boundaries (the exact bug Q2 hit at sf0.1).

    Plan shape: the part-name slice broadcasts and prunes the fact
    first, supplier+nation broadcast, and the only shuffles are the
    fact->orders join and the final (nation, year) aggregate.
    """
    li, o, s, n = t["lineitem"], t["orders"], t["supplier"], t["nation"]
    bolt_parts = (
        t["part"]
        .filter(F.col("p_name").like("%bolt%"))
        .select("p_partkey", "p_retailprice")
    )
    raw_profit = revenue() - F.col("l_quantity") * F.col("p_retailprice") * F.lit(0.6)
    line_profit = F.floor(raw_profit * 10000.0 + 0.5) / 10000.0
    return (
        li.join(bolt_parts, li.l_partkey == F.col("p_partkey"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(
            broadcast(n.select("n_nationkey", F.col("n_name").alias("nation"))),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("nation", F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(dec_sum(line_profit).alias("profit"))
    )


def q_events_anomaly(t: dict[str, DataFrame]) -> DataFrame:
    """Per-user outlier events: |z-score| > 3 against the user's own
    value distribution — the standard telemetry anomaly pass.

    Mean and variance come from decimal-routed window sums over ONE
    (user_id) Exchange (count, sum, sum-of-squares are each exact, so
    mean/var/z are identical doubles on any engine and any partition
    order); var > 0 guards the constant-value user.  At 100 TB this
    is a single pass over events: no self-join, no per-user collect.
    """
    e = t["events"]
    w = Window.partitionBy("user_id")
    n = F.count("*").over(w)
    s1 = F.sum(F.col("value").cast("decimal(28,4)")).over(w).cast("double")
    s2 = (
        F.sum((F.col("value") * F.col("value")).cast("decimal(28,4)"))
        .over(w)
        .cast("double")
    )
    mean = s1 / n
    var = s2 / n - mean * mean
    z = (F.col("value") - mean) / F.sqrt(var)
    return (
        e.select(
            "user_id",
            "event_id",
            "value",
            var.alias("__var"),
            F.round(z, 6).alias("z"),
        )
        .filter((F.col("__var") > 0) & (F.abs(F.col("z")) > 3.0))
        .select("user_id", "event_id", "value", "z")
    )


def q_events_running_anomaly(t: dict[str, DataFrame]) -> DataFrame:
    """Prefix (online) anomaly detection: each event's z-score against
    the user's statistics over STRICTLY EARLIER events only — the
    batch twin of the streaming detector
    (``streaming.stream_running_anomaly``), and the leak-free form for
    training-data labeling (an event never sees its own future).

    Same determinism machinery as ``q_events_anomaly``, but the three
    aggregates run over a ROWS UNBOUNDED PRECEDING..1 PRECEDING frame
    on the (user_id; ts, event_id) ordering — still ONE Exchange.
    Events before the user's 10th are unscored warm-up (the online
    estimator is meaningless at n=2), mirroring the streaming twin.
    """
    e = t["events"]
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    n = F.count("*").over(w)
    s1 = F.sum(F.col("value").cast("decimal(28,4)")).over(w).cast("double")
    s2 = (
        F.sum((F.col("value") * F.col("value")).cast("decimal(28,4)"))
        .over(w)
        .cast("double")
    )
    mean = s1 / n
    var = s2 / n - mean * mean
    z = (F.col("value") - mean) / F.sqrt(var)
    return (
        e.select(
            "user_id",
            "event_id",
            "value",
            n.alias("__n"),
            var.alias("__var"),
            F.round(z, 6).alias("z"),
        )
        .filter((F.col("__n") >= 10) & (F.col("__var") > 0) & (F.abs(F.col("z")) > 3.0))
        .select("user_id", "event_id", "value", "z")
    )


def q_events_autocorr(t: dict[str, DataFrame]) -> DataFrame:
    """Per-user lag-1 autocorrelation of event values — the
    time-series diagnostic that separates trending/bursty users from
    white-noise ones (feature for the anomaly stack, and the
    stationarity check before any EWMA/forecast is trusted).

    Shape: ONE user_id Exchange serves both the lag window and the
    per-user aggregate (grouping key == window partition key).  The
    Pearson r over (prev, cur) pairs is computed from five
    decimal-routed moment sums (Σx, Σy, Σxy, Σx², Σy²) — the same
    order-free determinism as ``q_events_anomaly`` — then one double
    formula, rounded at 6.  Users with < 10 pairs or zero variance on
    either side are excluded (r undefined).
    """
    e = t["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        e.select(
            "user_id",
            F.col("value").alias("y"),
            F.lag("value").over(w).alias("x"),
        )
        .filter(F.col("x").isNotNull())
    )

    def dsum(expr: F.Column) -> F.Column:
        return F.sum(expr.cast("decimal(28,4)")).cast("double")

    agg = pairs.groupBy("user_id").agg(
        F.count("*").alias("n"),
        dsum(F.col("x")).alias("sx"),
        dsum(F.col("y")).alias("sy"),
        dsum(F.col("x") * F.col("y")).alias("sxy"),
        dsum(F.col("x") * F.col("x")).alias("sxx"),
        dsum(F.col("y") * F.col("y")).alias("syy"),
    )
    n = F.col("n").cast("double")
    cov = n * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = n * F.col("syy") - F.col("sy") * F.col("sy")
    return (
        agg.filter((F.col("n") >= 10) & (vx > 0) & (vy > 0))
        .select(
            "user_id",
            F.col("n").cast("long").alias("n_pairs"),
            F.round(cov / F.sqrt(vx * vy), 6).alias("autocorr"),
        )
    )


def q_revenue_pareto(t: dict[str, DataFrame]) -> DataFrame:
    """Pareto (80/20) analysis of supplier revenue: rank suppliers by
    revenue and mark the vital few whose cumulative share is needed to
    reach 80% of total.

    The ranking window is GLOBAL but runs over the already-aggregated
    |suppliers| rows (the ``monthly_growth`` rule: aggregate first,
    then a global window over group-count rows, never raw facts).
    ``in_top80`` uses the PREVIOUS cumulative share (cum - own), so
    the supplier that crosses the 80% line is still included —
    the set you'd keep to cover 80% of revenue.
    """
    li, s = t["lineitem"], t["supplier"]
    per_supp = li.groupBy("l_suppkey").agg(dec_sum(revenue()).alias("rev"))
    total = per_supp.agg(dec_sum("rev").alias("total"))
    w = (
        Window.orderBy(F.desc("rev"), F.asc("l_suppkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col("rev").cast("decimal(28,4)")).over(w).cast("double")
    ranked = (
        per_supp.crossJoin(F.broadcast(total))
        .withColumn("rnk", F.row_number().over(Window.orderBy(F.desc("rev"), F.asc("l_suppkey"))))
        .withColumn("cum_share", F.round(cum / F.col("total"), 6))
        .withColumn(
            "in_top80",
            F.round((cum - F.col("rev")) / F.col("total"), 6) < 0.8,
        )
    )
    return (
        ranked.join(s, ranked.l_suppkey == s.s_suppkey)
        .select("rnk", "s_name", F.round("rev", 4).alias("rev"), "cum_share", "in_top80")
    )


def _rfm_per_customer(o: DataFrame) -> DataFrame:
    """Shared RFM base: per-customer recency/frequency/monetary with
    the corpus max order date broadcast as the recency reference."""
    ref = o.agg(F.max("o_orderdate").alias("ref_date"))
    return (
        o.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count("*").alias("frequency"),
            dec_sum("o_totalprice").alias("monetary"),
        )
        .crossJoin(F.broadcast(ref))
        .withColumn(
            "recency_days",
            F.datediff(F.col("ref_date"), F.col("last_order")).cast("long"),
        )
    )


def q_customer_rfm(t: dict[str, DataFrame]) -> DataFrame:
    """RFM segmentation, scale-safe DEFAULT path: per-customer recency
    (days since last order, vs the corpus max date), frequency (order
    count), monetary (total spend), each scored 1-5 by
    ``percentile_approx`` quintile cutoffs computed once over the
    per-customer aggregate and broadcast back (one row, four doubles
    per metric) — the ``quality_percentile`` pattern.

    No partition-less WindowExec anywhere in this plan (plan-tested):
    at billions of customers the aggregate shuffles on o_custkey once
    and scoring is a broadcast crossJoin + codegen scalar per row.
    ``q_customer_rfm_exact`` keeps the exact global-ntile formulation
    for oracle parity; the two differ only at quintile boundaries
    (within percentile_approx accuracy).
    """
    per_cust = _rfm_per_customer(t["orders"])
    qs = [0.2, 0.4, 0.6, 0.8]
    cuts = per_cust.agg(
        F.percentile_approx("recency_days", qs, 10000).alias("r_cuts"),
        F.percentile_approx("frequency", qs, 10000).alias("f_cuts"),
        F.percentile_approx("monetary", qs, 10000).alias("m_cuts"),
    )

    def below(cuts_col: str, value_col: str):
        return F.aggregate(
            F.col(cuts_col),
            F.lit(0),
            lambda acc, c: acc + F.when(c < F.col(value_col), 1).otherwise(0),
        )

    scored = per_cust.crossJoin(F.broadcast(cuts)).select(
        "o_custkey",
        "recency_days",
        F.col("frequency").cast("long").alias("frequency"),
        F.round("monetary", 4).alias("monetary"),
        # recency: smaller = better = bucket 1 (ascending quintiles)
        (F.lit(1) + below("r_cuts", "recency_days")).cast("long").alias("r_score"),
        # frequency/monetary: larger = bucket 1 (descending quintiles)
        (F.lit(5) - below("f_cuts", "frequency")).cast("long").alias("f_score"),
        (F.lit(5) - below("m_cuts", "monetary")).cast("long").alias("m_score"),
    )
    return scored.withColumn(
        "segment",
        F.concat_ws(
            "",
            F.col("r_score").cast("string"),
            F.col("f_score").cast("string"),
            F.col("m_score").cast("string"),
        ),
    )


def q_customer_rfm_exact(t: dict[str, DataFrame]) -> DataFrame:
    """RFM segmentation, exact-ntile ORACLE-PARITY variant: scores 1-5
    by ntile over a strict total order (metric, custkey), concatenated
    into the familiar segment code.

    Scale note: ntile here is a GLOBAL window — exact and
    oracle-portable over the aggregated |customers| rows at fixture
    scale, but it funnels the whole aggregate through one partition.
    This variant exists ONLY to hash-match the DuckDB NTILE oracle;
    ``q_customer_rfm`` (approx cutoffs, no global window) is the
    production default.
    """
    per_cust = _rfm_per_customer(t["orders"])
    w_r = Window.orderBy(F.asc("recency_days"), F.asc("o_custkey"))
    w_f = Window.orderBy(F.desc("frequency"), F.asc("o_custkey"))
    w_m = Window.orderBy(F.desc("monetary"), F.asc("o_custkey"))
    return per_cust.select(
        "o_custkey",
        "recency_days",
        F.col("frequency").cast("long").alias("frequency"),
        F.round("monetary", 4).alias("monetary"),
        F.ntile(5).over(w_r).cast("long").alias("r_score"),
        F.ntile(5).over(w_f).cast("long").alias("f_score"),
        F.ntile(5).over(w_m).cast("long").alias("m_score"),
    ).withColumn(
        "segment",
        F.concat_ws(
            "",
            F.col("r_score").cast("string"),
            F.col("f_score").cast("string"),
            F.col("m_score").cast("string"),
        ),
    )


def q_event_top_paths(t: dict[str, DataFrame]) -> DataFrame:
    """Most common 3-step behavior paths: per-user time-ordered
    event-type trigrams, counted corpus-wide, top-20 — the path-
    analytics complement of ``q_next_event_pairs`` (which builds
    training pairs; this reports the aggregate navigation structure).

    One window Exchange on user_id builds the trigram via lag, one
    wordcount-shaped aggregate counts paths, and the top-20 is
    TakeOrderedAndProject with a path tiebreak.
    """
    e = t["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.select(F.lag("event_type", 2).over(w).alias("e2"),
                 F.lag("event_type", 1).over(w).alias("e1"),
                 F.col("event_type").alias("e0"))
        .filter(F.col("e2").isNotNull())
        .select(F.concat_ws(">", "e2", "e1", "e0").alias("path"))
        .groupBy("path")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("path"))
        .limit(20)
    )


def changelog_apply(
    base: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    version_col: str = "version",
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Apply a CDC changelog to a snapshot — the MERGE INTO /
    merge-on-read compaction shape (the inverse of
    ``snapshot_diff``, which derives a changelog FROM two snapshots):
    for each key, the highest-``version_col`` row wins; a winning
    ``delete_op`` row tombstones the key out; otherwise the winner's
    payload upserts over the base row.

    Base rows participate as version-0 upserts, so a key absent from
    the changelog survives unchanged and a key present only in the
    changelog inserts.  Multiple changelog versions of one key
    collapse to the latest (exactly Delta/Iceberg MoR compaction).

    Shape: ONE union + ONE window rank on the key — a single Exchange
    keyed by ``key_cols``; with both sides bucketed on the key the
    shuffle disappears entirely.  ``version_col`` must totally order
    each key's changes (ties would make "latest" ambiguous — enforced
    nowhere here, contract of the changelog producer).
    """
    payload = [c for c in base.columns if c not in key_cols]
    b = base.select(
        *key_cols,
        *payload,
        F.lit(0).cast("long").alias(version_col),
        F.lit("U").alias(op_col),
    )
    c = changes.select(
        *key_cols, *payload,
        F.col(version_col).cast("long").alias(version_col),
        F.col(op_col).alias(op_col),
    )
    w = Window.partitionBy(*key_cols).orderBy(F.desc(version_col))
    return (
        b.unionByName(c)
        .withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) & (F.col(op_col) != delete_op))
        .select(*key_cols, *payload)
    )


def q_changelog_apply(t: dict[str, DataFrame]) -> DataFrame:
    """MERGE of a synthetic-but-deterministic changelog into the
    orders snapshot: %13 keys tombstone out, %7 keys take a price
    bump (+10.0 — an exactly-representable double increment, so both
    engines agree bit-for-bit with no rounding boundary), %21 keys
    get TWO further versions where the later status overwrite must
    win, and shifted +1000000 keys insert.  Change families carry
    DISTINCT versions (1..4, deletes highest) so overlapping keys
    (%91 is both %7 and %13; %21 is also %7) resolve deterministically
    — a version tie would make "latest" ambiguous, which
    ``changelog_apply`` documents as a changelog-producer contract."""
    o = t["orders"].select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    upd = o.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey",
        "o_orderstatus",
        (F.col("o_totalprice") + F.lit(10.0)).alias("o_totalprice"),
        F.lit(1).alias("version"),
        F.lit("U").alias("op"),
    )
    dels = o.filter(F.col("o_orderkey") % 13 == 0).select(
        "o_orderkey", "o_orderstatus", "o_totalprice",
        F.lit(4).alias("version"), F.lit("D").alias("op"),
    )
    twice_v1 = o.filter(F.col("o_orderkey") % 21 == 0).select(
        "o_orderkey", F.lit("X").alias("o_orderstatus"), "o_totalprice",
        F.lit(2).alias("version"), F.lit("U").alias("op"),
    )
    twice_v2 = o.filter(F.col("o_orderkey") % 21 == 0).select(
        "o_orderkey", F.lit("Y").alias("o_orderstatus"), "o_totalprice",
        F.lit(3).alias("version"), F.lit("U").alias("op"),
    )
    ins = o.filter(F.col("o_orderkey") % 17 == 0).select(
        (F.col("o_orderkey") + F.lit(1000000)).alias("o_orderkey"),
        F.lit("N").alias("o_orderstatus"),
        "o_totalprice",
        F.lit(1).alias("version"),
        F.lit("U").alias("op"),
    )
    changes = upd.unionByName(dels).unionByName(twice_v1).unionByName(twice_v2).unionByName(ins)
    return changelog_apply(o, changes, ["o_orderkey"])


def pit_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    how: str = "inner",
) -> DataFrame:
    """Point-in-time join: each fact row picks the dimension version
    whose [valid_from, valid_to) interval contains the fact timestamp
    (open-ended current version = null valid_to) — the SCD2 lookup
    every feature store / dimension-history query runs, and the
    train-serve-skew killer (a training row must see the dimension AS
    OF its event time, not the current one).

    Join mechanics: the equi key carries the shuffle; the interval
    predicate rides as a join filter (same design as ``range_join`` —
    keyed join, never a cartesian).  With non-overlapping intervals
    per key (what ``q_state_intervals`` produces) each fact matches at
    most one version.

    Columns from ``dim`` other than the key (payload AND interval
    bounds — the version stamp is often wanted downstream) are
    returned alongside all fact columns.
    """
    f, d = facts.alias("__f"), dim.alias("__d")
    cond = (
        (F.col(f"__f.{key}") == F.col(f"__d.{key}"))
        & (F.col(f"__f.{ts_col}") >= F.col(f"__d.{valid_from}"))
        & (
            F.col(f"__d.{valid_to}").isNull()
            | (F.col(f"__f.{ts_col}") < F.col(f"__d.{valid_to}"))
        )
    )
    payload = [c for c in dim.columns if c != key]
    return f.join(d, cond, how).select(
        *[F.col(f"__f.{c}") for c in facts.columns],
        *[F.col(f"__d.{c}") for c in payload],
    )


def q_pit_join(t: dict[str, DataFrame]) -> DataFrame:
    """PIT lookup of each event's state version: builds the SCD2
    interval table (``q_state_intervals``'s logic, timestamps kept
    native for the join) and point-in-time-joins the event stream
    back onto it.  Every event resolves to exactly one version — its
    own state at event time — which doubles as the built-in
    correctness witness (pytest asserts state == event_type).
    """
    e = t["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    state_c = F.coalesce(F.col("event_type"), F.lit("\x00"))
    changes = (
        e.select("user_id", "ts", "event_id", state_c.alias("__sc"))
        .withColumn("prev_state", F.lag("__sc").over(w))
        .filter(
            F.col("prev_state").isNull() | (F.col("prev_state") != F.col("__sc"))
        )
    )
    dim = changes.select(
        "user_id",
        F.col("__sc").alias("state"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
    )
    facts = e.select("event_id", "user_id", "ts")
    out = pit_join(facts, dim)
    return out.select(
        "event_id",
        "user_id",
        F.when(F.col("state") == "\x00", F.lit(None)).otherwise(F.col("state")).alias("state"),
        F.col("valid_from").cast("string").alias("version_from"),
    )


def q_rolling_active_users(t: dict[str, DataFrame]) -> DataFrame:
    """DAU / trailing-7-day WAU per observed day — the
    distinct-count-over-sliding-window shape that frame windows
    CANNOT express (COUNT(DISTINCT) is not frame-composable: a user
    active on 3 of the 7 days must count once).

    Shape: (1) reduce events to the DISTINCT (day, user) grid — the
    only pass over raw events; (2) CONTRIBUTION EXPLODE: each
    (day, user) row contributes to the 7 window-end days day..day+6
    (a bounded ×7 fan-out of the already-reduced grid, never of the
    event stream); (3) distinct + count per window end gives the
    rolling distinct — work is O(active-pairs × 7), linear at any
    scale, with no per-day self-join and no O(window) state.  A
    semi-join against observed days drops the phantom window ends
    after the last day of data.

    Determinism: days are UTC dates emitted as strings (session zone
    is pinned per query); counts are exact BIGINTs.
    """
    e = t["events"]
    grid = e.select(
        F.to_date("ts").alias("day"), "user_id"
    ).distinct()
    dau = grid.groupBy("day").agg(F.count("*").alias("dau"))
    contrib = (
        grid.select(
            F.explode(F.sequence(F.col("day"), F.date_add("day", 6))).alias("day"),
            "user_id",
        )
        .distinct()
        .groupBy("day")
        .agg(F.count("*").alias("wau7"))
        .join(grid.select("day").distinct(), "day", "left_semi")
    )
    return (
        dau.join(contrib, "day")
        .select(
            F.col("day").cast("string").alias("day"),
            F.col("dau").cast("long").alias("dau"),
            F.col("wau7").cast("long").alias("wau7"),
        )
    )


def q_skyline_frontier(t: dict[str, DataFrame]) -> DataFrame:
    """2-D skyline (Pareto frontier) of parts: minimize p_retailprice,
    maximize p_size — every part not dominated by another that is at
    least as cheap AND at least as large (strictly better in one).

    Spark shape (never the O(n²) dominance test the definition
    suggests): (1) aggregate max size per distinct price — the
    frontier can only contain per-price maxima; (2) ONE global window
    over the aggregated |distinct prices| rows computes the running
    max size over strictly-cheaper prices (aggregate-then-global-
    window rule: the window input is already reduced, so the single
    partition holds |prices| rows, not |parts|); (3) broadcast the
    surviving (price, size) frontier keys back onto the part table to
    emit all tied frontier rows.  A price's maximum survives iff it
    strictly exceeds every cheaper price's maximum — same-price
    same-size ties co-survive (neither dominates).

    The oracle is the dominance DEFINITION (NOT EXISTS over the
    quadratic pair space) — an independent formulation, not a replay
    of this plan.
    """
    p = t["part"]
    per_price = p.groupBy("p_retailprice").agg(F.max("p_size").alias("msize"))
    w = (
        Window.orderBy("p_retailprice")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    frontier_keys = (
        per_price.withColumn("prev_max", F.max("msize").over(w))
        .filter(F.col("prev_max").isNull() | (F.col("msize") > F.col("prev_max")))
        .select(
            F.col("p_retailprice").alias("__fp"), F.col("msize").alias("__fs")
        )
    )
    return p.join(
        F.broadcast(frontier_keys),
        (p["p_retailprice"] == F.col("__fp")) & (p["p_size"] == F.col("__fs")),
    ).select("p_partkey", "p_retailprice", "p_size")


def q_basket_rules(
    t: dict[str, DataFrame], min_pair_count: int = 2, k: int = 25
) -> DataFrame:
    """Market-basket association rules over order baskets: for part
    pairs co-ordered in >= ``min_pair_count`` orders, both directed
    rules a→b with support / confidence / lift, top-``k`` by lift.

    Shape: baskets are (orderkey, partkey) DISTINCT item sets; the
    pair count is ONE self-join keyed on l_orderkey — per-basket work
    is O(items²) bounded by the largest basket (13 here; capped by
    order size in any real corpus, never O(n²) in parts).  Item
    supports and the order total join onto the (already aggregated,
    pair-vocabulary-sized) rule table, not the item stream — the
    joins-land-on-the-vocabulary rule (`collocations_pmi`).  Top-k is
    TakeOrderedAndProject on rounded lift with a unique
    (antecedent, consequent) tiebreak.

    Determinism: support/confidence/lift are integer-ratio doubles
    (identical CAST structure mirrored in the oracle), rounded at 6
    before ranking.
    """
    li = t["lineitem"]
    items = li.select("l_orderkey", "l_partkey").distinct()
    n_orders = items.agg(
        F.count_distinct("l_orderkey").cast("long").alias("n_orders")
    )
    supp = items.groupBy("l_partkey").agg(F.count("*").alias("item_cnt"))
    a, b = items.alias("a"), items.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb")
        )
        .agg(F.count("*").alias("pair_cnt"))
        .filter(F.col("pair_cnt") >= min_pair_count)
    )
    rules = pairs.select(
        F.col("pa").alias("antecedent"), F.col("pb").alias("consequent"), "pair_cnt"
    ).unionByName(
        pairs.select(
            F.col("pb").alias("antecedent"), F.col("pa").alias("consequent"), "pair_cnt"
        )
    )
    sa = supp.select(F.col("l_partkey").alias("antecedent"), F.col("item_cnt").alias("cnt_a"))
    sb = supp.select(F.col("l_partkey").alias("consequent"), F.col("item_cnt").alias("cnt_b"))
    conf = F.col("pair_cnt").cast("double") / F.col("cnt_a").cast("double")
    return (
        rules.join(sa, "antecedent")
        .join(sb, "consequent")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "antecedent",
            "consequent",
            F.col("pair_cnt").cast("long").alias("pair_cnt"),
            F.round(
                F.col("pair_cnt").cast("double") / F.col("n_orders").cast("double"), 6
            ).alias("support"),
            F.round(conf, 6).alias("confidence"),
            F.round(
                conf
                / (F.col("cnt_b").cast("double") / F.col("n_orders").cast("double")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), F.asc("antecedent"), F.asc("consequent"))
        .limit(k)
    )


def q_state_intervals(t: dict[str, DataFrame]) -> DataFrame:
    """SCD2-style changelog compression: collapse each user's event
    stream into validity intervals of their current event_type state —
    rows where the state CHANGES open an interval, the next change
    closes it (open-ended = null valid_to).  This is the slowly-
    changing-dimension type-2 build step: changelog in, [from, to)
    history table out.

    Both the change detection (lag) and the interval close (lead over
    the surviving change rows) partition on user_id — one Exchange
    total; the lead window reads only the compressed change rows.
    Timestamps emit as strings at the edge (engine portability rule).

    A NULL event_type is a distinct state (compared through a \\x00
    sentinel so SQL three-valued logic can't silently merge a null-
    state run into its neighbors); the streaming twin
    (``streaming.stream_state_intervals``) defines null identically,
    keeping stream == batch on null-bearing changelogs too.
    """
    e = t["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    state_c = F.coalesce(F.col("event_type"), F.lit("\x00"))
    changes = (
        e.select("user_id", "ts", "event_id", "event_type", state_c.alias("__sc"))
        .withColumn("prev_state", F.lag("__sc").over(w))
        .filter(
            F.col("prev_state").isNull()
            | (F.col("prev_state") != F.col("__sc"))
        )
    )
    return changes.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("ts").cast("string").alias("valid_from"),
        F.lead("ts").over(w).cast("string").alias("valid_to"),
    )


def table_profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Data-quality profile: one row per column with row count, null
    count, exact distinct count, and min/max — the dbt-test/Deequ
    validation shape, used to gate pipeline stages ("did this
    snapshot's null fraction jump?").

    ONE pass over the table: every column's aggregates are computed in
    a single aggregation (multiple DISTINCT aggregates plan via
    Expand), then the wide row is stacked to long form — never one
    scan per column.  min/max aggregate in the column's native type
    and cast to string at the edge (string-casting FIRST would make
    numeric mins lexicographic).  Exact countDistinct is the oracle
    default; at 100 TB swap approx_count_distinct per column — same
    single-pass shape without the Expand blow-up.
    """
    cols = columns or df.columns
    aggs = [F.count("*").alias("__n")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"__nn_{c}"),
            F.countDistinct(c).alias(f"__nd_{c}"),
            F.min(c).cast("string").alias(f"__mn_{c}"),
            F.max(c).cast("string").alias(f"__mx_{c}"),
        ]
    wide = df.agg(*aggs)

    # names reach generated SQL: escape the string literal, backtick-
    # quote the identifiers, so ingested-CSV names ('unit price',
    # "o'clock") can't break or inject into the stack() expression
    def lit(c: str) -> str:
        return "'" + c.replace("\\", "\\\\").replace("'", "\\'") + "'"

    def ident(prefix: str, c: str) -> str:
        return "`" + f"{prefix}{c}".replace("`", "``") + "`"

    stack_args = ", ".join(
        f"{lit(c)}, {ident('__nn_', c)}, {ident('__nd_', c)}, "
        f"{ident('__mn_', c)}, {ident('__mx_', c)}"
        for c in cols
    )
    return wide.select(
        F.col("__n").alias("n_rows"),
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(col_name, __nn, n_distinct, min_value, max_value)"
        ),
    ).select(
        "col_name",
        F.col("n_rows").cast("long").alias("n_rows"),
        (F.col("n_rows") - F.col("__nn")).cast("long").alias("n_nulls"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        "min_value",
        "max_value",
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Snapshot comparison: label every key as added / removed /
    changed / unchanged between two versions of a table — the
    change-data-capture derivation step (and the audit behind "what
    did yesterday's pipeline run actually touch?").

    Rows compare by a sha2-256 over the canonicalized ``compare_cols``
    (default: all non-key columns, in sorted-name order so column
    order can't flip verdicts), so wide rows travel the join as one
    64-hex digest, not N columns.  One full outer join on the key —
    at 100 TB both sides bucket/cluster by the same key and the join
    is co-located (see ``sinks.write_bucketed``).

    Returns key columns + ``change`` ('added'|'removed'|'changed'|
    'unchanged').
    """
    if compare_cols is None:
        compare_cols = sorted(c for c in old.columns if c not in key_cols)
        new_extra = sorted(
            c for c in new.columns if c not in key_cols and c not in compare_cols
        )
        if new_extra:
            raise ValueError(
                "snapshot_diff: new snapshot has non-key columns absent from "
                f"old ({new_extra}) — a digest over old's columns would "
                "silently ignore their changes; pass compare_cols explicitly"
            )
    # length-prefixed encoding ('<len>:<value>') makes the digest a
    # prefix code: separator bytes inside values cannot realign field
    # boundaries, and a real '\\x00' value ('1:\\x00') cannot collide
    # with the bare null sentinel
    encoded = [
        F.coalesce(
            F.concat(
                F.length(F.col(c).cast("string")).cast("string"),
                F.lit(":"),
                F.col(c).cast("string"),
            ),
            F.lit("\x00"),
        )
        for c in compare_cols
    ]
    digest = F.sha2(F.concat_ws("\x1f", *encoded), 256)
    o = old.select(*key_cols, digest.alias("__old_sha"))
    n = new.select(*key_cols, digest.alias("__new_sha"))
    joined = o.join(n, key_cols, "full_outer")
    change = (
        F.when(F.col("__old_sha").isNull(), F.lit("added"))
        .when(F.col("__new_sha").isNull(), F.lit("removed"))
        .when(F.col("__old_sha") == F.col("__new_sha"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(*key_cols, change.alias("change"))


def q_conversation_build(t: dict[str, DataFrame], max_turns: int = 8) -> DataFrame:
    """Per-user ordered interaction sequence construction — the
    dialog-assembly shape of chat-style training data: every user's
    events, time-ordered, truncated to the first ``max_turns`` turns
    and rendered as one path string, plus the full turn count (the
    consumer drops or windows long histories from the count).

    Ordered aggregation portability: Spark has no ``collect_list(...
    ORDER BY ...)``, so the order is imposed by collecting
    (ts, event_id, event_type) STRUCTS and ``array_sort``-ing them —
    struct comparison orders by field position, and (ts, event_id) is
    a unique key, so the sort is total and deterministic regardless of
    partitioning.  DuckDB mirrors it natively with
    ``list(event_type ORDER BY ts, event_id)``.

    Plan: ONE Exchange (the user_id groupBy); the sort is per-group
    array_sort, not a window.  State per user is bounded by collecting
    only (ts, event_id, type) — at 100 TB, cap pathological users
    upstream (events_sessionize's gap split) before assembling.
    """
    e = t["events"]
    ordered = F.array_sort(
        F.collect_list(F.struct(F.col("ts"), F.col("event_id"), F.col("event_type")))
    )
    return (
        e.groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.array_join(
                F.transform(
                    F.slice(ordered, 1, max_turns), lambda s: s["event_type"]
                ),
                ">",
            ).alias("turns"),
        )
        .select("user_id", "n_events", "turns")
    )


def q_dq_expectations(t: dict[str, DataFrame]) -> DataFrame:
    """Declarative data-quality expectation suite over the star schema —
    the deequ/dbt-test shape (``table_profile`` describes; this
    ASSERTS): key uniqueness, referential integrity, range, null-rate,
    and cross-column ordering rules, one result row per rule with the
    violation count and a pass verdict.

    Scale: every rule is one scan + tiny aggregate; the referential-
    integrity rule is a LEFT ANTI join on the join key (shuffle on
    orderkey — the same key the fact table is bucketed by in a real
    deployment, so it co-locates).  Rules aggregate to 1 row each
    before the union: the union is 5 rows, not 5 scans' worth of data.
    """
    li, orders, cust = t["lineitem"], t["orders"], t["customer"]

    def rule(name: str, checked: DataFrame) -> DataFrame:
        return checked.select(
            F.lit(name).alias("rule"),
            F.col("n_checked").cast("long").alias("n_checked"),
            F.col("n_violations").cast("long").alias("n_violations"),
            (F.col("n_violations") == 0).alias("passed"),
        )

    unique_orderkey = orders.agg(
        F.count("*").alias("n_checked"),
        (F.count("*") - F.countDistinct("o_orderkey")).alias("n_violations"),
    )
    ref_integrity = (
        li.join(orders, li.l_orderkey == orders.o_orderkey, "left_anti")
        .agg(F.count("*").alias("n_violations"))
        .crossJoin(li.agg(F.count("*").alias("n_checked")))
    )
    qty_range = li.agg(
        F.count("*").alias("n_checked"),
        F.sum(
            F.when((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50), 1).otherwise(0)
        ).alias("n_violations"),
    )
    acctbal_null = cust.agg(
        F.count("*").alias("n_checked"),
        F.sum(F.when(F.col("c_acctbal").isNull(), 1).otherwise(0)).alias("n_violations"),
    )
    ship_after_order = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .agg(
            F.count("*").alias("n_checked"),
            F.sum(
                F.when(F.col("l_shipdate") < F.col("o_orderdate"), 1).otherwise(0)
            ).alias("n_violations"),
        )
    )
    return (
        rule("orders_pk_unique", unique_orderkey)
        .unionByName(rule("lineitem_orderkey_ri", ref_integrity))
        .unionByName(rule("lineitem_qty_1_50", qty_range))
        .unionByName(rule("customer_acctbal_not_null", acctbal_null))
        .unionByName(rule("ship_gte_orderdate", ship_after_order))
    )


def q_histogram_drift(t: dict[str, DataFrame], n_bins: int = 20) -> DataFrame:
    """Distribution-drift report between two deterministic snapshot
    halves of the event stream (even/odd event_id): a shared equi-width
    histogram over ``value`` plus each half's per-bin share and the
    absolute share gap — the per-bin decomposition of total-variation
    distance, the standard corpus-snapshot drift monitor.

    Bin edges derive from the GLOBAL min/max over both halves (one
    2-value aggregate broadcast back), so both halves bin identically;
    ``bin = least(floor((v - min) / width), n_bins - 1)`` is pure IEEE
    arithmetic on identical operands — engine-exact.  Shares are
    single divisions of exact counts; the gap |pa - pb| subtracts two
    such doubles.  Output is ``n_bins`` rows.
    """
    e = t["events"].select("event_id", "value")
    bounds = e.agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")
    )
    binned = (
        e.crossJoin(F.broadcast(bounds))
        .withColumn(
            "bin",
            # degenerate range (all values equal): one bin, not 0/0=NaN
            # (which would also diverge from DuckDB's NULL) — ADVICE r4
            F.when(
                F.col("hi") != F.col("lo"),
                F.least(
                    F.floor(
                        (F.col("value") - F.col("lo"))
                        / ((F.col("hi") - F.col("lo")) / F.lit(float(n_bins)))
                    ),
                    F.lit(n_bins - 1),
                ),
            )
            .otherwise(F.lit(0))
            .cast("long"),
        )
        .withColumn("half", (F.col("event_id") % 2 == 0))
    )
    counts = binned.groupBy("bin").agg(
        F.sum(F.when(F.col("half"), 1).otherwise(0)).cast("long").alias("cnt_a"),
        F.sum(F.when(~F.col("half"), 1).otherwise(0)).cast("long").alias("cnt_b"),
    )
    totals = counts.agg(
        F.sum("cnt_a").alias("n_a"), F.sum("cnt_b").alias("n_b")
    )
    shared = counts.crossJoin(F.broadcast(totals))
    pa = F.col("cnt_a").cast("double") / F.col("n_a").cast("double")
    pb = F.col("cnt_b").cast("double") / F.col("n_b").cast("double")
    return shared.select(
        "bin",
        "cnt_a",
        "cnt_b",
        pa.alias("share_a"),
        pb.alias("share_b"),
        F.abs(pa - pb).alias("share_gap"),
    )


def q_incremental_agg(t: dict[str, DataFrame]) -> DataFrame:
    """Incremental aggregate maintenance: merge a base snapshot's
    partial aggregates with a delta batch's partial aggregates and get
    EXACTLY the full recompute — the mergeability contract that lets a
    100 TB daily rollup absorb a new partition without rescanning
    history.

    The partials carry (count, DECIMAL(28,4) sum): decimal addition is
    exact and associative, so merge order cannot perturb the result —
    the oracle IS the single-pass full aggregate, and the hash match
    proves base+delta == full bit-for-bit.  The split (event_id mod 5)
    is deterministic; the merge is a 2-rows-per-group re-aggregate.
    """
    e = t["events"]
    day = F.to_date("ts").cast("string").alias("day")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy(F.col("event_type"), day).agg(
            F.count("*").cast("long").alias("cnt"),
            F.sum(F.col("value").cast("decimal(28,4)")).alias("dec_sum"),
        )

    base = partial(e.filter(F.col("event_id") % 5 != 0))
    delta = partial(e.filter(F.col("event_id") % 5 == 0))
    return (
        base.unionByName(delta)
        .groupBy("event_type", "day")
        .agg(
            F.sum("cnt").cast("long").alias("n_events"),
            F.sum("dec_sum").cast("double").alias("sum_value"),
        )
    )


def q_attribution_last_touch(t: dict[str, DataFrame]) -> DataFrame:
    """Last-touch conversion attribution: each purchase is credited to
    the user's most recent PRECEDING click (the marketing-analytics
    staple; first-touch is the same window with ``first``).

    One user_id window Exchange; the attributed click rides a
    running ``last(..., ignorenulls=True)`` over an
    unbounded-preceding/-1 frame — no self-join of purchases against
    click history, which at 100 TB would re-shuffle the event stream
    per conversion type.  Purchases with no prior click keep NULL
    attribution (the consumer's organic bucket), and
    ``secs_to_convert`` is an exact BIGINT epoch difference.
    """
    e = t["events"]
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_click = F.col("event_type") == "click"
    click_id = F.last(F.when(is_click, F.col("event_id")), ignorenulls=True).over(w)
    click_ts = F.last(F.when(is_click, F.col("ts")), ignorenulls=True).over(w)
    return (
        e.withColumn("attr_click_id", click_id)
        .withColumn("attr_click_ts", click_ts)
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            "event_id",
            "attr_click_id",
            (F.unix_timestamp("ts") - F.unix_timestamp("attr_click_ts"))
            .cast("long")
            .alias("secs_to_convert"),
        )
    )


def q_l_diversity(t: dict[str, DataFrame], l: int = 3) -> DataFrame:
    """l-diversity audit — k-anonymity's complement (``q_k_anonymity``
    measures class SIZE; this measures sensitive-value VARIETY): group
    documents by the quasi-identifier tuple (lang, length bucket) and
    report each class's distinct count of the sensitive attribute
    (source).  A class with fewer than ``l`` distinct sensitive values
    is vulnerable to homogeneity attacks even when its size passes k —
    an attacker who narrows a target to the class learns the sensitive
    value outright.

    Same shape as the k audit: ONE Exchange on the quasi-identifier
    tuple carrying a distinct-count; the report is |classes| rows.
    """
    d = t["documents"]
    bucket = F.least(F.lit(9), F.floor(F.col("n_chars") / 100).cast("long"))
    return (
        d.select("lang", bucket.alias("len_bucket"), "source")
        .groupBy("lang", "len_bucket")
        .agg(
            F.count("*").cast("long").alias("class_size"),
            F.countDistinct("source").cast("long").alias("n_sensitive"),
        )
        .select(
            "lang",
            "len_bucket",
            "class_size",
            "n_sensitive",
            (F.col("n_sensitive") < l).alias("violates_l"),
        )
    )


def q_attribution_linear(t: dict[str, DataFrame]) -> DataFrame:
    """Linear multi-touch attribution — ``q_attribution_last_touch``
    gives the newest click all the credit; here each purchase splits
    its credit EQUALLY across every click since the user's previous
    purchase (the journey segment it converts).

    Journey segmentation without a history self-join: a running count
    of PRECEDING purchases per user partitions the stream into
    conversion groups (each group's clicks convert at the purchase
    that closes it); a (user, group) aggregate counts the clicks, and
    the purchase row joins that 1-row-per-group aggregate.  Two keyed
    Exchanges (user_id window, (user, group) agg) regardless of
    corpus size — never events x events.

    Output per purchase: its touch count and the per-click credit
    (floor(1e6/n + 0.5)/1e6 — the floor-based half-up shared
    bit-exactly by the oracle and the streaming twin; organic
    purchases — no clicks in their group — report 0 touches and NULL
    credit).
    """
    e = t["events"]
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_p = F.col("event_type") == "purchase"
    is_c = F.col("event_type") == "click"
    grouped = e.withColumn(
        "grp",
        F.coalesce(
            F.sum(F.when(is_p, 1).otherwise(0)).over(w_prev), F.lit(0)
        ).cast("long"),
    )
    clicks = (
        grouped.filter(is_c)
        .groupBy("user_id", "grp")
        .agg(F.count("*").cast("long").alias("n_touch"))
    )
    purchases = grouped.filter(is_p).select(
        "user_id", "grp", F.col("event_id").alias("purchase_id")
    )
    return (
        purchases.join(clicks, ["user_id", "grp"], "left")
        .select(
            "user_id",
            "purchase_id",
            F.coalesce(F.col("n_touch"), F.lit(0)).cast("long").alias("n_touch"),
            # floor-based half-up: bit-identical in Spark SQL, DuckDB,
            # and the streaming twin's Python (F.round HALF_UP vs
            # Python banker's rounding split at exact ties like 1/128)
            F.when(
                F.col("n_touch") > 0,
                F.floor(F.lit(1e6) / F.col("n_touch") + F.lit(0.5)) / 1e6,
            ).alias("credit_per_touch"),
        )
    )


def q_ab_test_report(t: dict[str, DataFrame]) -> DataFrame:
    """A/B experiment readout: users split into two deterministic arms
    (user_id parity — in production, the salted hash split of
    ``sampling.train_val_test_split``), per-event-type mean ``value``
    compared with a Welch z statistic and a 95% verdict.

    Engine-exact statistics from decimal-routed moments: n (BIGINT),
    sum and sum-of-squares (DECIMAL(28,4) — each x*x is one IEEE
    product), then mean/variance/z as a fixed arithmetic tree over
    identical doubles, z ROUNDED at 6 before the verdict so the
    comparison never sits on a ulp.  One Exchange (event_type);
    conditional aggregation folds both arms in a single pass — no
    per-arm scan or join.
    """
    e = t["events"]

    def m(cond, expr, cast="decimal(28,4)"):
        return F.sum(F.when(cond, expr).otherwise(F.lit(None)).cast(cast))

    a = F.col("user_id") % 2 == 0
    b = ~a
    agg = e.groupBy("event_type").agg(
        F.sum(F.when(a, 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(b, 1).otherwise(0)).cast("long").alias("n_b"),
        m(a, F.col("value")).cast("double").alias("s1_a"),
        m(b, F.col("value")).cast("double").alias("s1_b"),
        m(a, F.col("value") * F.col("value")).cast("double").alias("s2_a"),
        m(b, F.col("value") * F.col("value")).cast("double").alias("s2_b"),
    )
    mean_a = F.col("s1_a") / F.col("n_a")
    mean_b = F.col("s1_b") / F.col("n_b")
    var_a = (F.col("s2_a") - F.col("s1_a") * F.col("s1_a") / F.col("n_a")) / (
        F.col("n_a") - 1
    )
    var_b = (F.col("s2_b") - F.col("s1_b") * F.col("s1_b") / F.col("n_b")) / (
        F.col("n_b") - 1
    )
    # under-populated arm (n<2): variance is undefined; zero pooled
    # variance (constant metric): z is 0/0 or x/0 — emit NULL z / NULL
    # verdict in BOTH engines instead of Spark NaN/Inf vs DuckDB
    # (ADVICE r4 + round-5 review; same guard class as
    # cuped_adjustment / bootstrap_se)
    se2 = var_a / F.col("n_a") + var_b / F.col("n_b")
    z = F.when(
        (F.col("n_a") > 1) & (F.col("n_b") > 1) & (se2 > 0),
        F.round((mean_a - mean_b) / F.sqrt(se2), 6),
    )
    return agg.select(
        "event_type",
        "n_a",
        "n_b",
        mean_a.alias("mean_a"),
        mean_b.alias("mean_b"),
        z.alias("welch_z"),
        (F.abs(z) > 1.96).alias("significant_95"),
    )


def q_k_anonymity(t: dict[str, DataFrame], k: int = 5) -> DataFrame:
    """k-anonymity audit over quasi-identifiers — the data-governance
    counterpart of ``text_pii_scrub`` (that operator redacts direct
    identifiers; this one measures RE-IDENTIFICATION risk from the
    indirect ones): group documents by the quasi-identifier tuple
    (lang, source, length decile) and report every equivalence class,
    its size, and whether it violates k-anonymity (size < k — an
    attacker who knows a target's quasi-identifiers can narrow them to
    under k candidates).

    The length decile uses fixed 100-char buckets (pure integer
    arithmetic — portable), mirroring how real audits coarsen
    continuous attributes before measuring.  One Exchange on the
    quasi-identifier tuple; the violation summary is |classes| rows.
    """
    d = t["documents"]
    bucket = F.least(F.lit(9), F.floor(F.col("n_chars") / 100).cast("long"))
    classes = (
        d.select("lang", "source", bucket.alias("len_bucket"))
        .groupBy("lang", "source", "len_bucket")
        .agg(F.count("*").cast("long").alias("class_size"))
    )
    return classes.select(
        "lang",
        "source",
        "len_bucket",
        "class_size",
        (F.col("class_size") < k).alias("violates_k"),
    )


def q_mad_outliers(t: dict[str, DataFrame]) -> DataFrame:
    """Robust per-group outlier detection via Median Absolute Deviation
    — the heavy-tail-safe alternative to the z-score (``events_
    running_anomaly``): median and MAD are unmoved by the outliers
    they hunt, where mean/stddev are dragged toward them.

    Portability fine print: l_quantity is integer-valued, so the
    interpolated medians land on binary-exact points (x.0 / x.5), the
    absolute deviations are half-integers, and the MAD lands on
    quarter-integers — every comparison against 3*MAD is exact in both
    engines (the same argument ``q_percentile`` documents).

    Plan: three passes over the fact (group medians -> deviations ->
    MAD -> outlier count), each a tiny aggregate BROADCAST back —
    the honest cost of nested medians; at 100 TB persist the deviation
    projection between passes 2 and 3.
    """
    li = t["lineitem"].select("l_returnflag", "l_quantity")
    med = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.5)").alias("med")
    )
    dev = li.join(F.broadcast(med), "l_returnflag").withColumn(
        "dev", F.abs(F.col("l_quantity") - F.col("med"))
    )
    mad = dev.groupBy("l_returnflag").agg(
        F.expr("percentile(dev, 0.5)").alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.max("med").alias("median_qty"),
            F.max("mad").alias("mad"),
            F.count("*").cast("long").alias("n"),
            F.sum(
                F.when(F.col("dev") > 3 * F.col("mad"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
        )
    )


def q_winsorize_mad(t: dict[str, DataFrame]) -> DataFrame:
    """Robust winsorization — ``q_mad_outliers`` COUNTS the tail; this
    CLIPS it: per group, values outside median +/- 3*MAD are clamped
    to the fence, the standard heavy-tail normalization before
    aggregate statistics (or before using a metric as a training
    weight).  Reports per group the clip counts and the decimal-routed
    mean before/after — the after-mean is what the cleaned pipeline
    consumes.

    Same integer-input exactness argument as ``q_mad_outliers``
    (quarter-integer fences, exact comparisons in both engines), same
    three broadcast-backed passes; at 100 TB persist the deviation
    projection between the MAD pass and the clip pass.
    """
    li = t["lineitem"].select("l_returnflag", "l_quantity")
    med = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.5)").alias("med")
    )
    dev = li.join(F.broadcast(med), "l_returnflag")
    mad = dev.withColumn(
        "dev", F.abs(F.col("l_quantity") - F.col("med"))
    ).groupBy("l_returnflag").agg(F.expr("percentile(dev, 0.5)").alias("mad"))
    fenced = dev.join(F.broadcast(mad), "l_returnflag").select(
        "l_returnflag",
        "l_quantity",
        (F.col("med") - 3 * F.col("mad")).alias("lo"),
        (F.col("med") + 3 * F.col("mad")).alias("hi"),
    )
    clipped = F.least(F.col("hi"), F.greatest(F.col("lo"), F.col("l_quantity")))
    return fenced.groupBy("l_returnflag").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.when(F.col("l_quantity") < F.col("lo"), 1).otherwise(0))
        .cast("long")
        .alias("n_clipped_low"),
        F.sum(F.when(F.col("l_quantity") > F.col("hi"), 1).otherwise(0))
        .cast("long")
        .alias("n_clipped_high"),
        F.round(
            F.sum(F.col("l_quantity").cast("decimal(28,4)")).cast("double")
            / F.count("*"),
            6,
        ).alias("mean_raw"),
        F.round(
            F.sum(clipped.cast("decimal(28,4)")).cast("double") / F.count("*"),
            6,
        ).alias("mean_winsorized"),
    )


def q_cuped_adjustment(t: dict[str, DataFrame]) -> DataFrame:
    """CUPED variance reduction for the A/B readout (Deng et al.
    WSDM'13, the industry-standard experiment sensitivity boost):
    each user's POST-period metric is adjusted by their PRE-period
    covariate, ``y_adj = y - theta * (x - mean(x))`` with
    ``theta = cov(x, y) / var(x)`` pooled over all users — removing
    the between-user variance the experiment didn't cause.

    Pipeline: one pass builds per-user (pre, post) decimal sums
    (conditional aggregation on the Jan-16 cutoff, one user_id
    Exchange); a 1-row pooled-moments aggregate broadcasts theta and
    mean(x) back; per-arm means fold in a final 2-row aggregate.
    Portability: per-user sums are decimal-routed; cross products are
    ROUNDED AT 6 then decimal-summed; theta/means are fixed arithmetic
    trees over identical doubles, rounded at 6 on emit.
    """
    e = t["events"]
    cutoff = F.lit("2024-01-16 00:00:00").cast("timestamp")

    def dsum(cond):
        return F.coalesce(
            F.sum(F.when(cond, F.col("value")).cast("decimal(28,4)")).cast("double"),
            F.lit(0.0),
        )

    users = e.groupBy("user_id").agg(
        dsum(F.col("ts") < cutoff).alias("x"),
        dsum(F.col("ts") >= cutoff).alias("y"),
    )
    moments = users.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("x").cast("decimal(28,4)")).cast("double").alias("sx"),
        F.sum(F.col("y").cast("decimal(28,4)")).cast("double").alias("sy"),
        F.sum(F.round(F.col("x") * F.col("x"), 6).cast("decimal(28,6)"))
        .cast("double")
        .alias("sxx"),
        F.sum(F.round(F.col("x") * F.col("y"), 6).cast("decimal(28,6)"))
        .cast("double")
        .alias("sxy"),
    )
    # zero pre-period variance (all x identical / all zero) must yield
    # NULL theta like DuckDB's x/0, not an ANSI DIVIDE_BY_ZERO crash
    denom = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    with_theta = users.crossJoin(F.broadcast(moments)).select(
        "user_id",
        "x",
        "y",
        F.when(
            denom != 0,
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / denom,
        ).alias("theta"),
        (F.col("sx") / F.col("n")).alias("mean_x"),
    )
    adj = with_theta.withColumn(
        "y_adj",
        F.round(
            F.col("y") - F.col("theta") * (F.col("x") - F.col("mean_x")), 6
        ),
    ).withColumn("arm_a", F.col("user_id") % 2 == 0)
    return (
        adj.groupBy("arm_a")
        .agg(
            F.count("*").cast("long").alias("n_users"),
            F.round(
                F.sum(F.col("y").cast("decimal(28,4)")).cast("double")
                / F.count("*"),
                6,
            ).alias("mean_post"),
            F.round(
                F.sum(F.col("y_adj").cast("decimal(28,6)")).cast("double")
                / F.count("*"),
                6,
            ).alias("mean_adjusted"),
            F.round(F.max("theta"), 6).alias("theta"),
        )
    )


def q_sft_render(t: dict[str, DataFrame], max_turns: int = 8) -> DataFrame:
    """Chat-template rendering — the last serialization step of an SFT
    pipeline: each user's time-ordered interaction sequence becomes ONE
    training string with alternating role markers
    (``<|user|>``/``<|assistant|>`` by turn parity), truncated to
    ``max_turns`` (the tokenizer-ready sibling of
    ``q_conversation_build``'s plain path string).

    Plan: one user_id window (row_number over the (ts, event_id) total
    order) and the per-user aggregate share the SAME partitioning —
    ONE Exchange; ordering inside the aggregate is array_sort over
    (rn, piece) structs with rn unique per user, so the rendered string
    is deterministic on any partitioning.
    """
    e = t["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    role = F.when(F.col("rn") % 2 == 1, F.lit("<|user|>")).otherwise(
        F.lit("<|assistant|>")
    )
    pieces = (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= max_turns)
        .select(
            "user_id",
            F.col("rn"),
            F.concat(role, F.col("event_type")).alias("piece"),
        )
    )
    ordered = F.array_sort(F.collect_list(F.struct(F.col("rn"), F.col("piece"))))
    return pieces.groupBy("user_id").agg(
        F.array_join(F.transform(ordered, lambda s: s["piece"]), "").alias(
            "rendered"
        ),
        F.count("*").cast("long").alias("n_turns"),
    )


def q_dp_noisy_counts(
    t: dict[str, DataFrame], epsilon: float = 1.0, salt: str = "dp-v1"
) -> DataFrame:
    """Differentially-private release of the per-(lang, source) document
    counts: true count + Laplace(1/epsilon) noise — the third leg of
    the privacy family (``text_pii_scrub`` redacts, ``k_anonymity`` /
    ``l_diversity`` audit, this RELEASES an aggregate with a formal
    epsilon budget; count queries have sensitivity 1, so scale b =
    1/epsilon).

    The Laplace draw is DETERMINISTIC and engine-portable: u =
    salted-md5 uniform of the group key in [0, 1), centered to
    u' = u - 1/2, then the standard inverse-CDF transform
    ``noise = -b * sign(u') * ln(1 - 2|u'|)`` — the one libm call
    (ln) is the same ulp-risk class as the shipped entropy/BM25
    entries, and the 1e-9 half-up rounding of the released value
    absorbs it.  ``1 - 2|u'|`` is floored at 1e-12 so the u' = -1/2
    edge cannot produce -inf.  (A production release would use a
    cryptographic RNG; the fixed salted hash here is what makes the
    entry value-checkable, same trade as every sampler in
    ``sampling.py``.)

    Scale: one Exchange on the released key; the noise is a
    zero-shuffle projection.  True count rides along for the
    verification contract (drop it downstream — releasing both would
    defeat the mechanism).
    """
    if epsilon <= 0:
        raise ValueError(f"dp_noisy_counts: epsilon must be > 0, got {epsilon}")
    from mapreduceimpl_spark.operators.sampling import hash_uniform

    b = 1.0 / epsilon
    d = t["documents"]
    counts = d.groupBy("lang", "source").agg(
        F.count("*").cast("long").alias("n_true")
    )
    u = hash_uniform(
        F.concat(
            F.lit(f"{salt}:"), F.col("lang"), F.lit("|"), F.col("source")
        )
    )
    uc = u - F.lit(0.5)
    sign = (
        F.when(uc < 0, F.lit(-1.0)).when(uc > 0, F.lit(1.0)).otherwise(F.lit(0.0))
    )
    noise = -F.lit(b) * sign * F.log(
        F.greatest(F.lit(1.0) - F.lit(2.0) * F.abs(uc), F.lit(1e-12))
    )
    return counts.select(
        "lang",
        "source",
        "n_true",
        (F.floor((F.col("n_true") + noise) * 1e9 + F.lit(0.5)) / 1e9).alias(
            "n_noisy"
        ),
    )


def q_events_twap(t: dict[str, DataFrame]) -> DataFrame:
    """Per-user TIME-weighted average of ``value`` — the correct mean
    for irregularly sampled telemetry (a gauge that sat at 5.0 for an
    hour then 100.0 for a second averages ~5, not 52.5; the unweighted
    mean every dashboard naively computes overweights bursts).

    Each event's value holds until the user's next event: weight =
    exact BIGINT MICROSECOND gap to the next event (unix_micros of the
    lead over the per-user (ts, event_id) order — integer end-to-end,
    immune to the unix_timestamp-floors-vs-epoch-fractions engine
    split); the last event has no successor and carries zero weight,
    i.e. the reading is integrated over the OBSERVED span.  twap =
    Σ round(value·gap_us) / Σ gap_us with the weighted terms quantized
    to BIGINT and summed exactly (magnitude-safe: ≤ ~1e12 per term,
    ~1e16 per user — inside both BIGINT and the 2^53 double-product
    window), final ratio half-up at 1e-9.  Users with a single event
    (or zero span) report NULL twap, never a 0/0 NaN.

    Scale: ONE window Exchange on user_id (lead + the aggregate share
    it), no self-join; millions of users parallelize the frame.
    """
    e = t["events"].filter(F.col("value").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = (F.unix_micros(F.lead("ts").over(w)) - F.unix_micros(F.col("ts"))).cast(
        "long"
    )
    per = e.select("user_id", "ts", "event_id", "value").withColumn("gap_us", gap)
    term = F.floor(F.col("value") * F.col("gap_us") + F.lit(0.5)).cast("long")
    agg = per.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum("gap_us").cast("long").alias("span_us"),
        F.sum(F.when(F.col("gap_us").isNotNull(), term)).cast("long").alias("wsum"),
    )
    twap = F.when(
        F.col("span_us") > 0,
        F.floor(F.col("wsum") / F.col("span_us") * 1e9 + F.lit(0.5)) / 1e9,
    )
    return agg.select("user_id", "n_events", "span_us", twap.alias("twap"))


def q_event_markov(t: dict[str, DataFrame]) -> DataFrame:
    """First-order Markov transition matrix over the event-type
    alphabet: for every observed (prev_type -> next_type) pair in a
    user's (ts, event_id)-ordered timeline, the transition count and
    the row-normalized probability — the behavioral model behind
    next-event prediction, funnel leak analysis, and synthetic
    session generation.

    ONE user_id window Exchange builds the lag-1 pairs; the matrix
    aggregate keys on a ≤ |types|² space, and the row normalizer is a
    window over that BOUNDED matrix (never raw events).  prob is
    half-up rounded at 1e-9 from the exact integer ratio.
    """
    e = t["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = e.select(
        F.lag("event_type", 1).over(w).alias("prev_type"),
        F.col("event_type").alias("next_type"),
    ).filter(F.col("prev_type").isNotNull())
    trans = pairs.groupBy("prev_type", "next_type").agg(
        F.count("*").cast("long").alias("n_trans")
    )
    wrow = Window.partitionBy("prev_type")
    return trans.select(
        "prev_type",
        "next_type",
        "n_trans",
        (
            F.floor(
                F.col("n_trans") / F.sum("n_trans").over(wrow) * 1e9
                + F.lit(0.5)
            )
            / 1e9
        ).alias("prob"),
    )


def q_markov_stationary(
    t: dict[str, DataFrame], iterations: int = 12
) -> DataFrame:
    """Stationary distribution of the event-type Markov chain by
    fixed-iteration power method: pi_{k+1}[j] = Σ_i pi_k[i]·P[i,j]
    starting uniform — where user behavior settles if sessions ran
    forever (the steady-state load mix each event type carries).

    Engine-exact iterative construction (the kmeans/BPE/logreg recipe
    applied to a BOUNDED matrix): P's probabilities are 1e-9-rounded
    exact ratios from :func:`q_event_markov`; each iteration's inflow
    terms pi·p are quantized to BIGINT at 1e12 and summed EXACTLY
    (order-free in both engines), the new pi being that integer sum /
    1e12.  Every iteration references the previous pi frame exactly
    once (broadcast join onto the ≤ |types|² matrix), so lineage is
    LINEAR in iterations and the whole chain replays as |iterations|
    chained CTEs.

    Scale: after the one events scan, everything operates on the
    bounded matrix — iterations cost |types|² rows each regardless of
    corpus size.  Types with no inflow at step k drop out of pi_k
    (their stationary mass is 0 in the limit); mass absorbed by
    types with no outgoing row leaves the simplex, which the power
    method reports honestly rather than renormalizing away.
    """
    if iterations < 1:
        raise ValueError(
            f"markov_stationary: iterations must be >= 1, got {iterations}"
        )
    trans = q_event_markov(t).select("prev_type", "next_type", "prob")
    types = trans.select(F.col("prev_type").alias("event_type")).unionByName(
        trans.select(F.col("next_type").alias("event_type"))
    ).distinct()
    n_types = types.agg(F.count("*").alias("nt"))
    pi = types.crossJoin(F.broadcast(n_types)).select(
        "event_type", (F.lit(1.0) / F.col("nt")).alias("pi")
    )
    for _ in range(iterations):
        term = F.floor(
            F.col("pi") * F.col("prob") * 1e12 + F.lit(0.5)
        ).cast("long")
        pi = (
            F.broadcast(pi)
            .join(trans, pi.event_type == trans.prev_type)
            .groupBy(F.col("next_type").alias("event_type"))
            .agg((F.sum(term) / F.lit(1e12)).alias("pi"))
        )
    return pi.select(
        "event_type",
        (F.floor(F.col("pi") * 1e9 + F.lit(0.5)) / 1e9).alias("pi"),
    )


def q_survival_km(
    t: dict[str, DataFrame], censor_horizon_days: int = 3
) -> DataFrame:
    """Kaplan-Meier survival curve of user LIFETIME (days between a
    user's first and last event), right-censored: a user whose last
    event falls within ``censor_horizon_days`` of the corpus's final
    timestamp is CENSORED (still alive — we just stopped watching),
    not dead — the distinction naive churn histograms get wrong and
    the entire reason KM exists.

    S(t) = Π_{t_i <= t} (1 − d_i / n_i) over the ordered distinct
    observed lifetimes: d_i = uncensored exits at t_i, n_i = users
    still at risk (lifetime >= t_i).  Engine-exact product: each
    factor's ln is quantized to BIGINT at 1e12, the cumulative window
    sum over the BOUNDED distinct-lifetime relation is exact, and
    S = exp(sum / 1e12) half-up at 1e-9 — the same
    quantize-then-exact-sum recipe as the shipped MI/Markov entries
    (exp/ln being the usual accepted ulp class).  Censored exits
    leave the risk set without a death event, exactly KM.

    Output: one row per distinct lifetime day with n_risk, n_death,
    n_censored, and the survival probability.  Scale: one per-user
    min/max aggregate, then everything operates on the bounded
    distinct-lifetime relation (≤ observation-span days).
    """
    if censor_horizon_days < 0:
        raise ValueError(
            f"survival_km: censor_horizon_days must be >= 0, got {censor_horizon_days}"
        )
    e = t["events"]
    spans = e.groupBy("user_id").agg(
        F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts")
    )
    corpus_end = e.agg(F.max("ts").alias("end_ts"))
    per_user = spans.crossJoin(F.broadcast(corpus_end)).select(
        F.floor(
            (F.unix_micros("last_ts") - F.unix_micros("first_ts"))
            / F.lit(86400000000.0)
        )
        .cast("long")
        .alias("lifetime_days"),
        (
            F.unix_micros("last_ts")
            >= F.unix_micros("end_ts")
            - F.lit(censor_horizon_days * 86400000000)
        ).alias("censored"),
    )
    by_day = per_user.groupBy("lifetime_days").agg(
        F.sum(F.when(~F.col("censored"), 1).otherwise(0))
        .cast("long")
        .alias("n_death"),
        F.sum(F.when(F.col("censored"), 1).otherwise(0))
        .cast("long")
        .alias("n_censored"),
        F.count("*").cast("long").alias("n_exit"),
    )
    w_risk = Window.orderBy("lifetime_days").rowsBetween(
        Window.unboundedPreceding, -1
    )
    tot = by_day.agg(F.sum("n_exit").cast("long").alias("n_total"))
    risked = by_day.crossJoin(F.broadcast(tot)).select(
        "lifetime_days",
        "n_death",
        "n_censored",
        (
            F.col("n_total") - F.coalesce(F.sum("n_exit").over(w_risk), F.lit(0))
        )
        .cast("long")
        .alias("n_risk"),
    )
    # n_death == n_risk zeroes the factor: ln(0) differs across engines
    # (Spark NULL, DuckDB -inf), so carry an explicit hit-zero flag and
    # pin survival to exactly 0.0 from that day on
    log_term = F.when(
        (F.col("n_death") > 0) & (F.col("n_death") < F.col("n_risk")),
        F.floor(
            F.log(F.lit(1.0) - F.col("n_death") / F.col("n_risk")) * 1e12
            + F.lit(0.5)
        ).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    zero_flag = F.when(F.col("n_death") == F.col("n_risk"), 1).otherwise(0)
    w_cum = Window.orderBy("lifetime_days").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = risked.select(
        "lifetime_days",
        "n_risk",
        "n_death",
        "n_censored",
        F.sum(log_term).over(w_cum).alias("cum12"),
        F.sum(zero_flag).over(w_cum).alias("hit_zero"),
    )
    surv = F.when(F.col("hit_zero") > 0, F.lit(0.0)).otherwise(
        F.floor(F.exp(F.col("cum12") / F.lit(1e12)) * 1e9 + F.lit(0.5)) / 1e9
    )
    return cum.select(
        "lifetime_days", "n_risk", "n_death", "n_censored", surv.alias("survival")
    )


def cramers_v(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Cramér's V association between two categorical columns —
    the effect-size readout behind every "does priority depend on
    ship mode"-style question (chi-square alone grows with n; V is
    the [0, 1]-normalized version a 100 TB table can act on).

    chi2 = Σ_cells (o - e)^2 / e with e = row_tot * col_tot / n,
    computed via the zero-cell-free identity chi2 = Σ_observed o²/e
    - n (structural-zero cells contribute exactly their e to the
    classic form, and Σe = n, so only OBSERVED cells need
    materializing — the contingency groupBy's output is already the
    full computation);  V = sqrt(chi2 / (n * (min(r, c) - 1))).
    Every input to the float expressions is an exact integer count
    (cell, row, column, grand totals and the r/c cardinalities), each
    cell term is evaluated in one fixed operation order, and the
    cell-term sum is decimal-routed — so the single output row is
    hash-exact.

    Returns one row: n, r, c, chi2 (round 9), cramers_v (round 9).

    Scale: ONE shuffle of the fact table (the (a, b) contingency
    groupBy); everything after operates on O(r*c) cells with
    broadcast-sized row/col/grand totals.
    """
    # NULL categories would land in contingency cells but be excluded
    # from the COUNT(DISTINCT) r/c cardinalities (both engines agree on
    # that asymmetry) — drop them so the two views stay consistent
    cells = (
        df.filter(F.col(col_a).isNotNull() & F.col(col_b).isNotNull())
        .groupBy(F.col(col_a).alias("a"), F.col(col_b).alias("b"))
        .agg(F.count("*").cast("long").alias("o"))
    )
    rowt = cells.groupBy("a").agg(F.sum("o").cast("long").alias("rt"))
    colt = cells.groupBy("b").agg(F.sum("o").cast("long").alias("ct"))
    tot = cells.agg(
        F.sum("o").cast("long").alias("n"),
        F.count_distinct("a").cast("long").alias("r"),
        F.count_distinct("b").cast("long").alias("c"),
    )
    e = (F.col("rt") * F.col("ct")) / F.col("n")
    term = (F.col("o") * F.col("o")) / e
    scored = (
        cells.join(rowt, "a")
        .join(colt, "b")
        .crossJoin(F.broadcast(tot))
        .select(
            "n", "r", "c", term.cast("decimal(28,12)").alias("term12")
        )
    )
    agg = scored.groupBy("n", "r", "c").agg(
        (F.sum("term12").cast("double") - F.col("n")).alias("chi2")
    )
    # min(r, c) == 1 leaves V undefined (no association possible on a
    # single category) — pin it to 0.0 rather than NaN
    v = F.when(
        F.least("r", "c") > 1,
        F.sqrt(F.col("chi2") / (F.col("n") * (F.least("r", "c") - F.lit(1)))),
    ).otherwise(F.lit(0.0))
    return agg.select(
        "n",
        "r",
        "c",
        F.round("chi2", 9).alias("chi2"),
        F.round(v, 9).alias("cramers_v"),
    )


def mannwhitney_u(
    df: DataFrame,
    value_col: str,
    group_col: str,
    target,
) -> DataFrame:
    """Mann-Whitney U rank-sum test: does the ``target`` stratum's
    ``value_col`` distribution sit above/below the rest's — the
    nonparametric two-sample test a mixing decision reads when means
    mislead (heavy-tailed doc lengths, quality scores).  The midrank
    machinery is ``classifier.logreg_eval``'s AUC trick (AUC and U are
    the same statistic); here the 2*R1 formulation keeps EVERY
    accumulated quantity an exact integer:

      2*R1      = Σ_values cnt1 * (2*below + cnt + 1)   [midrank x2]
      U1        = (2*R1 - n1*(n1+1)) / 2
      tie_term  = Σ_values cnt³ - cnt
      Var(U)    = n1*n2/12 * ((n+1) - tie_term / (n*(n-1)))
      z         = (U1 - n1*n2/2) / sqrt(Var)

    so the only float ops are the final fixed-order divisions and one
    sqrt.  Values are grouped RAW (quantize first if continuous —
    the logreg_eval precedent); z is 0 when the variance degenerates
    (all values tied, or n < 2).

    Scale: one wordcount-shaped groupBy(value), then ranking on the
    bounded DISTINCT-value relation (never the row count) via one
    ordered cumulative window, one final single-row aggregate.
    """
    tagged = df.select(
        F.col(value_col).alias("v"),
        (F.col(group_col) == F.lit(target)).cast("long").alias("is_t"),
    )
    by_value = tagged.groupBy("v").agg(
        F.sum("is_t").cast("long").alias("cnt1"),
        F.count("*").cast("long").alias("cnt"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    ranked = by_value.select(
        "cnt1",
        "cnt",
        F.coalesce(F.sum("cnt").over(w), F.lit(0)).cast("long").alias("below"),
    )
    agg = ranked.agg(
        F.sum("cnt1").cast("long").alias("n1"),
        F.sum("cnt").cast("long").alias("n"),
        F.sum(
            F.col("cnt1") * (F.lit(2) * F.col("below") + F.col("cnt") + F.lit(1))
        ).cast("long").alias("two_r1"),
        F.sum(
            F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt")
        ).cast("long").alias("tie_term"),
    ).withColumn("n2", F.col("n") - F.col("n1"))
    u1 = (F.col("two_r1") - F.col("n1") * (F.col("n1") + F.lit(1))) / F.lit(2.0)
    # greatest(..., 1) keeps the n < 2 denominator alive (when() does
    # not short-circuit; ANSI division by zero would throw) — the
    # degenerate case is excluded by the z guard anyway
    var = (
        (F.col("n1") * F.col("n2")) / F.lit(12.0)
    ) * (
        (F.col("n") + F.lit(1))
        - F.col("tie_term")
        / F.greatest(F.col("n") * (F.col("n") - F.lit(1)), F.lit(1))
    )
    mean_u = (F.col("n1") * F.col("n2")) / F.lit(2.0)
    z = F.when(
        (F.col("n") > 1) & (var > 0),
        F.round((u1 - mean_u) / F.sqrt(var), 9),
    ).otherwise(F.lit(0.0))
    return agg.select(
        "n1",
        "n2",
        u1.alias("u1"),
        z.alias("z"),
    )


def ols_by_group(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_col: str,
) -> DataFrame:
    """Per-group simple OLS (slope, intercept, r²) from the five
    classical sufficient statistics — the grouped regression readout
    behind every "does y scale with x inside each stratum" question,
    computed in ONE aggregate pass (map-side partial sums; no second
    scan for residuals because r² comes from the same sums).

    With integer-valued x and y every sufficient statistic (n, Σx,
    Σy, Σxy, Σx², Σy²) is an EXACT long, the slope/intercept/r²
    numerators and denominators are exact-long differences, and only
    the final divisions are float — fixed operation order, hash-exact
    without decimal routing.  Quantize continuous inputs first (the
    ``mannwhitney_u`` convention).  Degenerate strata (constant x or
    y, or n < 2) pin slope/intercept/r² to 0.0 rather than NaN.

    Scale: one groupBy(group) shuffle carrying six numeric partials,
    O(groups) output.  At 100 TB the partial aggregation does all the
    work map-side; nothing but the six sums crosses the wire.
    """
    g = df.select(
        F.col(group_col).alias("g"),
        F.col(x_col).cast("long").alias("x"),
        F.col(y_col).cast("long").alias("y"),
    )
    agg = g.groupBy("g").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")     # exact long
    den_x = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")   # exact long
    den_y = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")   # exact long
    ok = (F.col("n") > 1) & (den_x > 0)
    # ANSI-safe: greatest(..., 1) keeps excluded branches alive
    slope = num / F.greatest(den_x, F.lit(1))
    intercept = (F.col("sy") - slope * F.col("sx")) / F.col("n")
    r2 = (num.cast("double") * num.cast("double")) / (
        F.greatest(den_x, F.lit(1)).cast("double")
        * F.greatest(den_y, F.lit(1)).cast("double")
    )
    z = F.lit(0.0)
    return agg.select(
        F.col("g").alias(group_col),
        F.col("n").alias("n_rows"),
        F.round(F.when(ok, slope).otherwise(z), 9).alias("slope"),
        F.round(F.when(ok, intercept).otherwise(z), 9).alias("intercept"),
        F.round(F.when(ok & (den_y > 0), r2).otherwise(z), 9).alias("r2"),
    )


def ks_two_sample(
    df: DataFrame,
    value_col: str,
    group_col: str,
    target,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov: the max empirical-CDF gap
    between the ``target`` stratum's ``value_col`` distribution and
    the rest's — the distribution-SHAPE complement of
    :func:`mannwhitney_u` (U detects location shift; D fires on any
    divergence: variance, bimodality, truncation).

    D = max over distinct values |F1(v) - F2(v)| with each CDF an
    exact cumulative-count / total division; ks_stat =
    sqrt(n1*n2/(n1+n2)) * D.  MAX of doubles is order-free, every
    division has exact-long operands, so the single output row is
    hash-exact.  Values group RAW (quantize continuous inputs first,
    the ``mannwhitney_u`` convention).

    Scale: one groupBy(value) shuffle, then cumulative + total
    windows on the bounded DISTINCT-value relation (single-partition
    pass over |values| rows — the bounded-relation window posture),
    one 1-row max.
    """
    tagged = df.select(
        F.col(value_col).alias("v"),
        (F.col(group_col) == F.lit(target)).cast("long").alias("is_t"),
    )
    by_value = tagged.groupBy("v").agg(
        F.sum("is_t").cast("long").alias("cnt1"),
        (F.count("*") - F.sum("is_t")).cast("long").alias("cnt2"),
    )
    wc = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.partitionBy()
    cdf = by_value.select(
        F.sum("cnt1").over(wc).cast("long").alias("c1"),
        F.sum("cnt2").over(wc).cast("long").alias("c2"),
        F.sum("cnt1").over(wt).cast("long").alias("n1"),
        F.sum("cnt2").over(wt).cast("long").alias("n2"),
    )
    gap = F.abs(
        F.col("c1") / F.greatest(F.col("n1"), F.lit(1))
        - F.col("c2") / F.greatest(F.col("n2"), F.lit(1))
    )
    agg = cdf.groupBy("n1", "n2").agg(F.max(gap).alias("d_raw"))
    ok = (F.col("n1") > 0) & (F.col("n2") > 0)
    ks = F.sqrt(
        (F.col("n1") * F.col("n2"))
        / (F.col("n1") + F.col("n2"))
    ) * F.col("d_raw")
    return agg.select(
        "n1",
        "n2",
        F.round(F.when(ok, F.col("d_raw")).otherwise(F.lit(0.0)), 9).alias("d_stat"),
        F.round(F.when(ok, ks).otherwise(F.lit(0.0)), 9).alias("ks_stat"),
    )


def q_t_closeness(t: dict[str, DataFrame], threshold: float = 0.3) -> DataFrame:
    """t-closeness audit — the third leg of the anonymity triad
    (``q_k_anonymity`` bounds class SIZE, ``q_l_diversity`` sensitive
    VARIETY; this bounds sensitive DISTRIBUTION SKEW): per
    quasi-identifier class (lang, length bucket), the total-variation
    distance between the class's sensitive-attribute (source)
    distribution and the corpus-global one.  A class can pass k and l
    yet leak via skew — 90% of one source inside a class tells an
    attacker the likely value even with l distinct present; TVD is
    the categorical instance of the t-closeness EMD (Li et al. 2007).

    TVD = (1/2) Σ_v |p_class(v) - p_global(v)| over the GLOBAL value
    set (values absent from the class contribute p_global(v)).  Every
    probability is an exact-long-count division; the per-class sum
    runs over the bounded |sources| value set and is decimal-routed.

    Scale: one Exchange on (class, source) for cell counts; class and
    global totals are aggregate-side; the class x value grid is
    |classes| x |sources| — bounded, never row-count shaped.
    """
    d = t["documents"]
    bucket = F.least(F.lit(9), F.floor(F.col("n_chars") / 100).cast("long"))
    base = d.select("lang", bucket.alias("len_bucket"), "source")
    cells = base.groupBy("lang", "len_bucket", "source").agg(
        F.count("*").cast("long").alias("cnt")
    )
    classes = cells.groupBy("lang", "len_bucket").agg(
        F.sum("cnt").cast("long").alias("class_size")
    )
    gvals = cells.groupBy("source").agg(F.sum("cnt").cast("long").alias("gcnt"))
    gtot = gvals.agg(F.sum("gcnt").cast("long").alias("n"))
    grid = (
        classes.crossJoin(F.broadcast(gvals))
        .crossJoin(F.broadcast(gtot))
        .join(cells, ["lang", "len_bucket", "source"], "left")
        .select(
            "lang",
            "len_bucket",
            "class_size",
            F.abs(
                F.coalesce("cnt", F.lit(0)) / F.col("class_size")
                - F.col("gcnt") / F.col("n")
            ).cast("decimal(28,12)").alias("gap12"),
        )
    )
    agg = grid.groupBy("lang", "len_bucket", "class_size").agg(
        (F.sum("gap12").cast("double") / F.lit(2.0)).alias("tvd_raw")
    )
    return agg.select(
        "lang",
        "len_bucket",
        "class_size",
        F.round("tvd_raw", 9).alias("tvd"),
        (F.round("tvd_raw", 9) > F.lit(threshold)).alias("violates_t"),
    )


def q_funnel_windowed(t: dict[str, DataFrame], horizon_hours: int = 24) -> DataFrame:
    """Time-bounded conversion funnel — ``q_funnel`` with a horizon:
    the click must follow the first view AND land within
    ``horizon_hours`` of it, the purchase must follow that click
    within the SAME view-anchored horizon.  This is the number a
    product team actually quotes ("24h conversion"): the unbounded
    funnel credits a purchase months later, which inflates conversion
    and hides latency regressions.

    Same single-shuffle posture as ``q_funnel``: three window mins
    over one user_id partitioning; the horizon is exact timestamp
    arithmetic (micros), so the oracle replays it bit-for-bit.
    """
    e = t["events"]
    w = Window.partitionBy("user_id")
    horizon = F.expr(f"INTERVAL {int(horizon_hours)} HOURS")
    staged = e.withColumn(
        "first_view",
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w),
    )
    deadline = F.col("first_view") + horizon
    staged = staged.withColumn(
        "first_click",
        F.min(
            F.when(
                (F.col("event_type") == "click")
                & (F.col("ts") > F.col("first_view"))
                & (F.col("ts") <= deadline),
                F.col("ts"),
            )
        ).over(w),
    ).withColumn(
        "first_purchase",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") > F.col("first_click"))
                & (F.col("ts") <= deadline),
                F.col("ts"),
            )
        ).over(w),
    )
    per_user = staged.groupBy("user_id").agg(
        F.max("first_view").alias("fv"),
        F.max("first_click").alias("fc"),
        F.max("first_purchase").alias("fp"),
    )
    return per_user.agg(
        F.count("*").cast("long").alias("n_users"),
        F.count("fv").cast("long").alias("n_viewed"),
        F.count("fc").cast("long").alias("n_clicked_in_window"),
        F.count("fp").cast("long").alias("n_purchased_in_window"),
    )


# Benford first-digit probabilities log10(1 + 1/d), d = 1..9 — Python
# floats whose repr() is interpolated into BOTH engines' expressions
BENFORD_P: tuple[float, ...] = tuple(
    __import__("math").log10(1.0 + 1.0 / d) for d in range(1, 10)
)


def benford_deviation(
    df: DataFrame,
    amount_col: str,
) -> DataFrame:
    """Benford's-law first-digit audit of a positive amount column —
    the classic fabricated-/corrupted-data smell test (real
    transactional magnitudes follow log10(1+1/d); synthetic or
    truncated feeds don't): per leading digit, observed vs expected
    share and the absolute gap.

    The leading digit is exact string arithmetic on floor(amount)
    (no logs on the data path); expected probabilities are Python
    constants repr-interpolated into both engines; observed shares
    are exact-long-count divisions — 9 hash-exact rows.

    Scale: one map-side-combined groupBy(digit) (9 groups) + a 1-row
    total broadcast.
    """
    d = F.substring(
        F.floor(F.col(amount_col)).cast("long").cast("string"), 1, 1
    ).cast("int")
    counts = (
        df.filter(F.col(amount_col) >= 1)
        .groupBy(d.alias("digit"))
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    total = counts.agg(F.sum("cnt").cast("long").alias("n"))
    exp = df.sparkSession.createDataFrame(
        [(i + 1, p) for i, p in enumerate(BENFORD_P)], "digit int, exp_p double"
    )
    obs = F.col("cnt") / F.col("n")
    return (
        counts.crossJoin(F.broadcast(total))
        .join(F.broadcast(exp), "digit")
        .select(
            "digit",
            "cnt",
            obs.alias("obs_p"),
            "exp_p",
            F.round(F.abs(obs - F.col("exp_p")), 9).alias("abs_dev"),
        )
    )


def q_psi_drift(t: dict[str, DataFrame], n_bins: int = 20) -> DataFrame:
    """Population Stability Index between the two deterministic
    snapshot halves of the event stream — the single-number drift
    score the industry actually alerts on (PSI < 0.1 stable, > 0.25
    act), complementing ``q_histogram_drift``'s per-bin TVD
    decomposition with the log-weighted summary.

    Same global-min/max equi-width binning as the histogram entry;
    shares are Laplace-smoothed ((cnt + 1) / (n + n_bins), exact
    integer operands) so empty bins never hit ln(0); per-bin term
    (pa - pb) * ln(pa / pb) is rounded to 9 then decimal-summed (the
    ``bigram_logprob`` pattern — PSI terms are sign-mixed, which
    DECIMAL handles exactly).

    Output one row: n_bins, psi (round 6), max_bin_gap (the largest
    |pa - pb|, round 9 — the TVD hotspot PSI's log weighting can
    understate).
    """
    e = t["events"].select("event_id", "value")
    bounds = e.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    binned = (
        e.crossJoin(F.broadcast(bounds))
        .withColumn(
            "bin",
            F.when(
                F.col("hi") != F.col("lo"),
                F.least(
                    F.floor(
                        (F.col("value") - F.col("lo"))
                        / ((F.col("hi") - F.col("lo")) / F.lit(float(n_bins)))
                    ),
                    F.lit(n_bins - 1),
                ),
            )
            .otherwise(F.lit(0))
            .cast("long"),
        )
        .withColumn("half", (F.col("event_id") % 2 == 0))
    )
    counts = binned.groupBy("bin").agg(
        F.sum(F.when(F.col("half"), 1).otherwise(0)).cast("long").alias("cnt_a"),
        F.sum(F.when(~F.col("half"), 1).otherwise(0)).cast("long").alias("cnt_b"),
    )
    totals = counts.agg(
        F.sum("cnt_a").cast("long").alias("n_a"),
        F.sum("cnt_b").cast("long").alias("n_b"),
        F.count("*").cast("long").alias("bins_used"),
    )
    j = counts.crossJoin(F.broadcast(totals))
    pa = (F.col("cnt_a") + F.lit(1)) / (F.col("n_a") + F.lit(n_bins))
    pb = (F.col("cnt_b") + F.lit(1)) / (F.col("n_b") + F.lit(n_bins))
    term = F.round((pa - pb) * F.log(pa / pb), 9)
    gap = F.abs(pa - pb)
    agg = j.agg(
        F.max("bins_used").cast("long").alias("n_bins_used"),
        F.sum(term.cast("decimal(28,9)")).cast("double").alias("psi_raw"),
        F.max(gap).alias("gap_raw"),
    )
    return agg.select(
        "n_bins_used",
        F.round("psi_raw", 6).alias("psi"),
        F.round("gap_raw", 9).alias("max_bin_gap"),
    )


def q_attribution_time_decay(
    t: dict[str, DataFrame], halflife_days: float = 7.0
) -> DataFrame:
    """Time-decay multi-touch attribution — the third standard model
    after last-touch (newest click takes all) and linear (equal
    split): each click in the converting journey segment gets weight
    2^(-age / halflife) at purchase time, so recent touches dominate
    smoothly instead of absolutely.

    Same journey segmentation as ``q_attribution_linear`` (running
    preceding-purchase count; never events x events).  The decay
    exponent is ONE exact-long micros difference and ONE division —
    identical operands on both engines; pow(2, x) is then rounded to
    9 (the ULP-absorbing convention) BEFORE the decimal-routed group
    normalization, so shares are hash-exact.

    Output per (purchase, click): the touch count, the rounded raw
    weight and its normalized share of the purchase's credit.

    Scale: one user_id window Exchange + one (user, grp) window over
    the joined click-purchase frame — group fan-out is journey
    length, bounded by user activity, never corpus-shaped.
    """
    e = t["events"]
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_p = F.col("event_type") == "purchase"
    is_c = F.col("event_type") == "click"
    grouped = e.withColumn(
        "grp",
        F.coalesce(
            F.sum(F.when(is_p, 1).otherwise(0)).over(w_prev), F.lit(0)
        ).cast("long"),
    )
    clicks = grouped.filter(is_c).select(
        "user_id",
        "grp",
        F.col("event_id").alias("click_id"),
        F.unix_micros("ts").alias("cus"),
    )
    purchases = grouped.filter(is_p).select(
        "user_id",
        "grp",
        F.col("event_id").alias("purchase_id"),
        F.unix_micros("ts").alias("pus"),
    )
    half_us = halflife_days * 86400.0 * 1e6
    joined = clicks.join(purchases, ["user_id", "grp"])
    w9 = F.round(
        F.pow(F.lit(2.0), (F.col("cus") - F.col("pus")) / F.lit(half_us)), 9
    )
    scored = joined.select(
        "user_id", "purchase_id", "click_id", w9.alias("w9")
    )
    wg = Window.partitionBy("user_id", "purchase_id")
    return scored.select(
        "user_id",
        "purchase_id",
        "click_id",
        F.count("*").over(wg).cast("long").alias("n_touch"),
        "w9",
        F.round(
            F.col("w9")
            / F.sum(F.col("w9").cast("decimal(28,9)")).over(wg).cast("double"),
            6,
        ).alias("share"),
    )


def q_dow_uniformity(t: dict[str, DataFrame]) -> DataFrame:
    """Chi-square goodness-of-fit of event volume against a uniform
    day-of-week distribution — the load-pattern test behind capacity
    planning and anomaly baselines (``cramers_v`` tests ASSOCIATION
    between two columns; this tests one column's fit to a NULL
    model).  Weekly periodicity shows up as a large statistic.

    chi2 = Σ_d (o_d - n/7)² / (n/7) over the 7 observed-day counts =
    (7/n) * Σ o_d² - n via the same zero-cell-free expansion as
    ``cramers_v`` (a day with no events contributes its expectation):
    Σ o² is an exact long, so chi2 is two fixed-order float ops.
    Also reports the max |share - 1/7| deviation among OBSERVED days
    (days_seen < 7 means an absent day deviates by the full 1/7).

    Scale: one 7-group map-side aggregate; 1 output row.
    """
    e = t["events"]
    # dayofweek is locale-free in Spark (1=Sunday..7=Saturday); DuckDB
    # dayofweek(ts) is 0=Sunday..6 — the oracle offsets to match
    counts = e.groupBy(F.dayofweek("ts").alias("dow")).agg(
        F.count("*").cast("long").alias("o")
    )
    agg = counts.agg(
        F.sum("o").cast("long").alias("n"),
        F.sum(F.col("o") * F.col("o")).cast("long").alias("so2"),
        F.count("*").cast("long").alias("days_seen"),
        F.max(F.col("o")).cast("long").alias("max_day"),
        F.min(F.col("o")).cast("long").alias("min_day"),
    )
    chi2 = (F.lit(7.0) / F.col("n")) * F.col("so2") - F.col("n")
    return agg.select(
        "n",
        "days_seen",
        "min_day",
        "max_day",
        F.round(chi2, 9).alias("chi2"),
        F.round(
            F.greatest(
                F.abs(F.col("max_day") / F.col("n") - F.lit(1.0 / 7.0)),
                F.abs(F.col("min_day") / F.col("n") - F.lit(1.0 / 7.0)),
            ),
            9,
        ).alias("max_share_dev"),
    )


def q_deletion_cascade(t: dict[str, DataFrame]) -> DataFrame:
    """Right-to-erasure impact report: given a deterministic deletion
    cohort (the md5-uniform 1% of customers — standing in for a GDPR
    request list), count the rows each table must delete, following
    the referential cascade customer -> orders -> lineitem — the
    compliance dry-run a data platform executes BEFORE the destructive
    pass, and the number the DPO signs off on.

    Exact counts only; the cohort decision is the ``hash_uniform``
    convention (replayable, no list shipping).  Output one row per
    table: rows_total, rows_to_delete, delete_frac (exact division).

    Scale: the cohort is a semi-join pushed down each fact table
    (orders by custkey; lineitem via the orders keys — two keyed
    shuffles); counts are map-side-combined aggregates.
    """
    from mapreduceimpl_spark.operators.sampling import hash_uniform

    c = t["customer"]
    o = t["orders"]
    li = t["lineitem"]
    cohort = c.filter(
        hash_uniform(
            F.concat(F.lit("erasure-v1:"), F.col("c_custkey").cast("string"))
        )
        < F.lit(0.01)
    ).select("c_custkey")
    del_orders = o.join(
        cohort, o.o_custkey == cohort.c_custkey, "left_semi"
    ).select("o_orderkey")
    del_li = li.join(
        del_orders, li.l_orderkey == del_orders.o_orderkey, "left_semi"
    )

    def row(name: str, total_df: DataFrame, del_df: DataFrame) -> DataFrame:
        return total_df.agg(F.count("*").cast("long").alias("rows_total")).crossJoin(
            del_df.agg(F.count("*").cast("long").alias("rows_to_delete"))
        ).select(
            F.lit(name).alias("table_name"),
            "rows_total",
            "rows_to_delete",
            (F.col("rows_to_delete") / F.col("rows_total")).alias("delete_frac"),
        )

    return (
        row("customer", c, cohort)
        .unionAll(row("orders", o, del_orders))
        .unionAll(row("lineitem", li, del_li))
    )


def q_session_depth_hist(t: dict[str, DataFrame]) -> DataFrame:
    """Histogram of session depths (events per session) over the
    gap-based sessionization — the engagement-shape report behind
    "are sessions getting shallower": mass at depth 1 = bounce rate,
    the tail = power sessions.  Composes ``q_events_sessionize``'s
    per-session frame into a bounded (depth -> sessions) relation.

    All exact longs; share is one exact division against the 1-row
    session total.

    Scale: rides the sessionize window Exchange, then two bounded
    aggregates; output is bounded by the deepest session.
    """
    sessions = q_events_sessionize(t)
    hist = sessions.groupBy(F.col("n_events").alias("depth")).agg(
        F.count("*").cast("long").alias("n_sessions")
    )
    total = hist.agg(F.sum("n_sessions").cast("long").alias("total"))
    return hist.crossJoin(F.broadcast(total)).select(
        "depth",
        "n_sessions",
        (F.col("n_sessions") / F.col("total")).alias("session_share"),
        (F.col("depth") * F.col("n_sessions")).cast("long").alias("n_events"),
    )


def q_iqr_fences(t: dict[str, DataFrame]) -> DataFrame:
    """Tukey IQR outlier fences per language over doc length — the
    boxplot rule (1.5·IQR beyond the quartiles), the quantile-based
    sibling of ``mad_outliers`` (MAD keys off the median's absolute
    deviations; IQR off the quartile spread — the two standard robust
    fences a data-quality gate picks between).

    Quartiles ride the exact Spark-percentile == DuckDB-quantile_cont
    bit parity; fences and outlier counts are fixed-order float
    comparisons against exact-long lengths.

    Scale: one groupBy(lang) percentile aggregate, then one
    fence-count aggregate over the same grouping — two map-side
    passes, O(langs) output.
    """
    d = t["documents"].select(
        "lang", F.col("n_chars").cast("long").alias("x")
    )
    q = d.groupBy("lang").agg(
        F.count("*").cast("long").alias("n"),
        F.percentile("x", 0.25).alias("q1"),
        F.percentile("x", 0.75).alias("q3"),
    )
    lo = F.col("q1") - F.lit(1.5) * (F.col("q3") - F.col("q1"))
    hi = F.col("q3") + F.lit(1.5) * (F.col("q3") - F.col("q1"))
    fenced = d.join(q, "lang").select(
        "lang",
        "n",
        "q1",
        "q3",
        lo.alias("lo"),
        hi.alias("hi"),
        ((F.col("x") < lo) | (F.col("x") > hi)).cast("long").alias("is_out"),
    )
    return fenced.groupBy("lang", "n", "q1", "q3", "lo", "hi").agg(
        F.sum("is_out").cast("long").alias("n_outliers"),
        (F.sum("is_out") / F.count("*")).alias("outlier_frac"),
    )
