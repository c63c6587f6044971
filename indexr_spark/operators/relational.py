"""Relational operator surface — reference parity + Spark superset.

The reference's embedded engine covers single-table
Project/Filter/Aggregate(partial+final)/Sort/Limit(offset,count) with
HAVING rewritten to a post-aggregate Filter (SURVEY.md §2.1;
indexr-query-opt .../plan/physical/{Project,Filter,TungstenAggregate,
Sort,Limit}.java). Everything here is expressed declaratively on the
DataFrame/SQL API so Catalyst supplies predicate pushdown, column
pruning, partial aggregation and whole-stage codegen; joins, windows,
set ops and rollup are the Spark-superset operators the reference
delegates to its host engines (SURVEY.md §3.2).

Every query returns deterministic values against the DuckDB oracle in
ORACLE: computed columns share names on both sides, double aggregates
are rounded (sums→2dp, ratios/avgs→6dp) so floating summation order
cannot flip the value hash, and every LIMIT sits under a total order.

Scale notes (100 TB): filters here push to the Parquet scan
(PushedFilters), dimension joins are explicitly broadcast, large
fact-fact joins shuffle on their join key and survive skew via AQE;
nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from indexr_spark.tables import load_table

ORACLE: dict[str, str] = {}


def _r2(c, name):
    return F.round(c, 2).alias(name)


def _r4(c, name):
    return F.round(c, 4).alias(name)


def _r6(c, name):
    return F.round(c, 6).alias(name)


# ---------------------------------------------------------------------------
# Reference-surface queries (single-table scan/filter/agg/having/sort/limit)
# ---------------------------------------------------------------------------


def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: Filter → partial/final Aggregate → Sort.

    Parity: TungstenAggregate partial+final planning (reference
    indexr-query-opt .../plan/physical/TungstenAggregate.java:25-130,
    planner Utils.java:24-74); Spark's HashAggregateExec does the same
    split automatically, map-side combine included.
    """
    li = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice")
    disc = F.col("l_discount")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _r2(F.sum("l_quantity"), "sum_qty"),
            _r2(F.sum(price), "sum_base_price"),
            _r4(F.sum(price * (1 - disc)), "sum_disc_price"),
            _r6(F.sum(price * (1 - disc) * (1 + F.col("l_tax"))), "sum_charge"),
            _r6(F.avg("l_quantity"), "avg_qty"),
            _r6(F.avg(price), "avg_price"),
            _r6(F.avg(disc), "avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


ORACLE["q01_pricing_summary"] = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                                            AS sum_qty,
       round(sum(l_extendedprice), 2)                                       AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 4)                    AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 6)      AS sum_charge,
       round(avg(l_quantity), 6)                                            AS avg_qty,
       round(avg(l_extendedprice), 6)                                       AS avg_price,
       round(avg(l_discount), 6)                                            AS avg_disc,
       count(*)                                                             AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q02_filter_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + conjunctive predicate scan.

    Parity: the rough-check pushdown algebra Equal/Between/In/And
    (reference segment/rc/{Equal,Between,In,And}.java; Spark adapter
    SparkFilter.java:38-97). Expressed declaratively these predicates
    reach the Parquet reader as PushedFilters and prune row groups via
    min/max stats — the same three-level skip cascade, supplied by the
    format (SURVEY.md §2.2).
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            F.col("l_quantity").between(5, 15)
            & F.col("l_returnflag").isin("A", "R")
            & (F.col("l_linestatus") == "F")
            & (F.col("l_shipdate") >= F.lit("1996-06-01").cast("timestamp_ntz"))
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            "l_returnflag",
            _r4(F.col("l_extendedprice") * (1 - F.col("l_discount")), "net_price"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


ORACLE["q02_filter_scan"] = """
SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag,
       round(l_extendedprice * (1 - l_discount), 4) AS net_price
FROM lineitem
WHERE l_quantity BETWEEN 5 AND 15
  AND l_returnflag IN ('A', 'R')
  AND l_linestatus = 'F'
  AND l_shipdate >= TIMESTAMP '1996-06-01'
ORDER BY l_orderkey, l_linenumber
"""


def q03_scalar_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar expression battery: If / Cast / Greatest / Least /
    arithmetic / bitwise / modulo.

    Parity: reference expression nodes expr/If.java, expr/Cast.java,
    expr/Greatest.java, expr/Least.java, expr/arith/*.java (SURVEY.md
    §2.1 scalar table). Floor before integer cast because Spark
    truncates double→long while DuckDB rounds — floor pins both.
    """
    o = load_table(spark, sf_dir, "orders")
    price = F.col("o_totalprice")
    key = F.col("o_orderkey")
    return (
        o.select(
            "o_orderkey",
            F.when(price > 150000, F.lit("big")).otherwise(F.lit("small")).alias("size_tag"),
            _r4((price * 0.9 + 1) / 2 - 3, "arith"),
            F.floor(price).cast("bigint").alias("price_floor"),
            F.greatest(price, F.lit(100000.0)).alias("price_floor100k"),
            F.least(price, F.lit(400000.0)).alias("price_cap400k"),
            key.bitwiseAND(F.lit(255)).alias("key_and"),
            key.bitwiseOR(F.lit(4096)).alias("key_or"),
            key.bitwiseXOR(F.lit(1024)).alias("key_xor"),
            (key % 7).alias("key_mod"),
            key.cast("string").alias("key_str"),
        )
        .orderBy("o_orderkey")
        .limit(1000)
    )


ORACLE["q03_scalar_expr"] = """
SELECT o_orderkey,
       CASE WHEN o_totalprice > 150000 THEN 'big' ELSE 'small' END AS size_tag,
       round((o_totalprice * 0.9 + 1) / 2 - 3, 4)                  AS arith,
       CAST(floor(o_totalprice) AS BIGINT)                         AS price_floor,
       greatest(o_totalprice, 100000.0)                            AS price_floor100k,
       least(o_totalprice, 400000.0)                               AS price_cap400k,
       o_orderkey & 255                                            AS key_and,
       o_orderkey | 4096                                           AS key_or,
       xor(o_orderkey, 1024)                                       AS key_xor,
       o_orderkey % 7                                              AS key_mod,
       CAST(o_orderkey AS VARCHAR)                                 AS key_str
FROM orders
ORDER BY o_orderkey
LIMIT 1000
"""


def q04_agg_having_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY + HAVING + ORDER BY + LIMIT/OFFSET.

    Parity: HAVING is parsed as Filter-over-Aggregate in the reference
    (IndexRQL.java:126-130, Analyzer.java:337-421) — identical rewrite
    in Catalyst; Limit(offset, count) parity with reference
    plan/physical/Limit.java:14-29 via df.offset(n).limit(m).
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_suppkey")
        .agg(
            _r2(F.sum("l_quantity"), "total_qty"),
            _r4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), "revenue"),
            F.count("*").alias("n_items"),
        )
        .filter(F.col("n_items") > 20)
        .orderBy(F.desc("n_items"), "l_suppkey")
        .offset(10)
        .limit(20)
    )


ORACLE["q04_agg_having_limit_offset"] = """
SELECT l_suppkey,
       round(sum(l_quantity), 2)                                  AS total_qty,
       round(sum(l_extendedprice * (1 - l_discount)), 4)          AS revenue,
       count(*)                                                   AS n_items
FROM lineitem
GROUP BY l_suppkey
HAVING count(*) > 20
ORDER BY n_items DESC, l_suppkey
LIMIT 20 OFFSET 10
"""


def q05_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) — Spark-superset (reference has no distinct
    aggregate anywhere, SURVEY.md §2.1). Catalyst plans it as a
    two-stage expand+aggregate; at scale prefer approx_count_distinct
    (HLL) when exactness isn't required.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct("l_partkey").alias("n_part"),
            F.count("*").alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


ORACLE["q05_distinct_agg"] = """
SELECT l_returnflag,
       count(DISTINCT l_suppkey) AS n_supp,
       count(DISTINCT l_partkey) AS n_part,
       count(*)                  AS n_rows
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# ---------------------------------------------------------------------------
# Spark-superset operators (delegated to host engines by the reference)
# ---------------------------------------------------------------------------


def q06_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⋈ broadcast dimension. customer (small) is explicitly
    broadcast so the 100 TB-side orders scan joins map-side with no
    shuffle — the canonical star-schema plan.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            _r2(F.sum("o_totalprice"), "revenue"),
            F.count("*").alias("n_orders"),
        )
        .orderBy("c_mktsegment")
    )


ORACLE["q06_join_broadcast"] = """
SELECT c_mktsegment,
       round(sum(o_totalprice), 2) AS revenue,
       count(*)                    AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


def q07_multi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table star join, dims broadcast, fact-fact
    (orders⋈lineitem) shuffled on the join key. Catalyst reorders and
    AQE handles skew; region/nation/supplier/customer all broadcast.
    """
    t = {n: load_table(spark, sf_dir, n) for n in
         ("region", "nation", "customer", "supplier", "orders", "lineitem")}
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(t["supplier"]),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(
            (F.col("r_name") == "EUROPE")
            & (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
        )
        .groupBy("n_name")
        .agg(_r4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), "revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


ORACLE["q07_multi_join"] = """
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'EUROPE'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


def q08_window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group via ranking window — the standard distributed
    top-K: partial top-K per partition, shuffle only per-group heads.
    Tie-broken by o_orderkey so ranks are deterministic.
    """
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("o_orderpriority", "rn", "o_orderkey", "o_totalprice")
        .orderBy("o_orderpriority", "rn")
    )


ORACLE["q08_window_topk"] = """
SELECT o_orderpriority, rn, o_orderkey, o_totalprice
FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         CAST(row_number() OVER (PARTITION BY o_orderpriority
                                 ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
  FROM orders
)
WHERE rn <= 5
ORDER BY o_orderpriority, rn
"""


def q09_sort_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global Sort + Limit(offset, count) — reference
    plan/physical/Sort.java:22-70 + Limit.java:14-29. Spark executes
    limit+offset without a full global sort materialization (TakeOrdered).
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.desc("l_extendedprice"), "l_orderkey", "l_linenumber")
        .offset(100)
        .limit(50)
    )


ORACLE["q09_sort_limit_offset"] = """
SELECT l_orderkey, l_linenumber, l_extendedprice
FROM lineitem
ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
LIMIT 50 OFFSET 100
"""


def q10_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct) — Spark-superset set operation."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s).orderBy("nationkey")


ORACLE["q10_intersect"] = """
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
ORDER BY nationkey
"""


def q11_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct) — Spark-superset set operation: parts that
    ship in bulk (quantity ≥ 45) but never in small lots (≤ 5). Both
    branches push their quantity filter into the same scan."""
    li = load_table(spark, sf_dir, "lineitem")
    bulk = li.filter(F.col("l_quantity") >= 45).select(F.col("l_partkey").alias("partkey"))
    small = li.filter(F.col("l_quantity") <= 5).select(F.col("l_partkey").alias("partkey"))
    return bulk.subtract(small).orderBy("partkey")


ORACLE["q11_except"] = """
SELECT l_partkey AS partkey FROM lineitem WHERE l_quantity >= 45
EXCEPT
SELECT l_partkey AS partkey FROM lineitem WHERE l_quantity <= 5
ORDER BY partkey
"""


def q12_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ROLLUP — hierarchical subtotals (Spark-superset;
    Catalyst plans it as a single Expand+Aggregate, one shuffle)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(_r2(F.sum("l_quantity"), "sum_qty"), F.count("*").alias("n"))
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


ORACLE["q12_rollup"] = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       count(*)                  AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
"""


def q13_date_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-part extraction + aggregation (reference DATE/DATETIME
    semantics, SURVEY.md §1.2 — epoch-millis mapped to Spark
    timestamps at the boundary)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").alias("yr"),
            F.month("o_orderdate").alias("mo"),
        )
        .agg(_r2(F.sum("o_totalprice"), "revenue"), F.count("*").alias("n_orders"))
        .orderBy("yr", "mo")
    )


ORACLE["q13_date_agg"] = """
SELECT CAST(year(o_orderdate) AS INTEGER)  AS yr,
       CAST(month(o_orderdate) AS INTEGER) AS mo,
       round(sum(o_totalprice), 2)         AS revenue,
       count(*)                            AS n_orders
FROM orders
GROUP BY 1, 2
ORDER BY yr, mo
"""


def q14_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """If() inside aggregates (reference expr/If.java composed under
    expr/agg/Sum.java) — a single scan computes all branches."""
    li = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice")
    return (
        li.groupBy("l_returnflag")
        .agg(
            _r2(F.sum(F.when(F.col("l_discount") > 0.05, price).otherwise(F.lit(0.0))), "rev_high_disc"),
            _r2(F.sum(F.when(F.col("l_quantity") < 10, price).otherwise(F.lit(0.0))), "rev_small_qty"),
            F.sum(F.when(F.col("l_tax") > 0.04, 1).otherwise(0)).alias("n_high_tax"),
        )
        .orderBy("l_returnflag")
    )


ORACLE["q14_conditional_agg"] = """
SELECT l_returnflag,
       round(sum(CASE WHEN l_discount > 0.05 THEN l_extendedprice ELSE 0.0 END), 2) AS rev_high_disc,
       round(sum(CASE WHEN l_quantity < 10 THEN l_extendedprice ELSE 0.0 END), 2)   AS rev_small_qty,
       CAST(sum(CASE WHEN l_tax > 0.04 THEN 1 ELSE 0 END) AS BIGINT)                AS n_high_tax
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def q15_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running (cumulative) aggregate per key — ordered window frame.
    Deterministic: frame order fully tie-broken by o_orderkey."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            _r2(F.sum("o_totalprice").over(w.rowsBetween(W.unboundedPreceding, 0)), "running_spend"),
            F.row_number().over(w).alias("order_seq"),
        )
        .orderBy("o_custkey", "order_seq")
    )


ORACLE["q15_window_running"] = """
SELECT o_custkey, o_orderkey,
       round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend,
       CAST(row_number() OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate, o_orderkey) AS INTEGER) AS order_seq
FROM orders
ORDER BY o_custkey, order_seq
"""


def q16_like_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE / NOT LIKE / `_` wildcard — reference rc/Like.java,
    rc/NotLike.java + SQLLike matcher (`%`, `_`; SQLLike.java:10-13).
    Prefix patterns (`Brand#1%`) push down to Parquet as
    StringStartsWith; the CMap rough index this replaces is SURVEY.md
    §2.3."""
    p = load_table(spark, sf_dir, "part")
    return (
        p.filter(
            F.col("p_brand").like("Brand#1_")
            & F.col("p_type").like("%AR%")
            & ~F.col("p_name").like("%zz%")
            & F.col("p_size").between(10, 30)
        )
        .select("p_partkey", "p_name", "p_brand", "p_type", "p_size")
        .orderBy("p_partkey")
    )


ORACLE["q16_like_filters"] = """
SELECT p_partkey, p_name, p_brand, p_type, p_size
FROM part
WHERE p_brand LIKE 'Brand#1_'
  AND p_type LIKE '%AR%'
  AND p_name NOT LIKE '%zz%'
  AND p_size BETWEEN 10 AND 30
ORDER BY p_partkey
"""


def q17_union_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL over two slices then aggregate — the HybridTable
    pattern (reference HybridTable.java:22-66: one logical table =
    historical pool ∪ realtime pool; queries run over the union).
    Catalyst pushes the aggregate below the union (partial aggs per
    branch), so the union itself costs nothing extra."""
    li = load_table(spark, sf_dir, "lineitem")
    cut = F.lit("1999-01-01").cast("timestamp_ntz")
    hist = li.filter(F.col("l_shipdate") < cut)
    rt = li.filter(F.col("l_shipdate") >= cut)
    return (
        hist.unionAll(rt)
        .groupBy("l_linestatus")
        .agg(F.count("*").alias("n"), _r2(F.sum("l_extendedprice"), "sum_price"))
        .orderBy("l_linestatus")
    )


ORACLE["q17_union_hybrid"] = """
SELECT l_linestatus, count(*) AS n, round(sum(l_extendedprice), 2) AS sum_price
FROM (
  SELECT * FROM lineitem WHERE l_shipdate <  TIMESTAMP '1999-01-01'
  UNION ALL
  SELECT * FROM lineitem WHERE l_shipdate >= TIMESTAMP '1999-01-01'
)
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


def q18_sql_embedded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's embedded-SQL smoke query shape run through
    spark.sql — SegmentScanTest.java:140-147 / IndexRQL.java:427-429:
    group by + having on a select ratio + order by aggregate + limit
    offset. Exercises the SQL entry path end to end (parse → analyze →
    optimize → plan, all Catalyst — SURVEY.md §3.1)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_orderkey,
               round(sum(l_extendedprice), 2)                    AS sum_price,
               max(l_discount)                                   AS max_disc,
               round(sum(l_extendedprice) / sum(l_quantity), 6)  AS price_per_qty
        FROM lineitem
        WHERE l_orderkey > 100 AND l_linenumber != 0
        GROUP BY l_orderkey
        HAVING sum(l_extendedprice) / sum(l_quantity) > 1000
        ORDER BY sum_price DESC, l_orderkey
        LIMIT 20 OFFSET 5
        """
    )


ORACLE["q18_sql_embedded"] = """
SELECT l_orderkey,
       round(sum(l_extendedprice), 2)                    AS sum_price,
       max(l_discount)                                   AS max_disc,
       round(sum(l_extendedprice) / sum(l_quantity), 6)  AS price_per_qty
FROM lineitem
WHERE l_orderkey > 100 AND l_linenumber != 0
GROUP BY l_orderkey
HAVING sum(l_extendedprice) / sum(l_quantity) > 1000
ORDER BY sum_price DESC, l_orderkey
LIMIT 20 OFFSET 5
"""


def q19_update_column_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UpdateColumnJob expression semantics as a query: the new
    column's value is a SQL expression over existing columns —
    the reference's own example shape `if((a > 100), a - 100, a + 100)`
    (UpdateColumnJob.java:73-105, UpdateColSchema.java:12-41). The
    offline rewrite tool (sources/tools.update_column) applies exactly
    this expression before persisting."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            "o_totalprice",
            F.expr(
                "round(if(o_totalprice > 100000, o_totalprice - 100000, "
                "o_totalprice + 100000), 2)"
            ).alias("adjusted_price"),
        )
        .orderBy("o_orderkey")
    )


ORACLE["q19_update_column_expr"] = """
SELECT o_orderkey, o_totalprice,
       round(CASE WHEN o_totalprice > 100000 THEN o_totalprice - 100000
                  ELSE o_totalprice + 100000 END, 2) AS adjusted_price
FROM orders
ORDER BY o_orderkey
"""


def q26_div_zero_compat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference division semantics: divide/modulo by zero yields 0,
    not NULL (expr/arith/Divide.java) — via functions.compat. The
    zero divisor here is manufactured (l_linenumber % 3) so all three
    branches (zero / nonzero divisor, div and mod) are exercised."""
    from indexr_spark.functions.compat import indexr_div, indexr_mod

    li = load_table(spark, sf_dir, "lineitem")
    divisor = (F.col("l_linenumber") % 3).cast("double")
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            _r4(indexr_div(F.col("l_extendedprice"), divisor), "price_div"),
            _r4(indexr_mod(F.col("l_quantity"), divisor), "qty_mod"),
        )
        .orderBy("l_orderkey", "l_linenumber")
        .limit(5000)
    )


ORACLE["q26_div_zero_compat"] = """
SELECT l_orderkey, l_linenumber,
       round(CASE WHEN CAST(l_linenumber % 3 AS DOUBLE) = 0 THEN 0
                  ELSE l_extendedprice / CAST(l_linenumber % 3 AS DOUBLE) END, 4) AS price_div,
       round(CASE WHEN CAST(l_linenumber % 3 AS DOUBLE) = 0 THEN 0
                  ELSE l_quantity % CAST(l_linenumber % 3 AS DOUBLE) END, 4)      AS qty_mod
FROM lineitem
ORDER BY l_orderkey, l_linenumber
LIMIT 5000
"""


def q28_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping over (event_type, hour) — all four grouping-set
    combinations in ONE pass: Catalyst expands the cube before the
    aggregate, so the fact table is scanned once and partial
    aggregation still applies (the reference has no grouping sets at
    all — superset). The NULLs in grouping columns are the standard
    subtotal markers."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.cube(F.col("event_type"), F.hour("ts").alias("hr"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .orderBy(
            F.col("event_type").asc_nulls_first(), F.col("hr").asc_nulls_first()
        )
    )


ORACLE["q28_cube"] = """
SELECT event_type,
       CAST(hour(CAST(ts AS TIMESTAMP)) AS INTEGER) AS hr,
       count(*)             AS n,
       round(sum(value), 2) AS sum_value
FROM events
GROUP BY CUBE (event_type, hr)
ORDER BY event_type ASC NULLS FIRST, hr ASC NULLS FIRST
"""


def q29_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS as a left-anti join: customers with no big-ticket
    order (> 300k). The filter on the right side prunes BEFORE the
    join (pushed to the orders scan); the anti join then shuffles only
    the surviving keys — at scale Catalyst picks broadcast vs
    shuffled-hash from stats, and no driver-side NOT IN list is ever
    materialized."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_nationkey")
        .orderBy("c_custkey")
    )


ORACLE["q29_anti_join"] = """
SELECT c_custkey, c_name, c_nationkey
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
ORDER BY c_custkey
"""


def q30_correlated_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-subquery shape — suppliers above their nation's
    average balance — decorrelated the way Catalyst itself rewrites
    it: aggregate once per nation, then a broadcast equi-join back
    (25 nation rows), instead of re-running the subquery per row."""
    s = load_table(spark, sf_dir, "supplier")
    # Compare against the avg ROUNDED at 6dp in both engines: the raw
    # double differs in the last bits between engines (summation
    # order), and a strict > on it would make the boundary row
    # engine-dependent.
    nation_avg = s.groupBy("s_nationkey").agg(
        F.round(F.avg("s_acctbal"), 6).alias("nation_avg")
    )
    return (
        s.join(F.broadcast(nation_avg), "s_nationkey")
        .filter(F.col("s_acctbal") > F.col("nation_avg"))
        .select("s_suppkey", "s_nationkey", "s_acctbal", "nation_avg")
        .orderBy("s_suppkey")
    )


ORACLE["q30_correlated_avg"] = """
WITH nat AS (
  SELECT s_nationkey, round(avg(s_acctbal), 6) AS nation_avg
  FROM supplier GROUP BY s_nationkey
)
SELECT s_suppkey, s_nationkey, s_acctbal, nation_avg
FROM supplier JOIN nat USING (s_nationkey)
WHERE s_acctbal > nation_avg
ORDER BY s_suppkey
"""


def q31_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join with preserved NULLs: every customer, with
    their big-ticket (> 300k) order stats or NULL if none — the other
    half of q29's anti join. Aggregate-then-join keeps the shuffle on
    the pre-shrunk aggregate, not the raw fact table."""
    c = load_table(spark, sf_dir, "customer")
    big = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 300000)
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_big"),
            F.round(F.sum("o_totalprice"), 2).alias("big_total"),
        )
    )
    return (
        c.join(big, c.c_custkey == big.o_custkey, "left")
        .select("c_custkey", "n_big", "big_total")
        .orderBy("c_custkey")
    )


ORACLE["q31_outer_join"] = """
SELECT c_custkey, n_big, big_total
FROM customer c
LEFT JOIN (
  SELECT o_custkey, count(*) AS n_big, round(sum(o_totalprice), 2) AS big_total
  FROM orders WHERE o_totalprice > 300000 GROUP BY o_custkey
) b ON b.o_custkey = c.c_custkey
ORDER BY c_custkey
"""


def q32_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS as a left-semi join (the dual of q29): suppliers that
    shipped at least one high-quantity line. The semi join streams
    the left side against a deduplicated key set — no row
    multiplication however many matches exist."""
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 49)
    return (
        s.join(li, s.s_suppkey == li.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name", "s_nationkey")
        .orderBy("s_suppkey")
    )


ORACLE["q32_semi_join"] = """
SELECT s_suppkey, s_name, s_nationkey
FROM supplier s
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity >= 49)
ORDER BY s_suppkey
"""


def q33_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape — the canonical selective multi-table composite:
    filter both fact tables at the scan, join customer→orders→lineitem,
    aggregate revenue, top-10. The date filters push into both parquet
    scans; the final top-k plans as TakeOrderedAndProject (per-partition
    heap + merge), never a global sort."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1995-03-15"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1995-03-15"
    )
    rev = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(rev, 4).alias("revenue"))
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


ORACLE["q33_shipping_priority"] = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15'
  AND l_shipdate > TIMESTAMP '1995-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def q41_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS with grouping() markers — the generalized form of
    rollup (q12) and cube (q28): three explicit aggregation grains in
    one pass (Catalyst expands + reuses the child like the others).
    Null ordering pinned on both engines (Spark defaults NULLS FIRST,
    DuckDB NULLS LAST — unpinned ordering would flip rows)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("q41_li")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(grouping(l_returnflag) AS INT)  AS g_flag,
               CAST(grouping(l_linestatus) AS INT)  AS g_status,
               count(*)                             AS n,
               round(sum(l_quantity), 2)            AS sum_qty
        FROM q41_li
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY g_flag, g_status, l_returnflag NULLS FIRST,
                 l_linestatus NULLS FIRST
        """
    )


ORACLE["q41_grouping_sets"] = """
SELECT l_returnflag, l_linestatus,
       CAST(grouping(l_returnflag) AS INTEGER) AS g_flag,
       CAST(grouping(l_linestatus) AS INTEGER) AS g_status,
       count(*)                                AS n,
       round(sum(l_quantity), 2)               AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
ORDER BY g_flag, g_status, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
"""


def q42_window_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The navigation/distribution window functions in one ordered
    pass per user: lag/lead (exact), ntile buckets, percent_rank and
    cume_dist (closed-form ratios — deterministic given the unique
    (ts, event_id) total order). One shuffle on the partition key."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "user_id",
            "event_id",
            _r2(F.lag("value", 1).over(w), "prev_value"),
            _r2(F.lead("value", 1).over(w), "next_value"),
            F.ntile(4).over(w).alias("quartile"),
            _r6(F.percent_rank().over(w), "pct_rank"),
            _r6(F.cume_dist().over(w), "cume"),
        )
        .orderBy("user_id", "event_id")
        .limit(8000)
    )


ORACLE["q42_window_suite"] = """
SELECT user_id, event_id,
       round(lag(value, 1) OVER w, 2)  AS prev_value,
       round(lead(value, 1) OVER w, 2) AS next_value,
       CAST(ntile(4) OVER w AS INTEGER)         AS quartile,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6)    AS cume
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
ORDER BY user_id, event_id
LIMIT 8000
"""


def q43_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling surface (a superset of the reference, which has
    no NULLs at all — ColumnSchema defaults instead): nullif
    manufactures NULLs, coalesce recovers them, `<=>` (null-safe
    equality, DuckDB IS NOT DISTINCT FROM) compares through them, and
    count(col) vs count(*) shows NULL-skipping aggregation."""
    li = load_table(spark, sf_dir, "lineitem")
    d = F.nullif(F.col("l_discount"), F.lit(0.0))
    t = F.nullif(F.col("l_tax"), F.lit(0.0))
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_rows"),
            F.count(d).alias("n_discounted"),
            _r2(F.sum(F.coalesce(d, F.lit(0.0))), "sum_disc"),
            F.sum(d.eqNullSafe(t).cast("int")).alias("n_null_safe_eq"),
        )
        .orderBy("l_returnflag")
    )


ORACLE["q43_null_semantics"] = """
SELECT l_returnflag,
       count(*) AS n_rows,
       count(nullif(l_discount, 0.0)) AS n_discounted,
       round(sum(coalesce(nullif(l_discount, 0.0), 0.0)), 2) AS sum_disc,
       CAST(sum(CASE WHEN nullif(l_discount, 0.0) IS NOT DISTINCT FROM
                          nullif(l_tax, 0.0) THEN 1 ELSE 0 END) AS BIGINT)
         AS n_null_safe_eq
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def q44_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function surface over the reference's DATE/DATETIME
    types (DateTimeUtil.java parity targets): truncation to several
    grains, component extraction, day arithmetic and day differences —
    all integer/date-exact, so cross-engine values are bit-identical."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return (
        o.select(
            "o_orderkey",
            F.date_trunc("quarter", d).cast("date").alias("q_start"),
            F.year(d).cast("int").alias("yr"),
            F.month(d).cast("int").alias("mo"),
            F.dayofweek(d).cast("int").alias("dow"),
            F.date_add(d.cast("date"), 30).alias("due_date"),
            F.datediff(F.lit("2001-12-31").cast("date"), d.cast("date")).alias(
                "days_to_eoy"
            ),
            F.last_day(d).alias("month_end"),
        )
        .orderBy("o_orderkey")
        .limit(5000)
    )


# DuckDB: dayofweek() is 0=Sunday; Spark's dayofweek() is 1=Sunday.
ORACLE["q44_date_functions"] = """
SELECT o_orderkey,
       CAST(date_trunc('quarter', o_orderdate) AS DATE) AS q_start,
       CAST(year(o_orderdate) AS INTEGER)  AS yr,
       CAST(month(o_orderdate) AS INTEGER) AS mo,
       CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,
       CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS due_date,
       CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '2001-12-31') AS INTEGER)
         AS days_to_eoy,
       last_day(CAST(o_orderdate AS DATE)) AS month_end
FROM orders
ORDER BY o_orderkey
LIMIT 5000
"""


def q39_pruned_catalog_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The default read path end to end, driver-checkable: lineitem is
    laid out as shipdate-sorted segments in a catalog (built once per
    sf_dir, cached on disk), then queried through `Catalog.sql` —
    which converts the pushed filter to rough-check ops, prunes the
    file list via the stats sidecar, and re-plans. Results must equal
    the oracle running the same SQL on the raw table: pruning is an
    execution detail, never a semantic one. This is the reference's
    always-on skipping cascade (IndexRRecordReader.init2:119-154)
    surfaced as a driver correctness row."""
    import hashlib
    import os
    import tempfile

    from indexr_spark.sources.catalog import Catalog, ColumnSpec, TableSpec
    from indexr_spark.sources.segments import SIDECAR_NAME, write_segments

    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    root = os.path.join(tempfile.gettempdir(), f"indexr_q39_{key}")
    cat = Catalog(root)
    if not os.path.exists(os.path.join(cat.table_dir("li"), SIDECAR_NAME)):
        cat.save(
            TableSpec(
                name="li",
                columns=[
                    ColumnSpec("l_shipdate", "datetime"),
                    ColumnSpec("l_returnflag", "varchar", index=True),
                    ColumnSpec("l_quantity", "double"),
                    ColumnSpec("l_extendedprice", "double"),
                ],
                sort_by=["l_shipdate"],
            )
        )
        write_segments(
            load_table(spark, sf_dir, "lineitem").select(
                "l_shipdate", "l_returnflag", "l_quantity", "l_extendedprice"
            ),
            cat.table_dir("li"),
            sort_by=["l_shipdate"],
            num_segments=8,
        )
    return cat.sql(
        spark,
        """
        SELECT l_returnflag,
               count(*)                          AS n,
               round(sum(l_quantity), 2)         AS sum_qty,
               round(sum(l_extendedprice), 2)    AS sum_price
        FROM li
        WHERE l_shipdate >= timestamp'2000-06-01'
        GROUP BY l_returnflag
        ORDER BY l_returnflag
        """,
    )


ORACLE["q39_pruned_catalog_scan"] = """
SELECT l_returnflag,
       count(*)                       AS n,
       round(sum(l_quantity), 2)      AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_price
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '2000-06-01'
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def q40_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array function suite over the embedding column:
    aggregate (fold), filter, exists, transform, zip_with, slice,
    array_min/max — the in-row compute surface the similarity ops are
    built from, exercised as a driver correctness row.

    Cross-engine determinism: every fold starts from an explicit 0.0
    init and runs left-to-right, and +/*/abs are IEEE-correctly
    rounded, so Spark and DuckDB produce bit-identical doubles; the
    trailing `+ 0.0` normalizes -0.0 to 0.0 on both engines. All
    in-row, zero shuffles before the oracle-determinism sort."""
    e = load_table(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")

    def fold_sum(arr):
        return F.aggregate(arr, F.lit(0.0), lambda a, x: a + x)

    l2_sq = F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x)
    rev_dot = fold_sum(F.zip_with(v, F.reverse(v), lambda a, b: a * b))
    return e.select(
        "vec_id",
        (F.round(l2_sq, 6) + 0.0).alias("l2_sq"),
        F.size(F.filter(v, lambda x: x > 0)).alias("n_pos"),
        F.exists(v, lambda x: F.abs(x) > 0.3).alias("has_big"),
        (F.round(fold_sum(F.slice(v, 1, 8)), 6) + 0.0).alias("head_sum"),
        (F.round(fold_sum(F.transform(v, lambda x: F.abs(x) * 2.0)), 6) + 0.0)
        .alias("scaled_l1"),
        (F.round(rev_dot, 6) + 0.0).alias("rev_dot"),
        (F.round(F.array_min(v), 6) + 0.0).alias("v_min"),
        (F.round(F.array_max(v), 6) + 0.0).alias("v_max"),
    ).orderBy("vec_id")


ORACLE["q40_array_functions"] = """
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
SELECT vec_id,
  round(list_reduce(list_prepend(0.0::DOUBLE, e), (a,b) -> a + b*b), 6) + 0.0
    AS l2_sq,
  CAST(len(list_filter(e, x -> x > 0)) AS INTEGER) AS n_pos,
  len(list_filter(e, x -> abs(x) > 0.3)) > 0 AS has_big,
  round(list_reduce(list_prepend(0.0::DOUBLE, e[1:8]), (a,b) -> a + b), 6)
    + 0.0 AS head_sum,
  round(list_reduce(list_prepend(0.0::DOUBLE,
          list_transform(e, x -> abs(x) * 2.0)), (a,b) -> a + b), 6) + 0.0
    AS scaled_l1,
  round(list_reduce(list_prepend(0.0::DOUBLE,
          list_transform(generate_series(1, len(e)),
                         i -> e[i] * e[len(e) - i + 1])),
        (a,b) -> a + b), 6) + 0.0 AS rev_dot,
  round(list_aggregate(e, 'min'), 6) + 0.0 AS v_min,
  round(list_aggregate(e, 'max'), 6) + 0.0 AS v_max
FROM v
ORDER BY vec_id
"""


def q45_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function surface (reference UDF-less string ops +
    superset): case, length, search, translate, padding, reverse,
    split_part, levenshtein, ascii, repeat, concat_ws, substring.
    All JVM-side codegen expressions — narrow, no shuffle before the
    determinism sort."""
    p = load_table(spark, sf_dir, "part")
    name = F.col("p_name")
    return p.select(
        "p_partkey",
        F.upper(name).alias("up"),
        F.length(name).alias("nlen"),
        F.instr(name, "e").cast("int").alias("pos_e"),
        F.translate(name, "aeiou", "AEIOU").alias("vowels_up"),
        F.lpad(F.col("p_brand"), 12, "*").alias("brand_pad"),
        F.reverse(name).alias("rev"),
        F.split_part(name, F.lit(" "), F.lit(1)).alias("first_word"),
        F.levenshtein(name, F.lit("small ring")).cast("int").alias("lev"),
        F.ascii(name).cast("int").alias("first_cp"),
        F.repeat(F.col("p_type"), 2).alias("type2"),
        F.concat_ws("|", "p_brand", "p_type").alias("bt"),
        F.substring(name, 2, 5).alias("mid"),
    ).orderBy("p_partkey")


ORACLE["q45_string_functions"] = """
SELECT p_partkey,
       upper(p_name)                                   AS up,
       CAST(length(p_name) AS INTEGER)                 AS nlen,
       CAST(strpos(p_name, 'e') AS INTEGER)            AS pos_e,
       translate(p_name, 'aeiou', 'AEIOU')             AS vowels_up,
       lpad(p_brand, 12, '*')                          AS brand_pad,
       reverse(p_name)                                 AS rev,
       split_part(p_name, ' ', 1)                      AS first_word,
       CAST(levenshtein(p_name, 'small ring') AS INTEGER) AS lev,
       CAST(ascii(p_name) AS INTEGER)                  AS first_cp,
       repeat(p_type, 2)                               AS type2,
       concat_ws('|', p_brand, p_type)                 AS bt,
       substring(p_name, 2, 5)                         AS mid
FROM part
ORDER BY p_partkey
"""


def q46_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subqueries — uncorrelated in WHERE (compare to the
    global average) and in SELECT (share of the global total).
    Spark-superset (the reference grammar has no subqueries,
    SURVEY.md §2.1); Catalyst executes the scalar subquery once as a
    separate tiny job and folds the result into the main plan as a
    literal, so at 100 TB the fact scan still runs exactly once with
    the comparison inlined."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        SELECT o_orderpriority,
               count(*) AS n_above,
               round(sum(o_totalprice), 2) AS sum_price,
               round(sum(o_totalprice) / (SELECT sum(o_totalprice) FROM orders_v), 6)
                 AS share_of_total
        FROM orders_v
        WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders_v)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


ORACLE["q46_scalar_subquery"] = """
SELECT o_orderpriority,
       count(*) AS n_above,
       round(CAST(sum(o_totalprice) AS DOUBLE), 2) AS sum_price,
       round(CAST(sum(o_totalprice) AS DOUBLE)
             / (SELECT CAST(sum(o_totalprice) AS DOUBLE) FROM orders), 6)
         AS share_of_total
FROM orders
WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


QUERIES = {
    "q01_pricing_summary": q01_pricing_summary,
    "q02_filter_scan": q02_filter_scan,
    "q03_scalar_expr": q03_scalar_expr,
    "q04_agg_having_limit_offset": q04_agg_having_limit_offset,
    "q05_distinct_agg": q05_distinct_agg,
    "q06_join_broadcast": q06_join_broadcast,
    "q07_multi_join": q07_multi_join,
    "q08_window_topk": q08_window_topk,
    "q09_sort_limit_offset": q09_sort_limit_offset,
    "q10_intersect": q10_intersect,
    "q11_except": q11_except,
    "q12_rollup": q12_rollup,
    "q13_date_agg": q13_date_agg,
    "q14_conditional_agg": q14_conditional_agg,
    "q15_window_running": q15_window_running,
    "q16_like_filters": q16_like_filters,
    "q17_union_hybrid": q17_union_hybrid,
    "q18_sql_embedded": q18_sql_embedded,
    "q19_update_column_expr": q19_update_column_expr,
    "q26_div_zero_compat": q26_div_zero_compat,
    "q28_cube": q28_cube,
    "q29_anti_join": q29_anti_join,
    "q30_correlated_avg": q30_correlated_avg,
    "q31_outer_join": q31_outer_join,
    "q32_semi_join": q32_semi_join,
    "q33_shipping_priority": q33_shipping_priority,
    "q39_pruned_catalog_scan": q39_pruned_catalog_scan,
    "q40_array_functions": q40_array_functions,
    "q45_string_functions": q45_string_functions,
    "q41_grouping_sets": q41_grouping_sets,
    "q42_window_suite": q42_window_suite,
    "q43_null_semantics": q43_null_semantics,
    "q44_date_functions": q44_date_functions,
    "q46_scalar_subquery": q46_scalar_subquery,
}
