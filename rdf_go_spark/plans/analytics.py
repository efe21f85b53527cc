"""General analytics queries over the TPC-H-ish tables + events stream —
the relational operator surface (joins incl. broadcast, aggregations,
windows, top-k) the KG pipeline composes from, each with a DuckDB oracle.

Float policy: every aggregate over doubles is rounded (2–6 dp) so the
driver's value-hash comparison is stable across engines despite summation
order; sums of money-scale doubles at sf0.01 are well within rounding slack.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: the canonical shuffle-light
    map-side-combine aggregation."""
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2002-09-01"))
    return (li.groupBy("l_returnflag", "l_linestatus")
            .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                 F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
                 F.round(F.sum(F.col("l_extendedprice") *
                               (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
                 F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
                 F.round(F.avg("l_discount"), 4).alias("avg_disc"),
                 F.count("*").alias("count_order")))


def q_pricing_summary_oracle() -> str:
    return """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_discount), 4) AS avg_disc,
       count(*)::BIGINT AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2002-09-01'
GROUP BY l_returnflag, l_linestatus
""".strip()


def q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue top-20 by customer: broadcast dim join + agg + top-k.
    customer/nation/region are the broadcast side; orders streams."""
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    joined = (orders
              .join(F.broadcast(customer),
                    orders["o_custkey"] == customer["c_custkey"])
              .join(F.broadcast(nation),
                    customer["c_nationkey"] == nation["n_nationkey"]))
    agg = (joined.groupBy("c_custkey", "c_name", "n_name")
           .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"),
                F.count("*").alias("n_orders")))
    return (agg.orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
            .limit(20))


def q_top_customers_oracle() -> str:
    return """
SELECT c_custkey, c_name, n_name,
       round(sum(o_totalprice), 2) AS revenue,
       count(*)::BIGINT AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
""".strip()


def q_events_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event stats + windowed previous-event gap — windows and
    event-time ordering over the stream table."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.col("ts").cast("timestamp").cast("double")
    prev_epoch = F.col("prev_ts").cast("timestamp").cast("double")
    gaps = (ev.withColumn("prev_ts", F.lag("ts").over(w))
            .withColumn("gap_s", epoch - prev_epoch))
    return (gaps.groupBy("user_id")
            .agg(F.count("*").alias("n_events"),
                 F.count_distinct("event_type").alias("n_types"),
                 F.round(F.sum("value"), 2).alias("total_value"),
                 F.round(F.avg("gap_s"), 3).alias("avg_gap_s"),
                 F.date_format(F.max("ts"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
                 .alias("last_ts")))


def q_events_user_stats_oracle() -> str:
    return """
WITH g AS (
  SELECT user_id, event_id, event_type, value, ts,
         epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id)) AS gap_s
  FROM events
)
SELECT user_id, count(*)::BIGINT AS n_events,
       count(DISTINCT event_type)::BIGINT AS n_types,
       round(sum(value), 2) AS total_value,
       round(avg(gap_s), 3) AS avg_gap_s,
       strftime(max(ts), '%Y-%m-%dT%H:%M:%S.%f') AS last_ts
FROM g GROUP BY user_id
""".strip()


def q_orders_without_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join — the checkpoint-resume primitive ("partitions not yet
    committed", SURVEY.md §2.4): orders with no lineitem rows."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey").distinct()
    return (orders.join(li, orders["o_orderkey"] == li["l_orderkey"],
                        "left_anti")
            .select("o_orderkey", "o_custkey", "o_orderstatus"))


def q_orders_without_lineitems_oracle() -> str:
    return """
SELECT o_orderkey, o_custkey, o_orderstatus
FROM orders
WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
""".strip()


def q_repeat_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set op (intersect): customers ordering in both halves of the
    window, plus a semi-join back to customer attributes."""
    orders = _t(spark, sf_dir, "orders")
    early = orders.filter(F.col("o_orderdate") < F.lit("2001-01-01")) \
        .select("o_custkey")
    late = orders.filter(F.col("o_orderdate") >= F.lit("2001-01-01")) \
        .select("o_custkey")
    both = early.intersect(late)
    customer = _t(spark, sf_dir, "customer")
    return (customer.join(both,
                          customer["c_custkey"] == both["o_custkey"],
                          "left_semi")
            .select("c_custkey", "c_name", "c_mktsegment"))


def q_repeat_buyers_oracle() -> str:
    return """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE c_custkey IN (
  SELECT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '2001-01-01'
  INTERSECT
  SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '2001-01-01'
)
""".strip()


def q_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: 30-min-gap session ids via window cumsum — the
    standard stateful-stream shape expressed in batch."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = (ev.withColumn("prev_ts", F.lag("ts").over(w))
              .withColumn("new_session",
                          (F.col("prev_ts").isNull() |
                           (F.col("ts").cast("timestamp").cast("double") -
                            F.col("prev_ts").cast("timestamp").cast("double")
                            > 1800)).cast("int")))
    sess = marked.withColumn("session_seq", F.sum("new_session").over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
    return (sess.groupBy("user_id", "session_seq")
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 2).alias("session_value"))
            .withColumn("session_seq", F.col("session_seq").cast("long")))


def q_sessionize_events_oracle() -> str:
    return """
WITH marked AS (
  SELECT user_id, event_id, value, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, value,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM marked
)
SELECT user_id, session_seq::BIGINT AS session_seq,
       count(*)::BIGINT AS n_events,
       round(sum(value), 2) AS session_value
FROM sess GROUP BY user_id, session_seq
""".strip()
