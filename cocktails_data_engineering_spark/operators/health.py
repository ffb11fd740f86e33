"""Composed table-health report: one flagged-findings table unifying the
storage, schema, and distribution advisors.

A warehouse on-call does not read four advisor tables; they read ONE
health report whose rows say "this check, on this subject, measured this,
and it needs attention or not".  This module composes the REGISTERED
advisors — encoding recommendations, functional-dependency violations,
join-key skew, and the data-quality expectations — into that table, by
reusing both each operator's Spark plan (via the registry, so the report
can never drift from what the standalone queries compute) and each
operator's oracle SQL (wrapped as subqueries, so the whole composition
stays under the full value hash).

This module is imported LAST in plans/queries._OPERATOR_MODULES: the
oracle texts of the component queries must already be registered
(the profiling._spearman_oracle precedent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import get_spec, register

SKEW_FLAG_RATIO = 10.0  # a key hotter than 10x the mean key gets flagged

_ENC_SQL = get_spec("encoding_plan_audit").oracle
_FD_SQL = get_spec("functional_dependency_audit").oracle
_SKEW_SQL = get_spec("skew_key_diagnosis").oracle
_DQ_SQL = get_spec("dq_orders_expectations").oracle


@register(
    "table_health_report",
    oracle=f"""
SELECT * FROM (
SELECT 'encoding' AS check_name, column_name AS subject,
       'avg_run_len' AS metric, avg_run_len AS value,
       CAST(CASE WHEN encoding = 'PLAIN' THEN 1 ELSE 0 END AS INT) AS flagged
FROM ({_ENC_SQL}) enc
UNION ALL
SELECT 'functional_dependency',
       table_name || ':' || determinant || '->' || dependent,
       'violating_groups', CAST(n_violating_groups AS DOUBLE),
       CAST(CASE WHEN holds = 0 THEN 1 ELSE 0 END AS INT)
FROM ({_FD_SQL}) fd
UNION ALL
SELECT 'join_key_skew', 'events.user_id:' || CAST(user_id AS VARCHAR),
       'skew_ratio', skew_ratio,
       CAST(CASE WHEN skew_ratio > {SKEW_FLAG_RATIO} THEN 1 ELSE 0 END AS INT)
FROM ({_SKEW_SQL}) sk
UNION ALL
SELECT 'dq_expectation', rule, 'violations', CAST(n_violations AS DOUBLE),
       CAST(CASE WHEN n_violations > 0 THEN 1 ELSE 0 END AS INT)
FROM ({_DQ_SQL}) dq
) u
ORDER BY check_name, subject, metric
""",
)
def table_health_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed warehouse-health table: every advisor's findings as
    (check_name, subject, metric, value, flagged) rows — encoding
    recommendations (flag = a column stuck on PLAIN), functional
    dependencies (flag = assumed key broken), join-key skew (flag = a
    key hotter than {SKEW_FLAG_RATIO}× the mean), and the declarative
    data-quality expectations (flag = any violation).  Each leg IS the
    registered operator reused through the registry, so this report and
    the standalone queries cannot disagree.

    Plan at 100 TB: the component plans run as-is (each documented in
    its own operator); the reshape is a projection per leg and the union
    is rows = Σ component findings — metadata-sized."""
    enc = get_spec("encoding_plan_audit").fn(spark, sf_dir).select(
        F.lit("encoding").alias("check_name"),
        F.col("column_name").alias("subject"),
        F.lit("avg_run_len").alias("metric"),
        F.col("avg_run_len").alias("value"),
        (F.col("encoding") == "PLAIN").cast("int").alias("flagged"),
    )
    fd = get_spec("functional_dependency_audit").fn(spark, sf_dir).select(
        F.lit("functional_dependency").alias("check_name"),
        F.concat(
            F.col("table_name"),
            F.lit(":"),
            F.col("determinant"),
            F.lit("->"),
            F.col("dependent"),
        ).alias("subject"),
        F.lit("violating_groups").alias("metric"),
        F.col("n_violating_groups").cast("double").alias("value"),
        (F.col("holds") == 0).cast("int").alias("flagged"),
    )
    sk = get_spec("skew_key_diagnosis").fn(spark, sf_dir).select(
        F.lit("join_key_skew").alias("check_name"),
        F.concat(
            F.lit("events.user_id:"), F.col("user_id").cast("string")
        ).alias("subject"),
        F.lit("skew_ratio").alias("metric"),
        F.col("skew_ratio").alias("value"),
        (F.col("skew_ratio") > SKEW_FLAG_RATIO).cast("int").alias("flagged"),
    )
    dq = get_spec("dq_orders_expectations").fn(spark, sf_dir).select(
        F.lit("dq_expectation").alias("check_name"),
        F.col("rule").alias("subject"),
        F.lit("violations").alias("metric"),
        F.col("n_violations").cast("double").alias("value"),
        (F.col("n_violations") > 0).cast("int").alias("flagged"),
    )
    return (
        enc.unionByName(fd)
        .unionByName(sk)
        .unionByName(dq)
        .orderBy("check_name", "subject", "metric")
    )
