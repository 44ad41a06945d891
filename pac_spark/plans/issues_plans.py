"""Registry entries for the issues pipeline (flagship)."""

from __future__ import annotations

from pac_spark.functions.exact import money_sum_sql
from pac_spark.functions.normalize import PY_SPLIT_WS
from pac_spark.operators import issues
from pac_spark.plans.spec import QuerySpec

__all__ = ["SPECS"]


def _bucket(status: str) -> str:
    return money_sum_sql(f"CASE WHEN status = '{status}' THEN amount ELSE 0.0 END")


_GRID_CTES = f"""
fact AS (
    SELECT o_custkey AS company_id,
           trim(o_orderpriority) AS issue_name,
           o_orderstatus AS status,
           o_totalprice AS amount
    FROM orders
    WHERE o_custkey IS NOT NULL
      AND o_orderpriority IS NOT NULL AND trim(o_orderpriority) <> ''
), dim AS (
    SELECT c_custkey AS company_id,
           upper(trim(c_name)) AS company_name,
           c_mktsegment AS segment
    FROM customer
), agg AS (
    SELECT f.company_id, d.company_name, d.segment, f.issue_name,
           {_bucket('F')} AS against,
           {_bucket('P')} AS neutral,
           {_bucket('O')} AS pro
    FROM fact f JOIN dim d USING (company_id)
    GROUP BY 1, 2, 3, 4
), tot AS (
    SELECT *, ROUND(against + neutral + pro, 2) AS total FROM agg
), grid AS (
    SELECT company_id, company_name, segment, issue_name,
           against, neutral, pro, total,
           CASE WHEN total = 0 THEN 'NEUTRAL'
                WHEN against >= neutral AND against >= pro THEN 'AGAINST'
                WHEN pro >= neutral AND pro >= against THEN 'PRO'
                ELSE 'NEUTRAL' END AS position
    FROM tot
)
"""

_FLAGSHIP_ORACLE = f"""
WITH {_GRID_CTES}
SELECT * FROM grid ORDER BY company_id, issue_name
"""


def _money_str(col: str) -> str:
    # DECIMAL(18,2) -> VARCHAR renders identically in Spark and DuckDB
    # ('123.45', '0.00', no E-notation) — see company_issue_summary
    return f"CAST(CAST({col} AS DECIMAL(18,2)) AS VARCHAR)"


_SUMMARY_ORACLE = f"""
WITH {_GRID_CTES}
SELECT company_id, company_name, segment,
       to_json(LIST({{
           issue_name: issue_name,
           against: {_money_str('against')},
           neutral: {_money_str('neutral')},
           pro: {_money_str('pro')},
           total: {_money_str('total')},
           position: position
       }} ORDER BY issue_name)) AS issues,
       CAST(COUNT(*) AS BIGINT) AS n_issues
FROM grid
GROUP BY 1, 2, 3
ORDER BY company_id
"""

_VALIDATION_ORACLE = """
WITH fact AS (
    SELECT o_custkey AS company_id, trim(o_orderpriority) AS issue_name
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o_custkey IS NOT NULL
      AND o_orderpriority IS NOT NULL AND trim(o_orderpriority) <> ''
)
SELECT company_id, CAST(COUNT(DISTINCT issue_name) AS BIGINT) AS n_issues
FROM fact
GROUP BY company_id
HAVING COUNT(DISTINCT issue_name) != 5
ORDER BY company_id
"""


_ROLES_ORACLE = f"""
WITH fact AS (
    SELECT o_custkey AS company_id,
           trim(o_orderpriority) AS issue_name,
           o_totalprice AS amount
    FROM orders
    WHERE o_custkey IS NOT NULL
      AND o_orderpriority IS NOT NULL AND trim(o_orderpriority) <> ''
), dim AS (
    SELECT c_custkey AS company_id, toks[1] AS name_first,
           CASE WHEN len(toks) >= 2 THEN toks[-1] ELSE '' END AS name_last
    FROM (
        SELECT c_custkey,
               string_split(lower(trim(regexp_replace(c_name, '[{PY_SPLIT_WS}]+', ' ', 'g'))), ' ')
                   AS toks
        FROM customer
    )
)
SELECT f.company_id, d.name_first, d.name_last,
       CAST(COUNT(DISTINCT issue_name) AS BIGINT) AS n_issues,
       {money_sum_sql('amount')} AS total_amount
FROM fact f JOIN dim d USING (company_id)
GROUP BY 1, 2, 3
ORDER BY company_id
"""


_ENVELOPE_ORACLE = f"""
WITH {_GRID_CTES},
s AS (
    SELECT CAST(COUNT(DISTINCT company_id) AS BIGINT) AS total_companies,
           CAST(COUNT(*) AS BIGINT) AS total_issues
    FROM grid
),
d AS (SELECT strftime(MAX(o_orderdate), '%Y-%m-%d') AS as_of FROM orders)
SELECT to_json({{
    export_kind: 'issues_review',
    as_of: d.as_of,
    total_companies: s.total_companies,
    total_issues: s.total_issues,
    avg_issues_per_company:
        CAST(CAST(CAST(s.total_issues AS DOUBLE) / s.total_companies
             AS DECIMAL(18,2)) AS VARCHAR)
}}) AS export_info
FROM s, d
"""


def _validation(spark, sf_dir):
    return issues.issue_count_validation(spark, sf_dir, expected=5)


SPECS = [
    QuerySpec("flagship_company_positions", issues.company_issue_positions, _FLAGSHIP_ORACLE),
    QuerySpec("issues_count_validation", _validation, _VALIDATION_ORACLE),
    QuerySpec("company_issue_summary", issues.company_issue_summary, _SUMMARY_ORACLE),
    QuerySpec(
        "flagship_roles_resolved",
        issues.company_positions_role_resolved,
        _ROLES_ORACLE,
    ),
    QuerySpec("export_envelope", issues.export_envelope, _ENVELOPE_ORACLE),
]
