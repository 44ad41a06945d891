"""Registry entries + DuckDB oracles for entity resolution.

The oracle reproduces the full pipeline in ANSI SQL: record derivation,
blocked pair scoring (levenshtein token-sort ratios + weighted blend in
the same expression order as the Spark plan), connected components via
a recursive CTE, consolidation, and link fan-out. Clustering therefore
gets a *real* correctness check, not a rows-only count.
"""

from __future__ import annotations

from pac_spark.functions.exact import exact_avg_sql
from pac_spark.functions.normalize import PY_SPLIT_WS
from pac_spark.operators import dedup as _D
from pac_spark.operators import entity_resolution as ER
from pac_spark.plans.spec import QuerySpec

__all__ = ["SPECS"]


def _norm(x: str) -> str:
    """Mirror of functions.normalize.normalize_string: the whitespace
    class is the exact Python str.split() set (the reference's
    ``' '.join(s.split())``), not RE2's ASCII-only ``\\s`` — the class
    constant is interpolated from the one Spark uses so the two
    engines cannot drift (code-review r8)."""
    return f"lower(trim(regexp_replace({x}, '[{PY_SPLIT_WS}]+', ' ', 'g')))"


def _tsk(x: str) -> str:
    return f"array_to_string(list_sort(string_split({_norm(x)}, ' ')), ' ')"


def _ratio(a: str, b: str) -> str:
    longest = f"greatest(length({a}), length({b}))"
    return (
        f"(CASE WHEN {longest} = 0 THEN 100.0 "
        f"ELSE 100.0 * (1.0 - levenshtein({a}, {b}) / {longest}) END)"
    )


def _present(fa: str, fb: str) -> str:
    """Field present iff its NORMALIZED form is non-empty — the
    reference's ``if name1 and name2:`` where ``name1`` is already
    normalized (executive_review_tool.py:200-231). ``_norm(NULL)`` is
    NULL and ``NULL <> ''`` is NULL, which the consuming CASE treats
    as absent, so no explicit IS NOT NULL is needed; stated anyway."""
    return (
        f"({fa} IS NOT NULL AND {fb} IS NOT NULL "
        f"AND {_norm(fa)} <> '' AND {_norm(fb)} <> '')"
    )


_TITLE_CASE = (
    "CASE c_mktsegment WHEN 'AUTOMOBILE' THEN 'VP Operations' "
    "WHEN 'BUILDING' THEN 'Director' WHEN 'FURNITURE' THEN 'Chief Officer' "
    "WHEN 'HOUSEHOLD' THEN 'Analyst' WHEN 'MACHINERY' THEN 'Manager' END"
)

_RECORDS_CTE = f"""
base AS (
    SELECT c_custkey, c_name, c_mktsegment, n_name AS company_src
    FROM customer JOIN nation ON c_nationkey = n_nationkey
),
records AS (
    SELECT c_custkey * 10 AS record_id, c_name AS name,
           {_TITLE_CASE} AS title,
           company_src AS company,
           'addr_' || CAST(c_custkey % 97 AS VARCHAR) || ' ' || company_src AS address
    FROM base
    UNION ALL
    SELECT c_custkey * 10 + 1, c_name || ' Jr Xy', NULL, company_src, NULL
    FROM base WHERE c_custkey % 3 = 0
    UNION ALL
    SELECT c_custkey * 10 + 2, 'K' || substring(c_name, 2, 17),
           {_TITLE_CASE}, lower(company_src),
           'addr_' || CAST(c_custkey % 97 + 1 AS VARCHAR) || ' ' || company_src
    FROM base WHERE c_custkey % 5 = 0
    UNION ALL
    SELECT c_custkey * 10 + 3, replace(c_name, 'Customer', 'Supplier'),
           'Supplier Rep', company_src, NULL
    FROM base WHERE c_custkey % 7 = 0
)
"""

# the two-sided record projection every pair source emits, so the
# field-scoring CTE below composes with any blocking strategy
_PAIR_COLS = """a.record_id AS id_a, b.record_id AS id_b,
           a.name AS name_a, b.name AS name_b,
           a.title AS title_a, b.title AS title_b,
           a.address AS address_a, b.address AS address_b,
           a.company AS company_a, b.company AS company_b"""

# per-field raw scores (NULL when either side absent), then the blend in
# the same addition order as the Spark plan: name, address, title,
# company. Expects a CTE named raw_pairs — composes with any blocking.
_FIELD_SCORED_CTE = f"""
field_scores AS (
    SELECT id_a, id_b,
        CASE WHEN {_present('name_a', 'name_b')}
             THEN {_ratio(_tsk('name_a'), _tsk('name_b'))} END AS ns,
        CASE WHEN {_present('address_a', 'address_b')}
             THEN {_ratio(_tsk('address_a'), _tsk('address_b'))} END AS addrs,
        CASE WHEN {_present('title_a', 'title_b')}
             THEN {_ratio(_tsk('title_a'), _tsk('title_b'))} END AS ts,
        CASE WHEN {_present('company_a', 'company_b')}
             THEN {_ratio(_norm('company_a'), _norm('company_b'))} END AS cs
    FROM raw_pairs
),
scored AS (
    SELECT id_a, id_b,
        ROUND(ns, 6) AS name_score,
        ROUND(ts, 6) AS title_score,
        ROUND(addrs, 6) AS address_score,
        ROUND(cs, 6) AS company_score,
        ROUND(
            CASE WHEN (CASE WHEN ns IS NOT NULL THEN 0.5 ELSE 0.0 END
                     + CASE WHEN addrs IS NOT NULL THEN 0.25 ELSE 0.0 END
                     + CASE WHEN ts IS NOT NULL THEN 0.15 ELSE 0.0 END
                     + CASE WHEN cs IS NOT NULL THEN 0.1 ELSE 0.0 END) > 0
            THEN (CASE WHEN ns IS NOT NULL THEN ns * 0.5 ELSE 0.0 END
                + CASE WHEN addrs IS NOT NULL THEN addrs * 0.25 ELSE 0.0 END
                + CASE WHEN ts IS NOT NULL THEN ts * 0.15 ELSE 0.0 END
                + CASE WHEN cs IS NOT NULL THEN cs * 0.1 ELSE 0.0 END)
               / (CASE WHEN ns IS NOT NULL THEN 0.5 ELSE 0.0 END
                + CASE WHEN addrs IS NOT NULL THEN 0.25 ELSE 0.0 END
                + CASE WHEN ts IS NOT NULL THEN 0.15 ELSE 0.0 END
                + CASE WHEN cs IS NOT NULL THEN 0.1 ELSE 0.0 END)
            END, 6) AS overall_score
    FROM field_scores
)
"""

_SCORED_CTE = f"""
blocked AS (
    SELECT *, regexp_replace(name, '[^0-9]', '', 'g') AS block FROM records
),
raw_pairs AS (
    SELECT {_PAIR_COLS}
    FROM blocked a JOIN blocked b
      ON a.block = b.block AND a.record_id < b.record_id
),
{_FIELD_SCORED_CTE.strip()}
"""

_CLUSTERS_CTE = f"""
edges AS (SELECT id_a, id_b FROM scored WHERE overall_score >= {ER.GROUP_THRESHOLD}),
und AS (SELECT id_a AS a, id_b AS b FROM edges
        UNION ALL SELECT id_b, id_a FROM edges),
walk(node, label) AS (
    SELECT record_id, record_id FROM records
    UNION
    SELECT u.b, w.label FROM walk w JOIN und u ON w.node = u.a
),
clusters AS (
    SELECT node AS record_id, CAST(MIN(label) AS BIGINT) AS cluster_id
    FROM walk GROUP BY node
)
"""

_PRELUDE = f"WITH RECURSIVE {_RECORDS_CTE.strip()}, {_SCORED_CTE.strip()}, {_CLUSTERS_CTE.strip()}"

_ER_RECORDS = f"""
WITH {_RECORDS_CTE.strip()}
SELECT record_id, name, title, company, address
FROM records ORDER BY record_id
"""

_ER_PAIRS = f"""
WITH {_RECORDS_CTE.strip()}, {_SCORED_CTE.strip()}
SELECT id_a, id_b, name_score, title_score, address_score, company_score, overall_score
FROM scored ORDER BY id_a, id_b
"""

_ER_CLUSTERS = f"""
{_PRELUDE}
SELECT record_id, cluster_id FROM clusters ORDER BY record_id
"""

# best-record completeness counts RAW truthiness — the reference's
# ``if v and not pd.isna(v)`` (executive_review_tool.py:540), so a
# whitespace-only field is PRESENT here while companies/titles below
# collect by NORMALIZED non-emptiness (the :330/:560 rules) — the r9
# presence decision record, stated identically in
# entity_resolution.er_consolidated
_NONNULL = " + ".join(
    f"(CASE WHEN {c} IS NOT NULL AND {c} <> '' THEN 1 ELSE 0 END)"
    for c in ("name", "title", "company", "address")
)


def _collect_present(c: str) -> str:
    """Sorted distinct normalized values, '|'-joined, NORMALIZED
    non-emptiness presence — the oracle twin of
    ``entity_resolution.collect_normalized_present``. COALESCE: Spark's
    collect_set over zero qualifying rows is an EMPTY ARRAY (-> ''
    after array_join) while DuckDB's filtered LIST is NULL — all-NULL
    clusters must render '' in both engines."""
    return (
        f"COALESCE(array_to_string(list_sort(LIST(DISTINCT {_norm(c)}) "
        f"FILTER (WHERE {_norm(c)} IS NOT NULL AND {_norm(c)} <> '')), "
        f"'|'), '')"
    )

_CONSOLIDATED_BODY = f"""
{_PRELUDE},
clustered AS (
    SELECT r.*, c.cluster_id FROM records r JOIN clusters c USING (record_id)
),
best AS (
    SELECT cluster_id, name AS best_name, title AS best_title
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY cluster_id
            ORDER BY ({_NONNULL}) DESC, record_id ASC) AS rn
        FROM clustered
    ) WHERE rn = 1
),
members AS (
    SELECT cluster_id,
           CAST(COUNT(*) AS BIGINT) AS grouped_from,
           {_collect_present('company')} AS companies,
           {_collect_present('title')} AS titles
    FROM clustered GROUP BY cluster_id
),
-- separate aggregate: DuckDB 1.0.0 segfaults when LIST(DISTINCT..FILTER)
-- and LIST(struct ORDER BY..) share one GROUP BY
variations AS (
    SELECT cluster_id,
           to_json(LIST({{record_id: record_id, name: name, title: title,
                          company: company, address: address}}
                   ORDER BY record_id)) AS all_variations
    FROM clustered GROUP BY cluster_id
),
pair_scores AS (
    SELECT ca.cluster_id, {exact_avg_sql('s.overall_score', 6)} AS avg_similarity
    FROM scored s
    JOIN clusters ca ON s.id_a = ca.record_id
    JOIN clusters cb ON s.id_b = cb.record_id
    WHERE ca.cluster_id = cb.cluster_id
    GROUP BY ca.cluster_id
)
SELECT m.cluster_id, b.best_name, b.best_title, m.grouped_from,
       m.companies, m.titles, v.all_variations,
       COALESCE(p.avg_similarity, 100.0) AS avg_similarity,
       CASE WHEN COALESCE(p.avg_similarity, 100.0) >= {ER.HIGH_THRESHOLD} THEN 'high'
            WHEN COALESCE(p.avg_similarity, 100.0) >= {ER.GROUP_THRESHOLD} THEN 'uncertain'
            ELSE 'low' END AS confidence
FROM members m
JOIN best b USING (cluster_id)
JOIN variations v USING (cluster_id)
LEFT JOIN pair_scores p USING (cluster_id)
"""

_ER_CONSOLIDATED = f"{_CONSOLIDATED_BODY}\nORDER BY cluster_id"

# P7 approved-group gate: semi-join against the deterministic approvals
# set (high groups + every other uncertain group)
_ER_APPROVED = f"""
WITH body AS MATERIALIZED (
    {_CONSOLIDATED_BODY}
)
SELECT * FROM body
WHERE cluster_id IN (
    SELECT cluster_id FROM body
    WHERE confidence = 'high'
       OR (confidence = 'uncertain' AND (cluster_id // 10) % 2 = 0)
)
ORDER BY cluster_id
"""
# ^ MATERIALIZED: the body embeds the full ER pipeline including the
# recursive CC walk — inlining it once per reference (the old
# double-derived-table form) ran the most expensive oracle in the
# registry twice per gate (chained-CTE explosion lesson, pagerank d{{i}})

_ER_LINKS = f"""
{_PRELUDE},
clustered AS (
    SELECT r.*, c.cluster_id FROM records r JOIN clusters c USING (record_id)
),
best AS (
    SELECT cluster_id, name AS best_name
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY cluster_id
            ORDER BY ({_NONNULL}) DESC, record_id ASC) AS rn
        FROM clustered
    ) WHERE rn = 1
),
members AS (
    SELECT cluster_id,
           {_collect_present('company')} AS companies
    FROM clustered GROUP BY cluster_id
),
exploded AS (
    SELECT m.cluster_id, b.best_name,
           UNNEST(string_split(m.companies, '|')) AS company
    FROM members m JOIN best b USING (cluster_id)
)
SELECT cluster_id, best_name, company
FROM exploded WHERE company <> ''
ORDER BY cluster_id, company
"""


def _j(field: str) -> str:
    return f"CASE WHEN {field} IS NOT NULL THEN '\"{field}\":' || to_json({field}) END"


_ER_STRINGIFIED = f"""
WITH {_RECORDS_CTE.strip()}
SELECT record_id,
       '{{' || array_to_string(list_filter(
           [{_j('name')}, {_j('title')}, {_j('company')}, {_j('address')}],
           x -> x IS NOT NULL), ',') || '}}' AS record_json
FROM records ORDER BY record_id
"""


# LSH-blocked candidate pairs: the oracle re-derives the MinHash
# signatures (same md5 seed family as operators.dedup), the band keys,
# the bucket self-join, and the scoring — so the production blocking
# pipeline is hash-verified end-to-end, exactly like minhash_lsh_dedup.
_LSH_MH_COLS = ", ".join(
    f"MIN(md5('{s}|' || shingle)) AS mh{s}" for s in range(_D.N_HASHES)
)
_LSH_ROWS = _D.N_HASHES // _D.N_BANDS
_LSH_BANDS = "\n    UNION ALL ".join(
    "SELECT record_id, {b} AS band_idx, md5({key}) AS band_key FROM sigs".format(
        b=b,
        key=" || '|' || ".join(f"mh{b * _LSH_ROWS + r}" for r in range(_LSH_ROWS)),
    )
    for b in range(_D.N_BANDS)
)

_ER_PAIRS_LSH = f"""
WITH {_RECORDS_CTE.strip()},
runs AS (
    SELECT record_id,
           UNNEST(list_distinct(regexp_extract_all(name, '[0-9]+'))) AS shingle
    FROM records
),
sigs AS (SELECT record_id, {_LSH_MH_COLS} FROM runs GROUP BY record_id),
bands AS (
    {_LSH_BANDS}
),
cands AS (
    SELECT DISTINCT a.record_id AS id_a, b.record_id AS id_b
    FROM bands a JOIN bands b ON a.band_idx = b.band_idx AND a.band_key = b.band_key
                AND a.record_id < b.record_id
),
raw_pairs AS (
    SELECT {_PAIR_COLS}
    FROM cands c JOIN records a ON c.id_a = a.record_id
                 JOIN records b ON c.id_b = b.record_id
),
{_FIELD_SCORED_CTE.strip()}
SELECT id_a, id_b, name_score, title_score, address_score, company_score, overall_score
FROM scored WHERE overall_score >= {ER.GROUP_THRESHOLD} ORDER BY id_a, id_b
"""


def _records_q(spark, sf_dir):
    return ER.executive_records(spark, sf_dir).orderBy("record_id")


def _pairs_q(spark, sf_dir):
    return ER.candidate_pairs(spark, sf_dir).orderBy("id_a", "id_b")


SPECS = [
    QuerySpec("er_records", _records_q, _ER_RECORDS),
    QuerySpec("er_candidate_pairs", _pairs_q, _ER_PAIRS),
    QuerySpec("er_candidate_pairs_lsh", ER.candidate_pairs_lsh, _ER_PAIRS_LSH),
    QuerySpec("er_clusters", ER.er_clusters, _ER_CLUSTERS),
    QuerySpec("er_consolidated", ER.er_consolidated, _ER_CONSOLIDATED),
    QuerySpec("er_approved", ER.er_approved, _ER_APPROVED),
    QuerySpec("er_links", ER.er_links, _ER_LINKS),
    QuerySpec("er_records_stringified", ER.records_stringified, _ER_STRINGIFIED),
]
