"""Registry entries + DuckDB oracles for the LLM-data-pipeline suite:
dedup (exact / n-gram Jaccard / MinHash-LSH / SimHash), similarity
search, text analysis, multimodal byte features.

The MinHash oracle re-derives signatures with the same md5 hash family,
so LSH banding and candidate generation are verified end-to-end — not
just the final pair list.
"""

from __future__ import annotations

from pac_spark.functions.exact import exact_avg_sql
from pac_spark.functions.hashing import md5_u60_sql
from pac_spark.operators import curation as CU
from pac_spark.operators import dedup as D
from pac_spark.operators import multimodal as MM
from pac_spark.operators import scrub as SC
from pac_spark.operators import similarity as S
from pac_spark.operators import text as TX
from pac_spark.operators.text_core import SHINGLES_SQL
from pac_spark.plans.spec import QuerySpec

__all__ = ["SPECS"]

_DOCS_PRELUDE = f"""
WITH docs AS (SELECT doc_id, text FROM documents),
{SHINGLES_SQL(3).strip()}
"""

_DEDUP_EXACT = """
SELECT md5(text) AS text_hash,
       CAST(COUNT(*) AS BIGINT) AS n_copies,
       CAST(MIN(doc_id) AS BIGINT) AS keeper_doc_id
FROM documents GROUP BY 1 ORDER BY 1
"""

# the FULL uncapped formulation: every pair sharing any shingle, exact
# Jaccard. This is the oracle for the COMPLETE tiers (prefix_filter's
# PPJoin candidates carry no df cap).
_NGRAM_JACCARD_FULL = f"""
{_DOCS_PRELUDE},
sizes AS (SELECT doc_id, CAST(COUNT(*) AS INT) AS n FROM shingle_rows GROUP BY doc_id),
shared AS (
    SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, CAST(COUNT(*) AS BIGINT) AS shared
    FROM shingle_rows x
    JOIN shingle_rows y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
    GROUP BY 1, 2
),
j AS (
    SELECT doc_a, doc_b, shared, sa.n AS n_a, sb.n AS n_b,
           ROUND(shared / (sa.n + sb.n - shared), 8) AS jaccard
    FROM shared
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
)
SELECT * FROM j WHERE jaccard >= {D.JACCARD_THRESHOLD} ORDER BY doc_a, doc_b
"""

# oracle for the REGISTERED skew-guarded operator: candidate pairs must
# share at least one sub-cap ("rare") shingle — the df ceiling is part
# of ngram_jaccard_pairs' STATED semantics (a pair whose every shared
# shingle is corpus-hot boilerplate is out of scope for this tier), so
# the oracle states the identical candidate rule instead of silently
# promising the full self-join the operator never runs (code-review
# r7: the old full-join oracle would hash-diverge on the first corpus
# containing an all-hot-shared pair). Values on every candidate pair
# are EXACT over the full shingle sets, same as the operator's
# certain/rescore branches.
_NGRAM_JACCARD = f"""
{_DOCS_PRELUDE},
sizes AS (SELECT doc_id, CAST(COUNT(*) AS INT) AS n FROM shingle_rows GROUP BY doc_id),
hot AS (
    SELECT shingle FROM shingle_rows
    GROUP BY shingle HAVING COUNT(*) > {D.MAX_SHINGLE_DF}
),
rare AS (
    SELECT * FROM shingle_rows
    WHERE shingle NOT IN (SELECT shingle FROM hot)
),
cand AS (
    SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
    FROM rare x
    JOIN rare y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
),
shared AS (
    SELECT c.doc_a, c.doc_b, CAST(COUNT(*) AS BIGINT) AS shared
    FROM cand c
    JOIN shingle_rows x ON x.doc_id = c.doc_a
    JOIN shingle_rows y ON y.doc_id = c.doc_b AND y.shingle = x.shingle
    GROUP BY 1, 2
),
j AS (
    SELECT doc_a, doc_b, shared, sa.n AS n_a, sb.n AS n_b,
           ROUND(shared / (sa.n + sb.n - shared), 8) AS jaccard
    FROM shared
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
)
SELECT * FROM j WHERE jaccard >= {D.JACCARD_THRESHOLD} ORDER BY doc_a, doc_b
"""

_MH_COLS = ", ".join(
    f"MIN(md5('{s}|' || shingle)) AS mh{s}" for s in range(D.N_HASHES)
)

_MINHASH_SIGS = f"""
{_DOCS_PRELUDE},
sigs AS (SELECT doc_id, {_MH_COLS} FROM shingle_rows GROUP BY doc_id)
SELECT * FROM sigs ORDER BY doc_id
"""

# rows-per-band DERIVED from the constants (er_plans._LSH_BANDS form)
# — a hardcoded 2 would silently key bands wrong if N_HASHES changed
_BAND_ROWS = D.N_HASHES // D.N_BANDS
_BAND_SELECTS = "\n    UNION ALL ".join(
    "SELECT doc_id, {b} AS band_idx, md5({key}) AS band_key FROM sigs".format(
        b=b,
        key=" || '|' || ".join(
            f"mh{b * _BAND_ROWS + r}" for r in range(_BAND_ROWS)
        ),
    )
    for b in range(D.N_BANDS)
)

_MINHASH_LSH = f"""
{_DOCS_PRELUDE},
sigs AS (SELECT doc_id, {_MH_COLS} FROM shingle_rows GROUP BY doc_id),
bands AS (
    {_BAND_SELECTS}
),
cands AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a
    JOIN bands b ON a.band_idx = b.band_idx AND a.band_key = b.band_key
                AND a.doc_id < b.doc_id
),
doc_sets AS (
    SELECT doc_id, LIST(shingle ORDER BY shingle) AS sh FROM shingle_rows GROUP BY doc_id
),
rescored AS (
    SELECT doc_a, doc_b,
           ROUND(len(list_intersect(sa.sh, sb.sh))
                 / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))), 8)
               AS jaccard
    FROM cands
    JOIN doc_sets sa ON doc_a = sa.doc_id
    JOIN doc_sets sb ON doc_b = sb.doc_id
)
SELECT * FROM rescored WHERE jaccard >= {D.JACCARD_THRESHOLD} ORDER BY doc_a, doc_b
"""


# -- canonical-doc election: extends the verified-pair chain above with
# a recursive component walk (same walk shape as the ER clusters
# oracle); lives here, not in operators/dedup.py, to avoid an import
# cycle (this module imports dedup).
_lsh_prelude = _MINHASH_LSH[: _MINHASH_LSH.rindex(")") + 1].replace(
    "WITH ", "WITH RECURSIVE ", 1
)
CANONICAL_SQL = f"""
{_lsh_prelude},
dup_pairs AS (
    SELECT doc_a, doc_b FROM rescored WHERE jaccard >= {D.JACCARD_THRESHOLD}
),
und AS (SELECT doc_a AS a, doc_b AS b FROM dup_pairs
        UNION ALL SELECT doc_b, doc_a FROM dup_pairs),
walk(node, label) AS (
    SELECT doc_id, doc_id FROM documents
    UNION
    SELECT u.b, w.label FROM walk w JOIN und u ON w.node = u.a
),
clusters AS (
    SELECT node AS doc_id, CAST(MIN(label) AS BIGINT) AS cluster_id
    FROM walk GROUP BY node
),
clustered AS (
    SELECT d.doc_id, d.n_chars, c.cluster_id
    FROM documents d JOIN clusters c USING (doc_id)
),
sizes AS (
    SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM clustered GROUP BY cluster_id HAVING COUNT(*) >= 2
)
SELECT m.cluster_id, m.doc_id, m.n_chars, s.n_docs,
       ROW_NUMBER() OVER (PARTITION BY m.cluster_id
                          ORDER BY m.n_chars DESC, m.doc_id) = 1
           AS is_canonical
FROM clustered m JOIN sizes s USING (cluster_id)
ORDER BY m.cluster_id, m.doc_id
"""


_HEXD = "strpos('0123456789abcdef', substring(md5(shingle), {i}, 1)) - 1"

_H16 = " + ".join(
    f"({_HEXD.format(i=i + 1)}) * {16 ** (3 - i)}" for i in range(4)
)

_BIT_SUMS = ", ".join(
    f"SUM(CASE WHEN ((h >> {j}) & 1) = 1 THEN 1 ELSE -1 END) AS b{j}"
    for j in range(16)
)

_SIMHASH_VAL = " + ".join(
    f"(CASE WHEN b{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(16)
)

_SIMHASH = f"""
{_DOCS_PRELUDE},
sigs AS (SELECT doc_id, {_MH_COLS} FROM shingle_rows GROUP BY doc_id),
bands AS (
    {_BAND_SELECTS}
),
cands AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a
    JOIN bands b ON a.band_idx = b.band_idx AND a.band_key = b.band_key
                AND a.doc_id < b.doc_id
),
h16 AS (SELECT doc_id, {_H16} AS h FROM shingle_rows),
bit_sums AS (SELECT doc_id, {_BIT_SUMS} FROM h16 GROUP BY doc_id),
simhash AS (SELECT doc_id, CAST({_SIMHASH_VAL} AS INTEGER) AS simhash FROM bit_sums)
SELECT c.doc_a, c.doc_b, sa.simhash AS sim_a, sb.simhash AS sim_b,
       CAST(bit_count(xor(sa.simhash, sb.simhash)) AS INTEGER) AS hamming
FROM cands c
JOIN simhash sa ON c.doc_a = sa.doc_id
JOIN simhash sb ON c.doc_b = sb.doc_id
WHERE bit_count(xor(sa.simhash, sb.simhash)) <= 3
ORDER BY c.doc_a, c.doc_b
"""


def _dot_sql(a: str, b: str) -> str:
    """Sequential left-fold dot product, acc starts at 0.0 — mirrors
    the Spark ``aggregate(zip_with(...))`` accumulation order."""
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(generate_series(1, len({a})), i -> {a}[i] * {b}[i])), "
        f"(acc, x) -> acc + x)"
    )


_COS = f"{_dot_sql('v', 'qv')} / (sqrt({_dot_sql('v', 'v')}) * sqrt({_dot_sql('qv', 'qv')}))"

_KNN = f"""
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id IN {S.QUERY_IDS}),
scored AS (
    SELECT query_id, vec_id, label, ROUND({_COS}, 8) AS score
    FROM e, q WHERE vec_id != query_id
),
r AS (
    SELECT *, CAST(ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY score DESC, vec_id ASC) AS INT) AS rank
    FROM scored
)
SELECT query_id, vec_id, label, score, rank
FROM r WHERE rank <= {S.TOP_K} ORDER BY query_id, rank
"""

_VOCAB = f"""
WITH t AS (
    SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents
)
SELECT term,
       CAST(COUNT(*) AS BIGINT) AS term_count,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS doc_freq
FROM t GROUP BY term
ORDER BY term_count DESC, term ASC
LIMIT {TX.VOCAB_TOP_N}
"""

_CENTROIDS = f"""
WITH e AS (SELECT label, embedding::DOUBLE[] AS v FROM embeddings),
x AS (
    SELECT label, UNNEST(generate_series(1, len(v))) AS i, v FROM e
)
SELECT label,
       CAST(i - 1 AS INT) AS pos,
       CAST(COUNT(*) AS BIGINT) AS n_vectors,
       {exact_avg_sql('v[i]', 6)} AS centroid
FROM x GROUP BY label, i
ORDER BY label, pos
"""

# rerank features as raw IEEE arithmetic over the KNN result — no
# rounding, so numpy (Spark side) and DuckDB agree bit-exactly
_KNN_RERANK = f"""
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id IN {S.QUERY_IDS}),
scored AS (
    SELECT query_id, vec_id, label, ROUND({_COS}, 8) AS score
    FROM e, q WHERE vec_id != query_id
),
r AS (
    SELECT *, CAST(ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY score DESC, vec_id ASC) AS INT) AS rank
    FROM scored
),
topk AS (SELECT * FROM r WHERE rank <= {S.TOP_K})
SELECT query_id, vec_id, label, score, rank,
       MAX(score) OVER (PARTITION BY query_id) - score AS gap_to_best,
       CASE WHEN MAX(score) OVER (PARTITION BY query_id) != 0
            THEN score / MAX(score) OVER (PARTITION BY query_id) END AS rel_score
FROM topk ORDER BY query_id, rank
"""

_COS_AB = (
    f"{_dot_sql('a.v', 'b.v')} / "
    f"(sqrt({_dot_sql('a.v', 'a.v')}) * sqrt({_dot_sql('b.v', 'b.v')}))"
)


def _plane_dot_sql(p: list[float]) -> str:
    """Left-fold dot of column ``v`` against one hyperplane literal —
    shortest-round-trip float literals parse to identical doubles, so
    the sign test matches Spark bit-for-bit."""
    lit = "[" + ", ".join(repr(x) for x in p) + "]::DOUBLE[]"
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(generate_series(1, len(v)), i -> v[i] * ({lit})[i])), "
        f"(acc, x) -> acc + x)"
    )


def _sign_bits_sql(planes: list[list[float]]) -> str:
    """Concatenated per-plane sign bits over column ``v`` — the SQL
    twin of ``similarity.similar_pairs_banded``'s signature (and of
    the ANN bucket, which is its 6-plane prefix)."""
    return " || ".join(
        f"(CASE WHEN {_plane_dot_sql(p)} >= 0 THEN '1' ELSE '0' END)"
        for p in planes
    )


def _banded_pair_ctes(threshold: float) -> str:
    """The banded-candidate + exact-rescore CTE chain shared by the
    embedding_similar_pairs and semantic_dedup oracles: candidates
    are pairs sharing (label, band_idx, band_key) for >= 1 band —
    the SAME deterministic md5-seeded hyperplane banding the Spark
    plan computes, so the oracle states the operator's ACTUAL
    candidate rule instead of an exhaustive within-label enumeration
    that only coincided because the frozen fixtures contained no
    all-bands-missed pair (code-review r7 / VERDICT r7 wrong-#2; the
    minhash_lsh_dedup oracle is the pattern). Every surfaced pair is
    rescored with the exact cosine. Produces ``scored(label, vec_a,
    vec_b, score)``."""
    from pac_spark.operators.similarity import (
        EMB_PAIR_BANDS,
        EMB_PAIR_BITS,
        _hyperplanes,
    )

    bits = _sign_bits_sql(_hyperplanes(EMB_PAIR_BITS * EMB_PAIR_BANDS))
    return f"""e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
sig AS MATERIALIZED (SELECT vec_id, label, {bits} AS bits FROM e),
bands AS (
    SELECT vec_id, label, band_idx,
           substr(bits, band_idx * {EMB_PAIR_BITS} + 1, {EMB_PAIR_BITS}) AS band_key
    FROM sig, (SELECT UNNEST(generate_series(0, {EMB_PAIR_BANDS - 1})) AS band_idx)
),
cand AS (
    SELECT DISTINCT ba.label, ba.vec_id AS vec_a, bb.vec_id AS vec_b
    FROM bands ba JOIN bands bb
      ON ba.label = bb.label AND ba.band_idx = bb.band_idx
     AND ba.band_key = bb.band_key
    WHERE ba.vec_id < bb.vec_id
),
scored AS (
    SELECT label, vec_a, vec_b, score FROM (
        SELECT c.label, c.vec_a, c.vec_b, ROUND({_COS_AB}, 8) AS score
        FROM cand c JOIN e a ON a.vec_id = c.vec_a
                    JOIN e b ON b.vec_id = c.vec_b
    ) WHERE score >= {threshold}
)"""


def _similar_pairs_sql(threshold: float = S.DIFFUSE_PAIR_THRESHOLD) -> str:
    return f"""
WITH {_banded_pair_ctes(threshold)}
SELECT label, vec_a, vec_b, score FROM scored ORDER BY label, vec_a, vec_b
"""

def _sqdist_sql(a: str, b: str) -> str:
    """Sequential left-fold squared L2 — mirrors ``similarity._sqdist``
    (same operation order → identical doubles → identical argmins)."""
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(generate_series(1, len({a})), "
        f"i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i]))), "
        f"(acc, x) -> acc + x)"
    )


def _lloyd_ctes(prefix: str, src: str, k: int, iters: int, init_salt: str) -> str:
    """CTE chain for one deterministic Lloyd loop over ``src``
    (vec_id, v): seeded md5-order init, window-argmin assignment,
    exact floor-scaled BIGINT means, empty-cluster carry. Produces
    ``{prefix}_{iters}`` (centroid_id, c). Shared by the IVF and PQ
    oracles — the SQL twin of ``similarity._ivf_centroids``."""
    scale = "10000000.0"
    init_h = f"md5(CAST(vec_id AS VARCHAR) || ':{init_salt}')"
    out = [
        f""",
{prefix}_0 AS (
    SELECT CAST(rn - 1 AS INT) AS centroid_id, v AS c FROM (
        SELECT v, ROW_NUMBER() OVER (ORDER BY {init_h}) AS rn FROM {src}
    ) WHERE rn <= {k})"""
    ]
    for t in range(iters):
        out.append(
            f""",
{prefix}a{t} AS (
    SELECT vec_id, v, centroid_id, ROW_NUMBER() OVER (
        PARTITION BY vec_id ORDER BY {_sqdist_sql('v', 'c')}, centroid_id) AS rn
    FROM {src}, {prefix}_{t}),
{prefix}s{t} AS (SELECT centroid_id AS list_id, v FROM {prefix}a{t} WHERE rn = 1),
{prefix}x{t} AS (SELECT list_id, UNNEST(generate_series(1, len(v))) AS i, v
                 FROM {prefix}s{t}),
{prefix}m{t} AS (
    SELECT list_id, i,
           CAST(SUM(CAST(FLOOR(v[i] * {scale}) AS BIGINT)) AS DOUBLE) AS sm,
           CAST(COUNT(*) AS DOUBLE) AS n
    FROM {prefix}x{t} GROUP BY list_id, i),
{prefix}n{t} AS (SELECT list_id AS centroid_id,
                        list(sm / ({scale} * n) ORDER BY i) AS c
                 FROM {prefix}m{t} GROUP BY list_id),
{prefix}_{t + 1} AS (
    SELECT c0.centroid_id, COALESCE(n0.c, c0.c) AS c
    FROM {prefix}_{t} c0 LEFT JOIN {prefix}n{t} n0 USING (centroid_id))"""
        )
    return "".join(out)


def _ann_ivf_sql() -> str:
    """Full oracle for the deterministic IVF: replays the hash-bucket
    fit sample, the salted-md5-order init, ``IVF_ITERS`` unrolled Lloyd
    rounds (window argmin + exact floor-scaled BIGINT means + empty-
    cluster carry), the final assignment, multi-probe and scoring —
    every arithmetic step is the same IEEE expression the Spark plan
    runs, so the hash check covers the whole index build."""
    from pac_spark.operators import similarity as S

    bucket_digits = " + ".join(
        f"(strpos('0123456789abcdef', substring(md5(CAST(vec_id AS VARCHAR) "
        f"|| ':{S._IVF_FIT_SALT}'), {i + 1}, 1)) - 1) * {16 ** (3 - i)}"
        for i in range(4)
    )
    parts = [
        f"""
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
p AS (SELECT LEAST(1000, GREATEST(1,
          CAST(({S.IVF_FIT_TARGET} * 1000 + COUNT(*) - 1) // COUNT(*) AS INT)
      )) AS permille FROM e),
samp AS (SELECT e.vec_id, e.v FROM e, p
         WHERE (({bucket_digits}) % 1000) < p.permille)"""
    ]
    parts.append(
        _lloyd_ctes("cent", "samp", S.IVF_NLIST, S.IVF_ITERS, S._IVF_INIT_SALT)
    )
    T = S.IVF_ITERS
    parts.append(
        f""",
nv AS (SELECT vec_id, label, v, sqrt({_dot_sql('v', 'v')}) AS nvv FROM e),
asg AS (
    SELECT vec_id, label, v, nvv, centroid_id AS list_id, ROW_NUMBER() OVER (
        PARTITION BY vec_id ORDER BY {_sqdist_sql('v', 'c')}, centroid_id) AS rn
    FROM nv, cent_{T}),
inv AS (SELECT vec_id, label, v, nvv, list_id FROM asg WHERE rn = 1),
qr AS (SELECT vec_id AS query_id, v AS qv, nvv AS nq FROM nv
       WHERE vec_id IN {S.QUERY_IDS}),
pr AS (
    SELECT query_id, qv, nq, centroid_id AS list_id, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY {_sqdist_sql('qv', 'c')}, centroid_id) AS rn
    FROM qr, cent_{T}),
probes AS (SELECT query_id, qv, nq, list_id FROM pr WHERE rn <= {S.IVF_NPROBE}),
scored AS (
    SELECT p.query_id, i.vec_id, i.label,
           ROUND({_dot_sql('i.v', 'p.qv')} / (i.nvv * p.nq), 8) AS score
    FROM inv i JOIN probes p USING (list_id) WHERE i.vec_id != p.query_id),
r AS (SELECT *, CAST(ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY score DESC, vec_id ASC) AS INT) AS rank
      FROM scored)
SELECT query_id, vec_id, label, score, rank
FROM r WHERE rank <= {S.TOP_K} ORDER BY query_id, rank"""
    )
    return "".join(parts)


def _pq_topk_sql() -> str:
    """Full oracle for PQ/ADC search (staged for r6): replays the fit
    sample, the M per-subspace Lloyd loops (same unroll pattern as
    ``_ann_ivf_sql``, per-subspace init salts), window-argmin encoding,
    the M×K distance tables, the ADC sum over code lookups, and the
    exact-cosine rescore of the bounded top-k."""
    from pac_spark.operators import similarity as S

    bucket_digits = " + ".join(
        f"(strpos('0123456789abcdef', substring(md5(CAST(vec_id AS VARCHAR) "
        f"|| ':{S._IVF_FIT_SALT}'), {i + 1}, 1)) - 1) * {16 ** (3 - i)}"
        for i in range(4)
    )
    parts = [
        f"""
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
           -- unembedded vectors excluded by contract (PQ
           -- encoding cannot code a NULL vector; Spark side
           -- filters identically)
           FROM embeddings WHERE embedding IS NOT NULL),
p AS (SELECT LEAST(1000, GREATEST(1,
          CAST(({S.IVF_FIT_TARGET} * 1000 + COUNT(*) - 1) // COUNT(*) AS INT)
      )) AS permille FROM e),
samp AS (SELECT e.vec_id, e.v FROM e, p
         WHERE (({bucket_digits}) % 1000) < p.permille)"""
    ]
    T = S.PQ_ITERS
    for m in range(S.PQ_M):
        lo = m * S.PQ_SUB_DIM + 1
        hi = (m + 1) * S.PQ_SUB_DIM
        parts.append(
            f""",
smp{m} AS (SELECT vec_id, v[{lo}:{hi}] AS v FROM samp)"""
        )
        parts.append(
            _lloyd_ctes(
                f"c{m}", f"smp{m}", S.PQ_K, T, f"{S._PQ_INIT_SALT}_m{m}"
            )
        )
    # nv precedes every CTE that references it (ea/ec below); emitted
    # here, not spliced by index — the r5 first cut computed the splice
    # position wrong and only worked because DuckDB tolerates forward
    # CTE references
    parts.append(
        f""",
nv AS (SELECT vec_id, label, v, sqrt({_dot_sql('v', 'v')}) AS nvv FROM e)"""
    )
    enc_joins = []
    for m in range(S.PQ_M):
        lo = m * S.PQ_SUB_DIM + 1
        hi = (m + 1) * S.PQ_SUB_DIM
        parts.append(
            f""",
ea{m} AS (
    SELECT vec_id, centroid_id, ROW_NUMBER() OVER (
        PARTITION BY vec_id
        ORDER BY {_sqdist_sql(f'nv.v[{lo}:{hi}]', 'c')}, centroid_id) AS rn
    FROM nv, c{m}_{T}),
ec{m} AS (SELECT vec_id, centroid_id AS code FROM ea{m} WHERE rn = 1)"""
        )
        enc_joins.append(f"JOIN ec{m} ON ec{m}.vec_id = nv.vec_id")
    parts.append(
        f""",
qr AS (SELECT vec_id AS query_id, v AS qv, nvv AS nq FROM nv
       WHERE vec_id IN {S.QUERY_IDS})"""
    )
    dt_joins = []
    for m in range(S.PQ_M):
        lo = m * S.PQ_SUB_DIM + 1
        hi = (m + 1) * S.PQ_SUB_DIM
        parts.append(
            f""",
dt{m} AS (
    SELECT query_id, centroid_id,
           {_sqdist_sql(f'qv[{lo}:{hi}]', 'c')} AS d
    FROM qr, c{m}_{T})"""
        )
        dt_joins.append(
            f"JOIN dt{m} ON dt{m}.query_id = qr2.query_id "
            f"AND dt{m}.centroid_id = enc.code_{m}"
        )
    enc_cols = ", ".join(f"ec{m}.code AS code_{m}" for m in range(S.PQ_M))
    adc = " + ".join(f"dt{m}.d" for m in range(S.PQ_M))
    parts.append(
        f""",
enc AS (SELECT nv.vec_id, nv.label, nv.v, nv.nvv, {enc_cols}
        FROM nv {' '.join(enc_joins)}),
qr2 AS (SELECT query_id FROM qr),
scored AS (
    SELECT qr2.query_id, enc.vec_id, enc.label, enc.v, enc.nvv,
           {adc} AS approx_dist
    FROM enc CROSS JOIN qr2 {' '.join(dt_joins)}
    WHERE enc.vec_id != qr2.query_id),
r AS (SELECT *, CAST(ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY approx_dist ASC, vec_id ASC) AS INT)
        AS rank
      FROM scored),
topk AS (SELECT * FROM r WHERE rank <= {S.TOP_K})
SELECT t.query_id, t.vec_id, t.label,
       ROUND(t.approx_dist, 8) AS approx_dist,
       ROUND({_dot_sql('t.v', 'q.qv')} / (t.nvv * q.nq), 8) AS score,
       t.rank
FROM topk t JOIN qr q ON t.query_id = q.query_id
ORDER BY t.query_id, t.rank"""
    )
    return "".join(parts)


def _ann_lsh_sql() -> str:
    """Full oracle for sign-LSH ANN: the hyperplanes are deterministic
    python-side constants, so the bucket assignment (sign of the same
    left-fold dot product against the same plane literals), the bucket
    equi-join, and the rank are all exactly reproducible in SQL —
    shortest-round-trip float literals parse to identical doubles."""
    from pac_spark.operators.similarity import _hyperplanes

    bucket = _sign_bits_sql(_hyperplanes()[:6])
    return f"""
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
b AS (
    SELECT vec_id, label, v, {bucket} AS bucket,
           sqrt({_dot_sql('v', 'v')}) AS nv
    FROM e
),
q AS (
    SELECT vec_id AS query_id, v AS qv, bucket AS qbucket, nv AS nq
    FROM b WHERE vec_id IN {S.QUERY_IDS}
),
scored AS (
    SELECT query_id, b.vec_id, b.label, ROUND({_COS}, 8) AS score
    FROM b JOIN q ON b.bucket = q.qbucket AND b.vec_id != q.query_id
),
r AS (
    SELECT *, CAST(ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY score DESC, vec_id ASC) AS INT) AS rank
    FROM scored
)
SELECT query_id, vec_id, label, score, rank
FROM r WHERE rank <= {S.TOP_K} ORDER BY query_id, rank
"""


_SEMANTIC_DEDUP = f"""
WITH RECURSIVE {_banded_pair_ctes(S.DIFFUSE_PAIR_THRESHOLD)},
und AS (SELECT vec_a AS a, vec_b AS b FROM scored
        UNION ALL SELECT vec_b, vec_a FROM scored),
walk(node, lbl) AS (
    SELECT vec_id, vec_id FROM e
    UNION
    SELECT u.b, w.lbl FROM walk w JOIN und u ON w.node = u.a
),
clusters AS (
    SELECT node AS vec_id, CAST(MIN(lbl) AS BIGINT) AS cluster_id
    FROM walk GROUP BY node
)
SELECT vec_id, cluster_id, vec_id = cluster_id AS is_keeper
FROM clusters ORDER BY vec_id
"""

_STOP_LIST = "[" + ", ".join(f"'{s}'" for s in TX.STOPWORDS) + "]"


def _quality_sql(n_tokens: str, n_unique: str, n_stop: str) -> str:
    """The ONE rendering of the quality-score formula (mirrors
    text.stats_frame); every oracle that scores quality composes this,
    so a weight change cannot silently drift between copies."""
    return (
        f"ROUND(0.4 * least(1.0, {n_tokens} / 100.0) "
        f"+ 0.3 * ({n_unique} / {n_tokens}) "
        f"+ 0.3 * (1.0 - {n_stop} / {n_tokens}), 8)"
    )


# the formula over a raw string_split(text) column named `toks`
_QUALITY_TOKS = _quality_sql(
    "len(toks)",
    "len(list_distinct(toks))",
    f"len(list_filter(toks, t -> list_contains({_STOP_LIST}, t)))",
)

_TEXT_STATS = f"""
WITH d AS (
    SELECT *, string_split(text, ' ') AS toks FROM documents
),
m AS (
    SELECT doc_id, lang, source, n_chars,
           CAST(length(text) AS INT) AS n_chars_computed,
           CAST(len(toks) AS INT) AS n_tokens,
           CAST(len(list_distinct(toks)) AS INT) AS n_unique_tokens,
           CAST(len(list_filter(toks, t -> list_contains({_STOP_LIST}, t))) AS INT)
               AS n_stopwords
    FROM d
)
SELECT doc_id, lang, source, n_chars, n_chars_computed, n_tokens,
       n_unique_tokens, n_stopwords,
       ROUND(n_stopwords / n_tokens, 8) AS stopword_ratio,
       ROUND(n_unique_tokens / n_tokens, 8) AS unique_ratio,
       {_quality_sql("n_tokens", "n_unique_tokens", "n_stopwords")} AS quality_score,
       n_tokens < {TX.SHORT_DOC_TOKENS} AS is_short
FROM m ORDER BY doc_id
"""

_LANGS = sorted(TX.LANG_MARKERS)


def _marker_sql(lang: str) -> str:
    arr = "[" + ", ".join(f"'{m}'" for m in TX.LANG_MARKERS[lang]) + "]"
    return f"CAST(len(list_filter(toks, t -> list_contains({arr}, t))) AS INT)"


def _guess_cases() -> str:
    cases = []
    for lang in _LANGS[:-1]:
        conds = []
        for other in _LANGS:
            if other == lang:
                continue
            op = ">" if other < lang else ">="
            conds.append(f"score_{lang} {op} score_{other}")
        cases.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    return "CASE " + " ".join(cases) + f" ELSE '{_LANGS[-1]}' END"


_LANGID = f"""
WITH d AS (SELECT *, string_split(text, ' ') AS toks FROM documents),
m AS (
    SELECT doc_id, lang,
           {", ".join(f"{_marker_sql(lang)} AS score_{lang}" for lang in _LANGS)}
    FROM d
)
SELECT doc_id, lang, {", ".join(f"score_{lang}" for lang in _LANGS)},
       {_guess_cases()} AS lang_guess,
       lang = ({_guess_cases()}) AS guess_matches_label
FROM m ORDER BY doc_id
"""

_TOKEN_COUNTS = r"""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS INT) AS n_ws_tokens,
       CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 \t\n\x0B\f\r]'))
            AS INT) AS n_bpe_ish_tokens,
       CAST(ceil(n_chars / 4) AS BIGINT) AS est_tokens_char4
FROM documents ORDER BY doc_id
"""

_FINGERPRINTS = f"""
{_DOCS_PRELUDE},
mh AS (SELECT doc_id, MIN(md5(shingle)) AS minhash1 FROM shingle_rows GROUP BY doc_id)
SELECT d.doc_id, dd.source,
       md5(d.text) AS md5_fp,
       substring(md5(d.text), 1, 16) AS md5_prefix64,
       mh.minhash1
FROM docs d
JOIN documents dd ON d.doc_id = dd.doc_id
LEFT JOIN mh ON d.doc_id = mh.doc_id
ORDER BY d.doc_id
"""

_QUALITY_BY_LANG = f"""
WITH d AS (
    SELECT *, string_split(text, ' ') AS toks FROM documents
),
m AS (
    SELECT doc_id, lang,
           CAST(len(toks) AS INT) AS n_tokens,
           CAST(len(list_distinct(toks)) AS INT) AS n_unique_tokens,
           CAST(len(list_filter(toks, t -> list_contains({_STOP_LIST}, t))) AS INT)
               AS n_stopwords
    FROM d
),
s AS (
    SELECT doc_id, lang, n_tokens,
           {_quality_sql("n_tokens", "n_unique_tokens", "n_stopwords")} AS quality_score,
           n_tokens < {TX.SHORT_DOC_TOKENS} AS is_short
    FROM m
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       {exact_avg_sql('quality_score', 8)} AS avg_quality,
       CAST(SUM(CASE WHEN is_short THEN 1 ELSE 0 END) AS BIGINT) AS n_short_docs
FROM s GROUP BY lang ORDER BY lang
"""

# type-1 (lower) quantile: arr[floor(p*(n-1))], pure element selection
# — interpolating definitions create exact midpoints where Python
# round-half-even and SQL round-half-away disagree at the last digit
def _np_quantile_sql(p: float) -> str:
    return f"arr[CAST(floor(({p}) * (len(arr) - 1)) AS BIGINT) + 1]"


_QUANTILES = f"""
-- NULL-lang docs excluded in BOTH engines (a doc with no language
-- cannot contribute to per-language quartiles; the Spark plan's
-- per-lang boundary joins drop the NULL key anyway) and NULL-text
-- docs likewise (no quality score to rank)
WITH d AS (SELECT *, string_split(text, ' ') AS toks FROM documents
           WHERE lang IS NOT NULL AND text IS NOT NULL),
s AS (
    SELECT lang,
           {_QUALITY_TOKS}
               AS quality_score
    FROM d
),
g AS (
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           LIST(quality_score ORDER BY quality_score) AS arr
    FROM s GROUP BY lang
)
SELECT lang, n_docs,
       {_np_quantile_sql(0.25)} AS q25,
       {_np_quantile_sql(0.50)} AS median,
       {_np_quantile_sql(0.75)} AS q75
FROM g ORDER BY lang
"""

# Payload-BYTE prelude for the multimodal oracles: the Spark side
# resamples UTF-8 payload bytes (numpy over encode(text)), so the
# the byte-decode CTE is owned by operators.multimodal (one
# definition next to its PCM consumer; code-review r8) — re-exported
# under the historical local name for the three oracles below
_BYTES_CTE = MM.BYTES_CTE

_BYTE_FEATURES = f"""
WITH {_BYTES_CTE.strip()}
SELECT doc_id,
       n AS n_bytes,
       CAST(COALESCE(list_sum(bytes), 0) AS BIGINT) AS byte_sum,
       CAST(CASE WHEN n > 0 THEN bytes[1] ELSE -1 END AS INT) AS first_byte,
       CAST(CASE WHEN n > 0 THEN bytes[n] ELSE -1 END AS INT) AS last_byte
FROM by ORDER BY doc_id
"""

_FRAME_SAMPLE = f"""
WITH {_BYTES_CTE.strip()},
s AS (
    SELECT doc_id,
           list_transform(generate_series(1, n, {MM.FRAME_STRIDE}),
                          i -> bytes[i]) AS fr
    FROM by
)
SELECT doc_id,
       CAST(len(fr) AS INT) AS n_frames,
       COALESCE(array_to_string(list_transform(fr[1:8], x -> CAST(x AS VARCHAR)), ','),
                '') AS first_frames,
       CASE WHEN len(fr) > 0
            THEN ROUND(CAST(list_sum(fr) AS DOUBLE) / len(fr), 8) END AS mean_frame
FROM s ORDER BY doc_id
"""

# the losers CTE states ngram_jaccard_pairs' ACTUAL candidate rule —
# pairs sharing >=1 sub-cap shingle, exact Jaccard over full sets —
# exactly like the standalone _NGRAM_JACCARD above (code-review r7:
# the composed curation oracle had kept the uncapped self-join the
# operator's skew path never runs)
_CURATION = f"""
{_DOCS_PRELUDE},
sizes AS (SELECT doc_id, CAST(COUNT(*) AS INT) AS n FROM shingle_rows GROUP BY doc_id),
hot AS (
    SELECT shingle FROM shingle_rows
    GROUP BY shingle HAVING COUNT(*) > {D.MAX_SHINGLE_DF}
),
rare AS (
    SELECT * FROM shingle_rows
    WHERE shingle NOT IN (SELECT shingle FROM hot)
),
cand AS (
    SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
    FROM rare x
    JOIN rare y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
),
shared AS (
    SELECT c.doc_a, c.doc_b, CAST(COUNT(*) AS BIGINT) AS shared
    FROM cand c
    JOIN shingle_rows x ON x.doc_id = c.doc_a
    JOIN shingle_rows y ON y.doc_id = c.doc_b AND y.shingle = x.shingle
    GROUP BY 1, 2
),
losers AS (
    SELECT DISTINCT doc_b AS doc_id
    FROM shared
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
    WHERE ROUND(shared / (sa.n + sb.n - shared), 8) >= {D.JACCARD_THRESHOLD}
),
keepers AS (
    SELECT doc_id FROM (
        SELECT doc_id, MIN(doc_id) OVER (PARTITION BY md5(text)) AS keep_id
        FROM documents
    ) WHERE doc_id = keep_id
),
dd AS (SELECT *, string_split(text, ' ') AS toks FROM documents),
stats AS (
    SELECT doc_id, lang, source,
           CAST(len(toks) AS INT) AS n_tokens,
           {_QUALITY_TOKS}
               AS quality_score
    FROM dd
)
SELECT s.doc_id, s.lang, s.source, s.n_tokens, s.quality_score
FROM stats s
JOIN keepers k ON s.doc_id = k.doc_id
WHERE s.quality_score >= {CU.CURATION_MIN_QUALITY} AND NOT (s.n_tokens < {TX.SHORT_DOC_TOKENS})
  AND s.doc_id NOT IN (SELECT doc_id FROM losers)
ORDER BY s.doc_id
"""

_SAMPLE_HEXD = (
    "strpos('0123456789abcdef', "
    "substring(md5(CAST(doc_id AS VARCHAR) || ':{salt}'), {i}, 1)) - 1"
)


def _recall_audit_sql() -> str:
    """Recall@k of each ANN tier vs brute force — composes the three
    tiers' REGISTERED oracle texts verbatim as subqueries, so the
    audit oracle can never drift from the per-tier oracles."""
    from pac_spark.operators.similarity import TOP_K

    tiers = [
        ("ivf", _ann_ivf_sql()),
        ("lsh", _ann_lsh_sql()),
        ("pq", _pq_topk_sql()),
    ]
    parts = []
    for name, sql in tiers:
        parts.append(f"""
SELECT '{name}' AS tier, a.query_id,
       CAST(COUNT(*) AS BIGINT) AS n_returned,
       CAST(SUM(CASE WHEN e.vec_id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_hits,
       CAST((SUM(CASE WHEN e.vec_id IS NOT NULL THEN 1 ELSE 0 END) * 1000)
           // {TOP_K} AS BIGINT) AS recall_milli
FROM ({sql}) a
LEFT JOIN ({_KNN}) e
  ON e.query_id = a.query_id AND e.vec_id = a.vec_id
GROUP BY a.query_id""")
    body = "\nUNION ALL\n".join(parts)
    return f"SELECT * FROM ({body}) ORDER BY tier, query_id"


def _sample_bucket_sql() -> str:
    from pac_spark.operators import curation as C

    digits = " + ".join(
        f"({_SAMPLE_HEXD.format(salt=C.SAMPLE_SALT, i=i + 1)}) * {16 ** (3 - i)}"
        for i in range(4)
    )
    return f"(({digits}) % 1000)"


def _sample_sql() -> str:
    from pac_spark.operators import curation as C

    rate_cases = " ".join(
        f"WHEN '{lang}' THEN {p}" for lang, p in sorted(C.SAMPLE_PERMILLE.items())
    )
    return f"""
WITH b AS (
    SELECT doc_id, lang, source,
           CAST({_sample_bucket_sql()} AS INT) AS bucket,
           CAST(CASE lang {rate_cases} ELSE {C.SAMPLE_DEFAULT_PERMILLE} END AS INT)
               AS rate_permille
    FROM documents
)
SELECT * FROM b WHERE bucket < rate_permille ORDER BY doc_id
"""


_RESIZE = f"""
WITH {_BYTES_CTE.strip()},
s AS (
    SELECT doc_id, n,
           list_transform(generate_series(0, {MM.RESIZE_TARGET - 1}),
               i -> bytes[CAST((i * n) // {MM.RESIZE_TARGET} AS INT) + 1]) AS rz
    FROM by
)
SELECT doc_id, n AS n_bytes,
       CASE WHEN n > 0
            THEN array_to_string(list_transform(rz, x -> CAST(x AS VARCHAR)), ',')
       END AS resized
FROM s ORDER BY doc_id
"""

def _token_budget_sql() -> str:
    from pac_spark.operators import curation as C

    return f"""
-- NULL-lang docs excluded in BOTH engines: a doc with no language
-- joins no language budget (the Spark plan's per-lang budget join
-- drops the NULL key anyway)
WITH d AS (SELECT *, string_split(text, ' ') AS toks FROM documents
           WHERE lang IS NOT NULL),
m AS (
    SELECT doc_id, lang,
           CAST(len(toks) AS INT) AS n_tokens,
           {_QUALITY_TOKS}
               AS quality_score
    FROM d
),
ordered AS (
    SELECT *, SUM(n_tokens) OVER (
        PARTITION BY lang ORDER BY quality_score DESC, doc_id ASC
        ROWS UNBOUNDED PRECEDING) AS cum
    FROM m
)
SELECT doc_id, lang, n_tokens, quality_score
FROM ordered WHERE cum <= {C.TOKEN_BUDGET_PER_LANG} ORDER BY doc_id
"""


_CHUNKS = f"""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
m AS (SELECT doc_id, toks, len(toks) AS n FROM d WHERE len(toks) > 0),
c AS (
    SELECT doc_id, toks,
           UNNEST(generate_series(0,
               CASE WHEN n <= {TX.CHUNK_SIZE} THEN 0
                    ELSE CAST(ceil((n - {TX.CHUNK_SIZE}) / {float(TX.CHUNK_STRIDE)}) AS BIGINT)
               END)) AS chunk_idx
    FROM m
),
s AS (
    SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
           list_slice(toks, chunk_idx * {TX.CHUNK_STRIDE} + 1,
                      chunk_idx * {TX.CHUNK_STRIDE} + {TX.CHUNK_SIZE}) AS chunk
    FROM c
)
SELECT doc_id, chunk_idx,
       CAST(len(chunk) AS INT) AS n_chunk_tokens,
       array_to_string(chunk, ' ') AS chunk_text
FROM s ORDER BY doc_id, chunk_idx
"""

def _decontaminate_sql() -> str:
    from pac_spark.operators import curation as C

    return f"""
{_DOCS_PRELUDE},
n AS (SELECT doc_id, CAST(COUNT(*) AS INT) AS n_shingles FROM shingle_rows GROUP BY 1),
eval_sh AS (SELECT DISTINCT shingle FROM shingle_rows WHERE doc_id % {C.EVAL_SET_MOD} = 0),
shared AS (
    SELECT s.doc_id, CAST(COUNT(*) AS BIGINT) AS shared_with_eval
    FROM shingle_rows s JOIN eval_sh USING (shingle)
    WHERE s.doc_id % {C.EVAL_SET_MOD} != 0 GROUP BY 1
)
SELECT n.doc_id, n.n_shingles,
       CAST(COALESCE(shared_with_eval, 0) AS BIGINT) AS shared_with_eval,
       ROUND(COALESCE(shared_with_eval, 0) / n.n_shingles, 8) AS containment,
       COALESCE(shared_with_eval, 0) / n.n_shingles >= {C.CONTAMINATION_THRESHOLD}
           AS is_contaminated
FROM n LEFT JOIN shared USING (doc_id)
WHERE n.doc_id % {C.EVAL_SET_MOD} != 0
ORDER BY n.doc_id
"""


_TOP_TERMS = """
WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
dt AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2),
dfq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM dt GROUP BY 1),
nd AS (SELECT COUNT(*) AS n FROM documents),
scored AS (
    SELECT dt.doc_id, dt.term, dt.tf, dfq.df,
           CAST(dt.tf * nd.n AS DOUBLE) / CAST(dfq.df AS DOUBLE) AS score
    FROM dt JOIN dfq USING (term), nd
),
ranked AS (
    SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                                      ORDER BY score DESC, term ASC) AS INT) AS term_rank
    FROM scored
)
SELECT doc_id, term_rank, term, tf, df, score
FROM ranked WHERE term_rank <= 3
ORDER BY doc_id, term_rank
"""

_UNIGRAM_PROB = """
WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
tf AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt FROM toks GROUP BY 1),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM toks),
pd AS (
    SELECT doc_id, SUM(cnt) AS mass, CAST(COUNT(*) AS BIGINT) AS n_tokens
    FROM toks JOIN tf USING (term) GROUP BY doc_id
)
SELECT doc_id, n_tokens,
       CAST(mass AS DOUBLE) / (CAST(n_tokens AS DOUBLE) * CAST(total AS DOUBLE))
           AS avg_token_prob
FROM pd, tot ORDER BY doc_id
"""


def _shards_sql() -> str:
    from pac_spark.operators import curation as C

    digits = " + ".join(
        f"({_SAMPLE_HEXD.format(salt=C.SHARD_SALT, i=i + 1)}) * {16 ** (3 - i)}"
        for i in range(4)
    )
    return f"""
WITH h AS (
    SELECT doc_id, lang, source,
           md5(CAST(doc_id AS VARCHAR) || ':{C.SHARD_SALT}') AS _h,
           CAST(({digits}) % {C.N_TRAINING_SHARDS} AS INT) AS shard_id
    FROM documents
)
SELECT doc_id, lang, source, shard_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY shard_id ORDER BY _h, doc_id) AS INT)
           AS position
FROM h ORDER BY shard_id, position
"""


def _packing_sql() -> str:
    from pac_spark.operators import curation as C

    digits = " + ".join(
        f"({_SAMPLE_HEXD.format(salt=C.SHARD_SALT, i=i + 1)}) * {16 ** (3 - i)}"
        for i in range(4)
    )
    return f"""
WITH h AS (
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           md5(CAST(doc_id AS VARCHAR) || ':{C.SHARD_SALT}') AS _h,
           CAST(({digits}) % {C.N_TRAINING_SHARDS} AS INT) AS shard_id
    FROM documents
),
c AS (
    SELECT doc_id, shard_id, n_tokens,
           SUM(n_tokens) OVER (PARTITION BY shard_id ORDER BY _h, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - n_tokens AS start
    FROM h
)
SELECT doc_id, shard_id, n_tokens,
       CAST(start // {C.SEQ_LEN} AS INT) AS seq_in_shard,
       CAST(start % {C.SEQ_LEN} AS INT) AS seq_offset
FROM c ORDER BY shard_id, seq_in_shard, seq_offset, doc_id
"""


_INCREMENTAL = f"""
{_DOCS_PRELUDE},
sigs AS (SELECT doc_id, {_MH_COLS} FROM shingle_rows GROUP BY doc_id),
bands AS (
    {_BAND_SELECTS}
),
cands AS (
    SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS hist_id
    FROM bands a
    JOIN bands b ON a.band_idx = b.band_idx AND a.band_key = b.band_key
    WHERE a.doc_id % 10 >= {D.NEW_BATCH_MOD} AND b.doc_id % 10 < {D.NEW_BATCH_MOD}
),
doc_sets AS (
    SELECT doc_id, LIST(shingle ORDER BY shingle) AS sh FROM shingle_rows GROUP BY doc_id
),
matches AS (
    SELECT new_id,
           CAST(COUNT(*) AS INT) AS n_dup_matches,
           MIN(hist_id) AS nearest_hist
    FROM (
        SELECT new_id, hist_id,
               ROUND(len(list_intersect(sa.sh, sb.sh))
                     / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))), 8)
                   AS jaccard
        FROM cands
        JOIN doc_sets sa ON new_id = sa.doc_id
        JOIN doc_sets sb ON hist_id = sb.doc_id
    )
    WHERE jaccard >= {D.JACCARD_THRESHOLD}
    GROUP BY new_id
)
SELECT d.doc_id, d.lang, d.source,
       CAST(COALESCE(m.n_dup_matches, 0) AS INT) AS n_dup_matches,
       m.nearest_hist,
       COALESCE(m.n_dup_matches, 0) = 0 AS admitted
FROM documents d
LEFT JOIN matches m ON d.doc_id = m.new_id
WHERE d.doc_id % 10 >= {D.NEW_BATCH_MOD}
ORDER BY d.doc_id
"""


_CORR = f"""
WITH stats AS ({_TEXT_STATS.strip().rstrip()}),
xy AS (
    SELECT lang,
           CAST(ROUND(quality_score * {TX.QUALITY_SCALE}) AS BIGINT) AS x,
           CAST(n_tokens AS BIGINT) AS y
    FROM stats
),
m AS (
    -- moment sums stay HUGEINT (DuckDB's SUM(BIGINT) result type):
    -- narrowing through BIGINT threw a conversion error exactly in
    -- the >2^63 regime the Spark side's decimal(38,0) accumulators
    -- were built for (code-review r7 — reproduced live); they are CTE
    -- intermediates, never output columns, so no pandas-type concern
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n,
           SUM(x) AS sx,
           SUM(y) AS sy,
           SUM(x * x) AS sxx,
           SUM(y * y) AS syy,
           SUM(x * y) AS sxy
    FROM xy GROUP BY lang
)
SELECT lang, n AS n_docs,
       (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                     - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
           AS corr_quality_tokens,
       (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)
              * {float(TX.QUALITY_SCALE)})
           AS cov_quality_tokens
FROM m ORDER BY lang
"""


_REPETITION = """
WITH toks AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
           generate_subscripts(string_split(text, ' '), 1) AS pos
    FROM documents
),
sizes AS (
    SELECT doc_id, COUNT(*) AS n, COUNT(DISTINCT tok) AS n_unique
    FROM toks GROUP BY 1
),
tcounts AS (SELECT doc_id, tok, COUNT(*) AS cnt FROM toks GROUP BY 1, 2),
ttop AS (
    SELECT doc_id, tok, cnt FROM (
        SELECT doc_id, tok, cnt,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY cnt DESC, tok ASC) AS rn
        FROM tcounts) WHERE rn = 1
),
bigrams AS (
    SELECT a.doc_id, a.tok || ' ' || b.tok AS bg
    FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
),
bcounts AS (SELECT doc_id, bg, COUNT(*) AS cnt FROM bigrams GROUP BY 1, 2),
btop AS (
    SELECT doc_id, bg, cnt FROM (
        SELECT doc_id, bg, cnt,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY cnt DESC, bg ASC) AS rn
        FROM bcounts) WHERE rn = 1
)
SELECT s.doc_id,
       CAST(s.n AS INT) AS n_tokens,
       t.tok AS top_token,
       CAST(t.cnt AS INT) AS top_token_cnt,
       ROUND(t.cnt / s.n, 8) AS top_token_frac,
       b.bg AS top_bigram,
       CAST(COALESCE(b.cnt, 0) AS INT) AS top_bigram_cnt,
       CASE WHEN s.n >= 2 THEN ROUND(b.cnt / (s.n - 1), 8)
            ELSE 0.0 END AS top_bigram_frac,
       ROUND((s.n - s.n_unique) / s.n, 8) AS dup_token_frac,
       (CASE WHEN s.n >= 2 THEN ROUND(b.cnt / (s.n - 1), 8) ELSE 0.0 END
            > {top_bigram_max}
        OR ROUND((s.n - s.n_unique) / s.n, 8) > {dup_token_max})
           AS is_repetitive
FROM sizes s
JOIN ttop t USING (doc_id)
LEFT JOIN btop b USING (doc_id)
ORDER BY s.doc_id
""".format(
    top_bigram_max=TX.REP_TOP_BIGRAM_MAX, dup_token_max=TX.REP_DUP_TOKEN_MAX
)



def _dup_span_sql() -> str:
    """Registered in the r7 rotation (gate: tests/test_staged_specs.py —
    see the R7 plan in plans/registry.py): duplicated-span coverage,
    positioned (non-distinct) 5-gram rows keyed by md5 exactly as the
    Spark side, dup = gram present in >= 2 distinct docs, basis points
    by BIGINT integer division (// mirrors functions.exact.int_div)."""
    return f"""
WITH docs AS (SELECT doc_id, text FROM documents),
{SHINGLES_SQL(D.DUP_SPAN_N, distinct=False).strip()},
gram_rows AS (SELECT doc_id, md5(shingle) AS k FROM shingle_rows),
gs AS (SELECT k, COUNT(DISTINCT doc_id) AS nd FROM gram_rows GROUP BY k)
SELECT g.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(SUM(CASE WHEN gs.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_grams,
       CAST((CAST(SUM(CASE WHEN gs.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) * 10000)
            // CAST(COUNT(*) AS BIGINT) AS BIGINT) AS dup_bp
FROM gram_rows g JOIN gs USING (k)
GROUP BY g.doc_id ORDER BY g.doc_id
"""


# --- quantile normalization (registered in the r10 rotation; gate
#     stays in tests/test_staged_specs.py) ---------------------------
# Same computation as text._quantile_normalize: within-source rank r
# of n_s maps to the pooled order statistic at ceil(r*N/n_s). Target
# positions use HUGEINT // (DuckDB's BIGINT // and DECIMAL // are
# float-backed — the budget-allocation lesson).
QNORM_SQL = f"""
WITH stats AS ({_TEXT_STATS.strip().rstrip()}),
d AS (
    -- NULL-quality docs excluded in BOTH engines: Spark windows sort
    -- NULLS FIRST, DuckDB NULLS LAST, so a ranked NULL would shift
    -- every other doc's rank differently per engine
    SELECT doc_id, source,
           CAST(ROUND(quality_score * {TX.QUALITY_SCALE}) AS BIGINT) AS q_fp
    FROM stats
    WHERE quality_score IS NOT NULL AND source IS NOT NULL
),
g AS (
    SELECT doc_id, source, q_fp,
           ROW_NUMBER() OVER (ORDER BY q_fp, doc_id) AS p,
           ROW_NUMBER() OVER (PARTITION BY source ORDER BY q_fp, doc_id) AS r,
           COUNT(*) OVER (PARTITION BY source) AS n_s,
           COUNT(*) OVER () AS n_all
    FROM d
),
m AS (
    SELECT doc_id, source, q_fp,
           CAST((CAST(r AS HUGEINT) * n_all + n_s - 1) // n_s AS BIGINT) AS tgt
    FROM g
)
SELECT m.doc_id, m.source, m.q_fp, x.q_fp AS q_norm_fp
FROM m JOIN g x ON x.p = m.tgt
ORDER BY m.doc_id
"""


SPECS = [
    QuerySpec("dedup_exact_docs", D.dedup_exact, _DEDUP_EXACT),
    QuerySpec("ngram_jaccard_pairs", D.ngram_jaccard_pairs, _NGRAM_JACCARD),
    QuerySpec("minhash_signatures", D.minhash_signatures, _MINHASH_SIGS),
    QuerySpec("minhash_lsh_dedup", D.minhash_lsh_dedup, _MINHASH_LSH),
    QuerySpec("simhash_neardup", D.simhash_neardup, _SIMHASH),
    QuerySpec("knn_bruteforce", S.knn_bruteforce, _KNN),
    QuerySpec("knn_rerank", S.knn_rerank, _KNN_RERANK),
    QuerySpec("embedding_similar_pairs", S.embedding_similar_pairs, _similar_pairs_sql()),
    QuerySpec("ann_lsh_topk", S.ann_lsh_topk, _ann_lsh_sql()),
    QuerySpec("ann_ivf_topk", S.ann_ivf_topk, _ann_ivf_sql()),
    QuerySpec("text_stats", TX.text_stats, _TEXT_STATS),
    QuerySpec("language_id", TX.language_id, _LANGID),
    QuerySpec("token_counts", TX.token_counts, _TOKEN_COUNTS),
    QuerySpec("doc_fingerprints", TX.doc_fingerprints, _FINGERPRINTS),
    QuerySpec("corpus_quality_by_lang", TX.corpus_quality_by_lang, _QUALITY_BY_LANG),
    QuerySpec("multimodal_byte_features", MM.byte_features, _BYTE_FEATURES),
    QuerySpec("multimodal_frame_sample", MM.frame_sample, _FRAME_SAMPLE),
    QuerySpec("corpus_curation", CU.corpus_curation, _CURATION),
    QuerySpec("stratified_sample", CU.stratified_sample, _sample_sql()),
    QuerySpec("semantic_dedup", S.semantic_dedup, _SEMANTIC_DEDUP),
    QuerySpec("multimodal_resize", MM.resize_fixed, _RESIZE),
    QuerySpec("token_budget_mix", CU.token_budget_mix, _token_budget_sql()),
    QuerySpec("doc_chunks", TX.doc_chunks, _CHUNKS),
    QuerySpec("decontaminate", CU.decontaminate, _decontaminate_sql()),
    QuerySpec("lang_quality_quantiles", TX.lang_quality_quantiles, _QUANTILES),
    QuerySpec("vocab_top_terms", TX.vocab_top_terms, _VOCAB),
    QuerySpec("label_centroids", S.label_centroids, _CENTROIDS),
    QuerySpec("doc_top_terms", TX.doc_top_terms, _TOP_TERMS),
    QuerySpec("unigram_prob_score", TX.unigram_prob_score, _UNIGRAM_PROB),
    QuerySpec("training_shards", CU.training_shards, _shards_sql()),
    QuerySpec("sequence_packing", CU.sequence_packing, _packing_sql()),
    QuerySpec("incremental_neardup_filter", D.incremental_neardup_filter, _INCREMENTAL),
    QuerySpec("pii_scrub_docs", SC.pii_scrub_docs, SC.SCRUB_SQL()),
    QuerySpec("doc_repetition_signals", TX.doc_repetition_signals, _REPETITION),
    # promoted from the r4 queue in the r5 rotation (VERDICT r4 next-#1)
    QuerySpec("corr_quality_tokens_by_lang", TX.corr_quality_tokens_by_lang, _CORR),
    # registered in the r6 rotation after a round staged behind local
    # gates (test_staged_specs.py / test_multimodal_multibyte.py)
    QuerySpec("pq_topk", S.pq_topk, _pq_topk_sql()),
    QuerySpec("pcm_audio_features", MM.pcm_audio_features, MM.PCM_AUDIO_SQL),
    # registered in the r7 rotation after a round staged behind the
    # identical local 3-SF oracle gates (tests/test_staged_specs.py)
    QuerySpec("dup_span_coverage", D.dup_span_coverage, _dup_span_sql()),
    QuerySpec("contrastive_negatives", CU.contrastive_negatives, CU.NEGATIVES_SQL()),
    QuerySpec("chi2_terms_by_source", TX.chi2_terms_by_source, TX.CHI2_SQL()),
    # registered in the r8 rotation after two rounds staged behind the
    # identical local 3-SF oracle gates (tests/test_staged_specs.py)
    QuerySpec("bm25_topk_docs", TX.bm25_topk_docs, TX.BM25_SQL),
    QuerySpec("token_gini_by_source", TX.token_gini_by_source, TX.TOKEN_GINI_SQL),
    QuerySpec(
        "source_overlap_matrix", CU.source_overlap_matrix, CU.SOURCE_OVERLAP_SQL
    ),
    # registered in the r9 rotation after rounds staged behind the
    # identical local 3-SF oracle gates (tests/test_staged_specs.py)
    QuerySpec("embedding_dim_stats", S.embedding_dim_stats, S.DIM_STATS_SQL),
    QuerySpec("bpe_learn_merges", TX.bpe_learn_merges, TX.BPE_SQL),
    QuerySpec("dedup_canonical_docs", D.dedup_canonical_docs, CANONICAL_SQL),
    # registered in the r10 rotation after rounds staged behind the
    # identical local 3-SF oracle gates (tests/test_staged_specs.py)
    QuerySpec(
        "levenshtein_neardup_pairs",
        D.levenshtein_neardup_pairs,
        D.LEVENSHTEIN_SQL(),
    ),
    QuerySpec(
        "containment_neardup_pairs",
        D.containment_neardup_pairs,
        D.CONTAINMENT_SQL(),
    ),
    QuerySpec(
        "quantile_normalized_quality",
        TX.quantile_normalized_quality,
        QNORM_SQL,
    ),
    QuerySpec(
        "epoch_interleave_positions",
        CU.epoch_interleave_positions,
        CU.EPOCH_INTERLEAVE_SQL,
    ),
    QuerySpec(
        "kcenter_diverse_embeddings",
        S.kcenter_diverse_embeddings,
        S.KCENTER_SQL(),
    ),
    QuerySpec(
        "spearman_quality_tokens_by_lang",
        TX.spearman_quality_tokens_by_lang,
        f"WITH stats AS ({_TEXT_STATS.strip()}){TX.SPEARMAN_SQL_TAIL()}",
    ),
    # registered in the r11 rotation after rounds staged behind the
    # identical local 3-SF oracle gates (tests/test_staged_specs.py)
    QuerySpec(
        "phrase_match_docs", TX.phrase_match_docs, TX.PHRASE_MATCH_SQL()
    ),
    # the oracle is the FULL inverted-index exact-Jaccard formulation —
    # it knows nothing about prefixes, so an incomplete PPJoin filter
    # loses rows against it
    QuerySpec(
        "prefix_filter_neardup_pairs",
        D.prefix_filter_neardup_pairs,
        _NGRAM_JACCARD_FULL,
    ),
    QuerySpec(
        "priority_sample_docs",
        CU.priority_sample_docs,
        CU.PRIORITY_SAMPLE_SQL.format(
            h=md5_u60_sql("'ps|' || CAST(doc_id AS VARCHAR)")
        ),
    ),
    QuerySpec(
        "source_budget_waterfill",
        CU.source_budget_waterfill,
        f"WITH stats AS ({_TEXT_STATS.strip()}){CU.WATERFILL_SQL_TAIL()}",
    ),
    QuerySpec(
        "vocab_frequency_octaves",
        TX.vocab_frequency_octaves,
        TX.OCTAVES_SQL,
    ),
]
