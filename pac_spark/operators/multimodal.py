"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed through Arrow-batched Python (mapInPandas).

The container has no image/audio codecs, so actual decode is stubbed
(clearly marked below) — but everything Spark-side is real and tested:
binary column construction, metadata structs, the mapInPandas batch
contract (Arrow RecordBatch -> pandas -> Arrow), and a deterministic
byte-level feature extractor whose output is verified against the
DuckDB oracle. Swapping the stub for PIL/ffmpeg changes one function
body, not the plan.

At scale notes: mapInPandas streams Arrow batches (no row-at-a-time
pickling); binary payloads stay off the driver; batch size is bounded
by spark.sql.execution.arrow.maxRecordsPerBatch. Partitioning/skew
behavior is identical to any narrow transform.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pac_spark import catalog

__all__ = [
    "binary_corpus",
    "byte_features",
    "frame_sample",
    "resize_fixed",
    "decode_image_batch",
    "pcm_audio_features",
    "PCM_AUDIO_SQL",
    "blockhash_neardup_pairs",
    "BLOCKHASH_SQL",
]


def binary_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents as a multimodal table: payload BINARY + metadata
    struct — the schema contract for any image/audio/video column."""
    docs = catalog.load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.length(F.encode("text", "UTF-8")).alias("n_bytes"),
            F.col("source").alias("origin"),
        ).alias("meta"),
    )


_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("byte_sum", T.LongType()),
        T.StructField("first_byte", T.IntegerType()),
        T.StructField("last_byte", T.IntegerType()),
    ]
)


def _feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched feature extraction — the real multimodal UDF
    shape: bytes in, fixed-width features out, vectorized per batch.

    The whole batch is flattened into ONE numpy uint8 buffer and
    reduced with np.add.reduceat — no per-row Python byte loops
    (sum(bytes) is O(len) interpreted; reduceat is a single C pass
    over the concatenated payloads)."""
    import numpy as np

    for pdf in batches:
        # NULL payloads (a NULL-text document) compute as empty but
        # report n_bytes NULL — matching the oracle's encode(NULL)
        # row exactly; the pre-r8 code crashed the Python worker on
        # len(None) where the oracle succeeded (code-review r8)
        null_mask = [b is None for b in pdf["payload"]]
        payloads = [b"" if b is None else b for b in pdf["payload"]]
        lengths = np.fromiter((len(b) for b in payloads), dtype=np.int64, count=len(payloads))
        flat = np.frombuffer(b"".join(payloads), dtype=np.uint8)
        offsets = np.zeros(len(lengths), dtype=np.int64)
        np.cumsum(lengths[:-1], out=offsets[1:])
        nonempty = lengths > 0
        byte_sum = np.zeros(len(lengths), dtype=np.int64)
        if flat.size:
            # reduceat needs strictly valid start indices: compute on
            # the nonempty subset, scatter back
            sums = np.add.reduceat(flat.astype(np.int64), offsets[nonempty])
            byte_sum[nonempty] = sums
        first_byte = np.full(len(lengths), -1, dtype=np.int32)
        last_byte = np.full(len(lengths), -1, dtype=np.int32)
        first_byte[nonempty] = flat[offsets[nonempty]]
        last_byte[nonempty] = flat[offsets[nonempty] + lengths[nonempty] - 1]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": pd.array(
                    [None if m else int(n) for m, n in zip(null_mask, lengths)],
                    dtype="Int32",
                ),
                "byte_sum": byte_sum,
                "first_byte": first_byte,
                "last_byte": last_byte,
            }
        )


def byte_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic byte-level features via mapInPandas — the
    oracle-verified stand-in for decode + feature-extract."""
    corpus = binary_corpus(spark, sf_dir).select("doc_id", "payload")
    return corpus.mapInPandas(_feature_batches, schema=_FEATURES_SCHEMA).orderBy(
        "doc_id"
    )


FRAME_STRIDE = 16

_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("first_frames", T.StringType()),
        T.StructField("mean_frame", T.DoubleType()),
    ]
)


def _frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Frame sampling over opaque payloads: every FRAME_STRIDE-th byte
    is a 'frame' (the video-keyframe access pattern — seek, don't
    decode everything). Per row the sample is a strided numpy view of
    the batch buffer (C-level, no Python byte loops)."""
    import numpy as np

    for pdf in batches:
        out = {"doc_id": pdf["doc_id"], "n_frames": [], "first_frames": [], "mean_frame": []}
        for b in pdf["payload"]:
            # NULL payload: n_frames NULL (the oracle's len(NULL
            # list)), empty frame string, NULL mean — not a worker
            # crash (code-review r8)
            sampled = np.frombuffer(b or b"", dtype=np.uint8)[::FRAME_STRIDE]
            out["n_frames"].append(None if b is None else len(sampled))
            out["first_frames"].append(",".join(map(str, sampled[:8])))
            out["mean_frame"].append(
                round(float(sampled.sum(dtype=np.int64)) / len(sampled), 8)
                if len(sampled)
                else None
            )
        out["n_frames"] = pd.array(out["n_frames"], dtype="Int32")
        yield pd.DataFrame(out)


def frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic frame sampling via mapInPandas — the verified
    plumbing for video/audio frame extraction: payload in, fixed-width
    per-frame summary out, Arrow-batched. Swapping the strided-byte
    sampler for a real container parser (e.g. pyav keyframe iteration)
    changes the sampler body, not the plan."""
    corpus = binary_corpus(spark, sf_dir).select("doc_id", "payload")
    return corpus.mapInPandas(_frame_batches, schema=_FRAME_SCHEMA).orderBy("doc_id")


RESIZE_TARGET = 16

# resized emitted as a comma-joined string, not array<int>: the
# driver's order-insensitive value-hash canonicalizes scalar cells
# (same reason er_consolidated stringifies its variation arrays)
_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("resized", T.StringType()),
    ]
)


def _resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Nearest-neighbor resample of each payload to RESIZE_TARGET
    samples — the 1-D analog of image thumbnail resize: output index i
    reads source byte floor(i*n/target). Index math is one vectorized
    numpy gather per row; payloads shorter than the target upsample by
    repetition, exactly like nearest-neighbor upscale."""
    import numpy as np

    idx = np.arange(RESIZE_TARGET)
    for pdf in batches:
        out = {"doc_id": pdf["doc_id"], "n_bytes": [], "resized": []}
        for b in pdf["payload"]:
            # NULL payload: (NULL, NULL) like the oracle's NULL-text
            # row, not a worker crash (code-review r8)
            arr = np.frombuffer(b or b"", dtype=np.uint8)
            n = len(arr)
            out["n_bytes"].append(None if b is None else n)
            if n == 0:
                out["resized"].append(None)
            else:
                src = (idx * n) // RESIZE_TARGET
                out["resized"].append(",".join(map(str, arr[src])))
        out["n_bytes"] = pd.array(out["n_bytes"], dtype="Int32")
        yield pd.DataFrame(out)


def resize_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic payload resize via mapInPandas — the verified
    plumbing for image/audio resampling: variable-length payload in,
    fixed-width sample vector out, Arrow-batched. A real deployment
    swaps the byte gather for PIL's resize over the decoded image;
    schema and batch contract are unchanged."""
    corpus = binary_corpus(spark, sf_dir).select("doc_id", "payload")
    return corpus.mapInPandas(_resize_batches, schema=_RESIZE_SCHEMA).orderBy("doc_id")


def decode_image_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB — image decode (resize / frame-sample follow the same
    contract). The container ships no codecs; a real deployment
    replaces the body with e.g. PIL.Image.open over io.BytesIO and
    yields (doc_id, width, height, channels, thumbnail BINARY).
    The mapInPandas signature, schema discipline, and batching are
    exactly those of :func:`_feature_batches`.
    """
    raise NotImplementedError(
        "image decode requires a codec library not present in this "
        "container; see byte_features for the verified plumbing"
    )


_PCM_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("energy", T.LongType()),
        T.StructField("sum_amplitude", T.LongType()),
        T.StructField("peak", T.IntegerType()),
        T.StructField("zero_crossings", T.IntegerType()),
    ]
)


def _pcm_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Interpret each payload as little-endian signed 16-bit PCM and
    reduce per row with numpy (one C pass per feature over the
    concatenated samples, same vectorized shape as byte_features):
    energy Σs², amplitude Σs, peak max|s|, and sign-change count —
    the audio triage features (silence / clipping / activity) that
    need no codec, all exact integers."""
    import numpy as np

    for pdf in batches:
        # NULL payloads compute as empty but report n_samples NULL —
        # the oracle's NULL-text row (code-review r8)
        null_mask = [b is None for b in pdf["payload"]]
        payloads = [
            b"" if b is None else b[: len(b) - (len(b) % 2)]
            for b in pdf["payload"]
        ]
        lengths = np.fromiter(
            (len(b) // 2 for b in payloads), dtype=np.int64, count=len(payloads)
        )
        flat = np.frombuffer(b"".join(payloads), dtype="<i2").astype(np.int64)
        offsets = np.zeros(len(lengths), dtype=np.int64)
        np.cumsum(lengths[:-1], out=offsets[1:])
        nonempty = lengths > 0
        energy = np.zeros(len(lengths), dtype=np.int64)
        amp = np.zeros(len(lengths), dtype=np.int64)
        peak = np.zeros(len(lengths), dtype=np.int64)
        zc = np.zeros(len(lengths), dtype=np.int64)
        if flat.size:
            energy[nonempty] = np.add.reduceat(flat * flat, offsets[nonempty])
            amp[nonempty] = np.add.reduceat(flat, offsets[nonempty])
            peak[nonempty] = np.maximum.reduceat(np.abs(flat), offsets[nonempty])
            # sign-change indicator between consecutive samples, with
            # row-boundary pairs masked out before the per-row reduce
            if flat.size > 1:
                neg = flat < 0
                ind = (neg[:-1] != neg[1:]).astype(np.int64)
                ends = offsets[nonempty] + lengths[nonempty] - 1
                ind[ends[ends < ind.size]] = 0
                # rows with < 2 samples contribute nothing: their flat
                # territory holds only (masked) boundary pairs, so the
                # start-to-next-start reduceat segments stay correct
                multi = lengths > 1
                if multi.any():
                    zc[multi] = np.add.reduceat(np.append(ind, 0), offsets[multi])
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_samples": pd.array(
                    [None if m else int(n) for m, n in zip(null_mask, lengths)],
                    dtype="Int32",
                ),
                "energy": energy,
                "sum_amplitude": amp,
                "peak": peak.astype("int32"),
                "zero_crossings": zc.astype("int32"),
            }
        )


def pcm_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-modality features over the binary corpus, codec-free:
    payload → little-endian int16 PCM → exact-integer energy /
    amplitude / peak / zero-crossing features via Arrow-batched numpy,
    plus an RMS derived in the PLAN (not the UDF) so the rounding
    engine matches the oracle. Everything integer until the one final
    division+sqrt, so the DuckDB oracle (hex-dump byte list → sample
    list → the same sums) hash-matches exactly.

    Staged for the r6 rotation (r5's driver cap is fully claimed);
    until then `tests/test_multimodal_multibyte.py::test_pcm_audio_oracle`
    runs the identical oracle gate locally.
    """
    corpus = binary_corpus(spark, sf_dir).select("doc_id", "payload")
    feats = corpus.mapInPandas(_pcm_batches, schema=_PCM_SCHEMA)
    rms = F.when(
        F.col("n_samples") > 0,
        F.round(
            F.sqrt(
                F.col("energy").cast("double") / F.col("n_samples").cast("double")
            ),
            8,
        ),
    )
    return feats.withColumn("rms", rms).orderBy("doc_id")


# The hex-dump byte-decode CTE shared by EVERY multimodal oracle —
# the oracle must index BYTES, not characters (character semantics
# agree only while every document is pure ASCII — ADVICE r3); DuckDB
# has no blob indexing, so byte i = hexpair(2i-1, 2i) of
# hex(encode(text)). ONE definition (plans/llm_plans re-exports it as
# _BYTES_CTE for the byte/frame/resize oracles) so the intricate
# strpos arithmetic can never drift between copies (code-review r8).
BYTES_CTE = """
hb AS (
    SELECT doc_id, hex(encode(text)) AS hx,
           CAST(octet_length(encode(text)) AS INT) AS n
    FROM documents
),
by AS (
    SELECT doc_id, n,
           list_transform(generate_series(1, n),
               i -> 16 * (strpos('0123456789ABCDEF', substring(hx, 2*i-1, 1)) - 1)
                  + (strpos('0123456789ABCDEF', substring(hx, 2*i, 1)) - 1)) AS bytes
    FROM hb
)
"""

PCM_AUDIO_SQL = f"""
WITH {BYTES_CTE.strip()},
pcm AS (
    SELECT doc_id,
           list_transform(generate_series(1, n // 2),
               i -> CASE WHEN bytes[2*i - 1] + 256 * bytes[2*i] >= 32768
                         THEN bytes[2*i - 1] + 256 * bytes[2*i] - 65536
                         ELSE bytes[2*i - 1] + 256 * bytes[2*i] END) AS s
    FROM by
),
f AS (
    SELECT doc_id,
           CAST(len(s) AS INT) AS n_samples,
           CAST(COALESCE(list_sum(list_transform(s, x -> x * x)), 0) AS BIGINT)
               AS energy,
           CAST(COALESCE(list_sum(s), 0) AS BIGINT) AS sum_amplitude,
           CAST(COALESCE(list_max(list_transform(s, x -> abs(x))), 0) AS INT)
               AS peak,
           CAST(COALESCE(list_sum(list_transform(
                   generate_series(1, len(s) - 1),
                   i -> CASE WHEN (s[i] < 0) != (s[i+1] < 0) THEN 1 ELSE 0 END)), 0)
               AS INT) AS zero_crossings
    FROM pcm
)
SELECT *,
       CASE WHEN n_samples > 0
            THEN ROUND(sqrt(CAST(energy AS DOUBLE) / n_samples), 8) END AS rms
FROM f ORDER BY doc_id
"""


BLOCKHASH_BLOCKS = 64
BLOCKHASH_BANDS = 8
BLOCKHASH_MIN_BYTES = 64
BLOCKHASH_HAMMING_MAX = 12

_BLOCKHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("bands", T.ArrayType(T.IntegerType())),
    ]
)


def _blockhash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched 64-bit block-mean hash (the aHash family's
    byte-level member): payload split into 64 equal-frequency blocks
    (block b covers positions [b·len/64, (b+1)·len/64)), bit b set
    iff the block's byte mean exceeds the payload's global mean —
    decided by the integer cross-multiply ``sum_b·len > total·cnt_b``
    (no float division anywhere). Emitted as 8 band bytes (ints
    0..255) so downstream banding/XOR stays in plain integer columns.

    Vectorized the `_feature_batches` way: one flat uint8 buffer per
    batch, ONE np.add.reduceat over per-row×64 block offsets. Rows
    shorter than ``BLOCKHASH_MIN_BYTES`` (or NULL) are dropped — a
    sub-64-byte payload has empty blocks and no meaningful hash.
    """
    import numpy as np

    for pdf in batches:
        keep_ids, keep_payloads = [], []
        for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
            if b is not None and len(b) >= BLOCKHASH_MIN_BYTES:
                keep_ids.append(doc_id)
                keep_payloads.append(bytes(b))
        if not keep_ids:
            yield pd.DataFrame({"doc_id": [], "bands": []}).astype(
                {"doc_id": "int64"}
            )
            continue
        n = len(keep_ids)
        lengths = np.fromiter(
            (len(b) for b in keep_payloads), dtype=np.int64, count=n
        )
        flat = np.frombuffer(b"".join(keep_payloads), dtype=np.uint8).astype(
            np.int64
        )
        starts = np.zeros(n, dtype=np.int64)
        np.cumsum(lengths[:-1], out=starts[1:])
        # block partition: position p belongs to block p*64//len (the
        # oracle's closed form), so block b covers
        # [ceil(b*len/64), ceil((b+1)*len/64)) — nonempty for len >= 64
        b_idx = np.arange(BLOCKHASH_BLOCKS, dtype=np.int64)
        begins = (
            b_idx[None, :] * lengths[:, None] + BLOCKHASH_BLOCKS - 1
        ) // BLOCKHASH_BLOCKS
        ends = (
            (b_idx[None, :] + 1) * lengths[:, None] + BLOCKHASH_BLOCKS - 1
        ) // BLOCKHASH_BLOCKS
        offsets = (starts[:, None] + begins).ravel()
        block_sums = np.add.reduceat(flat, offsets)
        # reduceat quirk: a repeated offset (empty block — impossible at
        # len >= 64) would yield flat[offset]; the length gate above is
        # what rules it out
        block_sums = block_sums.reshape(n, BLOCKHASH_BLOCKS)
        cnts = ends - begins
        totals = block_sums.sum(axis=1)
        bits = (block_sums * lengths[:, None] > totals[:, None] * cnts).astype(
            np.int64
        )
        weights = 1 << (7 - np.arange(8, dtype=np.int64))
        bands = (
            bits.reshape(n, BLOCKHASH_BANDS, 8) * weights[None, None, :]
        ).sum(axis=2)
        yield pd.DataFrame(
            {"doc_id": keep_ids, "bands": [list(map(int, r)) for r in bands]}
        )


def blockhash_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal near-duplicate pairs by block-mean perceptual hash:
    the binary-payload analogue of the MinHash tier — the hash is
    computed from BYTES by an Arrow-batched numpy UDF (the multimodal
    decode stand-in: swapping in a real image decode changes one
    function body), candidates come from LSH-style banding (pairs
    agreeing on at least one of 8 band bytes at the same position),
    and survivors are rescored by EXACT Hamming distance over the
    full 64-bit hash (``bit_count(xor)`` per band, summed) at
    ``<= BLOCKHASH_HAMMING_MAX``.

    Scale shape: the hash frame is pinned (band explode + both rescore
    probes); banding is one (band_idx, band_val)-keyed self-join whose
    fan-out is bounded by bucket occupancy — boilerplate-heavy buckets
    are exactly the AQE skew-split case; the rescore joins the K-band
    arrays back by doc id and is row-local arithmetic. The oracle
    restates hash, banding, and rescore over the character stream
    (``ascii(substr(text))``) — equal to the byte stream for this
    corpus's single-byte text, the STATED assumption of the oracle
    (not of the operator, which hashes raw bytes).
    """
    from pac_spark.cache import pin

    corpus = binary_corpus(spark, sf_dir).select("doc_id", "payload")
    hashes = pin(
        corpus.mapInPandas(_blockhash_batches, schema=_BLOCKHASH_SCHEMA)
    )
    bands = hashes.select(
        "doc_id", F.posexplode("bands").alias("band_idx", "band_val")
    )
    cand = (
        bands.alias("x")
        .join(
            bands.alias("y"),
            (F.col("x.band_idx") == F.col("y.band_idx"))
            & (F.col("x.band_val") == F.col("y.band_val"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    ha = hashes.select(
        F.col("doc_id").alias("doc_a"), F.col("bands").alias("ba")
    )
    hb = hashes.select(
        F.col("doc_id").alias("doc_b"), F.col("bands").alias("bb")
    )
    hamming = F.expr(
        "aggregate(zip_with(ba, bb, (x, y) -> bit_count(x ^ y)),"
        " 0, (acc, h) -> acc + h)"
    )
    return (
        cand.join(ha, "doc_a")
        .join(hb, "doc_b")
        .select("doc_a", "doc_b", hamming.cast("long").alias("hamming"))
        .filter(F.col("hamming") <= BLOCKHASH_HAMMING_MAX)
        .orderBy("doc_a", "doc_b")
    )


BLOCKHASH_SQL = f"""
WITH d AS (
    SELECT doc_id, text, length(text) AS len FROM documents
    WHERE text IS NOT NULL AND length(text) >= {BLOCKHASH_MIN_BYTES}
),
chars AS (
    SELECT doc_id, len,
           (u.i - 1) * {BLOCKHASH_BLOCKS} // len AS b,
           ascii(substr(text, u.i, 1)) AS v
    FROM d, UNNEST(range(1, len + 1)) u(i)
),
blocks AS (
    SELECT doc_id, len, b, SUM(v) AS s, COUNT(*) AS c
    FROM chars GROUP BY 1, 2, 3
),
tot AS (SELECT doc_id, SUM(s) AS total FROM blocks GROUP BY doc_id),
bits AS (
    SELECT blocks.doc_id, b,
           CASE WHEN s * len > total * c THEN 1 ELSE 0 END AS bit
    FROM blocks JOIN tot ON blocks.doc_id = tot.doc_id
),
bands AS (
    SELECT doc_id, b // 8 AS band_idx,
           CAST(SUM(bit << (7 - (b % 8))) AS INT) AS band_val
    FROM bits GROUP BY 1, 2
),
cand AS (
    SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
    FROM bands x JOIN bands y
      ON x.band_idx = y.band_idx AND x.band_val = y.band_val
     AND x.doc_id < y.doc_id
),
ham AS (
    SELECT doc_a, doc_b, SUM(bit_count(xor(xa.band_val, xb.band_val))) AS hamming
    FROM cand
    JOIN bands xa ON xa.doc_id = cand.doc_a
    JOIN bands xb ON xb.doc_id = cand.doc_b AND xb.band_idx = xa.band_idx
    GROUP BY 1, 2
)
SELECT CAST(doc_a AS BIGINT) AS doc_a, CAST(doc_b AS BIGINT) AS doc_b,
       CAST(hamming AS BIGINT) AS hamming
FROM ham WHERE hamming <= {BLOCKHASH_HAMMING_MAX}
ORDER BY doc_a, doc_b
"""
