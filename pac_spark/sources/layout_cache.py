"""Sidecar validation for write-once layout caches.

The engine's derived layouts — bucketed copies
(:mod:`pac_spark.sources.bucketing`), compacted and Z-ordered copies
(:mod:`pac_spark.sources.compaction` callers) — are built ONCE per
(table, scale factor) and only read afterwards. Two silent-staleness
hazards come with that bargain (ADVICE r5 #2/#3):

- the cross-session DDL-registration branch of ``ensure_bucketed``
  used to trust the CALLER's bucket count and schema when registering
  files already on disk — a different ``n_buckets`` would make Spark
  mis-plan bucket pruning against file names hashed with the old
  count and return wrong rows;
- the compaction caches keyed only on ``basename(sf_dir)`` — source
  data regenerated in place (or a different dataset sharing the
  basename) would keep serving the stale copy while the oracle reads
  the fresh table.

Both are closed the same way: every layout directory carries a tiny
JSON sidecar (``_pac_layout.json``) recording the layout spec (kind,
key, bucket count, schema) and a fingerprint of the SOURCE files
(relative name, size, mtime) captured at build time. A cache hit
requires ``_SUCCESS`` AND a sidecar that matches the spec the caller
is requesting now; any mismatch — or a pre-sidecar layout — rebuilds.

The fingerprint is a metadata pass (one listdir), never a data read:
at 100 TB the equivalent is the table format's snapshot/transaction id
(Delta/Iceberg), which this sidecar stands in for on plain parquet.
"""

from __future__ import annotations

import hashlib
import json
import os

__all__ = [
    "source_fingerprint",
    "layout_intact",
    "write_sidecar",
]

_SIDECAR = "_pac_layout.json"


def source_fingerprint(*paths: str) -> str:
    """Hash of the source files' (relative name, size, mtime) triples.

    ``paths`` may be parquet files or directories (walked recursively,
    data files only — ``_SUCCESS``/sidecar markers excluded so a
    rebuilt derived layout doesn't fingerprint its own bookkeeping).
    Metadata only: no file contents are read.
    """
    entries: list[tuple[str, int, int]] = []
    for p in paths:
        if os.path.isdir(p):
            for root, _dirs, files in os.walk(p):
                for f in sorted(files):
                    if f.startswith(("_", ".")):
                        continue
                    full = os.path.join(root, f)
                    st = os.stat(full)
                    entries.append(
                        (os.path.relpath(full, p), st.st_size, st.st_mtime_ns)
                    )
        elif os.path.exists(p):
            st = os.stat(p)
            entries.append((os.path.basename(p), st.st_size, st.st_mtime_ns))
        else:
            # a nonexistent source must ERROR, not hash to the stable
            # empty fingerprint — a typo'd path would otherwise match
            # its sidecar forever and keep serving a stale layout, the
            # exact hazard this module exists to detect (code-review r8)
            raise FileNotFoundError(f"source_fingerprint: {p} does not exist")
    entries.sort()
    h = hashlib.sha256(json.dumps(entries).encode())
    return h.hexdigest()[:16]


def layout_intact(path: str, spec: dict) -> bool:
    """True iff ``path`` holds a completed layout (``_SUCCESS``) whose
    sidecar exactly matches the requested ``spec``. A missing or
    unreadable sidecar (pre-sidecar layouts included) is a miss — the
    caller rebuilds, which is always safe for a derived copy."""
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        return False
    try:
        with open(os.path.join(path, _SIDECAR)) as f:
            return json.load(f) == spec
    except (OSError, ValueError):
        return False


def write_sidecar(path: str, spec: dict) -> None:
    """Record ``spec`` next to the layout's ``_SUCCESS`` marker."""
    with open(os.path.join(path, _SIDECAR), "w") as f:
        json.dump(spec, f, sort_keys=True)
