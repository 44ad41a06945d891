"""Same-JVM interleaved A/B timing for registry queries.

Usage:
    python tools/ab_time.py <rounds> <query> [query ...]

Times each named query with the bench's protocol (warm-up at sf0.001,
release_caches between runs, System.gc between queries, min over
``rounds`` interleaved passes) in ONE JVM, so ambient drift hits both
sides of a comparison equally. Compare two code states by running this
before and after a change — or, for a flag-gated change, set the flag
env var per invocation.

Prints one JSON line: {"query": min_sec, ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pac_spark.cache import release_caches  # noqa: E402
from pac_spark.plans.registry import queries  # noqa: E402
from pac_spark.session import get_spark  # noqa: E402


def main() -> None:
    rounds = int(sys.argv[1])
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="pac_spark_ab")
    qs = queries()
    for name in names:
        if name not in qs:
            raise SystemExit(f"unknown query: {name}")
        qs[name](spark, "/root/testdata/sf0.001").count()  # warm codegen
    release_caches(all_generations=True)
    spark.catalog.clearCache()
    best: dict[str, float] = {}
    for _ in range(rounds):
        for name in names:
            spark.sparkContext._jvm.System.gc()
            t0 = time.time()
            qs[name](spark, sf_dir).count()
            dt = round(time.time() - t0, 3)
            best[name] = min(best.get(name, dt), dt)
            release_caches(all_generations=True)
    print(json.dumps(best))
    spark.stop()


if __name__ == "__main__":
    main()
