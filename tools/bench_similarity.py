"""Microbenchmark for the stdlib similarity kernels (kernels/similarity.py).

The bit-parallel LCS ratio is the per-pair constant behind D1 dedup verify,
M4 image-entity relevance, and R2 fuzzy search (VERDICT r3 item 5). This
prints raw single-core pairs/sec per kernel over three representative
workloads so the blocking math in BENCH.md can be stated as a budget:

    wall_time ≈ scored_pairs / (pairs_per_sec_per_core × cores)

No Spark involved — this is the pure-Python kernel floor; the in-pipeline
number (with Arrow batch + Python-worker overhead) is the ``sim_kernel``
block in bench.py's JSON.

Usage: python tools/bench_similarity.py [n_pairs]
"""

from __future__ import annotations

import json
import random
import sys
import time

sys.path.insert(0, ".")

from mmkg_rag_spark.kernels.similarity import (  # noqa: E402
    image_entity_relevance,
    ratio,
    token_ratio,
)

WORDS = (
    "acme global web consortium laboratories metropolitan area robotics "
    "tyrell systems institute pacific northern analytics".split()
)


def _name(rng: random.Random, n_tokens: int) -> str:
    return " ".join(rng.choice(WORDS).capitalize() for _ in range(n_tokens))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    rng = random.Random(7)

    # entity-name-shaped pairs (dedup verify: token-sorted upper norms)
    short_pairs = [
        (_name(rng, rng.randint(1, 4)).upper(), _name(rng, rng.randint(1, 4)).upper())
        for _ in range(n)
    ]
    # retrieval-shaped pairs (keyword vs field)
    kw_pairs = [
        (rng.choice(WORDS), _name(rng, rng.randint(2, 6))) for _ in range(n)
    ]
    # mmodal-shaped scoring (terms list vs caption+texts)
    mm = [
        (
            [_name(rng, 2), _name(rng, 1)],
            _name(rng, rng.randint(3, 8)),
            [_name(rng, 4) for _ in range(rng.randint(1, 3))],
        )
        for _ in range(n // 10)
    ]

    out = {}
    t0 = time.perf_counter()
    for a, b in short_pairs:
        ratio(a, b)
    dt = time.perf_counter() - t0
    out["ratio_entity_norms"] = {"pairs": n, "pairs_per_sec": round(n / dt)}

    t0 = time.perf_counter()
    for a, b in kw_pairs:
        token_ratio(a, b)
    dt = time.perf_counter() - t0
    out["token_ratio_search"] = {"pairs": n, "pairs_per_sec": round(n / dt)}

    t0 = time.perf_counter()
    for terms, cap, texts in mm:
        image_entity_relevance(terms, cap, texts)
    dt = time.perf_counter() - t0
    out["image_entity_relevance"] = {
        "pairs": len(mm),
        "pairs_per_sec": round(len(mm) / dt),
    }

    print(json.dumps(out))


if __name__ == "__main__":
    main()
