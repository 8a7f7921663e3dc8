"""Near-dup blocking scale probe: embedding_near_dups at PRODUCTION
parameters (τ=0.9, many planes, small ring) over growing corpora with
PLANTED near-duplicates.

The gated q28 instance runs at τ=0.5 on near-uniform synthetic vectors —
the adversarial regime for sign-LSH, where the probe ring must cover
most of a small bucket space (correct, oracle-matched, but candidate
ratio is high by construction). THIS probe shows the regime the
operator is built for: real near-dup corpora (τ ≥ 0.9, per-plane
agreement p = 1−θ/π ≥ 0.86), where candidate count grows ~linearly in
the corpus while all-pairs grows quadratically.

For each N: generate N/2 base vectors + N/2 planted near-dups
(base + small noise, cosine ≥ 0.95 whp), run the BANDED multi-table
operator (L=16 tables × 16 planes; recall 1−(1−p^b)^L ≈ 0.93 at
p=0.9, random-collision ratio ≈ L·2^−b ≈ 2.4e−4), and report:
  - recall of planted pairs (exact baseline run only at the smallest N;
    planted-pair recovery measured at every N)
  - candidate pairs vs all-pairs N·(N−1)/2 (the work ratio)
  - wall seconds

Usage: python tools/neardup_probe.py [N1 N2 ...]   (default 2000 10000 40000)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (  # noqa: E402
    similarity,
)
from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.session import (  # noqa: E402
    build_session,
)

DIM = 64
N_TABLES = 16
BAND_PLANES = 16
TAU = 0.9


def corpus(spark, n: int):
    """n vectors: ids [0, n/2) are random bases; id i+n/2 is a planted
    near-dup of id i (cosine ≥ ~0.95). Deterministic seed."""
    rng = np.random.RandomState(7)
    half = n // 2
    base = rng.normal(size=(half, DIM)).astype(np.float32)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    # per-dim scale 0.04 → noise vector norm ≈ 0.04·√64 = 0.32 against a
    # unit base → cosine ≈ 1/√(1+0.32²) ≈ 0.95
    noise = rng.normal(size=(half, DIM)).astype(np.float32) * 0.04
    dup = base + noise
    dup /= np.linalg.norm(dup, axis=1, keepdims=True)
    vecs = np.vstack([base, dup])
    pdf = pd.DataFrame(
        {"vec_id": np.arange(n, dtype=np.int64), "embedding": list(map(list, vecs))}
    )
    return spark.createDataFrame(pdf), half


def candidate_count(df) -> int:
    """Distinct pairs surviving the banded blocking (before the cosine
    filter) — the work measure. Reuses the operator with threshold=-1
    (every candidate passes), so the counted set IS the operator's."""
    return similarity.embedding_near_dups_banded(
        df, threshold=-1.0, n_tables=N_TABLES, band_planes=BAND_PLANES, dim=DIM
    ).count()


def main() -> None:
    sizes = [int(x) for x in sys.argv[1:]] or [2000, 10000, 40000]
    spark = build_session(
        app_name="neardup-probe", master="local[32]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")
    ok = True
    for n in sizes:
        df, half = corpus(spark, n)
        df = df.cache()
        df.count()
        t0 = time.perf_counter()
        found = (
            similarity.embedding_near_dups_banded(
                df, threshold=TAU, n_tables=N_TABLES, band_planes=BAND_PLANES, dim=DIM
            )
            .collect()
        )
        elapsed = time.perf_counter() - t0
        planted = {(i, i + half) for i in range(half)}
        got_pairs = {(r.id_a, r.id_b) for r in found}
        # planted pairs whose true cosine clears τ (noise occasionally dips below)
        emb = {r.vec_id: np.array(r.embedding) for r in df.collect()}
        truly_dup = {
            (a, b) for (a, b) in planted
            if round(float(np.dot(emb[a], emb[b]) / (np.linalg.norm(emb[a]) * np.linalg.norm(emb[b]))), 6) >= TAU
        }
        recall = len(got_pairs & truly_dup) / max(1, len(truly_dup))
        cands = candidate_count(df)
        allpairs = n * (n - 1) // 2
        rec = {
            "n": n,
            "planted_clearing_tau": len(truly_dup),
            "found_pairs": len(got_pairs),
            "planted_recall": round(recall, 3),
            "candidate_pairs": cands,
            "all_pairs": allpairs,
            "work_ratio": round(cands / allpairs, 5),
            "sec": round(elapsed, 2),
        }
        ok = ok and recall >= 0.8
        print(json.dumps(rec), flush=True)
        df.unpersist()
    print(json.dumps({"verdict": "PASS" if ok else "FAIL"}))
    spark.stop()
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
