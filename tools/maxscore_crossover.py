"""MaxScore crossover probe (VERDICT r12 #4): the decontamination
workload — the WHOLE val split as BM25 queries against the full corpus
(the q52 decon shape: shingle_k=3, k=10) — timed on three paths:

- unpruned  exact:  bm25_topk_df (no df cut)
- dfcut     lossy:  bm25_topk_df(max_df_ppm=100000)  — the gated path
- maxscore  exact:  bm25_topk_maxscore_df(split_df_ppm=100000)

at sf0.01 (1x) and sf0.1 (10x). Per (variant, sf): min-of-3 COLD runs
(the maxscore substrate caches are released before every run — q52
pays the cold cost once per gate evaluation, so cold is the honest
number). Exactness is asserted per sf: maxscore rows == unpruned rows.

Usage: python tools/maxscore_crossover.py
Prints one JSON line per (sf, variant) plus a crossover summary.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.functions import (  # noqa: E402
    cache,
)
from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (  # noqa: E402
    text as text_ops,
)
from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators.curation import (  # noqa: E402
    assign_split,
)
from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.session import (  # noqa: E402
    build_session,
)

SF_DIRS = {"1x": "/root/testdata/sf0.01", "10x": "/root/testdata/sf0.1"}
CACHE_SLOTS = ("text.maxscore_dfreq", "text.maxscore_postings")


def _decon_inputs(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    valq = assign_split(docs).filter(F.col("split") == "val").select(
        F.col("doc_id").alias("query_id"), F.col("text").alias("query_text")
    )
    return docs, valq


def _variant(name, docs, valq):
    if name == "unpruned":
        return text_ops.bm25_topk_df(docs, valq, k=10, shingle_k=3)
    if name == "dfcut":
        return text_ops.bm25_topk_df(
            docs, valq, k=10, max_df_ppm=100_000, shingle_k=3
        )
    return text_ops.bm25_topk_maxscore_df(
        docs, valq, k=10, split_df_ppm=100_000, shingle_k=3
    )


def _timed(build, runs: int = 3) -> float:
    best = float("inf")
    for _ in range(runs):
        for slot in CACHE_SLOTS:
            cache.release(slot)
        t0 = time.perf_counter()
        build().write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    spark = build_session(
        app_name="maxscore-crossover", master="local[32]",
        shuffle_partitions=32,
    )
    spark.sparkContext.setLogLevel("ERROR")
    times: dict[tuple[str, str], float] = {}
    for sf_name, sf_dir in SF_DIRS.items():
        docs, valq = _decon_inputs(spark, sf_dir)
        nq = valq.count()
        # exactness at the decon shape: maxscore == unpruned
        got = sorted(
            map(tuple, _variant("maxscore", docs, valq)
                .select("query_id", "rank", "doc_id", "score_micro")
                .collect())
        )
        want = sorted(
            map(tuple, _variant("unpruned", docs, valq).collect())
        )
        assert got == want, f"maxscore != unpruned at {sf_name}"
        for v in ("unpruned", "dfcut", "maxscore"):
            secs = _timed(lambda v=v: _variant(v, docs, valq))
            times[(sf_name, v)] = secs
            print(json.dumps({
                "sf": sf_name, "n_queries": nq, "variant": v, "secs": secs,
            }))
    for sf_name in SF_DIRS:
        u, m = times[(sf_name, "unpruned")], times[(sf_name, "maxscore")]
        print(json.dumps({
            "summary": sf_name,
            "maxscore_vs_unpruned": round(m / u, 2) if u else None,
            "pruned_wins_absolute": m < u,
        }))
    spark.stop()


if __name__ == "__main__":
    main()
