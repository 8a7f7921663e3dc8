"""Ingest-gate scale probe: drive DedupIngest / NearDupIngest over
successive same-size waves and measure (a) per-wave wall time as the
kept store GROWS — the number that must stay flat-ish for the gate to
be a viable standing service — and (b) the state actually stored per
kept doc.

Corpus per wave: ``dup_pct`` of docs duplicate texts from earlier
waves (the exact gate must reject them), the rest are novel. For the
near-dup gate the duplicates are light EDITS of earlier docs (tail
token changed) so rejection has to travel the LSH band + signature
path, not the md5 short-circuit.

Usage: python tools/ingest_probe.py [wave_docs] [n_waves] [dup_pct]
Prints one JSON line per (gate, wave) plus a summary.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.session import (  # noqa: E402
    build_session,
)
from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.streaming.ingest_dedup import (  # noqa: E402
    ChainedIngest,
    DedupIngest,
    NearDupIngest,
    SpanDedupIngest,
)


def _wave_df(spark, wave: int, n: int, dup_pct: int, edit: bool):
    """Wave w's docs: ids [w*n, (w+1)*n). The first dup_pct% of every
    wave past the first duplicate WAVE-0 docs (src = id % n — always an
    admitted doc, so the expected-reject arithmetic is exact); all
    other docs are novel. Text = 12 tokens hashed from (src, pos), so
    DISTINCT docs are near-orthogonal (no accidental near-dups) while
    a duplicate reproduces its source's tokens exactly. The near-gate
    variant appends one token to each duplicate: 3-shingle Jaccard
    10/11 ≈ 0.91 — above any sane τ, with a ~1% LSH miss rate at
    k=16/bands=4 (the probe's tolerance)."""
    df = spark.range(wave * n, (wave + 1) * n).select(
        F.col("id").alias("doc_id"),
        F.when(
            (F.col("id") % 100 < dup_pct) & (F.col("id") >= n),
            F.col("id") % n,
        )
        .otherwise(F.col("id"))
        .alias("src"),
        ((F.col("id") % 100 < dup_pct) & (F.col("id") >= n)).alias("_isdup"),
    )
    toks = F.transform(
        F.sequence(F.lit(0), F.lit(11)),
        lambda i: F.concat(
            F.lit("w"),
            F.pmod(F.xxhash64(F.col("src"), i), F.lit(100000)).cast("string"),
        ),
    )
    text = F.array_join(toks, " ")
    if edit:
        text = F.when(
            F.col("_isdup"), F.concat(text, F.lit(" edited"))
        ).otherwise(text)
    return df.select("doc_id", text.alias("text"))


def probe(gate_cls, name: str, spark, wave_docs: int, n_waves: int,
          dup_pct: int, count_fn=None, **gate_kw) -> dict:
    """count_fn overrides how the 'kept' total is read (the chain's
    final table is the quality VERDICTS — every admitted doc gets a
    row regardless of its verdict, which is the admission count the
    expected-kept arithmetic predicts)."""
    if count_fn is None:
        count_fn = lambda g: g.kept().count()  # noqa: E731
    root = tempfile.mkdtemp(prefix=f"ingest_probe_{name}_")
    gate = gate_cls(spark, root, schema="doc_id long, text string",
                    fmt="json", **gate_kw)
    per_wave = []
    for w in range(n_waves):
        df = _wave_df(spark, w, wave_docs, dup_pct,
                      edit=(name in ("near", "chain", "chain4", "chain4_qfirst")))
        df.coalesce(1).write.mode("overwrite").json(
            os.path.join(root, "landing", f"w{w}")
        )
        # the file source needs files directly under landing/ — move
        for f in os.listdir(os.path.join(root, "landing", f"w{w}")):
            if f.endswith(".json"):
                os.rename(
                    os.path.join(root, "landing", f"w{w}", f),
                    os.path.join(root, "landing", f"wave{w}.json"),
                )
        shutil.rmtree(os.path.join(root, "landing", f"w{w}"))
        t0 = time.perf_counter()
        gate.run_available()
        secs = round(time.perf_counter() - t0, 2)
        kept = count_fn(gate)
        per_wave.append({"wave": w, "secs": secs, "kept_total": kept})
        print(json.dumps({"gate": name, **per_wave[-1]}), flush=True)
    n_dups = (n_waves - 1) * wave_docs * dup_pct // 100
    out = {
        "gate": name,
        "kept_final": per_wave[-1]["kept_total"],
        # chain4: spans strip every dup to the IDENTICAL 1-token stub
        # ("edited" is a constant), so the near gate collapses all
        # stubs to ONE first-arrival — spans-preempt-near measured:
        # non-dups + exactly one stub, and the 3-stage chain's ~1% LSH
        # miss envelope disappears (window hashes are exact)
        "expected_kept": (
            n_waves * wave_docs - n_dups + (1 if n_dups else 0)
            if name in ("chain4", "chain4_qfirst")
            else n_waves * wave_docs - n_dups
        ),
        # the near gate is LSH-mediated: ~1% of true dups miss every
        # band at J≈0.91, k=16/bands=4 — allow that envelope; exact,
        # span, and chain4 are hash-exact (identical stubs always
        # collide and agree 16/16 — zero tolerance)
        "tolerance": (
            0 if name in ("exact", "span", "chain4", "chain4_qfirst")
            else max(2, n_dups * 3 // 100)
        ),
        # (chain: same LSH envelope — its rejections are the near stage's)
        "wave_secs": [p["secs"] for p in per_wave],
    }
    shutil.rmtree(root, ignore_errors=True)
    return out


def compaction_probe(gate_cls, name: str, spark, n_docs: int,
                     n_versions: int, **gate_kw) -> dict:
    """r13 (VERDICT r12 #3): every wave RE-SENDS the same n_docs ids
    with edited text (version v appends a fresh token set), so the
    live corpus stays n_docs while the ADDITIVE store accumulates one
    generation of state per superseded version. compact() must bring
    the store back to exactly the live corpus's state rows:
    exact gate → one fingerprint per kept doc; span gate → the distinct
    window rows of the kept cleaned texts."""
    root = tempfile.mkdtemp(prefix=f"ingest_probe_compact_{name}_")
    gate = gate_cls(spark, root, schema="doc_id long, text string",
                    fmt="json", **gate_kw)
    store_fn = (
        (lambda g: g.fingerprints().count())
        if name == "exact"
        else (lambda g: g.winhashes().count())
    )
    for v in range(n_versions):
        toks = F.transform(
            F.sequence(F.lit(0), F.lit(11)),
            lambda i: F.concat(
                F.lit("v"),
                F.pmod(
                    F.xxhash64(F.col("id"), F.lit(v), i), F.lit(100000)
                ).cast("string"),
            ),
        )
        df = spark.range(0, n_docs).select(
            F.col("id").alias("doc_id"), F.array_join(toks, " ").alias("text")
        )
        df.coalesce(1).write.mode("overwrite").json(
            os.path.join(root, "landing", f"v{v}")
        )
        for f in os.listdir(os.path.join(root, "landing", f"v{v}")):
            if f.endswith(".json"):
                os.rename(
                    os.path.join(root, "landing", f"v{v}", f),
                    os.path.join(root, "landing", f"version{v}.json"),
                )
        shutil.rmtree(os.path.join(root, "landing", f"v{v}"))
        gate.run_available()
        print(json.dumps({
            "gate": f"compact_{name}", "version": v,
            "kept": gate.kept().count(), "store_rows": store_fn(gate),
        }), flush=True)
    before = store_fn(gate)
    t0 = time.perf_counter()
    gate.compact()
    secs = round(time.perf_counter() - t0, 2)
    after = store_fn(gate)
    if name == "exact":
        expected = gate.kept().count()
    else:
        from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (  # noqa: E501
            dedup,
        )
        expected = (
            dedup._window_hashes(
                gate.kept(), gate.min_len, "text", "doc_id"
            ).select("_h", "_id").distinct().count()
        )
    out = {
        "gate": f"compact_{name}", "n_docs": n_docs,
        "n_versions": n_versions, "store_before": before,
        "store_after": after, "expected_live": expected,
        "compact_secs": secs,
        "store_tracks_live_corpus": after == expected and after < before,
    }
    shutil.rmtree(root, ignore_errors=True)
    return out


def gc_compaction_probe(spark, name: str, n_docs: int, dim: int = 64) -> dict:
    """r14 (VERDICT r13 #3): the near/embedding/quality stores MERGE by
    id, so supersedes don't grow them — their GC case is EXTERNAL
    removal from kept (downstream takedown). Ingest n_docs, remove half
    the kept rows directly, compact, and check the store shrank to
    exactly the live corpus's state rows."""
    root = tempfile.mkdtemp(prefix=f"ingest_probe_gc_{name}_")
    if name == "near":
        gate = NearDupIngest(spark, root, schema="doc_id long, text string")
        store_fn = lambda g: g.signatures().count()  # noqa: E731
        id_col = "doc_id"
    elif name == "embedding":
        from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.streaming.ingest_dedup import (  # noqa: E501
            EmbeddingDedupIngest,
        )

        gate = EmbeddingDedupIngest(
            spark, root, schema="vec_id long, embedding array<double>",
            dim=dim, n_planes=16, probe_hamming=2,
        )
        store_fn = lambda g: g.vectors().count()  # noqa: E731
        id_col = "vec_id"
    else:
        raise ValueError(name)

    if name == "near":
        toks = F.transform(
            F.sequence(F.lit(0), F.lit(11)),
            lambda i: F.concat(
                F.lit("w"),
                F.pmod(F.xxhash64(F.col("id"), i), F.lit(100000)).cast("string"),
            ),
        )
        df = spark.range(0, n_docs).select(
            F.col("id").alias("doc_id"), F.array_join(toks, " ").alias("text")
        )
    else:
        vec = F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: (
                F.pmod(F.xxhash64(F.col("id"), i), F.lit(2001)) - F.lit(1000)
            ).cast("double") / F.lit(1000.0),
        )
        df = spark.range(0, n_docs).select(
            F.col("id").alias("vec_id"), vec.alias("embedding")
        )
    df.coalesce(1).write.mode("overwrite").json(os.path.join(root, "landing", "_w"))
    for f in os.listdir(os.path.join(root, "landing", "_w")):
        if f.endswith(".json"):
            os.rename(os.path.join(root, "landing", "_w", f),
                      os.path.join(root, "landing", "w0.json"))
    shutil.rmtree(os.path.join(root, "landing", "_w"))
    gate.run_available()
    kept0, store0 = gate.kept().count(), store_fn(gate)

    # external GC: drop every even id from kept
    kept_path = os.path.join(root, "kept")
    live = spark.read.parquet(kept_path).filter(F.col(id_col) % 2 == 1)
    tmp = os.path.join(root, "_kept_rewrite")
    live.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(kept_path)
    os.rename(tmp, kept_path)

    t0 = time.perf_counter()
    gate.compact()
    secs = round(time.perf_counter() - t0, 2)
    kept1, store1 = gate.kept().count(), store_fn(gate)
    out = {
        "gate": f"gc_compact_{name}", "n_docs": n_docs,
        "kept_before": kept0, "store_before": store0,
        "kept_after_gc": kept1, "store_after": store1,
        "compact_secs": secs,
        "store_tracks_live_corpus": store1 == kept1 and store1 < store0,
    }
    shutil.rmtree(root, ignore_errors=True)
    return out


def probe_embedding(spark, wave_vecs: int, n_waves: int, dup_pct: int,
                    dim: int = 64) -> dict:
    """r13: the vector-side gate. Wave w's vectors: ids [w*n, (w+1)*n);
    dup_pct% of post-first waves perturb a WAVE-0 vector (coordinate
    noise ≤ 1% of the coordinate range — cosine ≥ 0.999, far above τ),
    the rest are fresh pseudo-random vectors (expected |cos| ≈ 1/√dim
    ≈ 0.125 at dim 64 — never near τ). Rejection must travel the SRP
    ring + cosine-verify path; perturbation can flip near-boundary
    plane signs, so misses within the ring-1 envelope get the same
    ~3% tolerance as the near-text gate."""
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.streaming.ingest_dedup import (  # noqa: E501
        EmbeddingDedupIngest,
    )

    root = tempfile.mkdtemp(prefix="ingest_probe_emb_")
    # production-τ parameterization (the embedding_near_dups guidance):
    # 16 planes + ring-2 → candidate fraction 137/2^16 ≈ 0.2% of pair
    # space (6 planes/ring-1 = 11% — measured NON-flat per-wave cost:
    # the store-side candidate count grows linearly with kept vectors)
    gate = EmbeddingDedupIngest(
        spark, root, schema="vec_id long, embedding array<double>",
        threshold=0.9, n_planes=16, dim=dim, probe_hamming=2, fmt="json",
    )
    per_wave = []
    for w in range(n_waves):
        df = spark.range(w * wave_vecs, (w + 1) * wave_vecs).select(
            F.col("id").alias("vec_id"),
            F.when(
                (F.col("id") % 100 < dup_pct) & (F.col("id") >= wave_vecs),
                F.col("id") % wave_vecs,
            ).otherwise(F.col("id")).alias("src"),
            ((F.col("id") % 100 < dup_pct) & (F.col("id") >= wave_vecs))
            .alias("_isdup"),
        )
        base = F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda d: (
                F.pmod(F.xxhash64(F.col("src"), d), F.lit(2001)) - 1000
            ).cast("double") / 1000.0,
        )
        noise = F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda d: F.when(
                F.col("_isdup"),
                (F.pmod(F.xxhash64(F.col("vec_id"), d, F.lit(7)), F.lit(21))
                 - 10).cast("double") / 1000.0,
            ).otherwise(F.lit(0.0)),
        )
        vec = F.zip_with(base, noise, lambda a, b: a + b)
        out = df.select("vec_id", vec.alias("embedding"))
        out.coalesce(1).write.mode("overwrite").json(
            os.path.join(root, "landing", f"w{w}")
        )
        for f in os.listdir(os.path.join(root, "landing", f"w{w}")):
            if f.endswith(".json"):
                os.rename(
                    os.path.join(root, "landing", f"w{w}", f),
                    os.path.join(root, "landing", f"wave{w}.json"),
                )
        shutil.rmtree(os.path.join(root, "landing", f"w{w}"))
        t0 = time.perf_counter()
        gate.run_available()
        secs = round(time.perf_counter() - t0, 2)
        kept = gate.kept().count()
        per_wave.append({"wave": w, "secs": secs, "kept_total": kept})
        print(json.dumps({"gate": "embedding", **per_wave[-1]}), flush=True)
    n_dups = (n_waves - 1) * wave_vecs * dup_pct // 100
    out = {
        "gate": "embedding",
        "kept_final": per_wave[-1]["kept_total"],
        "expected_kept": n_waves * wave_vecs - n_dups,
        "tolerance": max(2, n_dups * 3 // 100),
        "wave_secs": [p["secs"] for p in per_wave],
    }
    shutil.rmtree(root, ignore_errors=True)
    return out


def probe_drift(spark, wave_rows: int, n_waves: int) -> dict:
    """r16: the drift monitor at the landing edge. Per-wave cost must
    stay FLAT as the drift log grows — each batch's work is one
    grouped count to bucket grain + one bucket-grain join + a
    batch-keyed MERGE of ≤ n_buckets+1 rows; nothing scales with
    history. Waves alternate in-distribution and shifted so both the
    zero-PSI and drifted paths are exercised; the summary asserts the
    log holds every wave and shifted waves read positive PSI."""
    import json as _json

    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.streaming.drift import (  # noqa: E501
        DriftMonitor,
    )

    root = tempfile.mkdtemp(prefix="drift_probe_")
    baseline = spark.range(wave_rows).select(
        (F.col("id") % 1000).cast("long").alias("v")
    )
    mon = DriftMonitor(
        spark, root, schema="doc_id long, v long", value_col="v",
        baseline=baseline, n_buckets=8,
    )
    wave_secs = []
    for w in range(n_waves):
        shift = 0 if w % 2 == 0 else 700
        path = os.path.join(root, "landing", f"w{w}.json")
        with open(path, "w") as f:
            for i in range(wave_rows):
                f.write(_json.dumps(
                    {"doc_id": w * wave_rows + i,
                     "v": (i % 1000) + shift}) + "\n")
        t0 = time.time()
        mon.run_available()
        wave_secs.append(round(time.time() - t0, 2))
    psi = {r.batch_id: r.psi_micro for r in mon.batch_psi().collect()}
    n_batches = len(psi)
    shifted_positive = all(
        v > 0 for b, v in psi.items() if b % 2 == 1
    )
    inband_zero = all(v == 0 for b, v in psi.items() if b % 2 == 0)
    shutil.rmtree(root, ignore_errors=True)
    return {
        "gate": "drift", "wave_rows": wave_rows, "wave_secs": wave_secs,
        "n_batches_logged": n_batches,
        "shifted_waves_positive_psi": shifted_positive,
        "inband_waves_zero_psi": inband_zero,
        "ok": n_batches == n_waves and shifted_positive and inband_zero,
    }


def main() -> None:
    wave_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    n_waves = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    dup_pct = int(sys.argv[3]) if len(sys.argv) > 3 else 30

    spark = build_session(app_name="ingest-probe", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    print(json.dumps({"probe": "ingest", "wave_docs": wave_docs,
                      "n_waves": n_waves, "dup_pct": dup_pct}), flush=True)
    results = [
        probe(DedupIngest, "exact", spark, wave_docs, n_waves, dup_pct),
        probe(NearDupIngest, "near", spark, max(wave_docs // 4, 1000),
              n_waves, dup_pct),
        # the full three-gate chain: edited dups pass the exact stage
        # (texts differ) and must be caught by the near stage; every
        # admitted doc gets a quality verdict row
        probe(ChainedIngest, "chain", spark, max(wave_docs // 4, 1000),
              n_waves, dup_pct,
              count_fn=lambda g: g.verdicts().count(), min_tokens=3),
        # span gate (r12): exact-copy dups are EMPTIED, not dropped —
        # count the docs that kept any text; expected equals the exact
        # gate's kept arithmetic with zero tolerance (no LSH, exact
        # window hashes; novel docs are token-disjoint by construction)
        probe(SpanDedupIngest, "span", spark, max(wave_docs // 4, 1000),
              n_waves, dup_pct,
              count_fn=lambda g: g.kept().filter(
                  F.col("text") != "").count(),
              min_len=5),
        # four-stage chain (r12): edited dups lose their whole shared
        # body at the SPAN stage (cleaned to the 1-token novel tail) and
        # then pass the near gate as unique stubs — the documented
        # spans-preempt-near interplay — so EVERY doc gets a verdict row
        probe(ChainedIngest, "chain4", spark, max(wave_docs // 4, 1000),
              n_waves, dup_pct,
              count_fn=lambda g: g.verdicts().count(),
              span_min_len=5, min_tokens=3),
        # r13 chain-ORDER study (VERDICT r12 #5): quality FIRST. Same
        # admission arithmetic as chain4 (the stub collapse moves to
        # the trailing near stage; raw texts all pass min_tokens), but
        # quality now scores EVERY landing row — including the dups the
        # dedup stages would have rejected — and its verdicts predate
        # the span rewrite (the leak hazard is e2e-pinned; here we
        # measure the wall-time cost of the order)
        # (max_digit_ratio relaxed: the synthetic 'w12345' tokens are
        # digit-heavy; with quality FIRST a fired rule gates ADMISSION,
        # so the probe's zero-tolerance arithmetic needs every raw doc
        # to pass — in chain4 the same verdicts are informational)
        probe(ChainedIngest, "chain4_qfirst", spark,
              max(wave_docs // 4, 1000), n_waves, dup_pct,
              count_fn=lambda g: g.kept().count(),
              span_min_len=5, min_tokens=3, max_digit_ratio=1.0,
              order=("quality", "exact", "spans", "near")),
        # r13: the vector-side gate (SRP ring + cosine verify)
        probe_embedding(spark, max(wave_docs // 4, 1000), n_waves, dup_pct),
        # r16: the drift monitor cell (flat per-wave, bucket-grain state)
        probe_drift(spark, wave_docs, n_waves),
    ]
    for r in results:
        # drift cell carries its own verdict; admission gates are judged
        # on the kept-count arithmetic
        ok = r["ok"] if "ok" in r else (
            abs(r["kept_final"] - r["expected_kept"]) <= r["tolerance"]
        )
        print(json.dumps({**r, "kept_matches_expected": ok}), flush=True)
        if not ok:
            raise SystemExit(f"FAIL: {r['gate']} kept mismatch")

    # r13: store compaction — superseded versions' state must be GC-able
    # r14: + external-GC compaction for the MERGE-by-id stores (near /
    # embedding; quality's ledger scoping is pinned by its e2e test —
    # its store is one row per scored id, nothing to measure beyond it)
    for r in [
        compaction_probe(DedupIngest, "exact", spark,
                         max(wave_docs // 4, 1000), 4),
        compaction_probe(SpanDedupIngest, "span", spark,
                         max(wave_docs // 16, 500), 4, min_len=5),
        gc_compaction_probe(spark, "near", max(wave_docs // 4, 1000)),
        gc_compaction_probe(spark, "embedding", max(wave_docs // 4, 1000)),
    ]:
        print(json.dumps(r), flush=True)
        if not r["store_tracks_live_corpus"]:
            raise SystemExit(f"FAIL: {r['gate']} compaction mismatch")


if __name__ == "__main__":
    main()
