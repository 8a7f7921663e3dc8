"""Versioned parquet tables (r10): snapshot-isolated publish, keyed
MERGE with CDC tombstones, time travel, vacuum retention, and crash
behavior at the pointer commit point."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
    versioned,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k string, v long")


def test_publish_read_history_roundtrip(spark, tmp_path):
    root = str(tmp_path / "t")
    g0 = versioned.publish(spark, root, _df(spark, [("a", 1), ("b", 2)]))
    assert g0 == 0 and versioned.current_version(root) == 0
    assert {(r.k, r.v) for r in versioned.read_latest(spark, root).collect()} \
        == {("a", 1), ("b", 2)}
    g1 = versioned.publish(spark, root, _df(spark, [("a", 9)]))
    assert g1 == 1
    hist = versioned.history(root)
    assert [h["generation"] for h in hist] == [0, 1]
    assert [h["is_current"] for h in hist] == [False, True]
    assert all(h["n_files"] > 0 and h["bytes"] > 0 for h in hist)


def test_merge_versioned_semantics_and_snapshot_isolation(spark, tmp_path):
    root = str(tmp_path / "t")
    versioned.merge_versioned(
        spark, root, _df(spark, [("a", 1), ("b", 2)]), ["k"]
    )
    # a reader resolves generation 0 BEFORE the next merge...
    old = versioned.read_version(spark, root, 0)
    versioned.merge_versioned(
        spark, root, _df(spark, [("b", 20), ("c", 3)]), ["k"]
    )
    # ...and still reads the complete old snapshot AFTER it (the
    # isolation the in-place swap cannot give)
    assert {(r.k, r.v) for r in old.collect()} == {("a", 1), ("b", 2)}
    assert {(r.k, r.v) for r in versioned.read_latest(spark, root).collect()} \
        == {("a", 1), ("b", 20), ("c", 3)}

    # duplicate-key sources violate the same contract as upsert.merge
    with pytest.raises(ValueError, match="key-unique"):
        versioned.merge_versioned(
            spark, root, _df(spark, [("x", 1), ("x", 2)]), ["k"]
        )


def test_merge_versioned_tombstones_delete(spark, tmp_path):
    root = str(tmp_path / "t")
    versioned.merge_versioned(
        spark, root, _df(spark, [("a", 1), ("b", 2), ("c", 3)]), ["k"]
    )
    cdc = spark.createDataFrame(
        [("a", 0, True),     # delete a
         ("b", 20, False),   # update b
         ("d", 4, False),    # insert d
         ("z", 0, True)],    # tombstone for an absent key: no-op
        "k string, v long, _deleted boolean",
    )
    versioned.merge_versioned(spark, root, cdc, ["k"], delete_col="_deleted")
    got = {(r.k, r.v) for r in versioned.read_latest(spark, root).collect()}
    assert got == {("b", 20), ("c", 3), ("d", 4)}
    assert "_deleted" not in versioned.read_latest(spark, root).columns


def test_vacuum_retention_and_time_travel_expiry(spark, tmp_path):
    root = str(tmp_path / "t")
    for i in range(4):
        versioned.publish(spark, root, _df(spark, [("a", i)]))
    assert versioned.current_version(root) == 3
    removed = versioned.vacuum(root, keep_last=2)
    assert removed == [0, 1]
    # time travel inside the retention window works, beyond it raises
    assert versioned.read_version(spark, root, 2).collect()[0].v == 2
    with pytest.raises(FileNotFoundError, match="vacuumed"):
        versioned.read_version(spark, root, 0)
    assert versioned.read_latest(spark, root).collect()[0].v == 3


def test_crash_before_pointer_flip_never_serves_partial(
    spark, tmp_path, monkeypatch
):
    """A publish that dies after writing its gen directory but before
    the pointer flip leaves the table serving the OLD snapshot; the
    next publish supersedes the dangling directory with a fresh
    generation number and vacuum sweeps it."""
    root = str(tmp_path / "t")
    versioned.publish(spark, root, _df(spark, [("a", 1)]))

    real_replace = os.replace

    def _boom(src, dst):
        if dst.endswith(versioned._POINTER):
            raise RuntimeError("crash before pointer flip")
        return real_replace(src, dst)

    monkeypatch.setattr(versioned.os, "replace", _boom)
    with pytest.raises(RuntimeError, match="crash before pointer flip"):
        versioned.publish(spark, root, _df(spark, [("a", 2)]))
    monkeypatch.setattr(versioned.os, "replace", real_replace)

    # still serving the old complete snapshot
    assert versioned.current_version(root) == 0
    assert versioned.read_latest(spark, root).collect()[0].v == 1
    # recovery: the next publish lands on a FRESH number (the dangling
    # gen=1 is never re-pointed) and becomes current
    g = versioned.publish(spark, root, _df(spark, [("a", 3)]))
    assert g == 2 and versioned.read_latest(spark, root).collect()[0].v == 3
    # vacuum sweeps the dangling crashed generation
    removed = versioned.vacuum(root, keep_last=1)
    assert 1 in removed


def test_merge_versioned_schema_evolution(spark, tmp_path):
    """A source with a NEW column widens the table (old rows read it
    as null) and a source MISSING a column fills nulls — the
    mergeSchema semantics merge_parquet already has, preserved through
    the versioned path."""
    root = str(tmp_path / "t")
    versioned.merge_versioned(spark, root, _df(spark, [("a", 1)]), ["k"])
    wide = spark.createDataFrame([("b", 2, "x")], "k string, v long, extra string")
    versioned.merge_versioned(spark, root, wide, ["k"])
    got = {(r.k, r.v, r.extra)
           for r in versioned.read_latest(spark, root).collect()}
    assert got == {("a", 1, None), ("b", 2, "x")}
    # and a narrow source against the widened table back-fills null
    versioned.merge_versioned(spark, root, _df(spark, [("c", 3)]), ["k"])
    got = {(r.k, r.v, r.extra)
           for r in versioned.read_latest(spark, root).collect()}
    assert got == {("a", 1, None), ("b", 2, "x"), ("c", 3, None)}


def test_merge_versioned_dedupe_is_deterministic(spark, tmp_path):
    """ADVICE r10 (low): on_duplicate_source='dedupe' used dropDuplicates
    — an arbitrary surviving row per key, so two identical runs could
    publish DIFFERENT generations. The winner is now deterministic:
    highest md5 of the JSON-serialized non-key payload, independent of
    partitioning."""
    import hashlib
    import json

    dup_rows = [("a", 1), ("a", 2), ("a", 3), ("b", 7), ("b", 8)]
    want = {}
    for k, v in dup_rows:
        # Spark to_json emits compact separators: {"v":1}
        h = hashlib.md5(
            json.dumps({"v": v}, separators=(",", ":")).encode()
        ).hexdigest()
        if k not in want or h > want[k][0]:
            want[k] = (h, v)
    expect = {(k, hv[1]) for k, hv in want.items()}

    for trial, parts in enumerate([1, 7]):  # partitioning-invariant
        root = str(tmp_path / f"t{trial}")
        src = _df(spark, dup_rows).repartition(parts)
        versioned.merge_versioned(
            spark, root, src, ["k"], on_duplicate_source="dedupe"
        )
        got = {(r.k, r.v)
               for r in versioned.read_latest(spark, root).collect()}
        assert got == expect

    # all-key sources (no payload): duplicates are identical rows,
    # plain dropDuplicates is already deterministic
    root = str(tmp_path / "allkeys")
    src = spark.createDataFrame([("a",), ("a",), ("b",)], "k string")
    versioned.merge_versioned(
        spark, root, src, ["k"], on_duplicate_source="dedupe"
    )
    assert {r.k for r in versioned.read_latest(spark, root).collect()} \
        == {"a", "b"}


def test_read_changes_cdc_between_generations(spark, tmp_path):
    """read_changes = Delta's table_changes on the snapshot model: a
    merge that updates, inserts, AND tombstone-deletes in one source
    yields exactly those change rows between the two generations; the
    feed is reproducible while both snapshots survive vacuum, raises
    after, and spanning multiple merges composes (g0→g2 sees the NET
    change)."""
    root = str(tmp_path / "t")
    g0 = versioned.publish(
        spark, root, _df(spark, [("a", 1), ("b", 2), ("c", 3)])
    )
    src = spark.createDataFrame(
        [("a", 9, False), ("d", 4, False), ("c", 0, True)],
        "k string, v long, is_del boolean",
    )
    g1 = versioned.merge_versioned(spark, root, src, ["k"], delete_col="is_del")

    ch = {
        r.k: (r.change_type, r.changed_cols)
        for r in versioned.read_changes(spark, root, ["k"], g0, g1).collect()
    }
    assert ch == {"a": ("changed", "v"), "c": ("removed", ""), "d": ("added", "")}

    # include_unchanged surfaces the untouched key too
    full = {
        r.k: r.change_type
        for r in versioned.read_changes(
            spark, root, ["k"], g0, g1, include_unchanged=True
        ).collect()
    }
    assert full["b"] == "unchanged" and len(full) == 4

    # net change across TWO merges: b updated then a removed — g0→g2
    src2 = spark.createDataFrame(
        [("b", 7, False), ("a", 9, True)], "k string, v long, is_del boolean"
    )
    g2 = versioned.merge_versioned(spark, root, src2, ["k"], delete_col="is_del")
    net = {
        r.k: r.change_type
        for r in versioned.read_changes(spark, root, ["k"], g0, g2).collect()
    }
    assert net == {"a": "removed", "b": "changed", "c": "removed", "d": "added"}

    # to_gen defaults to the pointer
    assert {
        r.k
        for r in versioned.read_changes(spark, root, ["k"], g1).collect()
    } == {"a", "b"}

    # a vacuumed from-snapshot is gone — the feed refuses, not invents
    versioned.vacuum(root, keep_last=1)
    with pytest.raises(FileNotFoundError):
        versioned.read_changes(spark, root, ["k"], g0, g2)


def _full_agg(df, group_cols, sum_cols, count_col="n_rows"):
    from pyspark.sql import functions as F

    return df.groupBy(*group_cols).agg(
        *[F.sum(F.col(c).cast("long")).cast("long").alias(c) for c in sum_cols],
        F.count(F.lit(1)).cast("long").alias(count_col),
    )


def test_incremental_agg_refresh_equals_full_recompute(spark):
    """incremental_agg_refresh == a full recompute BIT-EXACTLY across
    randomized multi-generation edits (adds, removes, value changes,
    GROUP-MOVING changes), chained gen→gen→gen, at 1 and 7
    partitions; groups whose count reaches zero disappear exactly as
    they do under recompute."""
    import random

    from pyspark.sql import functions as F  # noqa: F401

    rng = random.Random(11)

    def grp():
        # NULL is a real group value (~1 in 6): the outer merge must
        # marry NULL groups null-safely (the r15 self-review find)
        g = rng.randrange(6)
        return None if g == 5 else f"g{g}"

    rows = {i: (grp(), rng.randrange(100, 10_000)) for i in range(200)}

    def snap(r):
        return spark.createDataFrame(
            [(k, g, v) for k, (g, v) in sorted(r.items())],
            "id long, grp string, cents long",
        )

    gens = [dict(rows)]
    for _ in range(3):
        cur = dict(gens[-1])
        for _ in range(25):  # removes
            if cur:
                cur.pop(rng.choice(sorted(cur)))
        for _ in range(25):  # adds
            cur[max(cur, default=0) + rng.randrange(1, 9)] = (
                grp(), rng.randrange(100, 10_000),
            )
        for _ in range(25):  # changes, half of them group-moving
            if cur:
                k = rng.choice(sorted(cur))
                g, v = cur[k]
                cur[k] = (
                    grp() if rng.random() < 0.5 else g,
                    rng.randrange(100, 10_000),
                )
        # drop one whole group sometimes (zero-count path)
        if rng.random() < 0.7:
            gone = f"g{rng.randrange(5)}"
            cur = {k: gv for k, gv in cur.items() if gv[0] != gone}
        gens.append(cur)

    for parts in (1, 7):
        agg = _full_agg(snap(gens[0]).repartition(parts), ["grp"], ["cents"])
        for i in range(1, len(gens)):
            old_s = snap(gens[i - 1]).repartition(parts)
            new_s = snap(gens[i]).repartition(parts)
            agg = versioned.incremental_agg_refresh(
                agg, old_s, new_s, ["id"], ["grp"], ["cents"]
            )
            want = {
                (r.grp, r.cents, r.n_rows)
                for r in _full_agg(new_s, ["grp"], ["cents"]).collect()
            }
            got = {(r.grp, r.cents, r.n_rows) for r in agg.collect()}
            assert got == want, (parts, i)


def test_incremental_agg_refresh_guards(spark):
    """Float measures are rejected up front (order-dependent sums
    cannot be delta-applied); an old_agg that is NOT the aggregate of
    old_snapshot raises at evaluation (negative count guard)."""
    import pytest as _pytest

    from pyspark.sql import utils as _u  # noqa: F401

    old_s = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20)], "id long, grp string, cents long"
    )
    new_s = spark.createDataFrame(
        [(2, "a", 20)], "id long, grp string, cents long"
    )
    fl = spark.createDataFrame(
        [(1, "a", 1.5)], "id long, grp string, cents double"
    )
    ok_agg = _full_agg(old_s, ["grp"], ["cents"])
    with _pytest.raises(ValueError, match="integral"):
        versioned.incremental_agg_refresh(
            ok_agg, fl, fl, ["id"], ["grp"], ["cents"]
        )
    # wrong old_agg: claims zero rows for group a, so removing id=1
    # would drive the count negative — must raise, never publish
    bad_agg = spark.createDataFrame(
        [("a", 0, 0)], "grp string, cents long, n_rows long"
    )
    out = versioned.incremental_agg_refresh(
        bad_agg, old_s, new_s, ["id"], ["grp"], ["cents"]
    )
    with _pytest.raises(Exception, match="negative row count"):
        out.collect()
    # ADVICE r15: merged count 0 with NONZERO merged sums is the same
    # inconsistency (all rows removed implies the delta exactly cancels
    # the served sums) — must raise, never silently drop the group.
    # old_agg claims n=1 / cents=99 for group a; removing both rows
    # (delta n=-2, cents=-30)... use a snapshot where exactly one row
    # leaves so the count lands at 0 but the sum residue is nonzero.
    one_s = spark.createDataFrame(
        [(1, "a", 10)], "id long, grp string, cents long"
    )
    empty_s = one_s.filter(F.lit(False))
    bad_sum_agg = spark.createDataFrame(
        [("a", 99, 1)], "grp string, cents long, n_rows long"
    )
    out0 = versioned.incremental_agg_refresh(
        bad_sum_agg, one_s, empty_s, ["id"], ["grp"], ["cents"]
    )
    with _pytest.raises(Exception, match="zero row count with nonzero"):
        out0.collect()
    # and the CONSISTENT zero-count case still silently drops the group
    good_agg = _full_agg(one_s, ["grp"], ["cents"])
    gone = versioned.incremental_agg_refresh(
        good_agg, one_s, empty_s, ["id"], ["grp"], ["cents"]
    )
    assert gone.count() == 0


def _agg_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_refresh_served_agg_cdc_composition(spark, tmp_path):
    """VERDICT r15 #3 — the CDC-to-served-gold loop as ONE call:
    merge_versioned(base) → read_changes → incremental_agg_refresh →
    publish, bit-exact vs a full recompute across 3 base generations
    covering inserts, value updates, GROUP MOVES, and tombstone
    deletes; replay after a completed refresh is a no-op; a crash
    between the refresh computation and the pointer flip (dangling gen
    dir, pointer unmoved) converges on replay; a vacuumed reflected
    snapshot falls back to a full recompute with identical results."""
    base = str(tmp_path / "base")
    agg = str(tmp_path / "agg")
    ks, gs, ss = ["id"], ["grp"], ["cents"]

    def check():
        got = _agg_rows(versioned.read_latest(spark, agg))
        want = _agg_rows(
            versioned.full_agg(versioned.read_latest(spark, base), gs, ss)
        )
        assert got == want

    # gen 0: bootstrap (full recompute path)
    versioned.merge_versioned(
        spark,
        base,
        spark.createDataFrame(
            [(1, "a", 10), (2, "a", 20), (3, "b", 30)],
            "id long, grp string, cents long",
        ),
        ks,
    )
    g0 = versioned.refresh_served_agg(spark, base, agg, ks, gs, ss)
    assert g0 == 0
    check()
    # replay with no base change: no-op, nothing published
    assert versioned.refresh_served_agg(spark, base, agg, ks, gs, ss) is None
    assert versioned.current_version(agg) == 0

    # gen 1: update (id=1 value), insert (id=4), GROUP MOVE (id=3 b→c)
    versioned.merge_versioned(
        spark,
        base,
        spark.createDataFrame(
            [(1, "a", 15), (4, "b", 40), (3, "c", 30)],
            "id long, grp string, cents long",
        ),
        ks,
    )
    g1 = versioned.refresh_served_agg(spark, base, agg, ks, gs, ss)
    assert g1 == 1
    check()
    # the incremental generation records the base gen it reflects
    assert versioned.read_meta(agg, 1)["base_gen"] == versioned.current_version(base)

    # gen 2: tombstone delete removes group c entirely (id=3 was its
    # only row) — the served aggregate must DROP the group
    versioned.merge_versioned(
        spark,
        base,
        spark.createDataFrame(
            [(3, "c", 0, True)], "id long, grp string, cents long, _del boolean"
        ),
        ks,
        delete_col="_del",
    )
    g2 = versioned.refresh_served_agg(spark, base, agg, ks, gs, ss)
    assert g2 == 2
    check()
    assert "c" not in {r[0] for r in versioned.read_latest(spark, agg).collect()}

    # crash window: base advances, the refresh's gen dir gets written
    # but the pointer flip never happens — replay must supersede the
    # dangling dir and converge
    versioned.merge_versioned(
        spark,
        base,
        spark.createDataFrame([(5, "a", 50)], "id long, grp string, cents long"),
        ks,
    )
    cur = versioned.current_version(agg)
    dangling = versioned.incremental_agg_refresh(
        versioned.read_version(spark, agg, cur),
        versioned.read_version(
            spark, base, versioned.read_meta(agg, cur)["base_gen"]
        ),
        versioned.read_latest(spark, base),
        ks, gs, ss,
    )
    # simulate publish dying after the parquet write, before the flip
    dangling.write.mode("overwrite").parquet(
        os.path.join(agg, f"gen={cur + 1}")
    )
    assert versioned.current_version(agg) == cur  # pointer unmoved
    g3 = versioned.refresh_served_agg(spark, base, agg, ks, gs, ss)
    assert g3 == cur + 2  # fresh number — the dangling dir is superseded
    check()

    # vacuumed reflected snapshot: drop everything but the latest base
    # gen, advance base, refresh — the full-recompute fallback fires
    # and the result is still exact
    versioned.merge_versioned(
        spark,
        base,
        spark.createDataFrame([(6, "d", 60)], "id long, grp string, cents long"),
        ks,
    )
    versioned.vacuum(base, keep_last=1)
    g4 = versioned.refresh_served_agg(spark, base, agg, ks, gs, ss)
    assert g4 is not None
    check()


def test_incremental_agg_refresh_non_abelian_recompute(spark):
    """VERDICT r15 #4 — the non-abelian escape hatch: MIN/MAX columns
    are recomputed from new_snapshot for TOUCHED GROUPS only (delta
    apply cannot see the next MIN after the current MIN row leaves);
    untouched groups keep served values; the result equals a full
    recompute bit-exactly, including the case that breaks naive IVM —
    deleting a group's minimum row; a recompute column absent from
    old_agg raises."""
    import pytest as _pytest

    gs, ss = ["grp"], ["cents"]
    rec = {
        "min_cents": F.min(F.col("cents").cast("long")).cast("long"),
        "max_cents": F.max(F.col("cents").cast("long")).cast("long"),
    }
    old_s = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 5), (4, "b", 50)],
        "id long, grp string, cents long",
    )
    # id=1 (group a's MIN) deleted; id=4 (group b's MAX) moves to c;
    # group d appears; group b keeps one row
    new_s = spark.createDataFrame(
        [(2, "a", 20), (3, "b", 5), (4, "c", 50), (5, "d", 7)],
        "id long, grp string, cents long",
    )
    old_agg = versioned.full_agg(old_s, gs, ss, recompute_exprs=rec)
    got = versioned.incremental_agg_refresh(
        old_agg, old_s, new_s, ["id"], gs, ss, recompute_exprs=rec
    )
    want = versioned.full_agg(new_s, gs, ss, recompute_exprs=rec)
    assert sorted(got.columns) == sorted(want.columns)
    assert _agg_rows(got.select(*want.columns)) == _agg_rows(want)
    # group a's min moved 10→20 ONLY via the scoped recompute
    a = {r.grp: (r.min_cents, r.max_cents) for r in got.collect()}
    assert a["a"] == (20, 20)
    assert a["b"] == (5, 5)       # touched (lost its max row)
    assert a["c"] == (50, 50)
    assert a["d"] == (7, 7)
    with _pytest.raises(ValueError, match="recompute column"):
        versioned.incremental_agg_refresh(
            old_agg.drop("min_cents"), old_s, new_s, ["id"], gs, ss,
            recompute_exprs=rec,
        )


def test_refresh_served_agg_with_non_abelian_columns(spark, tmp_path):
    """The CDC loop carries non-abelian columns end to end: bootstrap
    publishes MIN/MAX via full_agg, every refresh maintains them via
    the scoped recompute, and each generation equals the full recompute
    bit-exactly — including a delete that removes a group's minimum."""
    base = str(tmp_path / "base")
    agg = str(tmp_path / "agg")
    ks, gs, ss = ["id"], ["grp"], ["cents"]
    rec = {"min_cents": F.min(F.col("cents").cast("long")).cast("long")}

    def check():
        got = _agg_rows(versioned.read_latest(spark, agg))
        want = _agg_rows(
            versioned.full_agg(
                versioned.read_latest(spark, base), gs, ss,
                recompute_exprs=rec,
            )
        )
        assert got == want

    versioned.merge_versioned(
        spark, base,
        spark.createDataFrame(
            [(1, "a", 10), (2, "a", 20), (3, "b", 30)],
            "id long, grp string, cents long",
        ),
        ks,
    )
    versioned.refresh_served_agg(
        spark, base, agg, ks, gs, ss, recompute_exprs=rec
    )
    check()
    # delete group a's MIN row — the served min must rise 10→20, which
    # only the scoped recompute can know
    versioned.merge_versioned(
        spark, base,
        spark.createDataFrame(
            [(1, "a", 0, True)], "id long, grp string, cents long, _d boolean"
        ),
        ks, delete_col="_d",
    )
    versioned.refresh_served_agg(
        spark, base, agg, ks, gs, ss, recompute_exprs=rec
    )
    check()
    row_a = [
        r for r in versioned.read_latest(spark, agg).collect() if r.grp == "a"
    ][0]
    assert row_a.min_cents == 20 and row_a.n_rows == 1


def test_optimize_compacts_preserving_content_and_meta(spark, tmp_path):
    """versioned.optimize republishes the pointed generation with fewer
    files and identical rows; the generation meta (base_gen) carries
    forward so refresh_served_agg keeps working after compacting the
    AGG table; old readers keep their snapshot; z-order mode clusters
    on the requested columns and preserves content too."""
    base = str(tmp_path / "base")
    agg = str(tmp_path / "agg")
    ks, gs, ss = ["id"], ["grp"], ["cents"]
    versioned.merge_versioned(
        spark, base,
        spark.range(2000).select(
            F.col("id"),
            F.concat(F.lit("g"), (F.col("id") % 7)).alias("grp"),
            (F.col("id") % 100).cast("long").alias("cents"),
        ).repartition(32),
        ks,
    )
    versioned.refresh_served_agg(spark, base, agg, ks, gs, ss)
    # file-count reduction on the 32-partition BASE table
    files_before = versioned.history(base)[-1]["n_files"]
    assert files_before > 4
    base_reader = versioned.read_latest(spark, base)
    base_before = _agg_rows(base_reader)
    gb = versioned.optimize(spark, base, n_files=1)
    bhist = {h["generation"]: h for h in versioned.history(base)}
    assert bhist[gb]["is_current"] and bhist[gb]["n_files"] < files_before
    assert _agg_rows(versioned.read_latest(spark, base)) == base_before
    assert _agg_rows(base_reader) == base_before  # old snapshot serves

    before = _agg_rows(versioned.read_latest(spark, agg))
    g = versioned.optimize(spark, agg, n_files=1)
    assert _agg_rows(versioned.read_latest(spark, agg)) == before
    # meta carried forward: the compacted agg still records the base
    # gen it REFLECTS (gen 0 — base's own optimize at gen 1 changed no
    # rows, and the next refresh will prove that with an empty diff)
    m = versioned.read_meta(agg, g)
    assert m["base_gen"] == 0
    assert m["optimized_from"] == g - 1
    # and the CDC loop keeps working on the compacted table
    versioned.merge_versioned(
        spark, base,
        spark.createDataFrame([(9999, "g0", 5)], "id long, grp string, cents long"),
        ks,
    )
    versioned.refresh_served_agg(spark, base, agg, ks, gs, ss)
    want = _agg_rows(
        versioned.full_agg(versioned.read_latest(spark, base), gs, ss)
    )
    assert _agg_rows(versioned.read_latest(spark, agg)) == want

    # z-order mode: content preserved AND clustering measurably applied
    # (footer-stats span on the leading z-column shrinks well below the
    # ~1.0 every-file-spans-everything baseline)
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        layout,
    )

    g2 = versioned.optimize(
        spark, base, n_files=4, zorder_cols=["id", "cents"]
    )
    assert _agg_rows(versioned.read_latest(spark, base)) == _agg_rows(
        versioned.read_version(spark, base, g2 - 1)
    )
    prof = layout.file_span_profile(
        os.path.join(base, f"gen={g2}"), ["id"]
    )
    assert prof["id"] < 0.6
    # optimize on an unborn table raises
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        versioned.optimize(spark, str(tmp_path / "nope"))


def _rows(df):
    # repr-keyed sort: NULLs are unorderable under plain tuple compare
    return sorted((tuple(r) for r in df.collect()), key=repr)


def test_incremental_join_refresh_equals_full_rejoin(spark):
    """Join-view IVM (r16): the incremental result must equal a full
    re-join ROW-FOR-ROW across inserts, value updates, deletes,
    JOIN-KEY MOVES on both sides, and NULL join keys (which never
    match in either path)."""
    a_old = spark.createDataFrame(
        [
            (1, "c1", 10),
            (2, "c1", 20),
            (3, "c2", 30),
            (4, None, 40),   # NULL join key: matches nothing, both paths
            (5, "c3", 50),
        ],
        "id long, cust string, amt long",
    )
    b_old = spark.createDataFrame(
        [("c1", "gold"), ("c2", "silver"), ("c4", "bronze")],
        "cust string, seg string",
    )
    # changes: A — update id=1 amt, MOVE id=3 c2→c4, delete id=5,
    # insert id=6 (matching), id=4 keeps its NULL key;
    # B — update c1 seg, delete c2, insert c5 (matched by nothing yet)
    a_new = spark.createDataFrame(
        [
            (1, "c1", 11),
            (2, "c1", 20),
            (3, "c4", 30),
            (4, None, 40),
            (6, "c4", 60),
        ],
        "id long, cust string, amt long",
    )
    b_new = spark.createDataFrame(
        [("c1", "plat"), ("c4", "bronze"), ("c5", "tin")],
        "cust string, seg string",
    )
    old_view = versioned.full_join_view(a_old, b_old, ["cust"])
    got = versioned.incremental_join_refresh(
        old_view, a_old, a_new, b_old, b_new,
        keys_a=["id"], keys_b=["cust"], join_on=["cust"],
    )
    want = versioned.full_join_view(a_new, b_new, ["cust"])
    assert got.columns == want.columns
    assert _rows(got) == _rows(want)
    assert len(_rows(got)) > 0

    # empty change sets: the served view passes through row-for-row
    empty_a = a_new.select("id").limit(0)
    empty_b = b_new.select("cust").limit(0)
    same = versioned.incremental_join_refresh(
        want, a_new, a_new, b_new, b_new,
        keys_a=["id"], keys_b=["cust"], join_on=["cust"],
        changed_keys_a=empty_a, changed_keys_b=empty_b,
    )
    assert _rows(same) == _rows(want)


def test_incremental_join_refresh_null_pk_prunes(spark):
    """A NULL row-identity key on either base must still prune its
    served rows (eqNullSafe anti-joins — the r15 NULL-key-in-keyed-
    merge rule). A plain-equality prune would leave the stale row in
    the view forever."""
    a_old = spark.createDataFrame(
        [(None, "c1", 10), (2, "c1", 20)], "id long, cust string, amt long"
    )
    b = spark.createDataFrame([("c1", "gold")], "cust string, seg string")
    # the NULL-id row changes its amount
    a_new = spark.createDataFrame(
        [(None, "c1", 99), (2, "c1", 20)], "id long, cust string, amt long"
    )
    old_view = versioned.full_join_view(a_old, b, ["cust"])
    changed = spark.createDataFrame([(None,)], "id long")
    got = versioned.incremental_join_refresh(
        old_view, a_old, a_new, b, b,
        keys_a=["id"], keys_b=["cust"], join_on=["cust"],
        changed_keys_a=changed,
        changed_keys_b=b.select("cust").limit(0),
    )
    want = versioned.full_join_view(a_new, b, ["cust"])
    assert _rows(got) == _rows(want)
    assert (99,) in {(r.amt,) for r in got.collect()}


def test_incremental_join_refresh_rejects_ambiguous_columns(spark):
    a = spark.createDataFrame([(1, "c1", 5)], "id long, cust string, v long")
    b = spark.createDataFrame([("c1", 7)], "cust string, v long")
    with pytest.raises(ValueError, match="ambiguous"):
        versioned.incremental_join_refresh(
            versioned.full_join_view(a, b, ["cust"]),
            a, a, b, b, ["id"], ["cust"], ["cust"],
        )


def test_refresh_served_join_cdc_composition(spark, tmp_path):
    """The CDC-to-served-JOIN loop as ONE call: read_changes on both
    bases → incremental_join_refresh → publish; bit-exact vs a full
    re-join across generations covering one-side and both-side
    changes; replay no-ops; crash-before-flip converges; a vacuumed
    reflected snapshot on either side falls back to a full re-join."""
    ra, rb, rv = (
        str(tmp_path / "a"), str(tmp_path / "b"), str(tmp_path / "view")
    )
    ka, kb, jn = ["id"], ["cust"], ["cust"]

    def check():
        got = _rows(versioned.read_latest(spark, rv))
        want = _rows(
            versioned.full_join_view(
                versioned.read_latest(spark, ra),
                versioned.read_latest(spark, rb),
                jn,
            )
        )
        assert got == want

    versioned.merge_versioned(
        spark, ra,
        spark.createDataFrame(
            [(1, "c1", 10), (2, "c2", 20)], "id long, cust string, amt long"
        ),
        ka,
    )
    versioned.merge_versioned(
        spark, rb,
        spark.createDataFrame(
            [("c1", "gold"), ("c2", "silver")], "cust string, seg string"
        ),
        kb,
    )
    # bootstrap = full join
    assert versioned.refresh_served_join(spark, ra, rb, rv, ka, kb, jn) == 0
    check()
    meta = versioned.read_meta(rv, 0)
    assert meta["base_gen_a"] == versioned.current_version(ra)
    assert meta["base_gen_b"] == versioned.current_version(rb)
    # replay with no base change: no-op
    assert versioned.refresh_served_join(spark, ra, rb, rv, ka, kb, jn) is None
    assert versioned.current_version(rv) == 0

    # one-side change (A only): update + join-key move + insert
    versioned.merge_versioned(
        spark, ra,
        spark.createDataFrame(
            [(1, "c2", 11), (3, "c1", 30)], "id long, cust string, amt long"
        ),
        ka,
    )
    assert versioned.refresh_served_join(spark, ra, rb, rv, ka, kb, jn) == 1
    check()

    # both-side change: A tombstone delete + B seg update and insert
    versioned.merge_versioned(
        spark, ra,
        spark.createDataFrame(
            [(2, "c2", 0, True)], "id long, cust string, amt long, _del boolean"
        ),
        ka, delete_col="_del",
    )
    versioned.merge_versioned(
        spark, rb,
        spark.createDataFrame(
            [("c1", "plat"), ("c3", "tin")], "cust string, seg string"
        ),
        kb,
    )
    assert versioned.refresh_served_join(spark, ra, rb, rv, ka, kb, jn) == 2
    check()

    # crash window: bases advance, view gen dir written, pointer unmoved
    versioned.merge_versioned(
        spark, ra,
        spark.createDataFrame(
            [(4, "c3", 40)], "id long, cust string, amt long"
        ),
        ka,
    )
    cur = versioned.current_version(rv)
    dangling = versioned.full_join_view(
        versioned.read_latest(spark, ra), versioned.read_latest(spark, rb), jn
    )
    dangling.write.mode("overwrite").parquet(
        os.path.join(rv, f"gen={cur + 1}")
    )
    assert versioned.current_version(rv) == cur
    g = versioned.refresh_served_join(spark, ra, rb, rv, ka, kb, jn)
    assert g == cur + 2  # dangling dir superseded, never re-served
    check()

    # vacuumed reflected base snapshot → full-re-join fallback
    versioned.merge_versioned(
        spark, ra,
        spark.createDataFrame(
            [(5, "c1", 50)], "id long, cust string, amt long"
        ),
        ka,
    )
    versioned.vacuum(ra, keep_last=1)
    g2 = versioned.refresh_served_join(spark, ra, rb, rv, ka, kb, jn)
    assert g2 is not None
    check()

    # a view generation without the dual base metadata is refused
    versioned.publish(spark, rv, versioned.read_latest(spark, rv))
    with pytest.raises(ValueError, match="base_gen"):
        versioned.refresh_served_join(spark, ra, rb, rv, ka, kb, jn)
