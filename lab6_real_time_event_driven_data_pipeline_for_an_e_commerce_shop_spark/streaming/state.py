"""Custom keyed stateful streaming operators (``applyInPandasWithState``).

The reference's manifest is a hand-rolled stateful accumulator
(glue_job.py:96-104: per-order pending sets mutated across events).
The pipeline replaces that with staging-table joins
(streaming/pipeline.py — completeness spans two keys, so a single
keyed state op can't express it), but the *capability* of arbitrary
keyed state is still part of the engine surface: this module hosts it.

``running_user_totals`` is the canonical form: per-key state that
survives micro-batches (and restarts, via the checkpoint), Arrow-batched
both ways, no timeout (unbounded retention — the same contract as the
reference manifest's indefinite wait).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

from decimal import ROUND_HALF_UP, Decimal

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.streaming.stateful_processor import StatefulProcessor

_CENT = Decimal("0.01")

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("total_value", T.DoubleType(), True),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType(), False),
        # exact integer cents — same determinism contract as the batch
        # KPIs (functions.expressions.cents_sum)
        T.StructField("total_cents", T.LongType(), False),
    ]
)


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    n, cents = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        # Mirror the batch path's double→DECIMAL(_,2) cast bit-for-bit
        # (functions.expressions.cents_sum): Spark casts via the SHORTEST
        # decimal repr of the double (BigDecimal.valueOf ≡ Python repr),
        # then rounds HALF_UP. pandas .round() (half-to-even on the raw
        # binary value) diverges at half-cents like 0.125; even
        # floor(x*100+0.5) diverges for values like 1.005 whose binary
        # form sits just below the half.
        cents += sum(
            int(Decimal(repr(v)).quantize(_CENT, rounding=ROUND_HALF_UP).scaleb(2))
            for v in pdf["value"]
        )
    state.update((n, cents))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [cents / 100.0]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running event count + exact value total, maintained as
    keyed state across micro-batches. Update output mode: one row per
    user per batch with the latest totals (MERGE downstream for a
    serving view)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- GroupState session tracker (applyInPandasWithState, runs TODAY) --------


# epoch-µs event-time column added JVM-side before the fold: the Python
# worker only ever sees int64 epochs, never a timestamp rendering — the
# operator is timezone-invariant by construction (the repo-wide epoch
# discipline; pandas' session-tz-localized naive timestamps never enter).
_SESSION_TS_US = "__session_ts_us"


def _session_fold(gap_us: int):
    """Build the per-key fold for ``tracked_sessions_gs``. Defined via a
    factory so the closure (carrying ``gap_us``) cloudpickles BY VALUE —
    the Python worker never needs this package importable (the same
    contract as ``make_session_tracker``)."""

    gap_ms = gap_us // 1000

    def _fold(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState):
        def emit(st):
            return pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "session_start_us": [st[0]],
                    "session_end_us": [st[1]],
                    "n_events": [st[2]],
                }
            )

        if state.hasTimedOut:
            # The timeout is reconfigured on every update, so an expiry
            # always refers to the CURRENT state's horizon — no stale-
            # timer guard needed (unlike transformWithState timers).
            if state.exists:
                st = tuple(state.get)
                state.remove()
                yield emit(st)
            return
        ts_us: list[int] = []
        for pdf in pdfs:
            ts_us.extend(int(v) for v in pdf[_SESSION_TS_US])
        if not ts_us:
            return
        # Interval-merge fold (same contract as make_session_tracker):
        # each event is a (t, t, 1) atom, the carried state an
        # (start, last, n) atom; sort by start and merge adjacent atoms
        # whose boundary gap is <= gap_us. Cross-batch out-of-order
        # events join the NEAREST session boundary; state stays
        # monotone (last_us never moves backwards).
        atoms = [(t, t, 1) for t in ts_us]
        if state.exists:
            atoms.append(tuple(state.get))
        atoms.sort()
        merged = [atoms[0]]
        for a in atoms[1:]:
            cur = merged[-1]
            if a[0] - cur[1] <= gap_us:
                merged[-1] = (cur[0], max(cur[1], a[1]), cur[2] + a[2])
            else:
                merged.append(a)
        st = merged[-1]
        for c in merged[:-1]:
            yield emit(c)
        horizon_ms = st[1] // 1000 + gap_ms
        if horizon_ms <= state.getCurrentWatermarkMs():
            # The trailing session's idle horizon already passed the
            # watermark (a late-but-admissible key re-appearing after a
            # long gap): event-time timeouts can only be set ABOVE the
            # watermark, and semantically the session IS closed — emit
            # now and keep no state.
            if state.exists:
                state.remove()
            yield emit(st)
            return
        state.update(st)
        state.setTimeoutTimestamp(horizon_ms)

    return _fold


_SESSION_PENDING_SCHEMA = "starts array<long>, lasts array<long>, ns array<long>"


def _session_fold_wm(gap_us: int):
    """Watermark-correct session fold (``exact_close=True``): sessions
    close ONLY once the watermark strictly passes their idle horizon,
    so an admissible out-of-order bridge event can never arrive for a
    closed session — streamed output equals batch q18 sessionization
    for EVERY admissible arrival order, at the cost of a pending-
    session LIST in state (bounded by ~watermark/gap + 1 entries per
    key: only sessions whose horizon is still above the watermark are
    retained). Close rule is ms-floor-safe: horizon_ms < wm_ms implies
    wm_us > last_us + gap_us for any sub-ms remainder."""

    gap_ms = gap_us // 1000

    def _close_and_keep(key, pending, state):
        """Split pending (sorted session atoms) by the close rule,
        emit the closed ones, persist/clear state, set the timeout."""
        wm = state.getCurrentWatermarkMs()
        closed = [s for s in pending if s[1] // 1000 + gap_ms < wm]
        kept = [s for s in pending if s[1] // 1000 + gap_ms >= wm]
        if kept:
            state.update(
                ([s[0] for s in kept], [s[1] for s in kept], [s[2] for s in kept])
            )
            horizon = min(s[1] // 1000 + gap_ms for s in kept)
            state.setTimeoutTimestamp(max(horizon, wm + 1))
        elif state.exists:
            state.remove()
        for c in closed:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "session_start_us": [c[0]],
                    "session_end_us": [c[1]],
                    "n_events": [c[2]],
                }
            )

    def _fold(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState):
        atoms: list[tuple] = []
        if state.exists:
            starts, lasts, ns = state.get
            atoms += [
                (int(s), int(l), int(n)) for s, l, n in zip(starts, lasts, ns)
            ]
        if not state.hasTimedOut:
            for pdf in pdfs:
                atoms += [(int(v), int(v), 1) for v in pdf[_SESSION_TS_US]]
            if not atoms:
                return
        if not atoms:  # timed-out key with no state: nothing to do
            return
        atoms.sort()
        merged = [atoms[0]]
        for a in atoms[1:]:
            cur = merged[-1]
            if a[0] - cur[1] <= gap_us:
                merged[-1] = (cur[0], max(cur[1], a[1]), cur[2] + a[2])
            else:
                merged.append(a)
        yield from _close_and_keep(key, merged, state)

    return _fold


def tracked_sessions_gs(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "1 hour",
    ts_col: str = "ts",
    exact_close: bool = False,
) -> DataFrame:
    """Gap-based streaming sessionization on the ``applyInPandasWithState``
    GroupState API — the variant that runs WITHOUT the
    transformWithState Python protocol (which needs google.protobuf,
    absent in some deployments): append-mode rows (user_id,
    session_start_us, session_end_us, n_events), one per CLOSED
    session. A session closes either inline (a later event of the same
    key lands more than ``gap`` past it) or by EVENT-TIME TIMEOUT once
    the watermark passes ``last_seen + gap`` — state is one fixed-width
    tuple per ACTIVE user, evicted at close; shuffles only on user_id.

    Session grain matches the batch twin q18 and the transformWithState
    tracker (``tracked_sessions``) — same gap rule, same interval-merge
    disorder handling (pinned by the differential property test).
    EAGER-CLOSE contract, stated precisely: a session is closed INLINE
    the moment a later event of the same key lands more than ``gap``
    past it, even though the watermark may not yet have passed its
    horizon — so an admissible out-of-order event arriving in a LATER
    batch that would have bridged the closed session starts a new one
    instead (streamed output splits a session that batch q18 would
    merge). This is the classic flatMapGroupsWithState sessionization
    trade (Spark's own example closes the same way); exact batch
    equality holds whenever cross-batch disorder never spans a gap
    boundary — e.g. time-ordered waves, which the batch-equality e2e
    constructs. The fully watermark-correct variant EXISTS as
    ``exact_close=True`` (pending-session list state; close only once
    the watermark passes each horizon) — use it when late bridge
    events are common. Timeouts are evaluated per micro-batch, so an availableNow
    run whose watermark ends past a session's horizon emits that close
    in a trailing timeout batch of the SAME run.

    ``exact_close=True`` switches to the WATERMARK-CORRECT fold
    (:func:`_session_fold_wm`): sessions close only once the watermark
    strictly passes their horizon, so streamed output equals batch q18
    for every admissible arrival order — including cross-batch bridge
    events the eager default splits on — at the cost of a small
    pending-session list in state. Use it when the source delivers
    late gap-spanning events; the eager default emits sooner and keeps
    one fixed-width tuple per key.

    ``ts_col`` must be a TIMESTAMP (Spark's watermark contract — NTZ
    sources cast first, e.g. ``col.cast("timestamp")``). The fold never
    sees the timestamp itself: epoch µs are derived JVM-side with
    ``unix_micros`` so the Python worker works on int64 instants only
    (timezone-invariant; the emitted session start and end µs join back
    to ``unix_micros`` grain exactly)."""
    # NULL event times carry no session information and would reach
    # the Arrow fold as NaN (int() raises) — drop them JVM-side
    ev = (
        events.filter(F.col(ts_col).isNotNull())
        .withWatermark(ts_col, watermark)
        .withColumn(_SESSION_TS_US, F.unix_micros(F.col(ts_col)))
    )
    gap_us = gap_minutes * 60 * 1_000_000
    return ev.groupBy("user_id").applyInPandasWithState(
        _session_fold_wm(gap_us) if exact_close else _session_fold(gap_us),
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=(
            _SESSION_PENDING_SCHEMA if exact_close else _SESSION_STATE_SCHEMA
        ),
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


# --- transformWithState session tracker (event-time timers) -----------------

SESSION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        # epoch MICROSECONDS: integers end-to-end (the repo-wide float/
        # epoch discipline), trivially joinable back to _events_us grain
        T.StructField("session_start_us", T.LongType(), False),
        T.StructField("session_end_us", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
    ]
)

_SESSION_STATE_SCHEMA = "start_us long, last_us long, n long"


def make_session_tracker(gap_us: int, ts_col: str = "ts") -> StatefulProcessor:
    """Gap-based sessionization as a ``transformWithStateInPandas``
    processor — the Spark-4 arbitrary-state API the older
    ``applyInPandasWithState`` path (running_user_totals above) cannot
    match: per-key EVENT-TIME TIMERS close idle sessions when the
    watermark passes ``last_seen + gap``, so a session whose user simply
    stops sending events is still emitted (append mode), with state
    cleared — bounded state without a feed-forward sentinel per key.

    Semantics mirror the batch twin q18 (plans/queries.py): a row more
    than ``gap`` after the previous one starts a new session. Sessions
    closed by a later row in the SAME key emit inline; the trailing open
    session emits when its timer fires. One live timer per key (stale
    timers are deleted on every update and double-checked against state
    at expiry, since timer delete-then-register is not transactional
    across batches).

    Cross-batch disorder (r6, ADVICE fix): events may arrive OLDER than
    the carried session's ``last_us`` (legal while the watermark lags
    the gap). The fold therefore treats the carried state as an
    *interval atom* and merges the batch's sorted event atoms
    interval-wise — membership is decided against the NEAREST session
    boundary (within ``gap`` of either ``start_us`` or ``last_us``),
    and merging takes ``min(start)`` / ``max(last)``, so state is
    monotone: ``last_us`` never moves backwards, the timer horizon only
    grows, and ``start_us <= last_us`` always. An event more than
    ``gap`` older than the session's start forms its own earlier
    session and emits closed immediately.

    The class is defined INSIDE this factory on purpose: cloudpickle
    then serializes it BY VALUE, so the transformWithState driver
    worker (a separate Python process that does not share the
    application's sys.path) never needs this package importable."""

    gap_us = int(gap_us)
    gap_ms = gap_us // 1000
    state_schema = _SESSION_STATE_SCHEMA
    ts_name = ts_col

    class _SessionTracker(StatefulProcessor):
        def init(self, handle) -> None:
            self._handle = handle
            self._sess = handle.getValueState("sess", state_schema)

        def _emit(self, key, st) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "session_start_us": [st[0]],
                    "session_end_us": [st[1]],
                    "n_events": [st[2]],
                }
            )

        def handleInputRows(self, key, rows, timerValues):
            ts_us: list[int] = []
            for pdf in rows:
                # pandas Timestamp.value is epoch ns regardless of unit
                ts_us.extend(
                    int(v.value) // 1000 for v in pd.to_datetime(pdf[ts_name])
                )
            if not ts_us:  # empty delivery: state and timer unchanged
                return
            # Interval-merge fold: each event is a (t, t, 1) atom; the
            # carried state is an (start, last, n) atom. Sorting by
            # start and merging adjacent atoms whose boundary gap is
            # <= gap_us handles cross-batch out-of-order events against
            # the nearest session boundary (no backward state moves).
            atoms = [(t, t, 1) for t in ts_us]
            if self._sess.exists():
                atoms.append(tuple(self._sess.get()))
            atoms.sort()
            merged = [atoms[0]]
            for a in atoms[1:]:
                cur = merged[-1]
                if a[0] - cur[1] <= gap_us:
                    merged[-1] = (cur[0], max(cur[1], a[1]), cur[2] + a[2])
                else:
                    merged.append(a)
            st = merged[-1]
            closed = merged[:-1]
            self._sess.update(st)
            # single live timer per key at last_seen + gap
            for old in self._handle.listTimers():
                self._handle.deleteTimer(old)
            self._handle.registerTimer(st[1] // 1000 + gap_ms)
            for c in closed:
                yield self._emit(key, c)

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            st = self._sess.get() if self._sess.exists() else None
            expiry = expiredTimerInfo.getExpiryTimeInMs()
            # stale-timer guard: only close if THIS timer matches the
            # current state's horizon (a session extended after the
            # timer was registered must stay open)
            if st is not None and expiry >= st[1] // 1000 + gap_ms:
                self._sess.clear()
                yield self._emit(key, st)

    return _SessionTracker()


def tracked_sessions(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming sessionization with idle-timeout emission: append-mode
    rows (user_id, session_start_us, session_end_us, n_events), one per
    CLOSED session — closed either by a later event beyond the gap or
    by the event-time timer once the watermark passes last_seen + gap.

    Requires the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass`` =
    ``...state.RocksDBStateStoreProvider``) — transformWithState's
    backing store. Scale shape: state is one fixed-width tuple + one
    timer per ACTIVE user, evicted at close; shuffles only on user_id."""
    ev = events.withWatermark(ts_col, watermark)
    return ev.groupBy("user_id").transformWithStateInPandas(
        make_session_tracker(gap_minutes * 60 * 1_000_000, ts_col=ts_col),
        outputStructType=SESSION_OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="eventTime",
    )


def start_session_gold(
    events: DataFrame,
    gold_path: str,
    checkpoint: str,
    gap_minutes: int = 30,
    watermark: str = "1 hour",
    ts_col: str = "ts",
    exact_close: bool = False,
):
    """Serve CLOSED sessions as a queryable gold table: the
    ``tracked_sessions_gs`` append stream MERGEd per micro-batch into a
    parquet table keyed (user_id, session_start_us). A session closes
    exactly once (state evicted at close), but a crash between the
    sink's write and the checkpoint commit replays the batch — the
    keyed MERGE makes the replay a no-op instead of a duplicate (the
    medallion idempotence contract). Keys are disjoint by construction:
    a user's sessions are non-overlapping intervals, so
    (user, start_us) is unique across the stream's lifetime.

    Returns the StreamingQuery; the table at ``gold_path`` is readable
    between batches with plain ``spark.read.parquet``."""
    from ..operators import upsert

    sessions = tracked_sessions_gs(
        events, gap_minutes, watermark, ts_col, exact_close=exact_close
    )

    def _merge(batch: DataFrame, _bid: int) -> None:
        if not batch.isEmpty():
            upsert.merge_parquet(
                batch.sparkSession,
                gold_path,
                batch,
                keys=["user_id", "session_start_us"],
            )

    return (
        sessions.writeStream.foreachBatch(_merge)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
