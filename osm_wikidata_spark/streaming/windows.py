"""Event-time streaming operators over transcript streams (SURVEY.md §2.12).

The reference is batch-only; these are the graft's streaming-native
obligations (driver mandate): a watermarked event-time windowed aggregate
(late turns beyond the watermark are dropped, state is bounded), and a
custom stateful per-conversation operator via ``applyInPandasWithState``
(running turn counter + last event time — the streaming analog of the
reference's per-item ``done`` progress flags, place.py:1146-1160).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def turn_rate(
    transcripts: DataFrame,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Turns per (event-time window, role) with a watermark bounding state.

    Works on both a stream (readStream) and a static frame (the watermark
    is a no-op in batch), so batch≡stream equivalence is testable.
    """
    return (
        transcripts.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), F.col("role"))
        .agg(F.count("*").alias("n_turns"))
        .select(
            F.col("win.start").alias("window_start"),
            "role",
            "n_turns",
        )
    )


CONV_PROGRESS_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("n_turns", IntegerType()),
        StructField("max_turn_idx", IntegerType()),
        StructField("last_ts", TimestampType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("n_turns", IntegerType()),
        StructField("max_turn_idx", IntegerType()),
        # persisted so "last event time" is monotone across micro-batches:
        # a later batch holding only out-of-order OLDER turns must not make
        # the emitted last_ts regress below a previously reported value.
        # STATE-SCHEMA VERSION NOTE: adding this field changed the
        # applyInPandasWithState state schema — a query checkpointed under
        # the earlier 2-field schema cannot resume on it (Spark's state
        # store rejects incompatible schemas); restart from a fresh
        # checkpoint when upgrading.
        StructField("last_ts", TimestampType()),
    ]
)


def _update_conv_progress(key, pdf_iter, state: GroupState):
    """Stateful update: accumulate per-conversation turn counts across
    micro-batches (pandas in, pandas out, Arrow-batched)."""
    import pandas as pd

    n_turns, max_idx, last_ts = state.get if state.exists else (0, 0, None)
    if last_ts is not None and pd.isna(last_ts):
        last_ts = None  # never let a stored NaT poison the running max
    for pdf in pdf_iter:
        n_turns += len(pdf)
        if len(pdf):
            max_idx = max(max_idx, int(pdf["turn_idx"].max()))
            ts_max = pdf["ts"].max()
            # an all-null-ts batch yields NaT, and max(NaT, x) is NaT —
            # skip it so last_ts stays recoverable and never regresses
            if pd.notna(ts_max):
                last_ts = ts_max if last_ts is None else max(last_ts, ts_max)
    state.update((n_turns, max_idx, last_ts))
    yield pd.DataFrame(
        {
            "conv_id": [key[0]],
            "n_turns": [n_turns],
            "max_turn_idx": [max_idx],
            "last_ts": [last_ts],
        }
    )


def conversation_progress(transcripts_stream: DataFrame) -> DataFrame:
    """Custom stateful operator: per-conversation running progress via
    ``applyInPandasWithState`` — emits the updated (conv_id, n_turns,
    max_turn_idx, last_ts) row on every micro-batch that touches the
    conversation."""
    return transcripts_stream.groupBy("conv_id").applyInPandasWithState(
        _update_conv_progress,
        outputStructType=CONV_PROGRESS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_cols: tuple[str, ...] = ("event_id",),
) -> DataFrame:
    """Per-event session assignment by inactivity gap (gaps-and-islands).

    Appends ``session_idx`` (1-based per key) and ``session_id``
    (``"<key>-<idx>"``) to every input row.  An event starts a new
    session when it arrives more than ``gap_seconds`` after its
    predecessor — the same merge rule as Spark's ``session_window``
    (events exactly ``gap`` apart still merge), so the two operators
    agree on boundaries.

    ``order_cols`` breaks timestamp ties deterministically, making the
    assignment partitioning/cluster-size invariant.  Both windows use
    the same (key, order) spec, so Catalyst plans ONE shuffle; the unit
    of parallelism is the key — no salting needed because a session
    never spans keys.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(ts_col, *order_cols)
    prev = F.lag(ts_col).over(w)
    # interval arithmetic, NOT cast("long"): second-truncation would
    # disagree with session_window on sub-second gaps, and epoch
    # conversion would entangle the session timezone (ts may be NTZ)
    new_session = (
        prev.isNull()
        | (
            (F.col(ts_col) - prev)
            > F.make_dt_interval(secs=F.lit(gap_seconds))
        )
    ).cast("int")
    run = Window.partitionBy(key_col).orderBy(ts_col, *order_cols).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        events.withColumn("_new_session", new_session)
        .withColumn("session_idx", F.sum("_new_session").over(run))
        .drop("_new_session")
        .withColumn(
            "session_id",
            F.concat_ws("-", F.col(key_col).cast("string"), F.col("session_idx")),
        )
    )


def session_stats(
    events: DataFrame,
    gap: str = "30 minutes",
    key_col: str = "user_id",
    ts_col: str = "ts",
    watermark: str | None = None,
) -> DataFrame:
    """Per-session aggregate via Spark's native ``session_window``::

        (key_col, session_start, session_end, n_events)

    ``session_end`` is ``last event + gap`` (Spark's window-close rule).
    Works on both a static frame and a stream — pass ``watermark`` on a
    stream so session state is bounded (a session closes once the
    watermark passes its end; late events beyond it are dropped).
    The sf-oracle derives the same sessions independently via the
    :func:`sessionize` gaps-and-islands rule, pinning the built-in
    operator's merge semantics (boundary-equal events merge; verified
    diff==gap ⇒ same session).
    """
    src = events.withWatermark(ts_col, watermark) if watermark else events
    return (
        src.groupBy(key_col, F.session_window(ts_col, gap).alias("sw"))
        .agg(F.count("*").alias("n_events"))
        .select(
            key_col,
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )
