"""Streaming exact deduplication — the ingest-time dedup surface.

Batch dedup (operators/dedup.py) assumes the corpus is at rest; a training
-data INGEST pipeline sees documents as a stream and wants each normalised
fingerprint emitted once.  A plain ``dropDuplicates`` on a stream keeps
every key in the state store forever — fatal at 100-TB ingest.  Spark's
``dropDuplicatesWithinWatermark`` bounds the state by event time instead:
a key is remembered only while a duplicate could still arrive inside the
watermark, so state size tracks ingest *rate*, not corpus size.

Semantics are at-least-once-unique: a duplicate arriving later than the
watermark delay after its first copy MAY be re-emitted (its state entry
was evicted).  Downstream exact dedup over the at-rest corpus (or
``duplicate_mapping`` in the nightly compaction) removes the stragglers —
the standard two-tier layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators.dedup import normalize_text


def exact_dedup_stream(
    docs: DataFrame,
    ts_col: str = "ts",
    text_col: str = "text",
    watermark: str = "10 minutes",
) -> DataFrame:
    """First-seen copy per normalised text fingerprint, state bounded by
    ``watermark`` of event time on ``ts_col``.

    Streaming-only: Spark rejects ``dropDuplicatesWithinWatermark`` on
    batch frames — the batch equivalent is
    ``operators.dedup.duplicate_mapping`` / ``dropDuplicates``.
    Pinned by tests/test_streaming.py (availableNow run: exactly one
    representative per fingerprint, none lost).

    Null-text docs (fingerprint NULL) bypass the stateful dedup and pass
    through unchanged: the batch family's convention is that null-text
    docs are not duplicates of EACH OTHER, but the state store groups
    NULL keys together and would silently drop all but the first.
    """
    fp = docs.withColumn(
        "fingerprint", F.md5(normalize_text(text_col))
    ).withWatermark(ts_col, watermark)
    deduped = fp.filter(
        F.col("fingerprint").isNotNull()
    ).dropDuplicatesWithinWatermark(["fingerprint"])
    return deduped.unionByName(fp.filter(F.col("fingerprint").isNull()))
