"""Duplicated-span detection: substring-level dedup within documents.

Document-level dedup (exact/minhash/simhash) misses the common corpus
pathology of long shared spans inside otherwise-distinct documents —
boilerplate headers, license blocks, quoted chain-mails.  Lee et al. 2021
("Deduplicating Training Data Makes Language Models Better") remove any
substring repeated across the corpus using a suffix array; a suffix array
is inherently sequential, so the standard distributed approximation is a
sliding window-hash index: every ``window``-word window at ``stride``
spacing is keyed, windows whose key occurs more than once anywhere in the
corpus are flagged, and per document the flagged windows are merged into
maximal spans (the cut/drop list for the downstream rewrite).

Exactness contract: every repeated span of at least
``window + stride - 1`` words is guaranteed to contain a flagged probe
window AT ANY ALIGNMENT.  The guarantee holds because the two sides
sample differently: the COUNT side keys every window (stride 1), so two
copies of the same content share window keys no matter how their start
positions differ mod ``stride``; the PROBE side samples each document's
positions at ``stride`` spacing, and a repeat of ``window + stride - 1``
words covers at least one probe position in every copy.  (Counting at
stride spacing instead — the round-4 behaviour — silently missed copies
whose alignments differ mod stride, i.e. most cross-document repeats for
stride 10.)  A repeat shorter than ``window`` words is invisible by
construction — that is the approximation, and ``window``/``stride`` are
the knobs.  False positives: none with ``exact_keys=True`` (literal-text
keys); with the default hashed keys, one per ~2^65/P² corpus positions
(see ``duplicate_spans``).

Scale shape: the count side explodes one window KEY per WORD (stride no
longer discounts it — that is the price of the alignment guarantee — so
the key is an 8-byte hash by default, and it partial-aggregates map-side
before the one hash shuffle); the probe side explodes ~len/stride
positions per doc, joins to the flagged keys, then a per-document
gaps-and-islands merge (two window functions over the doc partition).
The count side defuses its own hot keys: a boilerplate window occurring
10^6 times is ONE count row; the join fan-out equals the number of
flagged probe positions, which is the size of the answer itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .dedup import normalize_text


def duplicate_spans(
    docs: DataFrame,
    window: int = 20,
    stride: int = 10,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    exact_keys: bool = False,
) -> DataFrame:
    """Maximal duplicated spans per document.

    Returns ``(doc_id, span_start, span_end, n_windows)`` — 1-based
    inclusive WORD indexes into the normalised text, one row per maximal
    run of flagged probe windows (overlapping or adjacent windows merge),
    with the number of flagged probe windows merged into the run.  A
    window is flagged when its exact text occurs ``min_count``-or-more
    times across ALL word positions of all documents (stride 1 — so
    copies at any alignment share keys; within-document repeats count);
    probe positions, and therefore reported span extents, are
    ``stride``-granular.  Documents shorter than ``window`` words emit
    nothing.

    By default windows are keyed by ``xxhash64`` over the slice of
    per-word hashes — each word hashed once, a window key is one hash of
    ``window`` longs, and the count shuffle carries 8-byte keys instead
    of built window strings (measured 2.2x end-to-end at sf0.1; the
    count side walks every word position, so its key width IS the
    operator's dominant cost).  Two distinct windows alias only on an
    xxhash64 collision (~P²/2^65 for P corpus positions — negligible
    below ~10^8 positions, and the sf0.01 oracle pins the collision-free
    semantics exactly).  ``exact_keys=True`` keys on the literal window
    text instead: zero false-positive guarantee, at string-building and
    string-shuffle cost.
    """
    if stride < 1 or window < 1:
        raise ValueError(f"window/stride must be >= 1, got {window}/{stride}")
    words = F.split(normalize_text(text_col), " ")
    # windows built array-side THEN exploded as (start, win) structs, so
    # the full word array never rides the exploded rows
    # NB: sequence(1, 0) would DESCEND, so the upper bound clamps to 1 and
    # the i <= limit predicate empties short docs instead
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        (
            words
            if exact_keys
            else F.transform(words, lambda x: F.xxhash64(x))
        ).alias("_w"),
    )
    limit = F.size(F.col("_w")) - (window - 1)

    def _key(i):
        seg = F.slice(F.col("_w"), i, window)
        return F.array_join(seg, " ") if exact_keys else F.xxhash64(seg)

    def _wins(step: int):
        return F.transform(
            F.filter(
                F.sequence(F.lit(1), F.greatest(limit, F.lit(1))),
                lambda i: ((i - 1) % step == 0) & (i <= limit),
            ),
            lambda i: F.struct(i.alias("start"), _key(i).alias("win")),
        )

    positions = base.select(
        "doc_id", F.explode(_wins(stride)).alias("s")
    ).select(
        "doc_id",
        F.col("s.start").alias("start"),
        (F.col("s.start") + (window - 1)).alias("end"),
        F.col("s.win").alias("win"),
    )

    # count side at stride 1: copies of a repeat share window keys no
    # matter how their start positions differ mod stride (the probe-side
    # lattice alone would miss misaligned copies); only the bare key
    # rides the full-position explode
    all_wins = (
        positions.select("win")
        if stride == 1
        else base.select(
            F.explode(
                F.transform(
                    F.filter(
                        F.sequence(F.lit(1), F.greatest(limit, F.lit(1))),
                        lambda i: i <= limit,
                    ),
                    _key,
                )
            ).alias("win")
        )
    )
    counts = (
        all_wins.groupBy("win")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= min_count)
        .select("win")
    )
    flagged = positions.join(counts, "win").select("doc_id", "start", "end")

    # gaps-and-islands: a new span begins where a window starts beyond
    # every earlier window's reach (+1 so adjacent windows merge too)
    by_start = Window.partitionBy("doc_id").orderBy("start", "end")
    reach = F.max("end").over(by_start.rowsBetween(Window.unboundedPreceding, -1))
    grouped = flagged.withColumn(
        "new_span",
        F.when(reach.isNull() | (F.col("start") > reach + 1), 1).otherwise(0),
    ).withColumn(
        "span_grp",
        F.sum("new_span").over(
            by_start.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return grouped.groupBy("doc_id", "span_grp").agg(
        F.min("start").alias("span_start"),
        F.max("end").alias("span_end"),
        F.count("*").alias("n_windows"),
    ).select("doc_id", "span_start", "span_end", "n_windows")
