"""Boilerplate removal and training-example rendering.

Three training-data-pipeline operators the reference has no analog for
(graft-new; the closest reference behavior is the HTML cleanup in
matcher/wikipedia.py:120-139, which strips markup from ONE extract at a
time — these operate corpus-wide):

* :func:`line_dedup` — CCNet-style line-level boilerplate removal
  (Wenzek et al., "CCNet", LREC 2020): a line whose normalised text
  occurs in many *distinct* documents is boilerplate (nav bars, cookie
  banners, footers) and is dropped from every document that carries it.
* :func:`c4_line_filters` — the C4 heuristic line/document filters
  (Raffel et al., JMLR 2020, §2.2): keep lines that end in terminal
  punctuation and have enough words; flag documents containing
  "lorem ipsum" or a curly brace, or with too few sentences.
* :func:`render_conversations` — flatten a transcripts table
  (conv_id, turn_idx, role, text, tool, ts) into one training document
  per conversation with ``<|role|>`` turn headers, truncated to a token
  budget at a *turn* boundary (whole turns only, earliest-first).

Scale notes
-----------
``c4_line_filters`` is a pure per-row map — higher-order functions over
the split-line array, NO shuffle, fully whole-stage-codegen.

``line_dedup`` is one explode + one aggregation to build the boilerplate
line set, then one join back.  The boilerplate set is small BY
CONSTRUCTION: a line must appear in ≥ ``min_docs`` distinct documents to
enter it, so its cardinality is bounded by ``total_lines / min_docs``
distinct values — the join is left UNHINTED so AQE broadcasts it when it
is actually small (the same data-dependent-dim rule as
plans/pipeline.py).  The hot-key hazard inverts the usual direction: the
most frequent boilerplate lines are the hottest probe-side join keys,
but the build side holds exactly one row per key, so AQE's skew-split
handles the probe side without replication cost.

``render_conversations`` needs per-conversation turn order twice (the
running token sum and the final assembly); both the window and the
groupBy hash-partition on ``conv_id``, so Catalyst reuses one exchange.
Conversations are the unit of parallelism — no key is hotter than the
longest single conversation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .scoring import quote_sep
from .textstats import token_count

#: Characters C4 accepts as a sentence/line terminator.
TERMINAL_PUNCT = (".", "!", "?", '"')


def _norm_line(col: F.Column) -> F.Column:
    """Line normalisation for cross-document comparison: lowercase,
    collapse internal whitespace, trim (CCNet §4.1 normalises case and
    digits; digits stay — the corpus is synthetic and digit-bucketing
    would only blur the oracle)."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def line_dedup(
    docs: DataFrame,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    line_delim: str = "\n",
) -> DataFrame:
    """Remove lines that occur in ``min_docs``-or-more distinct documents.

    Returns one row per input document::

        (id_col, text, n_lines_kept, n_lines_removed)

    ``text`` is the surviving lines (original, un-normalised spelling)
    re-joined with ``line_delim`` in original order; a document whose
    every line is boilerplate survives with ``text = ''`` so callers can
    distinguish "emptied" from "absent".

    Frequency is counted over *distinct documents*, not occurrences — a
    document that repeats its own header 50 times contributes 1, so
    intra-document repetition (operators/quality.py's job) cannot
    promote a line into the cross-document boilerplate set.
    """
    # posexplode_outer, not posexplode: split(NULL) is NULL, which the
    # inner variant explodes to ZERO rows — the null-text doc would
    # vanish from the output entirely, violating the one-row-per-input-
    # document contract (it survives as text=''/0/0 instead, same as a
    # fully-boilerplate doc).
    lines = docs.select(
        id_col,
        F.posexplode_outer(F.split(F.col(text_col), quote_sep(line_delim))).alias(
            "pos", "line"
        ),
    ).withColumn("norm", _norm_line(F.col("line")))
    # Boilerplate set: distinct (doc, norm) first so the doc-frequency
    # aggregation is over pre-deduped pairs; both steps are partial-agg
    # (map-side combine) hash aggregations on the same key.
    boiler = (
        lines.select(id_col, "norm")
        .distinct()
        .groupBy("norm")
        .agg(F.count("*").alias("doc_freq"))
        .filter(F.col("doc_freq") >= min_docs)
        .select("norm")
    )
    marked = lines.join(
        boiler.withColumn("is_boiler", F.lit(True)), "norm", "left"
    )
    kept_struct = F.when(
        F.col("is_boiler").isNull() & F.col("line").isNotNull(),
        F.struct("pos", "line"),
    )
    return (
        marked.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(kept_struct)),
                    lambda s: s.line,
                ),
                line_delim,
            ).alias(text_col),
            F.count(kept_struct).alias("n_lines_kept"),
            F.count_if(F.col("is_boiler").isNotNull()).alias("n_lines_removed"),
        )
    )


def c4_line_filters(
    docs: DataFrame,
    min_words_per_line: int = 5,
    min_sentences: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    line_delim: str = "\n",
) -> DataFrame:
    """C4 heuristic cleanup (Raffel et al. 2020 §2.2), one row per doc::

        (id_col, text, n_lines_kept, n_lines_dropped,
         n_sentences, has_lorem_ipsum, has_curly_brace, keep_doc)

    Line rule: keep a line iff it ends in terminal punctuation
    (``. ! ? "``) AND has ≥ ``min_words_per_line`` whitespace words.
    Document rule (``keep_doc``): ≥ ``min_sentences`` terminal-punct
    sentences in the *original* text, no "lorem ipsum"
    (case-insensitive), no ``{``.  ``text`` is the kept lines re-joined.

    Pure per-row map — higher-order functions over the line array, zero
    shuffle, whole-stage codegen end to end.
    """
    is_kept = (
        lambda ln: F.trim(ln)
        .substr(-1, 1)
        .isin(*TERMINAL_PUNCT)
        & (F.size(F.split(F.trim(ln), r"\s+")) >= min_words_per_line)
    )
    arr = F.split(F.col(text_col), quote_sep(line_delim))
    kept = F.filter(arr, is_kept)
    n_sentences = F.size(
        F.regexp_extract_all(F.col(text_col), F.lit(r"[.!?]"), F.lit(0))
    )
    has_lorem = F.contains(F.lower(F.col(text_col)), F.lit("lorem ipsum"))
    has_curly = F.contains(F.col(text_col), F.lit("{"))
    return docs.select(
        id_col,
        F.array_join(kept, line_delim).alias(text_col),
        F.size(kept).alias("n_lines_kept"),
        (F.size(arr) - F.size(kept)).alias("n_lines_dropped"),
        n_sentences.alias("n_sentences"),
        has_lorem.alias("has_lorem_ipsum"),
        has_curly.alias("has_curly_brace"),
        # coalesce: NULL text nulls every flag; keep_doc must read as an
        # explicit reject, not NULL, so downstream filters are deterministic
        F.coalesce(
            (n_sentences >= min_sentences) & ~has_lorem & ~has_curly,
            F.lit(False),
        ).alias("keep_doc"),
    )


def render_conversations(
    transcripts: DataFrame,
    token_budget: int | None = None,
    turn_delim: str = "\n",
) -> DataFrame:
    """Render each conversation into one training document.

    Input is the BASELINE.json transcripts shape (conv_id, turn_idx,
    role, text, tool, ts); output is one row per conversation::

        (conv_id, text, n_turns, n_turns_kept, n_tokens)

    Each turn renders as ``<|role|>`` (or ``<|role tool=NAME|>`` when a
    tool call is recorded) followed by the turn text on the next line;
    turns are joined by ``turn_delim`` in ``turn_idx`` order.  With a
    ``token_budget``, the longest *prefix* of whole turns whose summed
    whitespace-token count fits the budget is kept — a turn is never
    split, matching chat-style packing where truncating mid-turn breaks
    role alternation.  A conversation whose FIRST turn already exceeds
    the budget renders to ``text=''``/``n_turns_kept=0`` rather than
    vanishing.  ``n_tokens`` counts the rendered turns (header line
    included), so downstream packing can trust it.
    """
    rendered = F.concat(
        F.lit("<|"),
        F.col("role"),
        F.when(F.col("tool").isNotNull(), F.concat(F.lit(" tool="), F.col("tool"))).otherwise(F.lit("")),
        F.lit("|>"),
        F.lit(turn_delim),
        F.col("text"),
    )
    turns = transcripts.select(
        "conv_id", "turn_idx", rendered.alias("turn_text")
    ).withColumn("turn_tokens", token_count("turn_text"))
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    turns = turns.withColumn("cum_tokens", F.sum("turn_tokens").over(w))
    keep = (
        F.lit(True)
        if token_budget is None
        else F.col("cum_tokens") <= F.lit(int(token_budget))
    )
    kept_struct = F.when(keep, F.struct("turn_idx", "turn_text"))
    return (
        turns.groupBy("conv_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(kept_struct)),
                    lambda s: s.turn_text,
                ),
                turn_delim,
            ).alias("text"),
            F.count("*").alias("n_turns"),
            F.count(kept_struct).alias("n_turns_kept"),
            F.sum(F.when(keep, F.col("turn_tokens")).otherwise(F.lit(0))).alias(
                "n_tokens"
            ),
        )
    )
