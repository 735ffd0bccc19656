"""Conversation-level QA for chat-transcript training data.

The graft's input is the BASELINE.json transcripts shape
``(conv_id, turn_idx, role, text, tool, ts)``; before such data is
rendered into training documents (operators/boilerplate.py) a pipeline
needs per-conversation structural QA — the chat-data analog of the
document-level quality filters:

* :func:`conversation_qa` — one row per conversation with structural
  flags: dense turn indexing, strict role alternation, empty turns,
  consecutive-duplicate (stutter) turns, tool calls on non-assistant
  turns, and a composite ``keep_conv``.
* :func:`canned_turns` — turns whose normalised text occurs in many
  *distinct* conversations (canned greetings, templated refusals,
  scripted disclaimers); the turn-granularity analog of
  :func:`~osm_wikidata_spark.operators.boilerplate.line_dedup`.

Scale notes: ``conversation_qa`` is one window (lag over
``(conv_id, turn_idx)``) followed by one aggregation on the same key —
Catalyst reuses the window's hash exchange for the groupBy, so the whole
operator is a single shuffle whose unit of parallelism is the
conversation; no key is hotter than the longest conversation.
``canned_turns`` is two map-side-combinable hash aggregations on the
normalised turn text (distinct pairs, then frequency) — the canned set
it returns is small by construction (a turn must recur across
``min_convs`` conversations to qualify).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .boilerplate import _norm_line


def conversation_qa(transcripts: DataFrame) -> DataFrame:
    """Structural QA flags, one row per conversation::

        (conv_id, n_turns,
         idx_contiguous,     -- turn_idx is exactly 0..n_turns-1
         roles_alternate,    -- no two consecutive turns share a role
         starts_with_user,   -- first turn's role = 'user'
         n_empty_turns,      -- turns whose text is blank
         n_stutter_turns,    -- turns repeating the previous turn's text
         n_bad_tool_turns,   -- tool set on a non-assistant turn
         keep_conv)          -- all of the above clean

    Consecutive-turn checks compare each turn to its ``turn_idx``
    predecessor (lag window), so they are order-exact regardless of
    partitioning.  ``keep_conv`` is the conjunction a curation pipeline
    filters on; the individual flags stay exposed so audit metrics can
    count failure modes separately.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    t = transcripts.select(
        "conv_id",
        "turn_idx",
        "role",
        "text",
        "tool",
        F.lag("role").over(w).alias("prev_role"),
        F.lag("text").over(w).alias("prev_text"),
        # first-turn detection keys on POSITION (min turn_idx), not on
        # prev_role nullability: lag('role') is also NULL after a turn
        # whose role is NULL, which would let a conversation starting
        # with 'assistant' report starts_with_user=true via any
        # post-NULL-role 'user' turn.  Same partition key as w — the
        # extra Window node reuses the one exchange.
        F.min("turn_idx").over(Window.partitionBy("conv_id")).alias("first_idx"),
    )
    return t.groupBy("conv_id").agg(
        F.count("*").alias("n_turns"),
        (
            (F.min("turn_idx") == 0)
            & (F.max("turn_idx") == F.count("*") - 1)
            & (F.count_distinct("turn_idx") == F.count("*"))
        ).alias("idx_contiguous"),
        (F.count_if(F.col("role") == F.col("prev_role")) == 0).alias(
            "roles_alternate"
        ),
        F.max(
            F.when(F.col("turn_idx") == F.col("first_idx"), F.col("role") == "user")
        ).alias("starts_with_user"),
        # coalesce: a NULL-text turn is contentless and must count as
        # empty — bare trim(NULL) == '' is NULL and count_if would skip
        # it, letting a structurally broken conversation keep keep_conv
        F.count_if(F.coalesce(F.trim("text"), F.lit("")) == "").alias(
            "n_empty_turns"
        ),
        F.count_if(F.col("text") == F.col("prev_text")).alias(
            "n_stutter_turns"
        ),
        F.count_if(
            F.col("tool").isNotNull() & (F.col("role") != "assistant")
        ).alias("n_bad_tool_turns"),
    ).withColumn(
        "keep_conv",
        F.col("idx_contiguous")
        & F.col("roles_alternate")
        & F.col("starts_with_user")
        & (F.col("n_empty_turns") == 0)
        & (F.col("n_stutter_turns") == 0)
        & (F.col("n_bad_tool_turns") == 0),
    )


def canned_turns(
    transcripts: DataFrame, min_convs: int = 10
) -> DataFrame:
    """Normalised turn texts that occur in ``min_convs``-or-more distinct
    conversations::

        (norm_text, n_convs)

    Frequency counts *distinct conversations* — a conversation that
    loops the same reply contributes once, so intra-conversation
    stutter (a :func:`conversation_qa` signal) cannot promote a turn
    into the canned set.  Join the result back on the normalised text
    to drop or downweight canned turns corpus-wide.
    """
    return (
        transcripts.select(
            "conv_id", _norm_line(F.col("text")).alias("norm_text")
        )
        .distinct()
        .groupBy("norm_text")
        .agg(F.count("*").alias("n_convs"))
        .filter(F.col("n_convs") >= min_convs)
    )
