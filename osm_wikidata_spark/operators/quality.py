"""Repetition-based quality signals for pretraining-data filtering.

The statistics follow the Gopher repetition-filter family (Rae et al.
2021, "Scaling Language Models", table A1; the same signals drive the
MassiveText / RedPajama-v2 / Dolma quality pipelines): fraction of
duplicate lines, fraction of characters inside duplicate lines, fraction
of characters covered by the most frequent word n-gram (n = 2..4), and
fraction of characters inside word n-grams that occur more than once
(n = 5..10).  A document failing any thresholded signal is boilerplate-
or loop-heavy and a standard drop candidate.

Two deliberate, documented definition choices keep every value exactly
reproducible in plain SQL (the oracle) at any partitioning:

* the "most frequent n-gram" tie-break is lexicographic on
  ``(count, count*len(gram))`` — of the max-count grams, the one covering
  the most characters wins (both engines compute it as a struct max);
* the duplicated-n-gram character fraction counts ``count * len(gram)``
  over every gram with count ≥ 2 — the RedPajama-style occurrence-sum
  upper bound, NOT the span-union Gopher used (the span union needs
  per-position interval merging, which is neither SQL-expressible nor
  needed: callers threshold the signal, and the bound is monotone in the
  same repetition it measures).  It can exceed 1.0 on degenerate text.

Spark shape (scale notes): ZERO SHUFFLE.  Every statistic here is a pure
function of ONE document, so nothing should ever cross the wire: grams
are built as per-row hash arrays, sorted in place (``array_sort``), and
reduced by a single linear run-length scan (``aggregate`` with a finish
lambda) that folds count/top-gram/duplicate-chars in one pass — scan →
project, whole-stage codegen end to end.  Line stats use the same sorted
run scan on the trimmed line array.  (The previous shape exploded ~n×W
gram rows per document through two hash aggregations — correct, but it
shuffled ~5× the corpus word count to compute doc-local facts; measured
2.9x end-to-end at sf0.1, and the shuffle it removes grows linearly with
corpus size.)  Skew: a degenerate giant document costs one task's CPU
(O(W log W) sort), the same row it always occupied — no hot key, because
there are no keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import normalize_text
from .scoring import quote_sep

_PACK = 4294967296  # 2^32: (count, chars) packed into one BIGINT


def _run_scan_grams(sorted_grams: F.Column) -> F.Column:
    """Fold a SORTED array<struct<gh,glen>> into struct(top_chars,
    dup_chars) with one linear pass.

    Equal adjacent (gh, glen) entries form a run of count c; per run the
    packed key ``c * 2^32 + c*glen`` mirrors the previous implementation's
    packed hash-aggregate max (exact while chars < 2^32 and c < 2^31 —
    documents up to ~400 MB of text), so ``top_chars`` keeps the exact
    (count, chars)-lexicographic Gopher tie-break, and ``dup_chars`` sums
    ``c * glen`` over runs with c > 1.
    """
    zero = F.lit(0).cast("long")

    def _fin_top(acc):
        return F.greatest(
            acc["top"], acc["c"] * F.lit(_PACK) + acc["c"] * acc["pglen"]
        )

    def _fin_dup(acc):
        return acc["dup"] + F.when(
            acc["c"] > 1, acc["c"] * acc["pglen"]
        ).otherwise(zero)

    def step(acc, g):
        same = (
            acc["pgh"].isNotNull()
            & (acc["pgh"] == g["gh"])
            & (acc["pglen"] == g["glen"])
        )
        return F.struct(
            g["gh"].alias("pgh"),
            g["glen"].cast("long").alias("pglen"),
            F.when(same, acc["c"] + 1).otherwise(F.lit(1).cast("long")).alias("c"),
            F.when(same | (acc["c"] == 0), acc["top"])
            .otherwise(_fin_top(acc))
            .alias("top"),
            F.when(same | (acc["c"] == 0), acc["dup"])
            .otherwise(_fin_dup(acc))
            .alias("dup"),
        )

    def finish(acc):
        return F.struct(
            F.when(acc["c"] > 0, _fin_top(acc) % F.lit(_PACK)).alias("top_chars"),
            F.when(acc["c"] > 0, _fin_dup(acc)).alias("dup_chars"),
        )

    init = F.struct(
        F.lit(None).cast("long").alias("pgh"),
        F.lit(0).cast("long").alias("pglen"),
        F.lit(0).cast("long").alias("c"),
        F.lit(0).cast("long").alias("top"),
        F.lit(0).cast("long").alias("dup"),
    )
    return F.aggregate(sorted_grams, init, step, finish)


def _run_scan_lines(sorted_lines: F.Column) -> F.Column:
    """Fold a SORTED array<string> into struct(n_lines, n_line_chars,
    dup_lines, dup_line_chars) — runs of equal lines, duplicates = runs
    with count > 1 (counting every member line, as the previous
    two-level aggregation did)."""
    zero = F.lit(0).cast("long")

    def _dup(acc):
        return acc["dup"] + F.when(
            acc["c"] > 1, acc["c"]
        ).otherwise(zero)

    def _dupch(acc):
        return acc["dupch"] + F.when(
            acc["c"] > 1, acc["c"] * F.length(acc["prev"])
        ).otherwise(zero)

    def step(acc, line):
        same = acc["prev"].isNotNull() & (acc["prev"] == line)
        return F.struct(
            line.alias("prev"),
            F.when(same, acc["c"] + 1).otherwise(F.lit(1).cast("long")).alias("c"),
            (acc["n"] + 1).alias("n"),
            (acc["nch"] + F.length(line)).alias("nch"),
            F.when(same | (acc["c"] == 0), acc["dup"]).otherwise(_dup(acc)).alias("dup"),
            F.when(same | (acc["c"] == 0), acc["dupch"])
            .otherwise(_dupch(acc))
            .alias("dupch"),
        )

    def finish(acc):
        return F.struct(
            acc["n"].alias("n_lines"),
            acc["nch"].alias("n_line_chars"),
            F.when(acc["c"] > 0, _dup(acc)).otherwise(zero).alias("dup_lines"),
            F.when(acc["c"] > 0, _dupch(acc)).otherwise(zero).alias("dup_line_chars"),
        )

    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("c"),
        F.lit(0).cast("long").alias("n"),
        F.lit(0).cast("long").alias("nch"),
        F.lit(0).cast("long").alias("dup"),
        F.lit(0).cast("long").alias("dupch"),
    )
    return F.aggregate(sorted_lines, init, step, finish)


def repetition_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_ngram_ns: tuple[int, ...] = (2, 3, 4),
    dup_ngram_ns: tuple[int, ...] = (5, 10),
    line_delim: str = "\n",
) -> DataFrame:
    """Per-document repetition signals.

    Returns one row per input document::

        (doc_id,
         dup_line_frac,       -- lines whose text occurs >1x / all lines
         dup_line_char_frac,  -- chars inside those lines / all line chars
         top_{n}gram_frac...  -- chars covered by the most frequent n-gram
                              --   / chars of the normalised text
         dup_{n}gram_frac...) -- occurrence-sum chars of n-grams with
                              --   count >= 2 / chars of normalised text

    Lines are the raw ``line_delim`` split, trimmed, empties dropped
    (pass ``"\\n\\n"`` for paragraph-level stats); n-grams are word grams
    of the whitespace-collapsed lowercased text, so they are independent
    of line structure.  All fractions are rounded to 6 decimals and
    coalesced to 0.0 for degenerate inputs (empty text → no lines, no
    chars).  Documents shorter than ``n`` words contribute one sub-length
    gram (same convention as the dedup shingles).

    Gram identity is (xxhash64 of the slice of per-word hashes, gram
    length) and the gram STRING is never built: each word is hashed once
    and measured once, so a gram reduces to hashing n longs and summing
    n ints — no string allocation in the hot loop.  Two distinct grams of
    one document alias only on an xxhash64 collision (~W²/2^65 per doc,
    ~1e-9 even for million-word docs); the thresholded statistics are
    insensitive at that rate and the sf0.01 oracle pins the
    collision-free semantics exactly.
    """
    all_ns = sorted(set(top_ngram_ns) | set(dup_ngram_ns))
    doc = F.col(id_col).alias("doc_id")
    norm = normalize_text(text_col)
    words = F.split(norm, " ")

    def grams_for(n: int) -> F.Column:
        seg_h = lambda i: F.slice(F.col("_wh"), i, n)  # noqa: E731
        seg_l = lambda i: F.slice(F.col("_wl"), i, n)  # noqa: E731
        return F.transform(
            F.sequence(
                F.lit(1), F.greatest(F.size(F.col("_wh")) - (n - 1), F.lit(1))
            ),
            lambda i: F.struct(
                F.xxhash64(seg_h(i)).alias("gh"),
                # glen = sum(word lens) + (slice size - 1) equals
                # length(array_join(slice, ' ')) exactly, including the
                # sub-length gram a doc shorter than n words emits
                (
                    F.aggregate(seg_l(i), F.lit(0), lambda a, x: a + x)
                    + F.size(seg_l(i))
                    - 1
                ).alias("glen"),
            ),
        )

    # NB: the lambda is load-bearing — F.trim grew an optional second
    # (trim-characters) parameter in Spark 4, so passing it bare would make
    # transform() call trim(line, index): each line stripped of its INDEX's
    # digit characters instead of spaces (caught by the randomized
    # differential test on edge-space lines; the sf0.01 oracle data never
    # exercised them)
    lines_arr = F.filter(
        F.transform(
            F.split(F.col(text_col), quote_sep(line_delim)),
            lambda x: F.trim(x),
        ),
        lambda x: x != "",
    )

    prepared = docs.select(
        doc,
        F.length(norm).alias("total_chars"),
        F.transform(words, lambda x: F.xxhash64(x)).alias("_wh"),
        F.transform(words, lambda x: F.length(x)).alias("_wl"),
        _run_scan_lines(F.array_sort(lines_arr)).alias("_ls"),
    ).select(
        "doc_id",
        "total_chars",
        "_ls",
        *[
            _run_scan_grams(F.array_sort(grams_for(n))).alias(f"_g{n}")
            for n in all_ns
        ],
    )

    def frac(num: F.Column, den: F.Column) -> F.Column:
        return F.coalesce(
            F.round(F.when(den > 0, num / den), 6), F.lit(0.0)
        )

    return prepared.select(
        "doc_id",
        frac(F.col("_ls.dup_lines"), F.col("_ls.n_lines")).alias("dup_line_frac"),
        frac(F.col("_ls.dup_line_chars"), F.col("_ls.n_line_chars")).alias(
            "dup_line_char_frac"
        ),
        *[
            frac(F.col(f"_g{n}.top_chars"), F.col("total_chars")).alias(
                f"top_{n}gram_frac"
            )
            for n in top_ngram_ns
        ],
        *[
            frac(F.col(f"_g{n}.dup_chars"), F.col("total_chars")).alias(
                f"dup_{n}gram_frac"
            )
            for n in dup_ngram_ns
        ],
    )
