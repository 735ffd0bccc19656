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

Spark shape (scale notes): ONE tagged explode covers every n — each doc
row emits its (n, gram) pairs for all requested n in a single pass — then
two hash aggregations, ``(doc, n, gram)`` → ``(doc, n)`` → conditional
pivot to ``(doc)``.  Line stats are a parallel explode on the raw line
split with the same two-level aggregation.  Everything is JVM column
expressions (whole-stage codegen); no UDF, no window, no skew hazard
beyond a single degenerate document, which stays one key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import normalize_text


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
    """
    all_ns = sorted(set(top_ngram_ns) | set(dup_ngram_ns))
    doc = F.col(id_col).alias("doc_id")
    norm = normalize_text(text_col)
    words = F.split(norm, " ")

    base = docs.select(doc, F.length(norm).alias("total_chars"))

    # Gram identity is (xxhash64 of the slice of per-word hashes, gram
    # length), and the gram STRING is never built: each word is hashed
    # once and measured once, and a gram reduces to hashing n longs and
    # summing n ints — no string concatenation, no string allocation,
    # and 28-byte shuffle/aggregation keys instead of 80+-byte 10-gram
    # strings.  Measured 3.5x end-to-end vs materialised gram strings at
    # sf0.1 (the explode is this operator's largest intermediate by an
    # order of magnitude).  ``glen = sum(word lens) + (slice size - 1)``
    # equals ``length(array_join(slice, ' '))`` exactly, including the
    # sub-length gram a doc shorter than n words emits.  Two distinct
    # grams of one document alias only on an xxhash64 collision
    # (~W^2/2^65 per doc, ~1e-9 even for million-word docs); the
    # thresholded statistics are insensitive at that rate and the sf0.01
    # oracle pins the collision-free semantics exactly.
    wh = F.transform(words, lambda x: F.xxhash64(x))
    wl = F.transform(words, lambda x: F.length(x))

    def grams_for(n: int) -> F.Column:
        seg_h = lambda i: F.slice(F.col("_wh"), i, n)  # noqa: E731
        seg_l = lambda i: F.slice(F.col("_wl"), i, n)  # noqa: E731
        return F.transform(
            F.sequence(
                F.lit(1), F.greatest(F.size(F.col("_wh")) - (n - 1), F.lit(1))
            ),
            lambda i: F.struct(
                F.lit(n).alias("n"),
                F.xxhash64(seg_h(i)).alias("gh"),
                (
                    F.aggregate(seg_l(i), F.lit(0), lambda a, x: a + x)
                    + F.size(seg_l(i))
                    - 1
                ).alias("glen"),
            ),
        )

    tagged = docs.select(doc, wh.alias("_wh"), wl.alias("_wl")).select(
        "doc_id",
        F.explode(F.flatten(F.array(*[grams_for(n) for n in all_ns]))).alias("g"),
    ).select(
        "doc_id",
        F.col("g.n").alias("n"),
        F.col("g.gh").alias("gh"),
        F.col("g.glen").alias("glen"),
    )
    gram_counts = tagged.groupBy("doc_id", "n", "gh", "glen").agg(
        F.count("*").alias("c")
    )
    # Lexicographic (c, chars) max = Gopher's most-frequent gram with a
    # deterministic chars tie-break (identical in the SQL oracle's struct
    # max).  Packed into ONE BIGINT — max(struct) forces a SortAggregate
    # (sorting the whole distinct-gram set), while max(bigint) hash-
    # aggregates with map-side partials.  Exact while chars < 2^32 and
    # c < 2^31: chars = c*glen is bounded by ~n*L for a doc of L
    # normalised chars, so the packing is lossless for documents up to
    # ~400 MB of text — far beyond any sane pretraining row.
    per_n = (
        gram_counts.withColumn("chars", (F.col("c") * F.col("glen")).cast("bigint"))
        .groupBy("doc_id", "n")
        .agg(
            (
                F.max(F.col("c").cast("bigint") * F.lit(4294967296) + F.col("chars"))
                % F.lit(4294967296)
            ).alias("top_chars"),
            F.sum(F.when(F.col("c") > 1, F.col("chars")).otherwise(0)).alias(
                "dup_chars"
            ),
        )
    )
    ngram_wide = per_n.groupBy("doc_id").agg(
        *[
            F.max(F.when(F.col("n") == n, F.col("top_chars"))).alias(f"top{n}")
            for n in top_ngram_ns
        ],
        *[
            F.max(F.when(F.col("n") == n, F.col("dup_chars"))).alias(f"dup{n}")
            for n in dup_ngram_ns
        ],
    )

    lines = docs.select(
        doc, F.explode(F.split(F.col(text_col), line_delim)).alias("line")
    ).select("doc_id", F.trim("line").alias("line")).filter(F.col("line") != "")
    line_counts = lines.groupBy("doc_id", "line").agg(F.count("*").alias("c"))
    line_stats = line_counts.withColumn(
        "chars", F.col("c") * F.length("line")
    ).groupBy("doc_id").agg(
        F.sum("c").alias("n_lines"),
        F.sum("chars").alias("n_line_chars"),
        F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)).alias("dup_lines"),
        F.sum(F.when(F.col("c") > 1, F.col("chars")).otherwise(0)).alias(
            "dup_line_chars"
        ),
    )

    def frac(num: F.Column, den: F.Column) -> F.Column:
        return F.coalesce(
            F.round(F.when(den > 0, num / den), 6), F.lit(0.0)
        )

    return (
        base.join(line_stats, "doc_id", "left")
        .join(ngram_wide, "doc_id", "left")
        .select(
            "doc_id",
            frac(F.col("dup_lines"), F.col("n_lines")).alias("dup_line_frac"),
            frac(F.col("dup_line_chars"), F.col("n_line_chars")).alias(
                "dup_line_char_frac"
            ),
            *[
                frac(F.col(f"top{n}"), F.col("total_chars")).alias(
                    f"top_{n}gram_frac"
                )
                for n in top_ngram_ns
            ],
            *[
                frac(F.col(f"dup{n}"), F.col("total_chars")).alias(
                    f"dup_{n}gram_frac"
                )
                for n in dup_ngram_ns
            ],
        )
    )
