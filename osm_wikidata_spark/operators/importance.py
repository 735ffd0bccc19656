"""DSIR — Data Selection via Importance Resampling (Xie et al.,
NeurIPS 2023, arXiv:2302.03169) over hashed word-n-gram features.

The training-data-curation counterpart of the repo's quality filters:
instead of dropping rows by absolute heuristics, DSIR RESAMPLES the raw
corpus toward a small target domain (e.g. "books + wikipedia") by
importance weighting in a cheap feature space:

1. featurise every document as a bag of word unigrams + bigrams, hashed
   into ``16^hex_chars`` buckets (the paper hashes into 10k buckets;
   ours are md5-prefix buckets so the identical expression runs in any
   engine — the same portability trick as ``operators/sampling.py``);
2. fit add-1-smoothed multinomials ``p_target`` / ``p_raw`` over the
   bucket space from the target and raw corpora;
3. score each raw doc with the log importance ratio
   ``w(x) = Σ_grams log p_target(bucket) − log p_raw(bucket)``;
4. sample k docs WITHOUT replacement with probability proportional to
   the (softmax of the) ratio via Gumbel-top-k, the paper's sampler —
   here with deterministic content-hash Gumbel noise so the selection
   is a pure function of the data (rerun-, partitioning- and
   engine-stable, like every sampler in this repo).

Scale shape: the bucket dictionaries are TINY by construction (≤4096
rows at the default ``hex_chars=3``) — they broadcast-join onto the
gram stream, so scoring is one explode + one broadcast join + one
per-doc hash aggregation (map-side combinable).  Nothing in the plan
grows with corpus size except the linear gram scan; at 100 TB the only
knob is running step 2's raw-corpus counts on a hash sample
(:func:`~osm_wikidata_spark.operators.sampling.sample_rows`), which
changes ``p_raw`` estimates, not the machinery.

Measured negative result (round 5): swapping the per-gram md5-prefix
bucket for ``xxhash64(g) % 4096`` does NOT pay — isolated on the sf0.1
gram scan (explode + bucket count, min-of-3, local[32]), md5-prefix
6.33 s vs xxhash64 6.09 s vs NO hash at all 6.31 s.  The scan cost is
the normalise/split/bigram/explode machinery, not the hash, so the
engine-portable md5 expression (which lets the DuckDB oracle mirror the
exact bucket ids) is kept.  Contrast ``quality.repetition_stats``,
where the same swap won 8×: there the baseline materialised full gram
STRINGS through a shuffle, while here the md5 collapses each gram to a
3-char key before any exchange.

Measured negative result (round 4, keep for posterity): the raw corpus
is gram-exploded TWICE (dim counts + scoring) and that is the right
trade.  A "single-explosion" variant — pre-aggregate
``(doc_id, bucket, n)``, persist it, derive the dim and the weighted
score from the cache — benched 1.6× SLOWER at sf0.1/local[32] (20.5 s
vs 13.1 s): the per-(doc,bucket) pre-aggregation shuffles a
corpus-sized frame and materialises a corpus-sized cache, while the
two-scan design shuffles only the ≤4096-row dim plus per-doc partial
sums (map-side combine collapses each partition to its distinct docs
before the exchange).  Recompute beats caching corpus-sized
intermediates — the same reasoning holds at 100 TB, where the cache
would spill to disk and the shuffle would dominate the job.

No counterpart in the reference repo (curation-side addition mandated
by the graft brief).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import normalize_text, split_words

_U32 = float(2**32)  # md5 8-hex-char prefix space


def gram_buckets_from(words: F.Column, hex_chars: int = 3) -> F.Column:
    """Hashed unigram+bigram buckets from a MATERIALISED words array
    column (see :func:`~.dedup.split_words` for why staging matters:
    the inline form re-ran the split inside the per-bigram lambda —
    O(W²) per document, and this expression is evaluated over the full
    corpus TWICE per DSIR run by design)."""
    bigrams = F.when(
        F.size(words) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(words) - 1),
            lambda i: F.concat_ws(" ", words[i - 1], words[i]),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.transform(
        F.concat(words, bigrams), lambda g: F.substring(F.md5(g), 1, hex_chars)
    )


def gram_buckets(text_col: str = "text", hex_chars: int = 3) -> F.Column:
    """Hashed unigram+bigram bag of the normalised text (MULTISET — unlike
    :func:`~.dedup.word_shingles` repeats count, per the DSIR likelihoods).

    Bucket id is the first ``hex_chars`` hex chars of the gram's md5 —
    a string key, so no engine-specific hex→int conversion is needed and
    the bucket space is ``16^hex_chars`` (4096 at the default).

    PERF: inline form (the words split re-evaluates per bigram) — the
    operators below stage :func:`~.dedup.split_words` in a projection
    and call :func:`gram_buckets_from`.
    """
    return gram_buckets_from(split_words(text_col), hex_chars)


def _ratio_dim(
    docs: DataFrame, target: DataFrame, text_col: str, hex_chars: int
) -> DataFrame:
    """(bucket, lr) add-1-smoothed ``log p_target/p_raw`` dictionary.

    One TAGGED UNION of the two gram streams feeds a single aggregation
    producing both corpora's counts per bucket — each corpus is
    gram-exploded exactly once.  The normalisers ``N_raw``/``N_tgt`` are
    window sums OVER THE DIM itself (≤ ``16^hex_chars`` rows by
    construction, so the single-partition window is a non-issue), not a
    second pass over the corpora."""
    from pyspark.sql.window import Window

    b_space = float(16**hex_chars)
    grams = lambda df, side: df.select(  # noqa: E731
        split_words(text_col).alias("_w")
    ).select(
        F.explode(gram_buckets_from(F.col("_w"), hex_chars)).alias("bucket"),
        F.lit(side).alias("side"),
    )
    counts = (
        grams(docs, "r")
        .unionByName(grams(target, "t"))
        .groupBy("bucket")
        .agg(
            F.count(F.when(F.col("side") == "r", 1)).alias("c"),
            F.count(F.when(F.col("side") == "t", 1)).alias("ct"),
        )
    )
    w0 = Window.partitionBy()
    return counts.select(
        "bucket",
        (
            F.log(F.col("ct") + F.lit(1.0))
            - F.log(F.col("c") + F.lit(1.0))
            + F.log(
                (F.sum("c").over(w0) + F.lit(b_space))
                / (F.sum("ct").over(w0) + F.lit(b_space))
            )
        ).alias("lr"),
    )


def importance_weights(
    docs: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    hex_chars: int = 3,
) -> DataFrame:
    """Per-document DSIR log importance ratio ``(doc_id, weight)``.

    ``weight = Σ_grams [log(c_t(b)+1) − log(c_r(b)+1)] + n_grams·log((N_r+B)/(N_t+B))``
    — the add-1-smoothed ``log p_target/p_raw`` summed over the doc's
    gram occurrences (B = bucket-space size).  Positive ⇒ the doc looks
    more like ``target`` than like the raw corpus.  Docs with no grams
    (null text) are dropped — they carry no evidence either way.

    Plan: one tagged-union count agg (each corpus exploded once) → one
    ≤B-row ratio dim → broadcast join onto the gram stream → per-doc
    sum (map-side combinable).  The ratio dim is provably
    ≤ ``16^hex_chars`` rows, so the broadcast is safe by construction
    (contrast the data-dependent keep-set in ``dedup.cap_buckets``,
    which must stay unhinted).
    """
    if not 1 <= hex_chars <= 4:
        raise ValueError(f"hex_chars must be in 1..4, got {hex_chars}")

    ratio_dim = _ratio_dim(docs, target, text_col, hex_chars)

    grams = docs.select(
        F.col(id_col).alias("doc_id"), split_words(text_col).alias("_w")
    ).select(
        "doc_id",
        F.explode(gram_buckets_from(F.col("_w"), hex_chars)).alias("bucket"),
    )
    return (
        grams.join(F.broadcast(ratio_dim), "bucket")
        .groupBy("doc_id")
        .agg(F.round(F.sum("lr"), 6).alias("weight"))
    )


def gumbel_key(weight_col: F.Column, id_col: F.Column) -> F.Column:
    """``weight + Gumbel(0,1)`` with DETERMINISTIC content-hash noise.

    Gumbel-top-k over log-weights samples without replacement with
    probability ∝ softmax(weight) — DSIR's sampler (Xie et al. §2.2) —
    and seeding the uniform from the row id's md5 makes the draw a pure
    function of the data: ``u = (hexint(md5(id)[:8]) + 0.5) / 2^32``
    (the +0.5 keeps u strictly inside (0,1)), ``g = −ln(−ln u)``.
    """
    u = (
        F.conv(F.substring(F.md5(id_col.cast("string")), 1, 8), 16, 10)
        .cast("double")
        + F.lit(0.5)
    ) / F.lit(_U32)
    return weight_col + (-F.log(-F.log(u)))


def dsir_select(
    docs: DataFrame,
    target: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    hex_chars: int = 3,
) -> DataFrame:
    """Select ``k`` docs from the raw corpus, importance-resampled toward
    ``target``: Gumbel-top-k over :func:`importance_weights`.

    Returns ``(doc_id, weight, key)`` for the selected docs; ``key`` is
    the perturbed weight that won selection (exposed so the cut is
    auditable).  Deterministic — same corpus ⇒ same selection, on any
    partitioning or engine.

    Scale note: global top-k = per-partition top-k + a k-row final merge
    (Spark's ``TakeOrderedAndProject``); no full sort materialises.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    w = importance_weights(docs, target, id_col, text_col, hex_chars)
    return (
        w.select(
            "doc_id",
            "weight",
            F.round(gumbel_key(F.col("weight"), F.col("doc_id")), 6).alias(
                "key"
            ),
        )
        .orderBy(F.col("key").desc(), F.col("doc_id"))
        .limit(k)
    )
