"""Language-model-based quality scoring for pretraining data.

The CCNet pipeline's headline quality signal (Wenzek et al., LREC 2020,
§4.3) scores each document by its perplexity under a language model
trained on a trusted corpus; low-perplexity documents look like clean
prose, high-perplexity ones like boilerplate, tables, or noise.  CCNet
uses a KenLM 5-gram model; this module implements the distributed,
engine-portable core of that design with a **unigram** model — the model
order is a quality/cost knob, and unigram statistics are what a Spark
cluster can build exactly, in one aggregation, over any corpus size
(5-gram counts explode combinatorially and are pruned heuristically,
which would make the score partitioning-dependent).

Two pieces:

* :func:`unigram_model` — token → Laplace-smoothed log-probability over
  a (trusted) corpus.  One explode + one aggregation; the scalar
  normaliser (total tokens, vocab size) rides a 1-row cross join.
* :func:`doc_perplexity` — per-document mean negative log-probability
  and perplexity under a model frame.  Unseen tokens get the smoothed
  OOV probability, so scoring a corpus against a *different* trusted
  corpus (the CCNet setup) is well-defined.

Determinism / oracle portability: tokens are the whitespace split of the
lowercased, whitespace-collapsed text (same normalisation as the dedup
family); log-probabilities and derived scores are rounded to 6 decimals
(the repo-wide float-parity convention, cf. textstats.quality_score and
the cosine oracles) so IEEE ulp differences between JVM and C math
libraries cannot flip the comparison.

Scale notes: the model table has one row per distinct token — Heaps' law
puts that in the tens of millions at web scale, far too big to force-
broadcast, so the scoring join is UNHINTED (AQE broadcasts a small model,
shuffles a big one).  Hot tokens ("the") are probe-side skew against a
build side holding exactly one row per key — AQE's skew split handles
the probe side without replication cost (same argument as
boilerplate.line_dedup).  The per-document aggregation after the join is
a partial-agg sum on compact (id, double) rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import normalize_text


def _tokens(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, token) — one row per whitespace token of the normalised text;
    empty/whitespace-only documents emit nothing."""
    return (
        docs.select(
            F.col(id_col),
            F.explode(F.split(normalize_text(text_col), " ")).alias("token"),
        )
        .filter(F.col("token") != "")
    )


def unigram_model(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Laplace-smoothed unigram log-probabilities over ``docs``.

    Returns ``(token, n, logprob)``: occurrence count and
    ``round(ln((n + 1) / (T + V + 1)), 6)`` where T = total tokens and
    V = vocabulary size.  The ``+ 1`` in the denominator is the reserved
    OOV class, so model probabilities plus the OOV mass stay a proper
    distribution and :func:`doc_perplexity` can score unseen tokens with
    ``ln(1 / (T + V + 1))``.
    """
    counts = _tokens(docs, id_col, text_col).groupBy("token").agg(
        F.count("*").alias("n")
    )
    norm = counts.agg(
        F.sum("n").alias("_total"), F.count("*").alias("_vocab")
    )
    return counts.crossJoin(F.broadcast(norm)).select(
        "token",
        "n",
        F.round(
            F.log((F.col("n") + 1) / (F.col("_total") + F.col("_vocab") + 1)), 6
        ).alias("logprob"),
    )


def oov_logprob(model: DataFrame) -> DataFrame:
    """1-row frame with the model's smoothed OOV log-probability,
    recovered from the model itself: ``ln((n+1)/(T+V+1)) - ln(n+1)`` is
    ``-ln(T+V+1)`` for every row, but recomputing it from the UNROUNDED
    counts keeps full precision — so it is re-derived from the count
    column, not the rounded logprob."""
    return model.agg(
        F.round(
            -F.log(F.sum("n") + F.count("*") + 1), 6
        ).alias("oov_logprob")
    )


def doc_perplexity(
    docs: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    persist: bool = False,
) -> DataFrame:
    """Per-document perplexity under ``model`` (a :func:`unigram_model`
    frame, possibly built from a different, trusted corpus).

    Returns ``(id, n_tokens, avg_logprob, perplexity)`` for every input
    document; token-free documents keep a row with ``n_tokens = 0`` and
    null scores (a "no evidence" marker — callers' quality gates treat
    them separately from high-perplexity junk).

    ``avg_logprob`` is the mean of the model's per-token (rounded)
    log-probabilities — unseen tokens contribute the OOV mass — and
    ``perplexity = round(exp(-avg_logprob), 6)``.

    The averaging runs in **integer micro-nats**: each rounded logprob
    is scaled by 10^6 to an exact BIGINT before summing.  A float mean
    of rounded values sits arbitrarily close to the next 6-decimal
    rounding boundary by construction (the inputs live on the 1e-6
    grid), so the engines' different summation orders CAN flip the
    rounded mean — integer sums are order-independent and exact, and
    the two subsequent divisions are correctly-rounded operations on
    bit-identical operands.  ``exp`` is then fed the rounded mean, also
    bit-identical.

    ``model`` is consumed TWICE (the token join + the 1-row
    :func:`oov_logprob` aggregate), so an unpersisted
    :func:`unigram_model` plan — a full tokenize + groupBy over the
    trusted corpus — would run twice per scoring job.  ``persist``
    (opt-in, the :func:`~.metablocking.prune_edges_cnp` /
    ``ngram_jaccard_pairs`` convention: the CALLER owns the cache entry
    and unpersists/clears it) caches the model frame across the two
    consumers; leave it False when passing an already-materialised model
    (a table read), where a cache would only duplicate storage.
    """
    if persist:
        from pyspark import StorageLevel

        model = model.persist(StorageLevel.MEMORY_AND_DISK)
    lp_micro = F.round(
        F.coalesce("logprob", "oov_logprob") * 1e6, 0
    ).cast("bigint")
    scored = (
        _tokens(docs, id_col, text_col)
        # UNHINTED: model size is data-dependent (see module docstring)
        .join(model.select("token", "logprob"), "token", "left")
        .crossJoin(F.broadcast(oov_logprob(model)))
        .select(id_col, lp_micro.alias("lpm"))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("lpm").alias("_sum_micro"),
        )
    )
    avg = F.round(
        F.col("_sum_micro") / F.col("n_tokens") / F.lit(1e6), 6
    )
    return (
        docs.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            avg.alias("avg_logprob"),
            F.round(F.exp(-avg), 6).alias("perplexity"),
        )
    )


def vocab_top_k(
    docs: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tokenizer-prep vocabulary induction: the ``k`` most frequent
    tokens with corpus count and document frequency.

    Returns ``(rank, token, n, doc_freq)``; ties break lexicographically
    on the token (deterministic under any partitioning).  One explode +
    one aggregation + a global top-k (Spark's sort-limit pushes the
    limit into each partition before the single-partition merge, so no
    full sort materialises).
    """
    toks = _tokens(docs, id_col, text_col)
    counts = toks.groupBy("token").agg(
        F.count("*").alias("n"),
        F.count_distinct(id_col).alias("doc_freq"),
    )
    from pyspark.sql.window import Window

    ranked = counts.orderBy(F.desc("n"), F.asc("token")).limit(k)
    return ranked.withColumn(
        "rank",
        F.row_number().over(
            Window.orderBy(F.desc("n"), F.asc("token"))
        ),
    ).select("rank", "token", "n", "doc_freq")
