"""Benchmark decontamination: flag training documents that share an exact
word n-gram with an evaluation corpus (the GPT-3 appendix-C recipe, Brown
et al. 2020; n=8..13 word-grams are the common range).

Spark shape: explode each side to distinct n-gram shingle IDENTITIES
(``word_shingle_hashes`` — xxhash64 of per-word-hash slices; the shingle
string is never built), inner-join on the 8-byte hash, collapse to one
row per contaminated training doc.  Counts are exact up to xxhash64
collisions (~2^-64 per candidate pair — the same documented trade as the
repetition-stats gram keys); the SQL oracle joins true shingle strings
and stays hash-identical at any collision-free scale.

The eval side is exploded once and is usually tiny relative to the
training corpus (benchmarks are a few MB); the shuffle is dominated by
the training side's shingle explosion — one explode + one hash join, no
UDF anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import word_hashes, word_shingle_hashes_from


def contaminated_docs(
    train: DataFrame,
    eval_docs: DataFrame,
    shingle_n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_id_col: str = "doc_id",
    eval_text_col: str = "text",
) -> DataFrame:
    """One row per training document that shares ≥1 exact ``shingle_n``-gram
    with any eval document: ``(doc_id, n_hits, n_eval_docs)`` where
    ``n_hits`` counts distinct shared shingles and ``n_eval_docs`` the
    distinct eval documents hit.  ``filter(...)`` on the output is the
    drop list; documents shorter than ``shingle_n`` words produce one
    sub-length shingle and can only hit an identical short eval doc.
    Null-text rows on either side carry no shingles and are dropped
    (without the gate the shingle expression degenerates to a constant
    seed-hash for null text — see ``dedup.minhash_band_keys`` — so a
    null train doc would spuriously "hit" a null eval doc).
    """
    train = train.filter(F.col(text_col).isNotNull())
    eval_docs = eval_docs.filter(F.col(eval_text_col).isNotNull())
    # per-word hashes staged in their own projection (dedup.split_words
    # contract: inline shingling re-hashes the words per shingle, O(W²)/doc)
    t = train.select(
        F.col(id_col).alias("doc_id"), word_hashes(text_col).alias("_wh")
    ).select(
        "doc_id",
        F.explode(word_shingle_hashes_from(F.col("_wh"), shingle_n)).alias("shingle"),
    )
    ev = eval_docs.select(
        F.col(eval_id_col).alias("eval_id"),
        word_hashes(eval_text_col).alias("_wh"),
    ).select(
        "eval_id",
        F.explode(word_shingle_hashes_from(F.col("_wh"), shingle_n)).alias("shingle"),
    )
    return (
        t.join(ev, "shingle")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("shingle").alias("n_hits"),
            F.countDistinct("eval_id").alias("n_eval_docs"),
        )
    )


def fuzzy_contaminated_docs(
    train: DataFrame,
    eval_docs: DataFrame,
    threshold: float = 0.7,
    shingle_n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_id_col: str = "doc_id",
    eval_text_col: str = "text",
) -> DataFrame:
    """Fuzzy decontamination: flag training docs that COVER ≥ ``threshold``
    of some eval document's distinct ``shingle_n``-grams (eval-side
    containment, the PaLM / Llama-2 style rule — an eval item is
    compromised when most of it appears inside one training doc, even if
    the training doc is much longer, which plain Jaccard would dilute).

    Returns one row per contaminated training doc:
    ``(doc_id, max_containment, n_eval_docs)`` over its ≥-threshold eval
    matches.  Exact — no MinHash estimate: the candidate pair set is
    bounded by shared-shingle co-occurrence, and the eval corpus is tiny
    by construction (benchmarks), so the exact bipartite join is the
    scale-correct plan; no self-join prefix filtering needed (contrast
    ``dedup.ngram_jaccard_pairs``, where the corpus joins itself).

    Plan: two explodes → one hash join on 8-byte shingle identities →
    one (train, eval) agg → one per-train-doc agg.  Eval-side shingle
    counts ride the explode (``ne``), so containment needs no second
    pass.
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    # null-text gate on both sides — see contaminated_docs
    train = train.filter(F.col(text_col).isNotNull())
    eval_docs = eval_docs.filter(F.col(eval_text_col).isNotNull())
    # staged word hashes — see contaminated_docs
    t = train.select(
        F.col(id_col).alias("doc_id"), word_hashes(text_col).alias("_wh")
    ).select(
        "doc_id",
        F.explode(word_shingle_hashes_from(F.col("_wh"), shingle_n)).alias("shingle"),
    )
    ev = eval_docs.select(
        F.col(eval_id_col).alias("eval_id"),
        word_hashes(eval_text_col).alias("_wh"),
    ).select(
        "eval_id", word_shingle_hashes_from(F.col("_wh"), shingle_n).alias("sh")
    ).select(
        "eval_id", F.size("sh").alias("ne"), F.explode("sh").alias("shingle")
    )
    pairs = (
        t.join(ev, "shingle")
        .groupBy("doc_id", "eval_id", "ne")
        .agg(F.count("*").alias("common"))
        .select(
            "doc_id",
            "eval_id",
            F.round(F.col("common") / F.col("ne"), 6).alias("containment"),
        )
        .filter(F.col("containment") >= threshold)
    )
    return pairs.groupBy("doc_id").agg(
        F.max("containment").alias("max_containment"),
        F.countDistinct("eval_id").alias("n_eval_docs"),
    )
