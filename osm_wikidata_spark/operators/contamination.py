"""Benchmark decontamination: flag training documents that share an exact
word n-gram with an evaluation corpus (the GPT-3 appendix-C recipe, Brown
et al. 2020; n=8..13 word-grams are the common range).

Spark shape: explode each side to distinct n-gram shingles (the same
``word_shingles`` kernel the Jaccard dedup path uses), inner-join on the
shingle string, collapse to one row per contaminated training doc.  The
join key is the raw shingle text — exact semantics, portable to the SQL
oracle; at 100 TB swap the key for ``xxhash64(shingle)`` to shrink the
shuffle (same plan shape, hash-collision risk ~2^-64 per pair).

The eval side is exploded once and is usually tiny relative to the
training corpus (benchmarks are a few MB); the shuffle is dominated by
the training side's shingle explosion — one explode + one hash join, no
UDF anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import word_shingles


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
    """
    t = train.select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_shingles(text_col, shingle_n)).alias("shingle"),
    ).dropDuplicates(["doc_id", "shingle"])
    ev = eval_docs.select(
        F.col(eval_id_col).alias("eval_id"),
        F.explode(word_shingles(eval_text_col, shingle_n)).alias("shingle"),
    ).dropDuplicates(["eval_id", "shingle"])
    return (
        t.join(ev, "shingle")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("shingle").alias("n_hits"),
            F.countDistinct("eval_id").alias("n_eval_docs"),
        )
    )
