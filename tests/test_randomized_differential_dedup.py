"""Randomized differential tests for the dedup pair generators.

``ngram_jaccard_pairs`` claims EXACTNESS — the PPJoin prefix/length/
positional filters (dedup.py:305) must drop no pair with Jaccard ≥ t —
but the sf0.01 oracle pins that claim at one dataset and one parameter
point.  These tests pin it against a naive all-pairs Python reference on
corpora dense in the filters' edge cases (boilerplate shingles, exact
duplicates, threshold-boundary overlaps, sub-length docs, degenerate
whitespace) across several (threshold, shingle_n) configs.

``minhash_lsh_pairs`` / ``simhash_near_dups`` candidate semantics are
pinned by the driver oracle only at the registry's default parameters;
here the pure-Python replicas (scripts/gen_scale_oracles.py — already
hash-green vs the driver at the defaults) are re-run at RANDOMIZED
parameters (band counts, hash counts, tight bucket caps that trigger the
cap-drop path) against the Spark plans on the same corpus.

Batched-seeded, one Spark action per config — same pattern as
tests/test_randomized_differential.py.
"""

from __future__ import annotations

import os
import random
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")
)
from gen_scale_oracles import minhash_pairs, shingles, simhash_pairs  # noqa: E402

from osm_wikidata_spark.operators import contamination, dedup

# --------------------------------------------------------------- corpus


def _gen_corpus(seed: int, n_docs: int) -> list[tuple[int, str]]:
    """Docs dense in pair-generator edge cases: near-dup mutations (word
    substitute/insert/delete), exact duplicates, shared boilerplate
    prefixes/suffixes (maximal-df shingles that stress the prefix filter),
    sub-shingle-length docs, and degenerate whitespace."""
    rng = random.Random(seed)
    vocab = [f"w{j}" for j in range(14)]
    boiler = "the quick brown fox jumps over the lazy dog again and again"
    docs: list[tuple[int, str]] = []
    for i in range(n_docs):
        kind = i % 7
        if kind == 0:  # random base doc
            docs.append((i, " ".join(rng.choices(vocab, k=rng.randint(5, 40)))))
        elif kind == 1 and docs:  # near-dup: mutate an earlier doc
            base = rng.choice(docs)[1].split(" ")
            for _ in range(rng.randint(1, 3)):
                op = rng.randrange(3)
                pos = rng.randrange(len(base)) if base else 0
                if op == 0 and base:
                    base[pos] = rng.choice(vocab)
                elif op == 1:
                    base.insert(pos, rng.choice(vocab))
                elif base and len(base) > 1:
                    base.pop(pos)
            docs.append((i, " ".join(base)))
        elif kind == 2 and docs:  # exact duplicate (identical shingle set)
            docs.append((i, rng.choice(docs)[1]))
        elif kind == 3:  # boilerplate frame around a unique middle
            mid = " ".join(rng.choices(vocab, k=rng.randint(0, 8)))
            docs.append((i, f"{boiler} {mid} {boiler}".strip()))
        elif kind == 4:  # shorter than shingle_n words
            docs.append((i, " ".join(rng.choices(vocab, k=rng.randint(1, 2)))))
        elif kind == 5:  # messy whitespace / case over a shared base
            base = rng.choice(docs)[1] if docs else "w0 w1"
            docs.append((i, "  " + base.upper().replace(" ", "\t", 1) + " "))
        else:  # degenerate
            docs.append((i, rng.choice(["", " ", "x", "w0", "  \n "])))
    return docs


# ----------------------------------------------- exact n-gram Jaccard


@pytest.mark.parametrize(
    "threshold,shingle_n",
    [(0.5, 3), (0.8, 3), (0.35, 2)],
)
def test_ngram_jaccard_matches_naive_all_pairs(spark, threshold, shingle_n):
    docs = _gen_corpus(seed=hash((threshold, shingle_n)) & 0xFFFF, n_docs=120)
    # a few null texts: must be silently pair-less, not crash
    rows = docs + [(900, None), (901, None)]

    expected = {}
    sets = {i: set(shingles(t, shingle_n)) for i, t in docs}
    for li in sorted(sets):
        for ri in sorted(sets):
            if li >= ri:
                continue
            a, b = sets[li], sets[ri]
            common = len(a & b)
            if common == 0:
                continue
            # same IEEE expression as the Spark side: |A∩B|/(|A|+|B|-|A∩B|)
            j = common / (len(a) + len(b) - common)
            if j >= threshold:
                expected[(li, ri)] = j

    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        (r["left_id"], r["right_id"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(
            df, shingle_n=shingle_n, threshold=threshold
        ).collect()
    }

    missed = sorted(set(expected) - set(got))
    extra = sorted(set(got) - set(expected))
    assert not missed, f"filters dropped qualifying pairs: {missed[:10]}"
    assert not extra, f"non-qualifying pairs emitted: {extra[:10]}"
    for pair, j in expected.items():
        assert got[pair] == pytest.approx(j, abs=1e-9), (
            f"pair {pair}: spark={got[pair]} naive={j}"
        )


# --------------------------------------------------- MinHash LSH parity


@pytest.mark.parametrize(
    "n_hashes,bands,shingle_n,max_bucket",
    [
        (16, 4, 3, 50),  # registry defaults
        (12, 6, 2, 8),   # narrow bands, tight cap → cap-drop path
        (8, 2, 3, 4),    # wide bands, tiny cap
    ],
)
def test_minhash_lsh_matches_replica_random_params(
    spark, n_hashes, bands, shingle_n, max_bucket
):
    docs = _gen_corpus(seed=1000 + n_hashes * 100 + bands, n_docs=90)
    expected = minhash_pairs(
        docs,
        n_hashes=n_hashes,
        bands=bands,
        shingle_n=shingle_n,
        max_bucket=max_bucket,
    )

    # null-text rows must be silently key-less (the duplicate_mapping
    # convention), never bucketed together
    df = spark.createDataFrame(
        docs + [(900, None), (901, None)], "doc_id int, text string"
    )
    got = sorted(
        (r["left_id"], r["right_id"], r["band"])
        for r in dedup.minhash_lsh_pairs(
            df,
            n_hashes=n_hashes,
            bands=bands,
            shingle_n=shingle_n,
            max_bucket=max_bucket,
        ).collect()
    )
    assert got == expected, (
        f"minhash candidates diverge at params ({n_hashes},{bands},"
        f"{shingle_n},{max_bucket}): spark={len(got)} replica={len(expected)}"
    )


# --------------------------------------------------- SimHash parity


@pytest.mark.parametrize(
    "bits,max_hamming,n_bands,max_bucket",
    [
        (60, 6, 8, 200),  # registry's k+2 banding
        (60, 6, 7, 200),  # classic k+1
        (32, 3, 5, 6),    # short hash, tight cap → cap-drop path
    ],
)
def test_simhash_matches_replica_random_params(
    spark, bits, max_hamming, n_bands, max_bucket
):
    docs = _gen_corpus(seed=2000 + bits + n_bands, n_docs=90)
    expected = simhash_pairs(
        docs,
        shingle_n=3,
        max_hamming=max_hamming,
        bits=bits,
        n_bands=n_bands,
        max_bucket=max_bucket,
    )

    df = spark.createDataFrame(
        docs + [(900, None), (901, None)], "doc_id int, text string"
    )
    got = sorted(
        (r["left_id"], r["right_id"], r["hamming"])
        for r in dedup.simhash_near_dups(
            df,
            shingle_n=3,
            max_hamming=max_hamming,
            bits=bits,
            n_bands=n_bands,
            max_bucket=max_bucket,
        ).collect()
    )
    assert got == expected, (
        f"simhash pairs diverge at params ({bits},{max_hamming},{n_bands},"
        f"{max_bucket}): spark={len(got)} replica={len(expected)}"
    )


# ------------------------------------------- null-text cross-doc hazards


def test_null_text_docs_never_pair_or_contaminate(spark):
    """Null text carries no shingles anywhere in the dedup/contamination
    family: without the gates, null texts degenerate to a CONSTANT
    seed-hash shingle set, silently pairing every null doc with every
    other (and a null train doc with a null eval doc).  Empty STRINGS, by
    contrast, are legitimately identical documents and do pair."""
    df = spark.createDataFrame(
        [(1, None), (2, None), (3, "unique words here alpha beta gamma"),
         (4, ""), (5, "")],
        "doc_id int, text string",
    )
    jac = dedup.ngram_jaccard_pairs(df).collect()
    assert [({r["left_id"], r["right_id"]}, r["jaccard"]) for r in jac] == [
        ({4, 5}, 1.0)
    ]
    assert all(
        {r["left_id"], r["right_id"]} == {4, 5}
        for r in dedup.minhash_lsh_pairs(df).collect()
    )
    assert all(
        {r["left_id"], r["right_id"]} == {4, 5}
        for r in dedup.simhash_near_dups(df).collect()
    )
    groups = dedup.exact_duplicates(df).collect()
    assert [sorted(g["doc_ids"]) for g in groups] == [[4, 5]]

    ev = spark.createDataFrame(
        [(10, None), (11, "held out benchmark prompt")],
        "doc_id int, text string",
    )
    assert contamination.contaminated_docs(df, ev, shingle_n=3).collect() == []
    assert (
        contamination.fuzzy_contaminated_docs(df, ev, shingle_n=3).collect()
        == []
    )
