"""Randomized differential tests for the round-5 plan rewrites.

The zero-shuffle ``repetition_stats`` run-scan fold (quality.py) and the
any-alignment ``duplicate_spans`` contract (spans.py) replaced simpler
shapes whose semantics the sf0.01 oracles pin at one data point.  These
tests pin them at hundreds of ADVERSARIAL data points: a seeded generator
builds documents dense in repeats, degenerate whitespace, sub-length
grams and tie-break collisions, runs ONE Spark job over the whole batch,
and compares every row against an independent naive Python computation
of the documented contract.

Batched-seeded rather than hypothesis-per-example because each example
needs a Spark action; one job amortises the session across all cases
(the same pattern as scripts/reffuzz/ vs tests/test_properties.py).
"""

from __future__ import annotations

import random
import re
from collections import Counter

import pytest

from osm_wikidata_spark.operators import quality, spans

# --- naive reference implementations (contract as documented) ---------


def _norm(text: str) -> str:
    return re.sub(r"\s+", " ", text.lower())


def _frac(num: float, den: float) -> float:
    return num / den if den > 0 else 0.0


def _ref_repetition(text: str, top_ns=(2, 3, 4), dup_ns=(5, 10), delim="\n"):
    norm = _norm(text)
    total = len(norm)
    words = norm.split(" ")
    out = {}

    lines = [seg.strip(" ") for seg in text.split(delim)]
    lines = [l for l in lines if l != ""]
    lc = Counter(lines)
    n_lines = len(lines)
    n_chars = sum(len(l) for l in lines)
    out["dup_line_frac"] = _frac(
        sum(c for c in lc.values() if c > 1), n_lines
    )
    out["dup_line_char_frac"] = _frac(
        sum(c * len(l) for l, c in lc.items() if c > 1), n_chars
    )

    for n in sorted(set(top_ns) | set(dup_ns)):
        n_grams = max(len(words) - (n - 1), 1)
        grams = [" ".join(words[i : i + n]) for i in range(n_grams)]
        gc = Counter(grams)
        # lexicographic (count, count*len) max — the documented Gopher
        # tie-break the packed-BIGINT max implements
        top = max(((c, c * len(g)) for g, c in gc.items()), default=(0, 0))
        if n in top_ns:
            out[f"top_{n}gram_frac"] = _frac(top[1], total)
        if n in dup_ns:
            out[f"dup_{n}gram_frac"] = _frac(
                sum(c * len(g) for g, c in gc.items() if c > 1), total
            )
    return out


def _gen_docs(seed: int, n_docs: int) -> list[str]:
    """Documents dense in the operator's edge cases."""
    rng = random.Random(seed)
    vocab = ["aa", "b", "ccc", "dd", "e", "fff", "gg", "hhhh"]
    docs = []
    for i in range(n_docs):
        kind = i % 6
        if kind == 0:  # random words, heavy collisions
            docs.append(" ".join(rng.choices(vocab, k=rng.randint(1, 60))))
        elif kind == 1:  # one word repeated — every gram identical
            docs.append(" ".join([rng.choice(vocab)] * rng.randint(1, 30)))
        elif kind == 2:  # repeated lines + messy whitespace
            pool = [
                " ".join(rng.choices(vocab, k=rng.randint(1, 6)))
                for _ in range(rng.randint(1, 4))
            ]
            docs.append(
                "\n".join(
                    "  " + rng.choice(pool) + " " for _ in range(rng.randint(2, 8))
                )
            )
        elif kind == 3:  # shorter than n words (sub-length gram path)
            docs.append(" ".join(rng.choices(vocab, k=rng.randint(1, 4))))
        elif kind == 4:  # tie-break pressure: two gram types same count
            a, b = rng.sample(vocab, 2)
            docs.append(f"{a} {a} {b} {b} {a} {a} {b} {b}")
        else:  # degenerate whitespace / empty-ish
            docs.append(rng.choice(["", " ", "  \n  \n", "x", "UPPER  case\tTAB"]))
    return docs


def test_repetition_stats_matches_naive_reference(spark):
    docs = _gen_docs(seed=20260818, n_docs=240)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id int, text string"
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in quality.repetition_stats(df).collect()
    }
    assert len(got) == len(docs)
    for i, text in enumerate(docs):
        want = _ref_repetition(text)
        row = got[i]
        for col, expected in want.items():
            assert row[col] == pytest.approx(expected, abs=1.5e-6), (
                f"doc {i} col {col}: spark={row[col]} naive={expected} "
                f"text={text!r}"
            )


def test_duplicate_spans_any_alignment_randomized(spark):
    """The round-5 contract: a planted repeat of >= window+stride-1 words
    is flagged in EVERY copy, at ANY pair of (mod-stride-incongruent)
    alignments; unique-filler docs report nothing."""
    window, stride = 5, 3
    span_words = window + stride - 1  # minimum guaranteed-visible repeat
    rng = random.Random(42)
    planted = " ".join(f"dup{j}" for j in range(span_words))
    rows, expected = [], {}
    for i in range(60):
        pre = rng.randint(0, 2 * stride)  # sweeps all alignments mod stride
        post = rng.randint(0, 6)
        filler = lambda k, tag: " ".join(  # noqa: E731
            f"u{i}{tag}{j}" for j in range(k)
        )
        text = " ".join(x for x in [filler(pre, "a"), planted, filler(post, "b")] if x)
        rows.append((f"d{i}", text))
        expected[f"d{i}"] = (pre + 1, pre + span_words)  # 1-based word range
    for i in range(20):  # unique filler: no duplicated window anywhere
        rows.append((f"u{i}", " ".join(f"only{i}x{j}" for j in range(20))))

    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {}
    for r in spans.duplicate_spans(
        df, window=window, stride=stride
    ).collect():
        got.setdefault(r["doc_id"], []).append((r["span_start"], r["span_end"]))

    for doc_id, (lo, hi) in expected.items():
        assert doc_id in got, f"{doc_id}: planted repeat not flagged"
        assert any(s <= hi and e >= lo for s, e in got[doc_id]), (
            f"{doc_id}: no span overlaps planted words [{lo},{hi}]: {got[doc_id]}"
        )
    for i in range(20):
        assert f"u{i}" not in got, f"u{i}: false positive on unique text"
