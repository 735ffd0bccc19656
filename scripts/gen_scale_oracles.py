"""Generate exact VALUES-table oracles for the xxhash64/LSH queries.

Independently replicates — in pure Python/numpy, no Spark — the candidate
semantics of q_dedup_minhash, q_dedup_simhash, q_embed_lsh_topk and
q_dedup_embed_lsh over the driver's sf0.01 parquet tables, and writes the
expected rows to ``tests/_scale_oracle_fixtures.py``.  ``oracle_sql()``
then serves them as DuckDB VALUES tables, upgrading those queries from
rows-only checks to full value-hash oracles (the same pattern as
q_name_match's fixture-pinned expected labels).

The Spark-side hash is replicated by ``tests/xxh64_ref.py`` (pure-Python
xxHash64 per the public spec, parity with ``F.xxhash64`` pinned by
tests/test_kernel.py); the hyperplane matrices are a pure function of the
seed (numpy default_rng), exactly as the engine's worker-side ``_planes``
cache derives them.  Everything downstream of the hashes — shingling,
banding, bucket caps, candidate joins, Hamming/cosine verification,
top-k — is reimplemented here from the operator *specs*, so the oracle
genuinely cross-checks the Spark plans.

Run from the repo root when the dedup parameters change::

    python scripts/gen_scale_oracles.py
"""

from __future__ import annotations

import hashlib
import os
import re
import sys
from collections import defaultdict
from decimal import ROUND_HALF_UP, Decimal
from itertools import combinations

import numpy as np
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tests.xxh64_ref import xxhash64  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "_scale_oracle_fixtures.py")

# Java \s (no unicode classes) — mirrors Spark's regexp_replace(\s+, ' ')
_WS = re.compile(r"\s+", re.ASCII)


def normalize(text: str) -> str:
    return _WS.sub(" ", text.lower())


def shingles(text: str, n: int = 3) -> list[str]:
    """Mirror of dedup.word_shingles: split(' ') keeps empties; a sliding
    slice over 1..max(len-n+1, 1); array_distinct keeps first occurrence."""
    words = normalize(text).split(" ")
    hi = max(len(words) - (n - 1), 1)
    out = [" ".join(words[i - 1 : i - 1 + n]) for i in range(1, hi + 1)]
    return list(dict.fromkeys(out))


def spark_round(x: float, scale: int = 6) -> float:
    """F.round semantics: BigDecimal(Double.toString(x)) HALF_UP."""
    return float(Decimal(repr(x)).quantize(Decimal(1).scaleb(-scale), ROUND_HALF_UP))


def fold_dot(a: list[float], b: list[float]) -> float:
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + x * y
    return acc


def fold_norm(a: list[float]) -> float:
    acc = 0.0
    for x in a:
        acc = acc + x * x
    return acc ** 0.5


def cosine(a: list[float], b: list[float]) -> float:
    return fold_dot(a, b) / (fold_norm(a) * fold_norm(b))


# ------------------------------------------------------------- minhash

def minhash_pairs(docs, n_hashes=16, bands=4, shingle_n=3, max_bucket=50):
    rows_per_band = n_hashes // bands
    buckets: dict[tuple[int, int], list[int]] = defaultdict(list)
    for doc_id, text in docs:
        sh = shingles(text, shingle_n)
        mins = [min(xxhash64(("int", i), s) for s in sh) for i in range(n_hashes)]
        for b in range(bands):
            bucket = xxhash64(*mins[b * rows_per_band : (b + 1) * rows_per_band])
            buckets[(b, bucket)].append(doc_id)
    best_band: dict[tuple[int, int], int] = {}
    for (band, _), members in buckets.items():
        if not (2 <= len(members) <= max_bucket):
            continue
        for l, r in combinations(sorted(members), 2):
            key = (l, r)
            if key not in best_band or band < best_band[key]:
                best_band[key] = band
    return sorted((l, r, band) for (l, r), band in best_band.items())


# ------------------------------------------------------------- simhash

def _band_bounds(bits: int, n_bands: int):
    base, extra = divmod(bits, n_bands)
    bounds, offset = [], 0
    for b in range(n_bands):
        width = base + (1 if b < extra else 0)
        bounds.append((offset, width))
        offset += width
    return bounds


def simhash_pairs(docs, shingle_n=3, max_hamming=6, bits=60, n_bands=None,
                  max_bucket=200):
    if n_bands is None:
        # mirror of dedup._default_n_bands with corpus_size=len(docs), the
        # banding config q_dedup_simhash selects at runtime
        min_width = bits // (max_hamming + 1)
        if min_width >= 16 or len(docs) * 4 <= (1 << min_width) * max_bucket:
            n_bands = max_hamming + 1
        else:
            n_bands = max_hamming + 2
    t = n_bands - max_hamming
    bounds = _band_bounds(bits, n_bands)
    combos = list(combinations(range(n_bands), t))
    sims: dict[int, int] = {}
    for doc_id, text in docs:
        votes = [0] * bits
        for s in shingles(text, shingle_n):
            h = xxhash64(s)
            for b in range(bits):
                votes[b] += 1 if (h >> b) & 1 else -1
        sims[doc_id] = sum(1 << b for b in range(bits) if votes[b] > 0)
    buckets: dict[tuple[int, int], list[int]] = defaultdict(list)
    for doc_id, sim in sims.items():
        for ci, combo in enumerate(combos):
            key, shift = 0, 0
            for b in combo:
                offset, width = bounds[b]
                key += ((sim >> offset) & ((1 << width) - 1)) << shift
                shift += width
            buckets[(ci, key)].append(doc_id)
    seen: set[tuple[int, int]] = set()
    for members in buckets.values():
        if 2 <= len(members) <= max_bucket:
            seen.update(combinations(sorted(members), 2))
    out = []
    for l, r in seen:
        hamming = bin(sims[l] ^ sims[r]).count("1")
        if hamming <= max_hamming:
            out.append((l, r, hamming))
    return sorted(out)


# ------------------------------------------------------------- embeddings

def hyperplane_buckets(vec, planes, n_planes, n_tables):
    # key format mirrors similarity.hyperplane_signatures (t:<dim>:<bits>);
    # candidate sets only depend on key equality, so dim-in-key is inert
    # for the uniform-dim fixture corpus
    a = np.asarray(vec)
    bits = (a @ planes.T >= 0).astype(np.uint8)
    return [
        f"{t}:{len(a)}:" + "".join(map(str, bits[t * n_planes : (t + 1) * n_planes]))
        for t in range(n_tables)
    ]


def embed_lsh_topk(vectors, k=5, n_planes=4, n_tables=20, seed=42):
    dim = len(next(iter(vectors.values())))
    planes = np.random.default_rng(seed).standard_normal((n_tables * n_planes, dim))
    index: dict[str, list[int]] = defaultdict(list)
    for vid, vec in vectors.items():
        for bkt in hyperplane_buckets(vec, planes, n_planes, n_tables):
            index[bkt].append(vid)
    out = []
    for qid, qvec in vectors.items():
        if qid >= 5:
            continue
        cands: set[int] = set()
        for bkt in hyperplane_buckets(qvec, planes, n_planes, n_tables):
            cands.update(index[bkt])
        scored = sorted(
            ((cosine(vectors[v], qvec), v) for v in cands),
            key=lambda cv: (-cv[0], cv[1]),
        )[:k]
        out.extend((qid, v, spark_round(c)) for c, v in scored)
    return sorted(out)


def embed_lsh_pairs(vectors, threshold=0.4, n_planes=3, n_tables=12, seed=42,
                    max_bucket=200):
    dim = len(next(iter(vectors.values())))
    planes = np.random.default_rng(seed).standard_normal((n_tables * n_planes, dim))
    buckets: dict[str, list[int]] = defaultdict(list)
    for vid, vec in vectors.items():
        for bkt in hyperplane_buckets(vec, planes, n_planes, n_tables):
            buckets[bkt].append(vid)
    cands: set[tuple[int, int]] = set()
    for members in buckets.values():
        if 2 <= len(members) <= max_bucket:
            cands.update(combinations(sorted(members), 2))
    out = []
    for l, r in cands:
        cos = spark_round(cosine(vectors[l], vectors[r]))
        if cos >= threshold:
            out.append((l, r, cos))
    return sorted(out)


def main() -> None:
    docs_tbl = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    docs = list(zip(docs_tbl["doc_id"].to_pylist(), docs_tbl["text"].to_pylist()))
    emb_tbl = pq.read_table(f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"])
    vectors = {
        vid: [float(x) for x in vec]
        for vid, vec in zip(emb_tbl["vec_id"].to_pylist(), emb_tbl["embedding"].to_pylist())
    }
    assert all(fold_norm(v) > 0 for v in vectors.values()), "zero-norm embedding"

    fp = hashlib.md5()
    for f in ("documents.parquet", "embeddings.parquet"):
        fp.update(open(f"{SF_DIR}/{f}", "rb").read())

    minhash = minhash_pairs(docs)
    simhash = simhash_pairs(docs)
    topk = embed_lsh_topk(vectors)
    lsh_pairs = embed_lsh_pairs(vectors)
    print(f"minhash={len(minhash)} simhash={len(simhash)} "
          f"topk={len(topk)} embed_lsh={len(lsh_pairs)}")

    with open(OUT, "w") as f:
        f.write(
            '"""GENERATED by scripts/gen_scale_oracles.py — do not edit.\n\n'
            "Expected outputs of the xxhash64/LSH dedup queries over the sf0.01\n"
            "testdata, computed by an independent pure-Python/numpy replica\n"
            "(see the generator's docstring).  Valid only for the parquet\n"
            'snapshot fingerprinted below.\n"""\n\n'
            f'SF001_FINGERPRINT = "{fp.hexdigest()}"\n\n'
            f"MINHASH_PAIRS = {minhash!r}\n\n"
            f"SIMHASH_PAIRS = {simhash!r}\n\n"
            f"EMBED_LSH_TOPK = {topk!r}\n\n"
            f"EMBED_LSH_PAIRS = {lsh_pairs!r}\n"
        )
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
