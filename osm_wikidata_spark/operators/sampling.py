"""Deterministic, engine-portable hash sampling (training-data ops).

``df.sample()`` is seed-deterministic only for a FIXED partitioning: a
repartition, a different file split, or a different cluster size changes
which rows survive, which breaks reproducible eval/labeling sets and
makes oracle checks impossible.  These samplers key on a CONTENT hash
instead — ``md5`` of the row's key columns — so the sample is a pure
function of the data: identical on any partitioning, any cluster size,
and any engine with md5 (the DuckDB oracles run the same expression
verbatim).

The keep decision compares the first 8 hex chars of the md5 against a
hex threshold string *lexicographically*: lowercase hex digits are
ASCII-ordered (0-9 < a-f), so string order equals numeric order and no
engine-specific hex→int conversion is needed.  Resolution is 1/16^8
(~2.3e-10) — far below any sampling-rate granularity that matters.

Scale shape: a sampler is ONE narrow filter — no shuffle, no UDF, fully
pushdown-friendly — so it composes freely anywhere in a pipeline.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

_SPACE = 16 ** 8  # 8 hex chars


def _hex_threshold(fraction: float) -> str:
    """Hex string such that P(md5 8-char prefix < threshold) equals
    round(fraction * 16^8) / 16^8."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    v = int(round(fraction * _SPACE))
    if v >= _SPACE:
        # 'g' sorts after every hex digit -> keep-all sentinel (a 9-char
        # '100000000' would compare LOWER than 'f…' lexicographically)
        return "g" * 8
    return format(v, "08x")


def hash_key(cols: Sequence[str]) -> F.Column:
    """First 8 hex chars of md5 over the \\x1f-joined key columns (cast to
    string; the joiner cannot occur in numeric keys and is vanishingly
    rare in text ids)."""
    return F.substring(
        F.md5(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in cols])), 1, 8
    )


def sample_rows(
    df: DataFrame, key_cols: Sequence[str], fraction: float
) -> DataFrame:
    """Deterministic ``fraction`` sample keyed on ``key_cols`` content.

    Same input rows → same sample, on any partitioning or engine.  Also
    CONSISTENT across tables: sampling two tables by the same join key at
    rates p and q keeps their join at rate min(p, q) (the standard
    consistent-hash-sampling property), which row-position sampling
    cannot do.
    """
    return df.filter(hash_key(key_cols) < _hex_threshold(fraction))


def sample_rows_by_rate(
    df: DataFrame, key_cols: Sequence[str], rate_col: str
) -> DataFrame:
    """Deterministic weighted sample: each row survives with ITS OWN
    probability ``rate_col`` (a [0, 1] double column) — the importance-
    sampling / quality-weighted-selection shape ("keep high-quality docs
    at 100%, tail quality at 5%") that a global-fraction sampler cannot
    express.

    The per-row hex threshold is ``floor(rate * 16^8)`` rendered as 8
    lowercase hex chars, compared against the content-hash prefix exactly
    like :func:`sample_rows` — same determinism guarantees (partitioning/
    cluster-size/engine invariant; consistent across tables sharing the
    key).  Rows keyed identically but rated differently survive together
    iff the hash clears the higher rate — i.e. rate-r survivors are a
    subset of rate-r' survivors for r ≤ r' (monotone, the property that
    makes staged re-rating reproducible).  null / ≤0 rates drop the row;
    ≥1 keeps it unconditionally.  Still one narrow filter — no shuffle,
    no UDF.
    """
    rate = F.col(rate_col)
    thr = F.lower(
        F.lpad(F.hex(F.floor(rate * F.lit(float(_SPACE))).cast("bigint")), 8, "0")
    )
    return df.filter(
        F.when(rate >= 1.0, F.lit(True))
        .when(rate.isNull() | (rate <= 0.0), F.lit(False))
        .otherwise(hash_key(key_cols) < thr)
    )


def sample_pairs_stratified(
    edges: DataFrame,
    rates: dict[str, float],
    strata_col: str = "kind",
    key_cols: Sequence[str] = ("left_id", "right_id"),
    default_rate: float = 0.0,
    null_stratum: str = "no_match",
) -> DataFrame:
    """Stratified pair sample for human labeling / QA: per-stratum keep
    rates over the scored-edge table (e.g. oversample rare decision kinds,
    trickle-sample the bulk).

    One literal map lookup + one hash filter — no shuffle; rare-kind
    recall in the labeling set is controlled exactly by ``rates``.
    """
    mapping = F.create_map(
        *[F.lit(x) for k, v in rates.items() for x in (k, _hex_threshold(v))]
    )
    stratum = F.coalesce(F.col(strata_col).cast("string"), F.lit(null_stratum))
    threshold = F.coalesce(
        F.element_at(mapping, stratum), F.lit(_hex_threshold(default_rate))
    )
    return edges.filter(hash_key(key_cols) < threshold)
