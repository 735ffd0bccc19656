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
    rare in text ids).

    NULL columns are encoded as a ``\\x00`` sentinel rather than skipped:
    ``concat_ws`` silently drops NULL arguments, which would hash
    ``('a', NULL)`` and ``(NULL, 'a')`` — or ``('a', NULL, 'b')`` and
    ``('a', 'b', NULL)`` — identically, breaking the pure-function-of-
    the-key premise behind :func:`sample_rows`/:func:`assign_splits` for
    multi-column nullable keys.  The sentinel keeps every position's
    contribution distinguishable while leaving hashes of fully non-null
    keys unchanged (a genuine ``\\x00`` string value would collide with
    NULL — the same vanishingly-rare caveat as the joiner)."""
    return F.substring(
        F.md5(
            F.concat_ws(
                "\x1f",
                *[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in cols],
            )
        ),
        1,
        8,
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


def mixture_sample(
    docs: DataFrame,
    targets: dict[str, float],
    strata_col: str = "source",
    key_cols: Sequence[str] = ("doc_id",),
) -> DataFrame:
    """Data-mixing sampler: draw the LARGEST sample whose strata follow
    the ``targets`` proportions exactly in expectation — the "mix web at
    50%, books at 30%, code at 20%" step of every pretraining recipe.

    The binding stratum sets the capacity: ``cap = min_s floor(n_s/w_s)``
    is the largest total for which every stratum can supply its share, so
    stratum s keeps ``rate_s = w_s·cap/n_s`` of its rows (the binding
    stratum keeps ~all of them).  Everything — counts, capacity, rates,
    the keep decision — is DataFrame algebra over a tiny per-stratum dim
    (broadcast both ways), so there is no driver-side collect and the
    whole computation is a pure, partitioning-independent function of the
    data (hence the exact SQL oracle).  The keep decision reuses the
    per-row-rate hex-threshold of :func:`sample_rows_by_rate`, so staged
    re-mixing is monotone-reproducible the same way.

    ``targets`` must be positive; strata missing from ``targets`` are
    dropped (inner join), and a target stratum absent from the data makes
    the capacity 0 (nothing can satisfy the mixture) — callers see an
    empty result rather than a silently skewed one.
    """
    if not targets or any(w <= 0 for w in targets.values()):
        raise ValueError("targets must be a non-empty map of positive weights")
    spark = docs.sparkSession
    total_w = sum(targets.values())
    tgt = spark.createDataFrame(
        [(k, float(v) / total_w) for k, v in targets.items()],
        f"{strata_col} string, w double",
    )
    counts = (
        # tgt is the preserved side, so the per-stratum aggregate is the
        # build side of the left join; UNHINTED because its cardinality is
        # data-dependent (#distinct sources) — AQE broadcasts when small
        tgt.join(docs.groupBy(strata_col).agg(F.count("*").alias("n")),
                 strata_col, "left")
        .select(strata_col, F.coalesce("n", F.lit(0)).alias("n"), "w")
    )
    capacity = counts.select(
        F.min(F.floor(F.col("n") / F.col("w"))).alias("cap")
    )
    rates = counts.crossJoin(F.broadcast(capacity)).select(
        strata_col,
        # try_divide: a target stratum absent from the data has n = 0 (and
        # forces cap = 0); its null rate never joins a doc row anyway
        F.least(F.try_divide(F.col("w") * F.col("cap"), F.col("n")), F.lit(1.0)).alias("rate"),
    )
    rated = docs.join(F.broadcast(rates), strata_col)
    thr = F.lower(
        F.lpad(
            F.hex(F.floor(F.col("rate") * F.lit(float(_SPACE))).cast("bigint")),
            8,
            "0",
        )
    )
    return rated.filter(
        F.when(F.col("rate") >= 1.0, F.lit(True)).otherwise(hash_key(key_cols) < thr)
    ).drop("rate")


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


def assign_splits(
    df: DataFrame, key_cols: Sequence[str], splits: dict[str, float]
) -> DataFrame:
    """Deterministic disjoint split assignment (train/val/test).

    Appends a ``split`` column: each row lands in exactly one named
    bucket with probability equal to its fraction, decided by the same
    content-hash machinery as :func:`sample_rows` — so the assignment is
    a pure function of the key columns.  Two properties follow that
    seed-based ``randomSplit`` cannot give:

    * **stability under growth** — a row keeps its split when the corpus
      is re-ingested, re-partitioned, or extended, so eval rows can
      never leak into train across pipeline reruns;
    * **cross-table consistency** — splitting two tables by the same
      join key puts joined rows in the same split.

    ``splits`` must be positive fractions summing to 1 (±1e-9); order
    determines the hash sub-ranges, so pass the same dict ordering to
    reproduce an assignment.  One narrow projection — no shuffle, no
    UDF.
    """
    if not splits or any(f <= 0 for f in splits.values()):
        raise ValueError("splits must be a non-empty map of positive fractions")
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    names = list(splits)
    h = hash_key(key_cols)
    expr = None
    cum = 0.0
    for name in names[:-1]:
        cum += splits[name]
        cond = h < F.lit(_hex_threshold(cum))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    # the last bucket absorbs the residual range including the rounding
    # remainder at the top of the hash space
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    return df.withColumn("split", expr)


def assign_shards(
    df: DataFrame, key_cols: Sequence[str], n_shards: int
) -> DataFrame:
    """Deterministic global shuffle for training-data output: append
    ``(shard, shard_pos)`` — which of ``n_shards`` output shards each row
    lands in, and its position within that shard.

    Training loaders want the corpus in pseudo-random order, but a
    seedless ``orderBy(rand())`` is irreproducible and a global sort of
    100 TB is a range-partitioned monster.  Content-hash sharding gives
    the same permutation every run (resume-safe, diffable across
    pipeline versions) with exactly ONE hash shuffle on the shard key
    plus a per-shard sort: rows scatter to shards by the first 8 hex
    chars of their key hash, and sort within the shard by (hash, key) —
    the key tie-break keeps the order total even when two rows collide
    in the 32-bit hash prefix, which WILL happen beyond ~10^5 rows.

    Shards are hash-uniform, so per-shard volume is corpus/n_shards with
    binomial fluctuation — size ``n_shards`` so one shard's sort fits an
    executor (100 TB / 100k shards = 1 GB).  ``shard_pos`` is 0-based.
    """
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    from pyspark.sql.window import Window

    h = hash_key(key_cols)
    with_shard = df.withColumn(
        "shard", (F.conv(h, 16, 10).cast("bigint") % n_shards).cast("int")
    )
    w = Window.partitionBy("shard").orderBy(
        hash_key(key_cols), *[F.col(c) for c in key_cols]
    )
    return with_shard.withColumn(
        "shard_pos", F.row_number().over(w) - F.lit(1)
    )


def stratified_take(
    df: DataFrame,
    strata_cols: Sequence[str],
    key_cols: Sequence[str],
    k: int,
) -> DataFrame:
    """Exactly ``min(k, |stratum|)`` rows per stratum, chosen by
    content-hash order — count-exact eval-set construction.

    :func:`sample_pairs_stratified` keeps rows at a per-stratum RATE;
    this keeps a per-stratum COUNT, which is what benchmark curation
    actually wants ("500 examples per source").  The selection order is
    the key hash (with the raw key as the collision tie-break), so the
    chosen subset is a pure function of row content: stable across runs,
    partitionings and corpus growth *within* each stratum's survivors,
    and uniformly "random" in any human sense without a seed.

    One window over the strata key (single shuffle).  Skew note: the
    window sorts each stratum, so a degenerate stratum holding most of
    the corpus costs one big sort task; for heavy-tailed strata at
    100 TB prefer a two-step rate-then-take (sample_pairs_stratified at
    ~10k/|stratum| first, then this) so the sort input is bounded.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    from pyspark.sql.window import Window

    w = Window.partitionBy(*strata_cols).orderBy(
        hash_key(key_cols), *[F.col(c) for c in key_cols]
    )
    return (
        df.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= k)
        .drop("_r")
    )
