"""Probabilistic record linkage: Fellegi-Sunter model fitted with EM.

The reference's matcher is a deterministic rule cascade (matcher.py /
match.py — implemented exactly in kernel/ and operators/rejects.py).  This
module adds the *probabilistic* linkage layer the ER literature builds on
the same comparison primitives (Fellegi & Sunter JASA 1969; the
Splink/FastLink architecture): band continuous scores
(operators/scoring.py) into discrete comparison levels γ, estimate the
match/non-match conditional probabilities m, u and the match prevalence λ
by expectation-maximisation — unsupervised, no labels — and score every
pair with its log2 Bayes factor ("match weight") and posterior.

Scale shape (the part that matters at 10^12 pairs):

* The ONLY full-data pass is one ``groupBy(γ…).count()`` — a map-side-
  combinable aggregation whose output is bounded by the γ pattern space
  (Π_k levels_k rows, e.g. 27 for three ternary comparisons), NOT by the
  pair count.
* EM then runs driver-side on those sufficient statistics — O(patterns ×
  iterations) float ops on ≤ a few hundred rows; distributing it would be
  pure overhead.  This is the same "tiny bounded dim may collect" carve-out
  as vetoes.py's rule dim, and exactly how Splink executes on Spark.
* Scoring joins the fitted pattern dim back broadcast — patterns are
  bounded, so the broadcast is provably small (the legitimate direction of
  the hint, unlike data-dependent keep-sets; see blocking.py).

Determinism: EM from fixed deterministic initial values is a pure function
of the pattern counts; every float op is IEEE-754 double in both the
driver loop and the unrolled-SQL DuckDB oracle (q_fs_em), with results
compared after round-to-6dp.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

#: Probability floor applied in every M-step — keeps log2 weights finite
#: when a (γ_k = v | class) cell has zero expected mass.  The unrolled-SQL
#: oracle applies the identical ``greatest(x, FLOOR)``.
FLOOR = 1e-10


def comparison_vectors(
    pairs: DataFrame, bands: dict[str, list[float]]
) -> DataFrame:
    """Band continuous score columns into discrete comparison levels.

    ``bands`` maps a score column to its ascending thresholds; the level is
    the number of thresholds the score meets (``[0.5, 0.9]`` → level 2 when
    score ≥ 0.9, level 1 when ≥ 0.5, else 0).  Null scores band to level 0
    (absence of evidence).  Pure JVM CASE expressions — banding fuses into
    the scoring stage's codegen.  Band on *rounded* scores (score_name_pairs
    rounds to 6dp) so Spark and any oracle make identical level decisions.
    """
    out = pairs
    for col, thresholds in bands.items():
        if sorted(thresholds) != list(thresholds):
            raise ValueError(f"thresholds for {col} must be ascending: {thresholds}")
        level = F.lit(0)
        for i, t in enumerate(thresholds):
            level = F.when(F.col(col) >= t, F.lit(i + 1)).otherwise(level)
        out = out.withColumn(f"gamma_{col}", level)
    return out


@dataclass(frozen=True)
class FSParams:
    """Fitted Fellegi-Sunter parameters.

    ``m[k][v]`` = P(γ_k = v | match), ``u[k][v]`` = P(γ_k = v | non-match),
    ``lam`` = P(match) — indexed by gamma column order, then level.
    """

    gamma_cols: tuple[str, ...]
    levels: tuple[int, ...]
    m: tuple[tuple[float, ...], ...]
    u: tuple[tuple[float, ...], ...]
    lam: float
    n_iter: int


def _init_probs(n_levels: int, match_side: bool) -> list[float]:
    """Deterministic EM start: matches concentrate on high levels
    (∝ 4^v), non-matches on low (∝ 4^(L-1-v)), normalised."""
    raw = [4.0**v if match_side else 4.0 ** (n_levels - 1 - v) for v in range(n_levels)]
    s = sum(raw)
    return [x / s for x in raw]


def fellegi_sunter_em(
    cv: DataFrame,
    gamma_cols: list[str],
    levels: list[int],
    n_iter: int = 20,
    lambda_init: float = 0.1,
) -> tuple[DataFrame, FSParams]:
    """Fit the FS model by EM over pattern sufficient statistics.

    Returns ``(patterns, params)``: a small DataFrame with one row per
    observed γ pattern — (γ…, n_pairs, match_weight, posterior), weights
    rounded to 6dp — and the fitted parameters.  ``match_weight`` is the
    log2 Bayes factor log2(Π m / Π u); ``posterior`` is
    P(match | γ) = λΠm / (λΠm + (1-λ)Πu).

    One shuffle total; EM on the collected ≤Π(levels) pattern rows (see
    module docstring for why driver-side is the correct scale shape).  The
    driver loop uses plain left-to-right float accumulation — like the
    unrolled-SQL oracle, any summation-order drift is ~1e-15 on ≤hundreds
    of terms and vanishes under the 6dp round.
    """
    if len(levels) != len(gamma_cols):
        raise ValueError("levels must parallel gamma_cols")
    # schema gate BEFORE the collect: a non-integral gamma column (e.g.
    # raw DOUBLE scores passed by mistake) would both blow up the
    # pattern-counts collect (unbounded cardinality) and crash m[k][v]
    # indexing with values like 1.0 — reject it while the plan is lazy
    _INTEGRAL = {"tinyint", "smallint", "int", "bigint", "boolean"}
    # analyzer-style case-insensitive resolution (spark.sql.caseSensitive
    # defaults to false, so groupBy would have resolved these names)
    dtypes = {name.lower(): dt for name, dt in cv.dtypes}
    for g in gamma_cols:
        dt = dtypes.get(g.lower())
        if dt is None:
            raise ValueError(f"gamma column {g!r} not found in cv")
        if dt not in _INTEGRAL:
            raise ValueError(
                f"gamma column {g!r} must be an integral ordinal type, got "
                f"{dt!r} — band continuous scores first (see "
                "comparison_vectors)"
            )
    counts = cv.groupBy(*gamma_cols).agg(F.count("*").alias("n_pairs"))
    rows = counts.collect()  # bounded by Π levels, documented carve-out
    pats = [tuple(r[g] for g in gamma_cols) for r in rows]
    # arbitrary cv frames (not just comparison_vectors output) reach here:
    # validate the observed patterns against the declared levels up front,
    # instead of a bare TypeError/IndexError deep in the EM loop
    for pat in pats:
        for k, v in enumerate(pat):
            if v is None or not (0 <= v < levels[k]):
                raise ValueError(
                    f"gamma column {gamma_cols[k]!r} has value {v!r} outside "
                    f"its declared levels [0, {levels[k]}) — comparison "
                    "vectors must be non-null ordinals below levels[k]"
                )
    ns = [float(r["n_pairs"]) for r in rows]
    total = sum(ns)
    if total <= 0:
        raise ValueError(
            "comparison-vector frame is empty — Fellegi-Sunter EM needs "
            "at least one candidate pair to fit (did blocking/CNP prune "
            "every pair?)"
        )

    m = [_init_probs(nl, True) for nl in levels]
    u = [_init_probs(nl, False) for nl in levels]
    lam = lambda_init
    for _ in range(n_iter):
        # E-step: posterior weight per pattern
        ws = []
        for pat in pats:
            mp, up = lam, 1.0 - lam
            for k, v in enumerate(pat):
                mp *= m[k][v]
                up *= u[k][v]
            ws.append(mp / (mp + up))
        # M-step
        nw = sum(n * w for n, w in zip(ns, ws))
        nv = total - nw
        lam = nw / total
        m = [
            [
                max(
                    sum(
                        n * w
                        for pat, n, w in zip(pats, ns, ws)
                        if pat[k] == v
                    )
                    / nw,
                    FLOOR,
                )
                for v in range(levels[k])
            ]
            for k in range(len(gamma_cols))
        ]
        u = [
            [
                max(
                    sum(
                        n * (1.0 - w)
                        for pat, n, w in zip(pats, ns, ws)
                        if pat[k] == v
                    )
                    / nv,
                    FLOOR,
                )
                for v in range(levels[k])
            ]
            for k in range(len(gamma_cols))
        ]

    out_rows = []
    for pat, n in zip(pats, ns):
        mp, up = 1.0, 1.0
        for k, v in enumerate(pat):
            mp *= m[k][v]
            up *= u[k][v]
        weight = math.log2(mp / up)
        post = lam * mp / (lam * mp + (1.0 - lam) * up)
        out_rows.append(pat + (int(n), round(weight, 6), round(post, 6)))
    schema = (
        ", ".join(f"{g} int" for g in gamma_cols)
        + ", n_pairs bigint, match_weight double, posterior double"
    )
    patterns = cv.sparkSession.createDataFrame(out_rows, schema)
    params = FSParams(
        gamma_cols=tuple(gamma_cols),
        levels=tuple(levels),
        m=tuple(tuple(x) for x in m),
        u=tuple(tuple(x) for x in u),
        lam=lam,
        n_iter=n_iter,
    )
    return patterns, params


def score_pairs_fs(cv: DataFrame, patterns: DataFrame, gamma_cols: list[str]) -> DataFrame:
    """Attach match_weight/posterior to every pair by broadcast-joining the
    fitted pattern dim (provably ≤ Π levels rows — the legitimate broadcast
    direction)."""
    dim = patterns.select(*gamma_cols, "match_weight", "posterior")
    return cv.join(F.broadcast(dim), list(gamma_cols), "left")


def fs_decisions(
    scored: DataFrame,
    lower: float,
    upper: float,
    weight_col: str = "match_weight",
) -> DataFrame:
    """The Fellegi-Sunter three-way decision rule (JASA 1969, §3): weights
    at or above ``upper`` are links, below ``lower`` non-links, the band
    between goes to clerical review.  Pure column CASE — stays inside
    whole-stage codegen, no shuffle.

    The reference's binary analog is check_for_match's match/no-match with
    the "bad match" veto band carved out by matcher rules; the explicit
    possible-link band is what a human-in-the-loop ER deployment needs.
    """
    if lower > upper:
        raise ValueError(f"lower {lower} > upper {upper}")
    w = F.col(weight_col)
    return scored.withColumn(
        "decision",
        F.when(w >= upper, F.lit("link"))
        .when(w < lower, F.lit("non_link"))
        .otherwise(F.lit("possible")),
    )


def select_review_pairs(
    scored: DataFrame,
    k: int,
    weight_col: str = "match_weight",
    mid: float | None = None,
    lower: float | None = None,
    upper: float | None = None,
    id_cols: tuple[str, str] = ("left_id", "right_id"),
) -> DataFrame:
    """Uncertainty sampling for active learning / clerical review: the
    ``k`` pairs whose weight sits closest to the decision boundary
    (``mid``, default the lower/upper midpoint or 0.0 — the FS log-ratio
    indifference point).

    Deterministic: ties on uncertainty break by the pair ids.  The global
    top-k is orderBy+limit, which Spark executes as per-partition top-k +
    a k-row driver merge (TakeOrderedAndProject) — no global sort, no
    single-partition window, safe at any corpus size for bounded k.
    Restricting to the (lower, upper) possible-link band first, when
    given, keeps already-decided pairs out of the labelling budget.
    """
    w = F.col(weight_col)
    if mid is None:
        mid = (lower + upper) / 2.0 if lower is not None and upper is not None else 0.0
    out = scored
    if lower is not None:
        out = out.filter(w >= lower)
    if upper is not None:
        out = out.filter(w < upper)
    return (
        out.withColumn("uncertainty", F.abs(w - F.lit(float(mid))))
        .orderBy(F.col("uncertainty").asc(), *[F.col(c).asc() for c in id_cols])
        .limit(k)
    )
