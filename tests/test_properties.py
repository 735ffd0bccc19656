"""Property-based kernel invariants (hypothesis).

The reference suite is example-based only (SURVEY.md §5); these pin the
cascade's *algebraic* contracts, which matter for a distributed engine:
determinism (Spark retries re-run tasks — a nondeterministic kernel breaks
exactly-once semantics), reflexivity, and the digit guard (the rule that
keeps "Board 1" off "Board 11", match.py:22,271,347).

Deliberately NOT asserted: tidy_name idempotence — the reference's plural
strip leaves a trailing space on "... s" inputs (match.py:170-174), so
tidy∘tidy ≠ tidy by fixture-pinned design.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from osm_wikidata_spark.kernel.cascade import match_names

_WORD = st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=2, max_size=8)
_NAME = st.builds(" ".join, st.lists(_WORD, min_size=1, max_size=4))
_ENDINGS = st.one_of(
    st.none(), st.sets(st.sampled_from(["church", "house", "inn", "services"]), max_size=2)
)


@settings(max_examples=300, deadline=None)
@given(_NAME)
def test_self_match_is_good(name):
    decision = match_names(name, name)
    assert decision is not None and decision.kind == "good"


@settings(max_examples=300, deadline=None)
@given(_NAME, _NAME, _ENDINGS)
def test_deterministic(a, b, endings):
    e = tuple(sorted(endings)) if endings else None
    first = match_names(a, b, e)
    second = match_names(a, b, e)
    assert first == second


@settings(max_examples=300, deadline=None)
@given(_NAME, st.integers(1, 999), st.integers(1, 999))
def test_digit_guard(base, x, y):
    """Names identical except a differing trailing number never match
    (no endings in play)."""
    if x == y:
        return
    assert match_names(f"{base} {x}", f"{base} {y}") is None


@settings(max_examples=200, deadline=None)
@given(_NAME, _ENDINGS)
def test_endings_copy_no_cross_call_state(name, endings):
    """Calling match_names must not mutate the caller's endings collection
    (the documented per-pair-copy determinism fix, cascade.py header)."""
    if endings is None:
        return
    snapshot = set(endings)
    match_names(name + " church", name, endings)
    assert endings == snapshot


# ---- continuous scoring kernels (operators/scoring.py) ----

_SHORT = st.text(alphabet="abcdefgh '", max_size=14)


@given(_SHORT, _SHORT)
@settings(max_examples=400, deadline=None)
def test_jaro_winkler_symmetric_and_bounded(a, b):
    from osm_wikidata_spark.operators.scoring import jaro, jaro_winkler

    jw, j = jaro_winkler(a, b), jaro(a, b)
    assert jaro_winkler(b, a) == jw  # symmetry
    assert 0.0 <= j <= 1.0 and 0.0 <= jw <= 1.0
    assert jw >= j  # Winkler boost never lowers Jaro
    if a and a == b:
        assert jw == 1.0  # reflexive on non-empty strings


@given(_SHORT)
@settings(max_examples=200, deadline=None)
def test_jaro_empty_conventions(a):
    from osm_wikidata_spark.operators.scoring import jaro

    # the DuckDB/RapidFuzz convention: anything vs empty is 0, even ''
    assert jaro(a, "") == 0.0
    assert jaro("", a) == 0.0


# --- continuous-scorer kernel invariants (continuation session) ---

_SHORT = st.text(alphabet="abcdef", max_size=8)


@settings(max_examples=300, deadline=None)
@given(_SHORT, _SHORT)
def test_damerau_symmetric_and_identity(a, b):
    from osm_wikidata_spark.operators.scoring import damerau_levenshtein as dl

    assert dl(a, b) == dl(b, a)
    assert dl(a, a) == 0


@settings(max_examples=200, deadline=None)
@given(_SHORT, _SHORT, _SHORT)
def test_damerau_triangle_inequality(a, b, c):
    """TRUE (unrestricted) DL is a metric — the triangle inequality holds.
    The restricted OSA variant violates it (e.g. CA/AC/ABC), so this
    property also guards against silently regressing to OSA."""
    from osm_wikidata_spark.operators.scoring import damerau_levenshtein as dl

    assert dl(a, c) <= dl(a, b) + dl(b, c)


@settings(max_examples=300, deadline=None)
@given(_SHORT, _SHORT)
def test_damerau_bounded_by_levenshtein(a, b):
    from osm_wikidata_spark.operators.scoring import damerau_levenshtein as dl

    # plain Levenshtein DP
    m, n = len(a), len(b)
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        for j in range(1, n + 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (a[i - 1] != b[j - 1]),
            )
        prev = cur
    lev = prev[n]
    assert dl(a, b) <= lev
    # and they differ by at most the number of transpositions folded in
    assert dl(a, b) >= (lev + 1) // 2


@settings(max_examples=300, deadline=None)
@given(_SHORT, _SHORT)
def test_jaro_winkler_symmetric_and_bounded(a, b):
    from osm_wikidata_spark.operators.scoring import jaro_winkler as jw

    s = jw(a, b)
    assert 0.0 <= s <= 1.0
    assert s == jw(b, a)
    if a == b and a:
        assert s == 1.0
