"""Guards on the local oracle-gate replica (scripts/check_oracles.py).

Round 4 shipped two driver hash failures (q_pack_sequences, q_sessionize)
whose oracles emitted an uncast DuckDB window ``SUM(...)`` — typed HUGEINT,
which the driver canonicalizes differently from Spark's BIGINT, while the
replica's ``Decimal -> float`` coercion reported green.  These tests pin
the strict type gate that now rejects engine-specific oracle column types
before fingerprinting, and the exact-int canonicalisation of integral
Decimals.
"""

from __future__ import annotations

import os
import sys
from decimal import Decimal

import duckdb

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")
)

from check_oracles import _canon, bad_oracle_type_cols  # noqa: E402


def test_uncast_window_sum_is_hugeint_and_flagged():
    # the exact shape that slipped through in round 4
    rel = duckdb.sql(
        "SELECT sum(x) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING) AS s "
        "FROM (VALUES (1), (2)) t(x)"
    )
    bad = bad_oracle_type_cols([c.lower() for c in rel.columns], rel.types)
    assert bad == ["s:HUGEINT"]


def test_cast_window_sum_passes():
    rel = duckdb.sql(
        "SELECT CAST(sum(x) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING) AS BIGINT) AS s "
        "FROM (VALUES (1), (2)) t(x)"
    )
    assert bad_oracle_type_cols([c.lower() for c in rel.columns], rel.types) == []


def test_decimal_and_tz_types_flagged():
    rel = duckdb.sql(
        "SELECT CAST(1.5 AS DECIMAL(10,2)) AS d, TIMESTAMPTZ '2024-01-01 00:00:00Z' AS tz"
    )
    bad = bad_oracle_type_cols([c.lower() for c in rel.columns], rel.types)
    assert len(bad) == 2
    assert bad[0].startswith("d:DECIMAL")
    assert "tz:" in bad[1]


def test_neutral_types_pass_including_lists():
    rel = duckdb.sql(
        "SELECT 1::BIGINT AS a, 1.0::DOUBLE AS b, 'x' AS c, true AS d, "
        "DATE '2024-01-01' AS e, TIMESTAMP '2024-01-01 00:00:00' AS f, "
        "[1::BIGINT, 2::BIGINT] AS g"
    )
    assert bad_oracle_type_cols([c.lower() for c in rel.columns], rel.types) == []


def test_hugeint_list_flagged():
    rel = duckdb.sql("SELECT [1::HUGEINT] AS g")
    assert bad_oracle_type_cols(["g"], rel.types) == ["g:HUGEINT[]"]


def test_canon_integral_decimal_matches_bigint():
    assert _canon(Decimal("2")) == _canon(2) == "2"
    assert _canon(Decimal("2.0")) == "2"
    # a value outside float's exact-int range would previously corrupt
    big = Decimal(2**63 - 1)
    assert _canon(big) == str(2**63 - 1)


def test_canon_fractional_decimal_matches_double():
    assert _canon(Decimal("2.5")) == _canon(2.5)
