"""Capture .explain("formatted") output for headline queries.

Usage::

    python scripts/collect_plans.py before [query ...]
    python scripts/collect_plans.py after  [query ...]

Writes plans/r06/<query>_<tag>.txt for every named query (default: the
bench.py HEADLINE list).  Planning only — nothing is executed, so this is
safe to run alongside a bench.  With AQE on the output is the initial
physical plan (isFinalPlan=false), which is the comparable artifact
across code versions.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r06"
)


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    import bench
    import __spark_entry__ as entrymod
    from osm_wikidata_spark.session import build_session

    if not names:
        names = [q for q in bench.HEADLINE]
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = build_session("collect-plans", master="local[2]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    for name in names:
        if name not in qs:
            print(f"skip unknown query {name}")
            continue
        df = qs[name](spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
