"""spark-submit entrypoint: run the ER pipeline over a transcripts table.

    spark-submit --py-files osm_wikidata_spark.zip scripts/run_pipeline_job.py \
        --input /path/to/transcripts_parquet --run-dir /path/to/run1

Resumable: re-submitting with the same --run-dir skips completed stages.
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=False,
                    help="transcripts table: iceberg:<catalog>.<db>.<table> "
                         "(cluster, with the Iceberg runtime + "
                         "sources.catalog.iceberg_configs) or a parquet path")
    ap.add_argument("--input-snapshot-id", type=int, default=None,
                    help="Iceberg time travel: read this snapshot of --input")
    ap.add_argument("--run-dir", required=True)
    ap.add_argument("--run-id", default=None)
    ap.add_argument("--max-block-size", type=int, default=1000)
    ap.add_argument("--salt", type=int, default=8)
    ap.add_argument("--synth-convs", type=int, default=0,
                    help="generate N synthetic conversations instead of --input")
    ap.add_argument("--snm-window", type=int, default=None,
                    help="opt-in sorted-neighborhood blocking channel width")
    ap.add_argument("--cnp-k", type=int, default=None,
                    help="opt-in meta-blocking CNP pruning: keep pairs in "
                         "either endpoint's top-k by block overlap")
    ap.add_argument("--fs-bands", default=None,
                    help='opt-in Fellegi-Sunter stage: JSON column->ascending '
                         'thresholds, e.g. \'{"jaro_winkler": [0.7, 0.9]}\'')
    ap.add_argument("--fs-thresholds", type=float, nargs=2, default=(0.0, 0.0),
                    metavar=("LOWER", "UPPER"),
                    help="FS three-way decision cut points (with --fs-bands)")
    args = ap.parse_args()

    spark = SparkSession.builder.getOrCreate()
    from osm_wikidata_spark.plans.pipeline import run_pipeline
    from osm_wikidata_spark.sources.transcripts import synth_transcripts

    if args.synth_convs:
        transcripts, _ = synth_transcripts(spark, n_conversations=args.synth_convs)
    else:
        if not args.input:
            raise SystemExit("--input or --synth-convs required")
        from osm_wikidata_spark.sources.catalog import read_table

        transcripts = read_table(
            spark, args.input, snapshot_id=args.input_snapshot_id
        )

    import json

    fs_bands = json.loads(args.fs_bands) if args.fs_bands else None
    out = run_pipeline(
        spark,
        transcripts,
        run_dir=args.run_dir,
        run_id=args.run_id,
        max_block_size=args.max_block_size,
        salt=args.salt,
        snm_window=args.snm_window,
        cnp_k=args.cnp_k,
        fs_bands=fs_bands,
        fs_thresholds=tuple(args.fs_thresholds),
    )
    n = out["components"].count()
    print(f"components rows: {n}; stages under {args.run_dir}")
    if fs_bands is not None:
        print(f"fs_pairs rows: {out['fs_pairs'].count()}")


if __name__ == "__main__":
    main()
