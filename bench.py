"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` (default 32) and
prints ONE JSON line::

    {"metric": "suite_seconds", "value": N, "unit": "sec",
     "queries": {...}, "sf": ..., "pairs_scored": ..., "pairs_per_sec": ...}

Each query is fully materialised via the noop sink (no driver collect).

Noise defence: this VM has noisy-neighbor phases — BENCH.md documents
±50% same-code swings between runs minutes apart (round 2's single-shot
harness recorded a 6.9x phantom collapse of pairs_per_sec).  Every
headline query therefore runs ``$SPARK_GRAFT_BENCH_REPS`` times (default
3) and reports the per-query MINIMUM (the least-noise-contaminated
observation of the same deterministic plan); the scoring throughput runs
the same number of passes and reports the best.  ``spark.catalog
.clearCache()`` between reps keeps the min honest (no cross-rep data
cache reuse — only the JVM/codegen warmth every long-lived cluster has).

For the N-vs-4N scaling-efficiency protocol see scripts/scaling_bench.py,
which reruns the ER job in interleaved fresh JVMs at local[4]/local[16].
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))

# headline set: the ER flagship + the operators that dominate 100 TB runs
HEADLINE = [
    "q_blocking_join",
    "q_topk_window",
    "q_audit_metrics",
    "q_result_assembly",
    "q_multi_match_veto",
    "q_connected_components",
    "q_dedup_exact",
    "q_dedup_ngram_jaccard",
    "q_dedup_fuzzy_clusters",
    "q_dedup_minhash",
    "q_dedup_simhash",
    "q_embed_topk",
    "q_embed_lsh_topk",
    "q_token_count",
    "q_quality_score",
    "q_name_match",
    "q_reduce_candidates",
    "q_reject_reasons",
    "q_entity_payload_parse",
    "q_osm_changeset_edits",
    "q_er_pipeline",
    # round-4 training-data additions with non-trivial plans (explodes /
    # window aggs); the pure scan-shaped ones (pii, sampling) cost noise
    "q_decontaminate",
    "q_repetition_stats",
    "q_duplicate_spans",
    "q_pack_sequences",
    # round-4 late additions: semantic dedup, importance resampling,
    # fuzzy decontamination (explode/join/topk plans worth tracking)
    "q_semdedup",
    "q_dsir_select",
    "q_decontaminate_fuzzy",
    # round 4: north-star scoring trio + Fellegi-Sunter EM fit
    "q_pair_scores",
    "q_fs_em",
    # round 4: meta-blocking (1M-edge weight graph + CNP prune),
    # idf scorer, distributed cluster evaluation
    "q_meta_cnp",
    "q_idf_overlap",
    "q_cluster_eval",
    # round 4 (cont.): sorted-neighborhood channel (distributed global
    # rank) + blocking-quality triple over a 3M-pair truth set
    "q_snm_pairs",
    "q_blocking_metrics",
    # round 4 (cont.): hybrid scorers over the 160k-pair blocked set —
    # token-level JW through one Arrow node each
    "q_soft_tfidf",
    "q_monge_elkan",
    # the zero-Python fuzzy scorer (chargram TF-IDF cosine): the JVM
    # cost floor the Arrow-crossing scorers are judged against
    "q_gram_cosine",
    # round 5: the gaps-and-islands sessionization family gets a tracked
    # cost now that its oracle-type fix made it driver-gradeable
    "q_sessionize",
]


def _materialise(df) -> int:
    df.write.mode("overwrite").format("noop").save()
    return 0


def main() -> None:
    import __spark_entry__ as entrymod
    from osm_wikidata_spark.session import build_session

    spark = build_session(
        "bench", master=f"local[{CPUS}]", shuffle_partitions=max(CPUS, 32)
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    # warm the Python workers + Arrow path once: worker fork/import at 32
    # cores costs ~10-30 s and would otherwise land on whichever query
    # first touches a pandas UDF (a per-JVM cost, not a query cost)
    from pyspark.sql import functions as F
    from osm_wikidata_spark.functions.udfs import tidy_name_udf

    spark.range(256).select(
        tidy_name_udf(F.col("id").cast("string"))
    ).write.mode("overwrite").format("noop").save()

    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = qs[name]
        best = None
        for _ in range(REPS):
            spark.catalog.clearCache()
            t0 = time.time()
            _materialise(fn(spark, SF_DIR))
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        total += best

    # throughput metric: candidate pairs scored per second.  Synthetic
    # transcripts at volume (fixture variant groups) so blocks carry real
    # collision density — the derive-from-orders path spreads conversations
    # over too many customers to exercise the scoring join.
    from osm_wikidata_spark.plans.pipeline import extract_entities, score_pairs
    from osm_wikidata_spark.operators.blocking import build_blocks, salted_pair_join
    from osm_wikidata_spark.sources.transcripts import synth_transcripts
    from pyspark.sql import functions as F

    n_convs = int(os.environ.get("SPARK_GRAFT_BENCH_CONVS", "4000"))
    transcripts, _truth = synth_transcripts(spark, n_conversations=n_convs, turns_per_conv=4)
    entities = extract_entities(transcripts).cache()
    blocks = build_blocks(entities, "conv_id", "tokens", max_block_size=None)
    pairs = salted_pair_join(blocks, blocks).filter(
        F.col("left_id") < F.col("right_id")
    ).cache()
    n_pairs = pairs.count()
    # best-of-N scoring passes: inputs stay cached (that is the steady-state
    # shape — blocking output feeds scoring in the same job), the scoring
    # stage itself re-executes each pass; min defends against VM noise.
    score_dt = None
    for _ in range(REPS):
        t0 = time.time()
        _materialise(score_pairs(pairs, entities))
        dt = time.time() - t0
        score_dt = dt if score_dt is None else min(score_dt, dt)
    pairs_per_sec = round(n_pairs / score_dt, 1) if score_dt > 0 else None
    timings["er_score_pairs"] = round(score_dt, 3)
    total += score_dt

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "suite_seconds",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "cpus": CPUS,
                "pairs_scored": n_pairs,
                "pairs_per_sec": pairs_per_sec,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
