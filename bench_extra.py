"""Per-stage isolation benchmarks (guide §1.4) — NOT the driver contract.

``bench.py`` is frozen for measurement; this file holds the noop-sink
stage isolations used to attribute each expensive query's cost to a
stage, so OPTIMIZATION_r06.md can cite per-stage numbers.  Usage::

    python bench_extra.py [group ...]

Groups: dsir, semdedup, cc, decon, ngram, minhash, simhash, er.
Each leg runs ``$SPARK_GRAFT_BENCH_REPS`` (default 3) reps and prints
the min, via the noop sink, with the cache cleared between reps.
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


def _noop(df):
    df.write.mode("overwrite").format("noop").save()


def timed(spark, name, fn):
    best = None
    for _ in range(REPS):
        spark.catalog.clearCache()
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(json.dumps({"leg": name, "sec": round(best, 3)}), flush=True)
    return best


def main() -> None:
    from osm_wikidata_spark.session import build_session
    from pyspark.sql import functions as F

    groups = sys.argv[1:] or ["dsir", "semdedup", "cc", "decon", "ngram"]
    spark = build_session(
        "bench-extra", master=f"local[{CPUS}]", shuffle_partitions=max(CPUS, 32)
    )
    spark.sparkContext.setLogLevel("ERROR")

    def docs():
        return spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))

    def emb():
        e = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
        return e.select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
        )

    if "dsir" in groups:
        from osm_wikidata_spark.operators import importance
        from osm_wikidata_spark.operators.dedup import split_words

        # _inline: the pre-r06 expression shape (gram_buckets inlines the
        # words split under the per-element lambda — O(W²)/doc), kept as
        # the before-evidence for the staging fix; _staged mirrors the
        # operators' current two-projection shape.
        spark.sparkContext.setJobDescription("dsir: gram scan only")
        timed(
            spark,
            "dsir_gram_scan_docs_inline",
            lambda: _noop(
                docs()
                .select(F.explode(importance.gram_buckets("text", 3)).alias("b"))
                .groupBy("b")
                .agg(F.count("*").alias("n"))
            ),
        )
        timed(
            spark,
            "dsir_gram_scan_docs_staged",
            lambda: _noop(
                docs()
                .select(split_words("text").alias("_w"))
                .select(
                    F.explode(
                        importance.gram_buckets_from(F.col("_w"), 3)
                    ).alias("b")
                )
                .groupBy("b")
                .agg(F.count("*").alias("n"))
            ),
        )
        target = docs().filter(F.col("source").isin("src0", "src1"))
        timed(
            spark,
            "dsir_ratio_dim",
            lambda: _noop(importance._ratio_dim(docs(), target, "text", 3)),
        )
        timed(
            spark,
            "dsir_weights_full",
            lambda: _noop(importance.importance_weights(docs(), target)),
        )
        timed(
            spark,
            "dsir_select_full",
            lambda: _noop(importance.dsir_select(docs(), target, k=100)),
        )

    if "semdedup" in groups:
        from osm_wikidata_spark.operators import similarity
        from osm_wikidata_spark.operators.dedup import cap_buckets

        centroids = [[1.0 if j == c else 0.0 for j in range(64)] for c in range(4)]
        timed(
            spark,
            "semdedup_ivf_assign",
            lambda: _noop(similarity.ivf_assign(emb(), centroids)),
        )

        def _pairs_only():
            cells = (
                similarity.ivf_assign(emb(), centroids)
                .filter(F.col("cell").isNotNull())
                .select(F.col("vec_id").alias("doc"), "cell")
            )
            kept, _ = cap_buckets(cells, ["cell"], None)
            cands = (
                kept.select(F.col("doc").alias("left_id"), "cell")
                .join(kept.select(F.col("doc").alias("right_id"), "cell"), "cell")
                .filter(F.col("left_id") < F.col("right_id"))
                .select("left_id", "right_id")
            )
            _noop(cands)

        timed(spark, "semdedup_candidates_only", _pairs_only)

        def _verify():
            e = emb()
            cells = (
                similarity.ivf_assign(e, centroids)
                .filter(F.col("cell").isNotNull())
                .select(F.col("vec_id").alias("doc"), "cell")
            )
            kept, _ = cap_buckets(cells, ["cell"], None)
            cands = (
                kept.select(F.col("doc").alias("left_id"), "cell")
                .join(kept.select(F.col("doc").alias("right_id"), "cell"), "cell")
                .filter(F.col("left_id") < F.col("right_id"))
                .select("left_id", "right_id")
            )
            lv = e.select(
                F.col("vec_id").alias("left_id"),
                F.col("embedding").alias("lv"),
                similarity.l2_norm(F.col("embedding")).alias("ln"),
            )
            rv = e.select(
                F.col("vec_id").alias("right_id"),
                F.col("embedding").alias("rv"),
                similarity.l2_norm(F.col("embedding")).alias("rn"),
            )
            pairs = (
                cands.join(lv, "left_id")
                .join(rv, "right_id")
                .select(
                    "left_id",
                    "right_id",
                    F.round(
                        similarity._norm_cosine(
                            F.col("lv"), F.col("rv"), F.col("ln"), F.col("rn")
                        ),
                        6,
                    ).alias("cos"),
                )
                .filter(F.col("cos") >= 0.4)
            )
            _noop(pairs)

        timed(spark, "semdedup_pairs_verified", _verify)
        timed(
            spark,
            "semdedup_full",
            lambda: _noop(
                similarity.semdedup(emb(), centroids, threshold=0.4)
            ),
        )

    if "cc" in groups:
        from osm_wikidata_spark.operators.components import connected_components

        cust = spark.read.parquet(os.path.join(SF_DIR, "customer.parquet"))
        edges = cust.select(
            F.col("c_custkey").alias("left_id"),
            (F.col("c_custkey") + 1).alias("right_id"),
        ).filter(
            (F.pmod(F.col("c_custkey") + 1, F.lit(10)) != 0)
            & (F.col("right_id") <= F.lit(1499))
        )
        timed(spark, "cc_full", lambda: _noop(connected_components(edges)))

    if "decon" in groups:
        from osm_wikidata_spark.operators import contamination

        d = docs()
        timed(
            spark,
            "decon_exact_full",
            lambda: _noop(
                contamination.contaminated_docs(
                    d.filter(F.col("doc_id") % 50 != 0),
                    d.filter(F.col("doc_id") % 50 == 0),
                    shingle_n=3,
                )
            ),
        )
        from osm_wikidata_spark.operators.dedup import word_shingle_hashes

        timed(
            spark,
            "decon_train_shingles_inline",
            lambda: _noop(
                d.filter(F.col("doc_id") % 50 != 0)
                .filter(F.col("text").isNotNull())
                .select(
                    "doc_id",
                    F.explode(word_shingle_hashes("text", 3)).alias("shingle"),
                )
            ),
        )
        timed(
            spark,
            "decon_fuzzy_full",
            lambda: _noop(
                contamination.fuzzy_contaminated_docs(
                    d.filter(F.col("doc_id") % 50 != 0),
                    d.filter(F.col("doc_id") % 50 == 0),
                    threshold=0.05,
                    shingle_n=3,
                )
            ),
        )

    if "ngram" in groups:
        from osm_wikidata_spark.operators import dedup

        timed(
            spark,
            "ngram_with_sets_inline",
            lambda: _noop(
                docs()
                .filter(F.col("text").isNotNull())
                .select(
                    F.col("doc_id").alias("doc"),
                    dedup.word_shingle_hashes("text", 3).alias("sh"),
                )
                .withColumn("set_size", F.size("sh"))
            ),
        )
        timed(
            spark,
            "ngram_full",
            lambda: _noop(
                dedup.ngram_jaccard_pairs(
                    docs(), shingle_n=3, threshold=0.5, persist=True
                )
            ),
        )

    if "minhash" in groups:
        from osm_wikidata_spark.operators import dedup

        timed(
            spark,
            "minhash_band_keys_only",
            lambda: _noop(dedup.minhash_band_keys(docs())),
        )
        timed(
            spark,
            "minhash_full",
            lambda: _noop(dedup.minhash_lsh_pairs(docs(), persist=True)),
        )

    if "simhash" in groups:
        from osm_wikidata_spark.operators import dedup

        timed(
            spark,
            "simhash_table_only",
            lambda: _noop(dedup.simhash_table(docs())),
        )
        timed(
            spark,
            "simhash_full",
            lambda: _noop(
                dedup.simhash_near_dups(
                    docs(), persist=True, corpus_size=docs().count()
                )
            ),
        )

    if "er" in groups:
        from osm_wikidata_spark.plans.pipeline import (
            extract_entities,
            run_pipeline,
            score_pairs,
        )
        from osm_wikidata_spark.operators.blocking import build_blocks, salted_pair_join
        import __spark_entry__ as entrymod

        qs = entrymod.queries()
        timed(
            spark,
            "er_pipeline_full",
            lambda: _noop(qs["q_er_pipeline"](spark, SF_DIR)),
        )

    spark.stop()


if __name__ == "__main__":
    main()
