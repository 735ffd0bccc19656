"""Unit tests for dedup / similarity / textstats / resolve / multimodal
operators with planted ground truth."""

from __future__ import annotations

from pyspark.sql import functions as F

from osm_wikidata_spark.operators import dedup, resolve, similarity, textstats


def _docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog near the river bank today"),
        (2, "The quick  brown fox jumps over the lazy dog near the river bank today"),  # exact dup modulo ws/case
        (3, "the quick brown fox jumps over the lazy dog near the river bank yesterday"),  # near dup
        (4, "completely different text about spark query engines and shuffles here"),
        (5, "der hund und die katze sind nicht auf der strasse mit dem auto"),
        (6, "le chat est dans la maison et le chien est pour la porte"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_exact_duplicates(spark):
    groups = dedup.exact_duplicates(_docs(spark)).collect()
    assert len(groups) == 1
    assert groups[0]["doc_ids"] == [1, 2]


def test_ngram_jaccard(spark):
    pairs = {
        (r["left_id"], r["right_id"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(_docs(spark), threshold=0.5).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs and 0.5 <= pairs[(1, 3)] < 1.0
    assert not any(4 in p for p in pairs)


def test_minhash_lsh(spark):
    pairs = {
        (r["left_id"], r["right_id"])
        for r in dedup.minhash_lsh_pairs(_docs(spark)).collect()
    }
    assert (1, 2) in pairs  # identical signature -> all bands agree
    assert (4, 5) not in pairs and (4, 6) not in pairs


def test_simhash(spark):
    pairs = {
        (r["left_id"], r["right_id"]): r["hamming"]
        for r in dedup.simhash_near_dups(_docs(spark), max_hamming=10).collect()
    }
    assert pairs.get((1, 2)) == 0
    assert (4, 5) not in pairs


def test_brute_force_topk(spark):
    vecs = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0]),
            (2, [0.9, 0.1, 0.0]),
            (3, [0.0, 1.0, 0.0]),
            (4, [0.0, 0.0, 1.0]),
        ],
        "vec_id bigint, embedding array<double>",
    )
    queries = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0])], "query_id bigint, query_vec array<double>"
    )
    top = similarity.brute_force_top_k(vecs, queries, k=2).collect()
    assert [r["vec_id"] for r in top] == [1, 2]
    assert top[0]["cos"] == 1.0


def test_lsh_topk_finds_identical(spark):
    vecs = spark.createDataFrame(
        [(i, [float(i == j) for j in range(4)]) for i in range(4)],
        "vec_id bigint, embedding array<double>",
    )
    queries = vecs.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    got = similarity.lsh_top_k(vecs, queries, dim=4, k=1).collect()
    # every query's identical vector shares its bucket and ranks first
    assert all(r["query_id"] == r["vec_id"] for r in got)


def test_textstats(spark):
    stats = {
        r["doc_id"]: r for r in textstats.document_stats(_docs(spark)).collect()
    }
    assert stats[1]["n_tokens"] == 14
    assert stats[1]["lang_pred"] == "en"
    assert stats[5]["lang_pred"] == "de"
    assert stats[6]["lang_pred"] == "fr"
    assert stats[1]["fingerprint"] == stats[2]["fingerprint"]
    assert 0.0 <= stats[4]["quality"] <= 1.0


def test_resolve_one_to_one(spark):
    edges = spark.createDataFrame(
        [
            ("e1", "r1", 0.9),
            ("e1", "r2", 0.5),
            ("e2", "r1", 0.8),   # e2's best collides with e1's best -> both vetoed
            ("e3", "r3", 0.7),
        ],
        "left_id string, right_id string, score double",
    )
    got = {
        (r["left_id"], r["right_id"])
        for r in resolve.resolve_one_to_one(edges).collect()
    }
    assert got == {("e3", "r3")}


def test_multi_match_veto(spark):
    edges = spark.createDataFrame(
        [("e1", "r1"), ("e2", "r1"), ("e3", "r2")],
        "left_id string, right_id string",
    )
    got = {
        (r["left_id"], r["right_id"])
        for r in resolve.multi_match_veto(edges).collect()
    }
    assert got == {("e3", "r2")}


def test_multimodal_features(spark):
    from osm_wikidata_spark.operators.multimodal import extract_features, synth_media

    feats = extract_features(synth_media(spark, 12)).collect()
    assert len(feats) == 12
    assert all(len(r["feature"]) == 8 for r in feats)
    assert all(r["n_bytes"] == 32 for r in feats)
    # deterministic across runs
    feats2 = extract_features(synth_media(spark, 12)).collect()
    assert sorted(map(str, feats)) == sorted(map(str, feats2))
