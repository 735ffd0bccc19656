"""Stage-checkpoint semantics: resume on same params, rebuild on changed
params (the _PARAMS_MANIFEST fingerprint added after ADVICE r1)."""

from __future__ import annotations

import os

from osm_wikidata_spark.plans.checkpoint import completed_stages, stage


def _build_counter(spark, value):
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.createDataFrame([(value,)], "v int")

    return build, calls


def test_same_params_reuse(spark, tmp_path):
    run_dir = str(tmp_path)
    build, calls = _build_counter(spark, 1)
    first = stage(spark, run_dir, "s1", build, params={"cap": 50})
    assert first.collect()[0]["v"] == 1 and calls["n"] == 1
    again = stage(spark, run_dir, "s1", build, params={"cap": 50})
    assert again.collect()[0]["v"] == 1 and calls["n"] == 1  # not rebuilt
    assert completed_stages(run_dir) == ["s1"]


def test_changed_params_rebuild(spark, tmp_path):
    run_dir = str(tmp_path)
    build_a, calls_a = _build_counter(spark, 1)
    stage(spark, run_dir, "s1", build_a, params={"cap": 50})
    # same stage name, different params: stale output must NOT be reused
    build_b, calls_b = _build_counter(spark, 2)
    rebuilt = stage(spark, run_dir, "s1", build_b, params={"cap": 500})
    assert calls_b["n"] == 1
    assert rebuilt.collect()[0]["v"] == 2


def test_legacy_stage_without_params_still_resumes(spark, tmp_path):
    run_dir = str(tmp_path)
    build, calls = _build_counter(spark, 7)
    stage(spark, run_dir, "legacy", build)  # no params → no manifest
    assert not os.path.exists(
        os.path.join(run_dir, "legacy", "_PARAMS_MANIFEST.json")
    )
    stage(spark, run_dir, "legacy", build)
    assert calls["n"] == 1
