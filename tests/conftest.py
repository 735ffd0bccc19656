"""Shared Spark fixture for the test suite (local mode, small shuffle)."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from osm_wikidata_spark.session import build_session

    session = build_session(
        app_name="osm-wikidata-spark-tests",
        master="local[4]",
        shuffle_partitions=8,
    )
    yield session
    session.stop()
