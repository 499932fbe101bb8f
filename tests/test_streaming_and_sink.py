"""Smoke tests for the capabilities the oracle harness can't check:
true Structured Streaming (watermark + windowed agg; stateful dedup)
and the partitioned Parquet sink (SURVEY §2.A/§2.K smoke rows)."""

from __future__ import annotations

import tempfile

from conftest import SF_DIR


def test_streaming_windowed_agg(spark):
    from bdt_enwikisearch_hadoop_spark.streaming.events import run_streaming_smoke

    assert run_streaming_smoke(spark, SF_DIR) > 0


def test_streaming_stateful_dedup(spark):
    from bdt_enwikisearch_hadoop_spark.streaming.events import (
        run_streaming_dedup_smoke,
    )
    from bdt_enwikisearch_hadoop_spark.sources import load

    n = run_streaming_dedup_smoke(spark, SF_DIR)
    # streaming dedup must agree with the batch k4 row count
    batch = (
        load(spark, SF_DIR, "events")
        .dropDuplicates(["user_id", "event_type"])
        .count()
    )
    assert n == batch > 0


def test_partitioned_sink_roundtrip(spark):
    from bdt_enwikisearch_hadoop_spark.operators.scans import (
        write_partitioned_parquet,
    )
    from bdt_enwikisearch_hadoop_spark.sources import load

    docs = load(spark, SF_DIR, "documents")
    with tempfile.TemporaryDirectory() as tmp:
        path = f"{tmp}/docs_by_lang"
        write_partitioned_parquet(docs, path, "lang")
        back = spark.read.parquet(path)
        assert back.count() == docs.count()
        assert set(back.columns) == set(docs.columns)
        # partition pruning must engage: a lang filter reads one dir
        pruned = back.filter(back.lang == "en")
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        assert pruned.count() == docs.filter(docs.lang == "en").count()
        assert "PartitionFilters: [isnotnull(lang" in plan
