"""Physical-plan regression guards: the scale claims in the module
docstrings (pushdown, pruning, broadcast, partial agg, top-k heaps)
must stay true as queries evolve — a correct-but-full-scan plan is a
silent 100 TB regression the oracle can't catch."""

from __future__ import annotations

from bdt_enwikisearch_hadoop_spark.registry import QUERIES


def _plan(spark, sf_dir, key: str) -> str:
    return (
        QUERIES[key](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    )


def test_a3_filter_pushed_and_columns_pruned(spark, sf_dir):
    p = _plan(spark, sf_dir, "a3_scan_filter_pushdown")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate" in p
    assert (
        "ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,"
        "l_shipdate:timestamp_ntz>" in p
    )


def test_a2_reads_only_projected_columns(spark, sf_dir):
    p = _plan(spark, sf_dir, "a2_scan_project")
    assert "ReadSchema: struct<l_orderkey:bigint,l_quantity:double>" in p


def test_c7_broadcasts_without_shuffle(spark, sf_dir):
    p = _plan(spark, sf_dir, "c7_join_broadcast")
    assert "BroadcastHashJoin" in p
    assert "Exchange hashpartitioning" not in p


def test_d1_two_phase_aggregation(spark, sf_dir):
    p = _plan(spark, sf_dir, "d1_groupby_basic")
    assert p.count("HashAggregate") == 2  # partial (map-side) + final


def test_f2_topk_is_heap_not_sort(spark, sf_dir):
    p = _plan(spark, sf_dir, "f2_global_topk")
    assert "TakeOrderedAndProject" in p
    assert "Exchange rangepartitioning" not in p


def test_i6_search_ends_in_topk_heap(spark, sf_dir):
    p = _plan(spark, sf_dir, "i6_search_and")
    assert "TakeOrderedAndProject" in p


def test_c8_no_cartesian(spark, sf_dir):
    assert "CartesianProduct" not in _plan(spark, sf_dir, "c8_join_range_theta")


def test_j18_is_pure_map_pass(spark, sf_dir):
    """The repetition filter must stay a narrow per-row projection —
    in-row bigram arrays, never an explode + re-aggregate."""
    p = _plan(spark, sf_dir, "j18_repetition_filter")
    assert "Exchange" not in p
    assert "Generate" not in p  # no explode


def test_j19_broadcasts_eval_set(spark, sf_dir):
    """Decontamination probes a BROADCAST eval-shingle table; the
    corpus side must not shuffle before the join."""
    p = _plan(spark, sf_dir, "j19_decontaminate")
    assert "BroadcastHashJoin" in p


def test_i10_bm25_ends_in_topk_heap(spark, sf_dir):
    p = _plan(spark, sf_dir, "i10_bm25")
    assert "TakeOrderedAndProject" in p


def test_bucketed_join_is_shuffle_free(spark, sf_dir, tmp_path):
    """Bucketed tables co-locate join keys at WRITE time — the join
    then plans with zero Exchange on either side.  This is the storage
    layout for the persisted inverted index / fact tables at 100 TB."""
    from bdt_enwikisearch_hadoop_spark.sources import load

    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    for name, df, key in (("t_orders_b", o, "o_custkey"), ("t_cust_b", c, "c_custkey")):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.mode("overwrite")
            .option("path", str(tmp_path / name))
            .bucketBy(8, key)
            .sortBy(key)
            .saveAsTable(name)
        )
    joined = spark.table("t_orders_b").join(
        spark.table("t_cust_b"),
        spark.table("t_orders_b").o_custkey == spark.table("t_cust_b").c_custkey,
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    try:
        assert "Exchange hashpartitioning" not in plan
        assert joined.count() == o.join(c, o.o_custkey == c.c_custkey).count()
    finally:
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_cust_b")


def test_c14_hint_forces_shuffled_hash_join(spark, sf_dir):
    """The SHUFFLE_HASH hint must survive planning: no sort-merge, no
    broadcast on the hinted side."""
    p = _plan(spark, sf_dir, "c14_join_shuffle_hash_hint")
    assert "ShuffledHashJoin" in p
    assert "SortMergeJoin" not in p
