"""Physical-plan regression gate: representative queries across every
operator family must plan WITHOUT the scale anti-patterns — no
cartesian / broadcast-nested-loop joins (except the documented exact
baselines, which are deliberately excluded from this sweep), no
row-at-a-time Python eval in the hot path, and whole-stage codegen
present. Catches a future refactor that silently degrades a plan while
the small-scale result stays hash-correct."""

import pytest

SF_DIR = "/root/testdata/sf0.001"

# Pure-transform queries spanning the operator families. Sink-builders
# are excluded (their plans are per-micro-batch and already asserted in
# their own suites); the exact-similarity baselines (sim_cosine_topk,
# sim_neardup_pairs*) are excluded because their broadcast
# nested-loop formulation is the DOCUMENTED oracle baseline.
AUDITED = [
    "cdc_apply_final_state",
    "cdc_scd2_history",
    "cdc_compact_net_effect",
    "cdc_temporal_enrich",
    "cdc_hot_keys",
    "cdc_seq_summary",
    "cdc_disorder_stats",
    "cdc_replication_lag",
    "cdc_gap_fenced_apply",
    "lww_latest_event_per_user",
    "transcript_stats",
    "text_quality",
    "pii_counts",
    "dedup_exact",
    "dedup_minhash_lsh",
    "sim_lsh_ann_topk",
    "events_sessionize",
    "events_asof_join",
    "capture_typed_members",
]

BANNED = ("CartesianProduct", "BroadcastNestedLoopJoin", "BatchEvalPython")

# The scalar-bound pattern — crossJoin(broadcast(<1-row bounds/fence/
# hwm frame>)) — plans as BroadcastNestedLoopJoin but is O(n) with one
# broadcast row: the standard Spark scalar-subquery idiom. These
# queries use it deliberately (integer midpoints/fences both engines
# can pin); BNLJ is allowed for them, the other bans still apply.
SCALAR_BOUND_OK = {
    "cdc_hot_keys",
    "cdc_seq_summary",
    "cdc_replication_lag",
    "cdc_gap_fenced_apply",
}


@pytest.fixture(scope="module")
def registry():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entry_for_plan_audit", "__spark_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m.queries()


@pytest.mark.parametrize("name", AUDITED)
def test_no_scale_antipatterns_in_plan(spark, registry, name):
    df = registry[name](spark, SF_DIR)
    # execute THIS df first: under AQE the final plan (and its codegen
    # spans) only exists after the run — and count() would plan a
    # different query. sf0.001 results are test-sized.
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    for bad in BANNED:
        if bad == "BroadcastNestedLoopJoin" and name in SCALAR_BOUND_OK:
            continue
        assert bad not in plan, f"{name}: {bad} in physical plan:\n{plan[:2000]}"
    # codegen spans render as "*(n) <Node>" in executedPlan.toString
    assert "*(" in plan, f"{name}: no whole-stage-codegen span"
