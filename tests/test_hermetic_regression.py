"""The hermetic replay is an ENFORCED regression gate (VERDICT round-2
item 7): this test re-runs the deterministic replay and fails if any
gated metric (global score, faithfulness, source score, cited-source
hit rate@5) drops below the best committed record in
`rag_dpo_tpu/evals/results/` by more than the per-metric tolerance.

The reference commits 80+ eval records but nothing fails on drift
(SURVEY §4); here drift is a test failure.
"""

import pytest

from rag_dpo_tpu.evals.hermetic import (
    baseline_from_records,
    check_against_baseline,
    comparable_records,
    gated_values,
    load_committed_records,
    run_hermetic_replay,
)


def test_committed_records_exist_and_are_wellformed():
    records = load_committed_records()
    assert len(records) >= 2, "need committed hermetic records to gate"
    for rec in records:
        vals = gated_values(rec)
        assert all(0.0 <= v <= 1.0 for v in vals.values()), vals


@pytest.mark.slow
def test_replay_does_not_regress_vs_committed_records():
    record = run_hermetic_replay(n_runs=1)  # deterministic: 1 run gates
    failures = check_against_baseline(record)
    assert not failures, "\n".join(failures)


@pytest.mark.slow
def test_trained_encoder_beats_random_init_and_holds_its_floors():
    """The learned-quality gate (VERDICT r3 #1): the COMMITTED trained
    checkpoint (produced by scripts/train_eval_encoder.py through the
    framework's own training stack) must (a) beat the best committed
    random-init record on the strict true-doc retrieval metric — the
    proof that training improves the product — and (b) not regress
    below the best committed trained record (the raised floors)."""
    from rag_dpo_tpu.evals.train_encoder import (
        TRAINED_NPZ,
        load_trained_params,
    )

    if not TRAINED_NPZ.exists():
        pytest.skip("no committed trained checkpoint yet")
    record = run_hermetic_replay(
        n_runs=1, encoder_params=load_trained_params(TRAINED_NPZ))
    records = load_committed_records()
    rand = comparable_records(records,
                              dict(record, encoder="random-init"))
    assert rand, "need a committed random-init v2 record to compare"
    rand_base = baseline_from_records(rand)
    assert record["true_doc_hit_rate_at_5"] > \
        rand_base["true_doc_hit_rate_at_5"], (
            "trained encoder no longer beats random-init retrieval",
            record["true_doc_hit_rate_at_5"],
            rand_base["true_doc_hit_rate_at_5"])
    failures = check_against_baseline(record, records)
    assert not failures, "\n".join(failures)


def test_gate_detects_a_regression():
    """The checker itself must flag a doctored record."""
    records = load_committed_records()
    base = baseline_from_records(records)
    bad = {
        "global_score": {"mean": base["global_score_mean"] - 0.1},
        "faithfulness": base["faithfulness"],
        "source_score": base["source_score"],
        "cited_source_hit_rate_at_5":
            base["cited_source_hit_rate_at_5"],
    }
    failures = check_against_baseline(bad, records)
    assert failures and "global_score_mean" in failures[0]
