"""The learned-quality loop, one command (VERDICT r3 #1):

    JAX_PLATFORMS=cpu python scripts/train_eval_encoder.py

1. trains the tiny BGE-M3-style retrieval encoder on the v2 hermetic
   corpus with the framework's own stack (train/contrastive.py InfoNCE
   over a device mesh; queries derived from DOCUMENT CONTENT only — the
   48 eval questions never appear in training);
2. saves the checkpoint through the production npz path to
   rag_dpo_tpu/evals/data/trained_encoder_v2.npz (the format
   bootstrap.build_stack loads);
3. rebuilds the index with the trained encoder and replays the
   48-question benchmark, writing a `results_hermetic_*.json` record
   with encoder="trained";
4. prints the trained-vs-random-init comparison and the gate verdict.

The committed checkpoint + record become the regression gate's trained
floors (tests/test_hermetic_regression.py::test_trained_encoder_*).
"""

import json
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault(
    "XLA_FLAGS", "--xla_force_host_platform_device_count=8")


def main() -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")

    from rag_dpo_tpu.evals import EvalHarness
    from rag_dpo_tpu.evals.hermetic import (
        RESULTS_DIR,
        baseline_from_records,
        check_against_baseline,
        comparable_records,
        gated_values,
        load_committed_records,
        run_hermetic_replay,
    )
    from rag_dpo_tpu.evals.train_encoder import (
        TRAINED_NPZ,
        load_trained_params,
        train_eval_encoder,
    )

    metrics = train_eval_encoder(out_npz=TRAINED_NPZ)
    print("train:", json.dumps(metrics))

    record = run_hermetic_replay(
        n_runs=3, encoder_params=load_trained_params(TRAINED_NPZ))
    path = EvalHarness.save_report(None, record, RESULTS_DIR,
                                   tag="hermetic")
    print("trained:", json.dumps(gated_values(record)))
    print(f"saved {path}")

    # trained must beat the best committed RANDOM-INIT record on the
    # strict retrieval metric — the whole point of the loop
    records = load_committed_records()
    rand = comparable_records(records, dict(record, encoder="random-init"))
    if rand:
        base = baseline_from_records(rand)
        print("random-init best:", json.dumps(base))
        if record["true_doc_hit_rate_at_5"] <= \
                base["true_doc_hit_rate_at_5"]:
            print("TRAINED DID NOT BEAT RANDOM-INIT true_doc@5")
            return 1
    failures = check_against_baseline(record)
    if failures:
        print("REGRESSION vs committed trained records:")
        for f in failures:
            print(f"  {f}")
        return 1
    print("gate: OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
