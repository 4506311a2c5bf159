"""Hermetic 48-question eval replay → committed regression record.

The reference keeps 80+ historical eval-result JSONs under `eval/` as a
regression record (`/root/reference/eval/results_*.json`, SURVEY §4).
This script produces the same kind of artifact for THIS framework with
zero external dependencies (see evals/hermetic.py for the recipe), and —
beyond the reference's habit — the scores are ENFORCED by
tests/test_hermetic_regression.py, which fails on drift below the best
committed record.

Run (CPU is fine and deterministic):
    JAX_PLATFORMS=cpu python scripts/run_hermetic_replay.py

Writes rag_dpo_tpu/evals/results/results_hermetic_<stamp>.json and
prints the summary line plus the gate verdict vs the committed records.
With real weights + a real LLM endpoint, the same harness replays the
reference's 90.4% benchmark — see README "Real-weights replay".
"""

import json
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

# The replay is hermetic BY DEFINITION: random-init tiny encoders +
# extractive fake LLM, CPU-deterministic. sitecustomize re-pins
# JAX_PLATFORMS=axon in every process, so setdefault would lose and a
# dead TPU tunnel would hang the replay — assign, and pin the config.
os.environ["JAX_PLATFORMS"] = "cpu"


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    from rag_dpo_tpu.evals import EvalHarness
    from rag_dpo_tpu.evals.hermetic import (
        RESULTS_DIR,
        check_against_baseline,
        gated_values,
        run_hermetic_replay,
    )

    record = run_hermetic_replay(n_runs=3)
    failures = check_against_baseline(record)
    path = EvalHarness.save_report(None, record, RESULTS_DIR,
                                   tag="hermetic")
    print(json.dumps(gated_values(record)))
    print(f"saved {path}")
    if failures:
        print("REGRESSION vs committed records:")
        for f in failures:
            print(f"  {f}")
        return 1
    print("gate: OK (no metric below the best committed record)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
