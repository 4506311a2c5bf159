"""Randomized abort-traffic stress on the continuous driver: many
concurrent clients mixing blocking generates, mid-stream disconnects,
handle cancels, and deadlines — under slot churn every COMPLETED
request must still equal its solo run bit-for-bit, every PARTIAL must
be a prefix of it, every caller must unblock, and the pool must end
empty and still serviceable. This is the invariant the per-feature
tests assert one path at a time; races live in the interleavings.
"""

import threading
import time as _time

import jax.numpy as jnp
import numpy as np
import pytest

from rag_dpo_tpu.models.decoder import DecoderConfig
from rag_dpo_tpu.models.generate import SamplingConfig, TextGenerator
from rag_dpo_tpu.serving import (
    ContinuousDriver,
    ContinuousEngine,
    DeadlineExceeded,
)

CFG = DecoderConfig.tiny(num_heads=4, num_kv_heads=2,
                         dtype=jnp.float32)
SAMPLING = SamplingConfig(temperature=0.0, eos_id=2, pad_id=1)
MAX_NEW = 40


@pytest.fixture(scope="module")
def gen():
    return TextGenerator(CFG)


def _solo(gen, ids):
    out = gen.generate_ids(
        ids[None], np.asarray([len(ids)], np.int32),
        SamplingConfig(temperature=0.0, eos_id=2, pad_id=1,
                       max_new_tokens=MAX_NEW))[0]
    toks = []
    for t in out:
        t = int(t)
        if t in (1, 2):
            break
        toks.append(t)
    return toks


@pytest.mark.parametrize("seed", [7, 8])
def test_randomized_abort_traffic(gen, seed):
    rng = np.random.default_rng(seed)
    prompts = [rng.integers(4, CFG.vocab_size,
                            (int(rng.integers(3, 12)),)).astype(np.int32)
               for _ in range(6)]
    solos = [_solo(gen, p) for p in prompts]

    eng = ContinuousEngine(gen, slots=3, sampling=SAMPLING, chunk=2)
    orig_step = eng.step
    eng.step = lambda: (_time.sleep(0.01), orig_step())[1]
    driver = ContinuousDriver(eng)

    N = 24
    plans = [(int(rng.integers(len(prompts))),
              ["block", "stream_close", "handle_cancel",
               "deadline"][int(rng.integers(4))],
              float(rng.uniform(0.02, 0.25)))
             for _ in range(N)]
    errors: list = []
    done = threading.Barrier(N + 1, timeout=180)

    def client(i):
        pi, kind, delay = plans[i]
        ids, solo = prompts[pi], solos[pi]
        try:
            if kind == "block":
                out = driver.generate(ids, len(ids), MAX_NEW)
                assert out == solo, f"client {i}: completed != solo"
            elif kind == "stream_close":
                stream = driver.generate_stream(ids, len(ids), MAX_NEW)
                got = []
                t0 = _time.monotonic()
                for t in stream:
                    got.append(t)
                    if _time.monotonic() - t0 > delay:
                        break
                stream.close()
                assert got == solo[:len(got)], \
                    f"client {i}: stream not a solo prefix"
            elif kind == "handle_cancel":
                h = driver.submit(ids, len(ids), MAX_NEW)
                _time.sleep(delay)
                h.cancel()
                out = h.result()        # partial or complete — both ok
                assert out == solo[:len(out)], \
                    f"client {i}: cancelled partial not a solo prefix"
            else:  # deadline
                try:
                    out = driver.generate(ids, len(ids), MAX_NEW,
                                          deadline_s=delay)
                    assert out == solo, f"client {i}: in-budget != solo"
                except DeadlineExceeded as e:
                    assert e.tokens == solo[:len(e.tokens)], \
                        f"client {i}: expired partial not a solo prefix"
        except Exception as e:  # noqa: BLE001 — collected for the report
            errors.append((i, kind, repr(e)))
        finally:
            done.wait()

    for i in range(N):
        threading.Thread(target=client, args=(i,), daemon=True).start()
    done.wait()                 # Barrier timeout → stranded caller
    assert not errors, errors

    # the pool drained: nothing active, queued, or prefilling
    deadline = _time.monotonic() + 30
    while eng.busy and _time.monotonic() < deadline:
        _time.sleep(0.02)
    assert not eng.busy
    assert not driver._events, "stranded driver-side events"
    # ...and still serviceable after all that churn
    out = driver.generate(prompts[0], len(prompts[0]), 5)
    assert out == solos[0][:5] or out == solos[0]
    # accounting: every deadline expiry was a cancel too
    assert eng.stats["cancelled"] >= driver.timeouts
    driver.close()
