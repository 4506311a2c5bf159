"""Request deadlines on the continuous serving stack: `deadline_s`
bounds queue wait + decode together; expiry cancels the request (slot
frees at the next step) and surfaces `DeadlineExceeded` carrying the
partial tokens — so callers degrade to a truncated answer, in-band.
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


@pytest.fixture(scope="module")
def gen():
    return TextGenerator(CFG)


def _prompt(rng, n):
    return rng.integers(4, CFG.vocab_size, (n,)).astype(np.int32)


def _solo(gen, ids, max_new):
    out = gen.generate_ids(
        ids[None], np.asarray([len(ids)], np.int32),
        SamplingConfig(temperature=0.0, eos_id=2, pad_id=1,
                       max_new_tokens=max_new))[0]
    toks = []
    for t in out:
        t = int(t)
        if t in (1, 2):
            break
        toks.append(t)
    return toks


def _throttled(gen, slots=2, sleep=0.05):
    eng = ContinuousEngine(gen, slots=slots, sampling=SAMPLING, chunk=2)
    orig_step = eng.step
    eng.step = lambda: (_time.sleep(sleep), orig_step())[1]
    return eng


def test_deadline_expiry_returns_partial_and_frees_slot(gen):
    eng = _throttled(gen)
    driver = ContinuousDriver(eng)
    rng = np.random.default_rng(40)
    ids = _prompt(rng, 8)
    solo = _solo(gen, ids, 60)          # pre-compile the programs so
    # the deadline budget pays decode steps, not jit

    with pytest.raises(DeadlineExceeded) as exc:
        driver.generate(ids, len(ids), 60, deadline_s=0.5)
    partial = exc.value.tokens
    assert 0 < len(partial) < len(solo)
    assert partial == solo[:len(partial)]   # prefix of the greedy run
    assert eng.stats["cancelled"] == 1
    assert driver.timeouts == 1
    # the slot is free: a fresh request decodes to completion
    other = _prompt(rng, 6)
    assert driver.generate(other, len(other), 5) == _solo(gen, other, 5)
    driver.close()


def test_deadline_neighbor_unaffected(gen):
    """A deadline'd request dying must not perturb its pool neighbor."""
    eng = _throttled(gen)
    driver = ContinuousDriver(eng)
    rng = np.random.default_rng(41)
    a = _prompt(rng, 7)
    b = _prompt(rng, 9)
    solo_a = _solo(gen, a, 14)

    out: dict = {}

    def _run_a():
        out["a"] = driver.generate(a, len(a), 14)

    ta = threading.Thread(target=_run_a)
    ta.start()
    with pytest.raises(DeadlineExceeded):
        driver.generate(b, len(b), 60, deadline_s=0.4)
    ta.join(timeout=60)
    assert out["a"] == solo_a
    driver.close()


def test_queue_wait_counts_against_deadline(gen):
    """slots=1: a request stuck BEHIND a long neighbor times out from
    the queue — the deadline covers admission latency, not just
    decode."""
    eng = _throttled(gen, slots=1)
    driver = ContinuousDriver(eng)
    rng = np.random.default_rng(42)
    hog = _prompt(rng, 8)
    vic = _prompt(rng, 5)

    started = threading.Event()
    h = driver.submit(hog, len(hog), 60,
                      on_token=lambda r, t: started.set())
    assert started.wait(timeout=30)
    with pytest.raises(DeadlineExceeded) as exc:
        driver.generate(vic, len(vic), 8, deadline_s=0.3)
    assert exc.value.tokens == []        # never admitted
    assert driver.timeouts == 1
    assert h.cancel() is True
    driver.close()


def test_handle_timed_out_flag_and_no_deadline_never_expires(gen):
    eng = _throttled(gen)
    driver = ContinuousDriver(eng)
    rng = np.random.default_rng(43)
    ids = _prompt(rng, 6)
    # no deadline: completes; flags clean
    h = driver.submit(ids, len(ids), 5)
    assert h.result() == _solo(gen, ids, 5)
    assert not h.timed_out() and not h.cancelled()
    assert driver.timeouts == 0
    # generous deadline: completes well inside it
    h2 = driver.submit(ids, len(ids), 5, deadline_s=120.0)
    assert h2.result() == _solo(gen, ids, 5)
    assert not h2.timed_out()
    assert driver.timeouts == 0
    # expired one sets the flag
    h3 = driver.submit(ids, len(ids), 60, deadline_s=0.3)
    with pytest.raises(DeadlineExceeded):
        h3.result()
    assert h3.timed_out() and h3.done()
    driver.close()


def test_invalid_deadline_rejected(gen):
    eng = ContinuousEngine(gen, slots=2, sampling=SAMPLING, chunk=2)
    driver = ContinuousDriver(eng)
    ids = _prompt(np.random.default_rng(44), 5)
    with pytest.raises(ValueError):
        driver.generate(ids, len(ids), 4, deadline_s=0.0)
    with pytest.raises(ValueError):
        driver.generate(ids, len(ids), 4, deadline_s=-1.0)
    driver.close()
    from rag_dpo_tpu.providers.tpu_llm import TPULLMProvider
    with pytest.raises(ValueError):
        TPULLMProvider(CFG, request_timeout_s=-2.0)


def _tiny_llm(**kw):
    from rag_dpo_tpu.providers.factory import create_tpu_llm

    return create_tpu_llm(arch="tiny", quantize_int8=False,
                          scheduler="continuous", max_batch=2, **kw)


def _throttle_llm(llm, sleep=0.05):
    eng = llm._driver.engine
    orig_step = eng.step
    eng.step = lambda: (_time.sleep(sleep), orig_step())[1]
    return eng


def test_provider_timeout_returns_partial_in_band():
    llm = _tiny_llm(request_timeout_s=600.0)   # default: generous
    # warm the decode programs so the tight per-call deadline below
    # measures decoding, not compilation
    ok = llm.generate("bonjour", temperature=0.0, max_tokens=4)
    assert ok.ok
    eng = _throttle_llm(llm)
    r = llm.generate("Explique l'article 32 du RGPD en détail",
                     temperature=0.0, max_tokens=64, timeout_s=0.5)
    assert not r.ok and "deadline" in r.error
    assert isinstance(r.text, str)           # partial answer, in-band
    assert eng.stats["cancelled"] == 1
    assert llm._driver.timeouts == 1
    # pool recovered: next call (no per-call override) completes
    r2 = llm.generate("bonjour", temperature=0.0, max_tokens=4)
    assert r2.ok
    llm._driver.close()


def test_provider_stream_timeout_raises_after_partial():
    llm = _tiny_llm()
    ok = llm.generate("bonjour", temperature=0.0, max_tokens=4)
    assert ok.ok
    _throttle_llm(llm)
    got = []
    with pytest.raises(DeadlineExceeded):
        for delta in llm.generate_stream(
                "Explique le RGPD longuement", max_tokens=64,
                timeout_s=0.5):
            got.append(delta)
    # the deltas that streamed before expiry are the partial answer
    assert llm._driver.timeouts == 1
    llm._driver.close()


def test_server_generate_timeout_field():
    """/generate accepts timeout_s: invalid → 400; expiry → in-band
    error with partial text; /stats carries the timeouts counter."""
    import json
    import urllib.error
    import urllib.request

    from http.server import ThreadingHTTPServer

    from rag_dpo_tpu.app.server import make_handler
    from rag_dpo_tpu.utils.query_logger import QueryLogger

    llm = _tiny_llm()
    ok = llm.generate("bonjour", temperature=0.0, max_tokens=4)
    assert ok.ok
    _throttle_llm(llm)
    qlog = QueryLogger(__import__("tempfile").mktemp(suffix=".jsonl"))
    system = {"llm": llm, "qlog": qlog, "pipe": None,
              "agent_pipe": None}
    srv = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(system))
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{port}"

    def post(payload):
        req = urllib.request.Request(
            base + "/generate", data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
        try:
            with urllib.request.urlopen(req, timeout=120) as r:
                return r.status, json.loads(r.read())
        except urllib.error.HTTPError as e:
            return e.code, json.loads(e.read())

    code, data = post({"prompt": "x", "timeout_s": 0})
    assert code == 400 and "timeout_s" in data["error"]
    code, data = post({"prompt": "x", "timeout_s": "nan-ish"})
    assert code == 400
    code, data = post({"prompt": "Explique le RGPD longuement",
                       "max_tokens": 64, "timeout_s": 0.5})
    assert code == 200
    assert data["error"] and "deadline" in data["error"]
    assert isinstance(data["text"], str)
    with urllib.request.urlopen(base + "/stats", timeout=30) as r:
        stats = json.loads(r.read())
    assert stats["decode_pool"]["timeouts"] == 1
    srv.shutdown()
    llm._driver.close()
