"""Regression tests for the round-3 advisor findings (ADVICE.md r3).

1. tpu_llm.py — _prepare_image_request must reserve the speculative
   pool's draft window like the text paths do: on a spec pool a vision
   request near the context edge degrades max_new instead of raising
   'embeds length ... exceeds max_seq_len'.
2. providers — caller/capability errors carry error_kind="input" so
   HTTP layers classify structurally (400) without substring-matching
   error text; server-side failures stay 502.
3. server.py — logprobs stop truncation: the entry whose token
   completes (or straddles) the stop sequence is dropped; the
   concatenated logprob tokens never cross the content cut.
4. server.py — chat n>1 fan-out rides a shared bounded executor, and
   n>1 at temperature 0 generates ONCE and replicates (greedy decode
   is deterministic — n identical choices without n× the compute).
"""

import io
import json as _json
import os
import threading as th
import urllib.error
import urllib.request

import numpy as np
import pytest

from rag_dpo_tpu.models.decoder import DecoderConfig
from rag_dpo_tpu.providers.base import LLMResponse
from rag_dpo_tpu.providers.fake import FakeLLMProvider
from rag_dpo_tpu.providers.tpu_llm import TPULLMProvider


def _png() -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(
        (np.arange(32 * 32 * 3).reshape(32, 32, 3) % 255
         ).astype(np.uint8)).save(buf, format="PNG")
    return buf.getvalue()


def _serve(system):
    from rag_dpo_tpu.app.server import serve

    srv = serve(port=0, system=system)
    th.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, f"http://127.0.0.1:{srv.server_address[1]}"


def _post(url, path, body):
    req = urllib.request.Request(
        url + path, data=_json.dumps(body).encode(),
        headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req, timeout=120) as resp:
            return resp.status, _json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, _json.loads(e.read())


# ------------------------------------------------- 1. vision spec budget
def test_vision_budget_reserves_draft_window():
    """On a speculative pool the image path's max_new must leave the
    draft reserve below max_seq_len (mirroring generate/generate_
    stream); without speculation the old budget stands."""
    from rag_dpo_tpu.models.vit import ViTConfig
    from rag_dpo_tpu.tokenize.base import bucket_length

    cfg = DecoderConfig.tiny()
    spec = TPULLMProvider(cfg, max_new_tokens=10_000, continuous=True,
                          max_batch=2, speculative=True, draft_len=8)
    try:
        spec.attach_vision(ViTConfig.tiny())
        pre, post, _img, max_new = spec._prepare_image_request(
            "Décris cette image en détail.", _png())
        n_img = spec._llava.config.num_image_tokens
        s = bucket_length(len(pre) + n_img + len(post))
        assert max_new >= 1
        assert s + max_new + spec._spec_reserve <= cfg.max_seq_len, (
            s, max_new, spec._spec_reserve, cfg.max_seq_len)
        assert spec._spec_reserve == 8
    finally:
        spec._driver.close()

    plain = TPULLMProvider(cfg, max_new_tokens=10_000, continuous=True,
                           max_batch=2)
    try:
        plain.attach_vision(ViTConfig.tiny())
        _, _, _, max_new_plain = plain._prepare_image_request(
            "Décris cette image en détail.", _png())
        # no speculation → no reserve → strictly more decode budget
        assert max_new_plain > max_new
    finally:
        plain._driver.close()


# --------------------------------------------------- 2. error_kind tagging
def test_input_errors_carry_error_kind():
    llm = TPULLMProvider(DecoderConfig.tiny(), max_new_tokens=8)
    # no vision tower attached → capability error, input class
    r = llm.generate_with_image("Décris.", _png())
    assert not r.ok and r.error_kind == "input"

    from rag_dpo_tpu.models.vit import ViTConfig

    llm.attach_vision(ViTConfig.tiny())
    # bad image bytes → PIL decode failure normalized to input class
    r = llm.generate_with_image("Décris.", b"not an image at all")
    assert not r.ok and "bad image data" in r.error
    assert r.error_kind == "input"
    # capability error (penalties off the pool) → input class
    r = llm.generate_with_image("Décris.", _png(),
                                frequency_penalty=0.5)
    assert not r.ok and r.error_kind == "input"
    # text path: logprobs without the continuous scheduler
    r = llm.generate("x", logprobs=2)
    assert not r.ok and r.error_kind == "input"


def test_http_classifies_provider_errors_structurally(tmp_path):
    """400 for error_kind='input', 502 otherwise — no substring
    matching on error text."""
    from rag_dpo_tpu.app.server import build_system

    os.environ["RAGDPO_TPU_ROOT"] = str(tmp_path)
    system = build_system(agent_too=False)

    class ErrLLM(FakeLLMProvider):
        def __init__(self, kind):
            super().__init__()
            self.kind = kind

        def generate(self, prompt, system=None, temperature=0.0,
                     json_mode=False, max_tokens=None):
            return LLMResponse(text="", error="vision not supported "
                               "penalties whatever wording",
                               error_kind=self.kind)

    # error text mentions the old magic substrings but kind is None →
    # server-side failure → 502 (the old substring matcher said 400)
    system2 = dict(system)
    system2["stream_llm"] = ErrLLM(None)
    srv, url = _serve(system2)
    code, d = _post(url, "/v1/chat/completions",
                    {"messages": [{"role": "user", "content": "x"}]})
    assert code == 502, d
    code, d = _post(url, "/v1/completions", {"prompt": "x"})
    assert code == 502, d
    srv.shutdown()

    # input-class error → 400 regardless of wording
    system3 = dict(system)
    system3["stream_llm"] = ErrLLM("input")
    srv, url = _serve(system3)
    code, d = _post(url, "/v1/chat/completions",
                    {"messages": [{"role": "user", "content": "x"}]})
    assert code == 400, d
    code, d = _post(url, "/v1/completions", {"prompt": "x"})
    assert code == 400, d
    srv.shutdown()


# ------------------------------------------ 3. logprobs stop truncation
def test_logprobs_never_cross_the_stop_cut(tmp_path):
    from rag_dpo_tpu.app.server import build_system

    pool = TPULLMProvider(DecoderConfig.tiny(), max_new_tokens=8,
                          continuous=True, max_batch=2)
    pool.generator.load()
    try:
        os.environ["RAGDPO_TPU_ROOT"] = str(tmp_path)
        system = build_system(agent_too=False)
        system["stream_llm"] = pool
        srv, url = _serve(system)
        msgs = [{"role": "user", "content":
                 "Qu'est-ce que le RGPD ?"}]
        code, full = _post(url, "/v1/chat/completions",
                           {"messages": msgs, "max_tokens": 8,
                            "logprobs": True})
        assert code == 200, full
        text = full["choices"][0]["message"]["content"]
        assert len(text.split()) >= 2, text
        stop_tok = text.split()[1]
        code, cut = _post(url, "/v1/chat/completions",
                          {"messages": msgs, "max_tokens": 8,
                           "logprobs": True, "stop": [stop_tok]})
        assert code == 200, cut
        content = cut["choices"][0]["message"]["content"]
        lp = cut["choices"][0]["logprobs"]["content"]
        joined = "".join(e["token"] for e in lp)
        # the ENTIRE joined token text (not just all-but-last) stays
        # inside the truncated content and is stop-free
        assert stop_tok not in joined, (stop_tok, joined)
        assert len(joined) <= len(content) + 1, (joined, content)
        srv.shutdown()
    finally:
        pool._driver.close()


# -------------------------------------------------- 4. fan-out economics
def test_chat_n_greedy_generates_once(tmp_path):
    from rag_dpo_tpu.app.server import build_system

    os.environ["RAGDPO_TPU_ROOT"] = str(tmp_path)
    system = build_system(agent_too=False)

    class CountingLLM(FakeLLMProvider):
        def __init__(self):
            super().__init__()
            self.n_calls = 0
            self.lock = th.Lock()

        def generate(self, prompt, system=None, temperature=0.0,
                     json_mode=False, max_tokens=None):
            with self.lock:
                self.n_calls += 1
            return LLMResponse(text="réponse déterministe",
                               model=self.model_name)

    llm = CountingLLM()
    system["stream_llm"] = llm
    srv, url = _serve(system)
    msgs = [{"role": "user", "content": "x"}]
    # temperature 0 + n=4: ONE generation, four identical choices
    code, d = _post(url, "/v1/chat/completions",
                    {"messages": msgs, "n": 4})
    assert code == 200, d
    assert len(d["choices"]) == 4
    assert len({c["message"]["content"] for c in d["choices"]}) == 1
    assert llm.n_calls == 1, llm.n_calls
    # sampled n=3 still fans out (distinct calls on the shared pool)
    code, d = _post(url, "/v1/chat/completions",
                    {"messages": msgs, "n": 3, "temperature": 0.8})
    assert code == 200, d
    assert len(d["choices"]) == 3 and llm.n_calls == 4
    srv.shutdown()


def test_fanout_pool_is_shared_and_bounded():
    from rag_dpo_tpu.app import server as srv_mod

    done = []
    srv_mod._fanout_map(lambda i: done.append(i), 5)
    assert sorted(done) == [0, 1, 2, 3, 4]
    pool1 = srv_mod._FANOUT_POOL
    srv_mod._fanout_map(lambda i: None, 2)
    assert srv_mod._FANOUT_POOL is pool1          # shared, not per-call
    assert pool1._max_workers == 16               # bounded
