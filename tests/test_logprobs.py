"""OpenAI-style logprobs through the continuous pool.

Every decode program emits the chosen token's log-probability and the
top-LOGPROB_TOPK alternatives under the sampling distribution
(log-softmax of the penalty/bias-adjusted, temperature-scaled logits,
full vocab, pre-truncation — vLLM's convention). Logprob-requesting
slots decode sequentially under speculation (the lp is extracted at
the position-0 draw); neighbors keep speculating.
"""

import numpy as np
import pytest

from rag_dpo_tpu.models.decoder import DecoderConfig
from rag_dpo_tpu.providers.tpu_llm import TPULLMProvider

PROMPT = "Quelles sont les obligations du responsable de traitement ?"


def _ids(llm, text):
    from rag_dpo_tpu.tokenize.base import bucket_length

    enc = llm.tokenizer.encode_batch([text],
                                     bucket_length(len(text) // 3 + 2))
    return np.asarray(enc.input_ids[0], np.int32), int(enc.lengths[0])


@pytest.fixture(scope="module")
def pool():
    llm = TPULLMProvider(DecoderConfig.tiny(), max_new_tokens=8,
                         continuous=True, max_batch=2)
    llm.generator.load()
    yield llm
    llm._driver.close()


def test_greedy_logprobs_align_and_top1(pool):
    ids, n = _ids(pool, PROMPT)
    toks, lps = pool._driver.generate_with_logprobs(ids, n, 8,
                                                    logprobs=3)
    assert toks and len(lps) == len(toks)
    for t, (lp, top) in zip(toks, lps):
        assert np.isfinite(lp) and lp <= 0.0
        assert len(top) == 3
        # greedy: the emitted token IS the argmax = top-1
        assert top[0][0] == t
        assert abs(top[0][1] - lp) < 1e-5
        assert top[0][1] >= top[1][1] >= top[2][1]


def test_logprobs_do_not_change_tokens(pool):
    ids, n = _ids(pool, PROMPT)
    base = pool._driver.generate(ids, n, 8)
    toks, _ = pool._driver.generate_with_logprobs(ids, n, 8)
    assert toks == base
    # chosen-only mode: empty top lists
    _, lps = pool._driver.generate_with_logprobs(ids, n, 8, logprobs=0)
    assert all(top == [] for _, top in lps)


def test_sampled_logprobs_reproducible(pool):
    ids, n = _ids(pool, PROMPT)
    a = pool._driver.generate_with_logprobs(ids, n, 8, logprobs=2,
                                            temperature=0.9, seed=21)
    b = pool._driver.generate_with_logprobs(ids, n, 8, logprobs=2,
                                            temperature=0.9, seed=21)
    assert a[0] == b[0]
    assert all(abs(x[0] - y[0]) < 1e-6 for x, y in zip(a[1], b[1]))
    # a sampled token's lp can't beat the argmax's
    for t, (lp, top) in zip(a[0], a[1]):
        assert lp <= top[0][1] + 1e-6


def test_spec_pool_logprobs_match_plain():
    """Sequential gating under speculation: (tokens, lps) from the
    spec pool equal the plain pool exactly, while an unbiased greedy
    NEIGHBOR still speculates (spec stats advance)."""
    import threading

    cfg = DecoderConfig.tiny()
    plain = TPULLMProvider(cfg, max_new_tokens=8, continuous=True,
                           max_batch=2)
    params = plain.generator.load()
    spec = TPULLMProvider(cfg, params=params, max_new_tokens=8,
                          continuous=True, max_batch=2,
                          speculative=True)
    ids, n = _ids(plain, PROMPT)
    a_t, a_l = plain._driver.generate_with_logprobs(ids, n, 8,
                                                    logprobs=3)
    out = {}

    def lp_req():
        out["lp"] = spec._driver.generate_with_logprobs(ids, n, 8,
                                                        logprobs=3)

    def neighbor():
        ids2, n2 = _ids(spec, "Qu'est-ce qu'une AIPD ?")
        out["nb"] = spec._driver.generate(ids2, n2, 8)

    th = [threading.Thread(target=lp_req),
          threading.Thread(target=neighbor)]
    [t.start() for t in th]
    [t.join() for t in th]
    b_t, b_l = out["lp"]
    assert a_t == b_t
    assert all(abs(x[0] - y[0]) < 1e-5
               and [i for i, _ in x[1]] == [i for i, _ in y[1]]
               for x, y in zip(a_l, b_l))
    plain._driver.close()
    spec._driver.close()


def test_logprobs_with_bias_reflect_adjustment(pool):
    """A +100 forced token's logprob under the ADJUSTED distribution
    is ~0 (it holds all the mass) — the lp is computed on the same
    logits the draw used."""
    ids, n = _ids(pool, PROMPT)
    toks, lps = pool._driver.generate_with_logprobs(
        ids, n, 8, logprobs=1, logit_bias={6: 100.0})
    eos = pool.tokenizer.sep_id
    for t, (lp, _top) in zip(toks, lps):
        if t == eos:
            break
        assert t == 6 and lp > -1e-3


def test_validation_and_provider_surface(pool):
    ids, n = _ids(pool, PROMPT)
    with pytest.raises(ValueError, match="logprobs"):
        pool._driver.generate_with_logprobs(ids, n, 8, logprobs=9)
    direct = TPULLMProvider(DecoderConfig.tiny(), max_new_tokens=8)
    r = direct.generate("x", logprobs=2)
    assert not r.ok and "continuous" in r.error

    r = pool.generate(PROMPT, max_tokens=8, logprobs=2)
    assert r.ok and r.logprobs and len(r.logprobs) > 0
    e = r.logprobs[0]
    assert set(e) == {"id", "token", "logprob", "top_logprobs"}
    assert len(e["top_logprobs"]) == 2
    assert isinstance(e["token"], str)
    base = pool.generate(PROMPT, max_tokens=8)
    assert base.logprobs is None and base.text == r.text


def test_http_chat_logprobs(pool, tmp_path):
    import json as _json
    import os
    import threading as th
    import urllib.error
    import urllib.request

    from rag_dpo_tpu.app.server import build_system, serve

    os.environ["RAGDPO_TPU_ROOT"] = str(tmp_path)
    system = build_system(agent_too=False)
    system["stream_llm"] = pool
    srv = serve(port=0, system=system)
    th.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"

    def post(body):
        req = urllib.request.Request(
            url + "/v1/chat/completions",
            data=_json.dumps(body).encode(),
            headers={"Content-Type": "application/json"})
        try:
            with urllib.request.urlopen(req, timeout=120) as resp:
                return resp.status, _json.loads(resp.read())
        except urllib.error.HTTPError as e:
            return e.code, _json.loads(e.read())

    msgs = [{"role": "user", "content": PROMPT}]
    code, data = post({"messages": msgs, "max_tokens": 8,
                       "logprobs": True, "top_logprobs": 2})
    assert code == 200, data
    lb = data["choices"][0]["logprobs"]
    assert lb and lb["content"]
    e = lb["content"][0]
    assert set(e) == {"token", "logprob", "top_logprobs"}
    assert len(e["top_logprobs"]) == 2
    # without logprobs the field is null
    code, data = post({"messages": msgs, "max_tokens": 8})
    assert code == 200 and data["choices"][0]["logprobs"] is None

    for body, frag in (
        ({"messages": msgs, "logprobs": True, "stream": True},
         "non-streaming"),
        ({"messages": msgs, "top_logprobs": 2}, "requires"),
        ({"messages": msgs, "logprobs": True, "top_logprobs": 9},
         "[0, 5]"),
    ):
        code, data = post(body)
        assert code == 400 and frag in str(data), (frag, data)
    srv.shutdown()

    from rag_dpo_tpu.providers import FakeLLMProvider

    system2 = dict(system)
    system2["stream_llm"] = FakeLLMProvider()
    srv2 = serve(port=0, system=system2)
    th.Thread(target=srv2.serve_forever, daemon=True).start()
    req = urllib.request.Request(
        f"http://127.0.0.1:{srv2.server_address[1]}"
        "/v1/chat/completions",
        data=_json.dumps({"messages": msgs,
                          "logprobs": True}).encode(),
        headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req, timeout=60) as resp:
            code = resp.status
    except urllib.error.HTTPError as e:
        code = e.code
    assert code == 400
    srv2.shutdown()


def test_review_fixes_http_contracts(pool, tmp_path):
    """Round-3 self-review fixes: logprobs.content trims at stop
    sequences; /v1/completions rejects legacy logprobs/n/echo/best_of
    explicitly; n:null means default-1."""
    import json as _json
    import os
    import threading as th
    import urllib.error
    import urllib.request

    from rag_dpo_tpu.app.server import build_system, serve

    os.environ["RAGDPO_TPU_ROOT"] = str(tmp_path)
    system = build_system(agent_too=False)
    system["stream_llm"] = pool
    srv = serve(port=0, system=system)
    th.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"

    def post(path, body):
        req = urllib.request.Request(
            url + path, data=_json.dumps(body).encode(),
            headers={"Content-Type": "application/json"})
        try:
            with urllib.request.urlopen(req, timeout=120) as resp:
                return resp.status, _json.loads(resp.read())
        except urllib.error.HTTPError as e:
            return e.code, _json.loads(e.read())

    msgs = [{"role": "user", "content": PROMPT}]
    code, full = post("/v1/chat/completions",
                      {"messages": msgs, "max_tokens": 8,
                       "logprobs": True})
    assert code == 200
    n_full = len(full["choices"][0]["logprobs"]["content"])
    stop_tok = full["choices"][0]["message"]["content"].split()[1]
    code, cut = post("/v1/chat/completions",
                     {"messages": msgs, "max_tokens": 8,
                      "logprobs": True, "stop": [stop_tok]})
    assert code == 200
    cut_content = cut["choices"][0]["message"]["content"]
    lp = cut["choices"][0]["logprobs"]["content"]
    assert len(lp) < n_full                 # trimmed at the stop
    joined = "".join(e["token"] for e in lp[:-1])
    assert stop_tok not in joined
    assert stop_tok not in cut_content

    # n: null = default 1 (OpenAI clients serialize optional as null)
    code, d = post("/v1/chat/completions",
                   {"messages": msgs, "max_tokens": 8, "n": None})
    assert code == 200 and len(d["choices"]) == 1

    # /v1/completions: legacy params rejected loudly, never dropped
    for body, frag in (
        ({"prompt": "x", "logprobs": 2}, "logprobs"),
        ({"prompt": "x", "n": 3}, "'n'"),
        ({"prompt": "x", "echo": True}, "echo"),
        ({"prompt": "x", "best_of": 2}, "best_of"),
    ):
        code, d = post("/v1/completions", body)
        assert code == 400 and frag in str(d), (frag, d)
    code, d = post("/v1/completions",
                   {"prompt": "x", "max_tokens": 4, "n": 1})
    assert code == 200                      # n=1 is the default, fine
    srv.shutdown()
