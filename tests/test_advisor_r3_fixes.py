"""Regression tests for the round-2 advisor findings (ADVICE.md).

1. validators.py — article enumerations in the context ("articles 12 et
   13") must ground a citation of "article 13".
2. server.py — mid-stream exceptions must not write a second status
   line into an open SSE stream (error rides in-band as a final event).
3. server.py — binary /search validates dim against the index and caps
   q before buffering the body (400, not a deep 500).
4. tpu_llm.py — sampled generations (temperature>0) get a fresh seed
   per decode instead of replaying rng_seed=0 forever.
5. batcher.py — fn errors re-raise as a per-caller wrapper (shared
   exception objects mutate __traceback__ across threads).
"""

import threading

import numpy as np
import pytest

from rag_dpo_tpu.rag.validators import GroundingValidator
from rag_dpo_tpu.serving.batcher import MicroBatcher


# ------------------------------------------------------ 1. validators
def test_article_enumeration_grounds_each_member():
    v = GroundingValidator()
    ctx = "Les articles 12, 13 et 14 du RGPD encadrent l'information."
    rep = v.validate("Voir l'article 13 du RGPD. [Source 1]", ctx, 1)
    assert not any("article non sourcé" in i for i in rep.issues), rep

    # "articles 12 à 23" style ranges ground the endpoints
    ctx2 = "Conformément aux articles 12 à 23 du règlement."
    rep2 = v.validate("L'article 12 s'applique. [Source 1]", ctx2, 1)
    assert not any("article non sourcé" in i for i in rep2.issues), rep2


def test_article_enumeration_does_not_overmatch():
    v = GroundingValidator()
    # 5 must NOT be grounded by "35" nor by a non-enumeration context
    rep = v.validate("L'article 5 pose les principes. [Source 1]",
                     "L'article 35 impose une AIPD.", 1)
    assert any("article non sourcé" in i for i in rep.issues)
    rep2 = v.validate("L'article 5 pose les principes. [Source 1]",
                      "Les articles du chapitre 5 sont importants... "
                      "sans numéro.", 1)
    # "articles du chapitre" is not a numeric enumeration — words break
    # the span, so a bare later "5" cannot ground "article 5"
    assert any("article non sourcé" in i for i in rep2.issues)


# ------------------------------------------------------ 5. batcher
def test_batcher_error_is_per_caller_wrapper():
    boom = ValueError("kernel exploded")

    def fn(stacked, key):
        raise boom

    b = MicroBatcher(fn, max_batch=8, max_wait_ms=5.0)
    caught = []

    def call():
        try:
            b(np.zeros((2, 3), np.float32), key="x")
        except RuntimeError as e:
            caught.append(e)

    threads = [threading.Thread(target=call) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    b.close()
    assert len(caught) == 4
    # each caller got its OWN wrapper, chained to the one original
    assert len({id(e) for e in caught}) == 4
    for e in caught:
        assert e.__cause__ is boom
        assert "kernel exploded" in str(e)


# ------------------------------------------------------ 4. tpu_llm seeds
def test_sampled_decodes_get_fresh_seeds():
    import jax.numpy as jnp

    from rag_dpo_tpu.models.decoder import DecoderConfig
    from rag_dpo_tpu.providers.tpu_llm import TPULLMProvider

    llm = TPULLMProvider(DecoderConfig.tiny(num_heads=4, num_kv_heads=2,
                                            dtype=jnp.float32),
                         max_new_tokens=4)
    seen = []
    real = llm.generator.generate_ids

    def spy(ids, lengths, sampling, rng_seeds=None):
        seen.append(tuple(int(s) for s in rng_seeds))
        return real(ids, lengths, sampling, rng_seeds=rng_seeds)

    llm.generator.generate_ids = spy
    llm.generate("bonjour", temperature=0.8)
    llm.generate("bonjour", temperature=0.8)
    llm.generate("bonjour", temperature=0.0)
    llm.generate("bonjour", temperature=0.0)
    assert len(seen) == 4
    assert seen[0] != seen[1], "sampled calls must not share a seed"
    assert seen[2] == seen[3] == (0,), "greedy keeps the stable seed"


def test_batched_sampled_decodes_get_fresh_seeds():
    import jax.numpy as jnp

    from rag_dpo_tpu.models.decoder import DecoderConfig
    from rag_dpo_tpu.providers.tpu_llm import TPULLMProvider

    llm = TPULLMProvider(DecoderConfig.tiny(num_heads=4, num_kv_heads=2,
                                            dtype=jnp.float32),
                         max_new_tokens=4, batch_concurrent=True,
                         max_wait_ms=1.0)
    seen = []
    real = llm.generator.generate_ids

    def spy(ids, lengths, sampling, rng_seeds=None):
        seen.append(tuple(int(s) for s in rng_seeds))
        return real(ids, lengths, sampling, rng_seeds=rng_seeds)

    llm.generator.generate_ids = spy
    llm.generate("bonjour", temperature=0.7)
    llm.generate("bonjour", temperature=0.7)
    llm._batcher.close()
    assert len(seen) == 2 and seen[0] != seen[1]


# ------------------------------------------------------ 2+3. server
@pytest.fixture(scope="module")
def server(tmp_path_factory):
    import os

    from rag_dpo_tpu.app.server import build_system, serve

    os.environ["RAGDPO_TPU_ROOT"] = str(tmp_path_factory.mktemp("srv3"))
    system = build_system(agent_too=False)
    srv = serve(port=0, system=system)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", system
    srv.shutdown()


def _post_binary(url, body, headers=None):
    import urllib.error
    import urllib.request

    req = urllib.request.Request(
        url + "/search", data=body,
        headers={"Content-Type": "application/octet-stream",
                 **(headers or {})})
    try:
        with urllib.request.urlopen(req, timeout=60) as r:
            return r.status, r.read()
    except urllib.error.HTTPError as e:
        return e.code, e.read()


def test_binary_search_wrong_dim_is_400(server):
    import json
    import struct

    url, system = server
    index_dim = system["index"].config.dim
    bad_dim = index_dim + 3
    vecs = np.zeros((2, bad_dim), np.float32)
    body = b"RDPV" + struct.pack("<III", 2, bad_dim, 4) + vecs.tobytes()
    code, out = _post_binary(url, body)
    assert code == 400
    err = json.loads(out)["error"]
    assert str(index_dim) in err and str(bad_dim) in err


def test_binary_search_huge_q_rejected_before_buffering(server):
    import json
    import struct

    url, system = server
    dim = system["index"].config.dim
    # q = 10M: would be a 2.5 GB body; must 400 on the header alone
    head = b"RDPV" + struct.pack("<III", 10_000_000, dim, 4)
    code, out = _post_binary(url, head + b"\x00" * 64)
    assert code == 400
    assert "q=" in json.loads(out)["error"]


def test_binary_search_good_dim_still_works(server):
    import struct

    url, system = server
    dim = system["index"].config.dim
    rng = np.random.default_rng(0)
    vecs = rng.standard_normal((1, dim)).astype(np.float32)
    body = b"RDPV" + struct.pack("<III", 1, dim, 3) + vecs.tobytes()
    code, out = _post_binary(url, body)
    assert code == 200 and out[:4] == b"RDPR"


def test_sse_midstream_error_stays_in_band(tmp_path_factory):
    """An exception thrown after SSE headers are sent must surface as a
    final in-band `data: {"error": ...}` event + [DONE], never a second
    HTTP status line injected into the stream."""
    import json
    import os
    import urllib.request

    from rag_dpo_tpu.app.server import build_system, serve

    os.environ["RAGDPO_TPU_ROOT"] = str(tmp_path_factory.mktemp("sse3"))
    system = build_system(agent_too=False)

    class ExplodingLLM:
        model_name = "exploder"

        def generate_stream(self, prompt, max_tokens=None, **kw):
            yield "début "
            raise RuntimeError("chip fell over")

        def generate(self, prompt, **kw):  # pragma: no cover
            raise AssertionError

    system["stream_llm"] = ExplodingLLM()
    srv = serve(port=0, system=system)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"

    req = urllib.request.Request(
        url + "/generate",
        data=json.dumps({"prompt": "x", "stream": True,
                         "max_tokens": 8}).encode(),
        headers={"Content-Type": "application/json"})
    events = []
    with urllib.request.urlopen(req, timeout=60) as r:
        raw = r.read().decode()
    for line in raw.splitlines():
        if line.startswith("data: "):
            events.append(line[6:])
    assert "HTTP/1." not in raw, "second status line leaked into stream"
    assert events[0] == json.dumps({"delta": "début "},
                                   ensure_ascii=False)
    payloads = [e for e in events if e != "[DONE]"]
    assert any("chip fell over" in p for p in payloads)
    assert events[-1] == "[DONE]"
    srv.shutdown()
