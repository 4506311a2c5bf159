"""Constrained choice decoding (`TextGenerator.score_choices` /
`TPULLMProvider.choose`): teacher-forced candidate ranking must match a
cache-free full-forward oracle exactly, and the capability-gated wiring
(intent fallback, chunk classifier two-option call) must produce
structurally-valid answers.

Reference parity: the reference's constrained calls generate free text
and regex-rescue it (`src/rag/intent_classifier.py:192-201`,
`src/processing/process_and_chunk.py:1107-1318`); scoring the choices
directly is the TPU-native superset (always valid, one forward).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rag_dpo_tpu.models.decoder import DecoderConfig, DecoderModel
from rag_dpo_tpu.models.generate import TextGenerator
from rag_dpo_tpu.providers.base import BaseLLMProvider, LLMResponse

CFG = DecoderConfig.tiny(num_heads=4, num_kv_heads=2,
                         dtype=jnp.float32)


@pytest.fixture(scope="module")
def gen():
    return TextGenerator(CFG)


def test_score_choices_matches_full_forward_oracle(gen):
    """Prefill+broadcast+extend scoring == a cache-free forward over
    prompt+candidate (independent code path: no cache machinery)."""
    params = gen.load()
    rng = np.random.default_rng(0)
    p_len = 11
    prompt = rng.integers(4, CFG.vocab_size, (p_len,)).astype(np.int32)
    cands = [rng.integers(4, CFG.vocab_size, (n,)).astype(np.int32)
             for n in (1, 3, 5)]
    c = max(len(x) for x in cands)
    cand_ids = np.full((len(cands), c), 1, np.int32)
    for i, x in enumerate(cands):
        cand_ids[i, :len(x)] = x
    cand_lens = np.asarray([len(x) for x in cands], np.int32)
    got = gen.score_choices(prompt, p_len, cand_ids, cand_lens)
    model = DecoderModel(CFG)
    for i, x in enumerate(cands):
        row = np.concatenate([prompt, x])[None]
        logits = model.apply(params, jnp.asarray(row))
        lp = jax.nn.log_softmax(np.asarray(logits, np.float64), axis=-1)
        want = sum(lp[0, p_len - 1 + j, int(x[j])]
                   for j in range(len(x)))
        assert abs(got[i] - want) < 5e-3, (i, got[i], want)


def test_choose_api_contract():
    from rag_dpo_tpu.providers.factory import create_tpu_llm

    llm = create_tpu_llm(arch="tiny", quantize_int8=False)
    choices = ["factuel", "methodologique", "refus"]
    best, scores = llm.choose("Quel est le délai CNIL ? Intention :",
                              choices)
    assert best in choices and len(scores) == 3
    # identical candidates score identically (shared-prefix split and
    # padding must not leak between rows)
    _, s2 = llm.choose("Question :", ["aa bb", "aa bb"])
    assert abs(s2[0] - s2[1]) < 1e-5, s2
    b3, s3 = llm.choose("X", ["seule"])
    assert b3 == "seule" and len(s3) == 1
    with pytest.raises(ValueError):
        llm.choose("X", [])


def test_choose_fuzz_unicode_and_boundaries():
    """Randomized prompts/choices (accents, punctuation-leading,
    shared-prefix traps, k 1..6): always returns a member, score list
    length k, and is deterministic across repeat calls."""
    import random

    from rag_dpo_tpu.providers.factory import create_tpu_llm

    llm = create_tpu_llm(arch="tiny", quantize_int8=False)
    rng = random.Random(7)
    pool = ["oui", "non", "à confirmer", "REFUS", "l'article 28",
            "données", "10", "1", ", virgule", "sous-traitance (art. 28)"]
    for trial in range(6):
        k = rng.randint(1, 6)
        choices = rng.sample(pool, k)
        prompt = rng.choice([
            "Réponse :", "Choix parmi les options suivantes :",
            "Le délai CNIL est de 72 h. Verdict :",
        ])
        best, scores = llm.choose(prompt, choices)
        assert best in choices and len(scores) == k, (trial, best)
        best2, scores2 = llm.choose(prompt, choices)
        assert best2 == best
        assert all(abs(a - b) < 1e-5 for a, b in zip(scores, scores2))


class BrokenJSONLLM(BaseLLMProvider):
    """Returns malformed JSON; exposes `choose` like the TPU provider."""
    model_name = "broken"

    def __init__(self, pick="cas_pratique"):
        self.pick = pick
        self.choose_calls = 0

    def generate(self, prompt, system=None, temperature=0.0,
                 json_mode=False, max_tokens=None) -> LLMResponse:
        return LLMResponse("intent: cas_pratique (pas du JSON)",
                           self.model_name)

    def choose(self, prompt, choices, system=None, normalize=True):
        self.choose_calls += 1
        if self.pick is None:           # "pick the runner-up" mode
            return choices[-1], [0.0] * len(choices)
        assert self.pick in choices, (self.pick, choices)
        return self.pick, [0.0] * len(choices)


def test_intent_falls_back_to_constrained_choice():
    """Malformed JSON no longer silently degrades to 'factuel' when the
    provider can score the intents directly."""
    from rag_dpo_tpu.rag.intent import IntentClassifier

    clf = IntentClassifier(BrokenJSONLLM())
    out = clf.classify("Un salarié refuse la vidéosurveillance, "
                       "que faire ?")
    assert out.intent == "cas_pratique"
    assert clf.llm.choose_calls == 1


class ValidJSONBadIntentLLM(BrokenJSONLLM):
    def generate(self, prompt, system=None, temperature=0.0,
                 json_mode=False, max_tokens=None) -> LLMResponse:
        return LLMResponse('{"intent": "poetique", "topics": []}',
                           self.model_name)


def test_invalid_intent_value_uses_choice_fallback():
    from rag_dpo_tpu.rag.intent import IntentClassifier

    clf = IntentClassifier(ValidJSONBadIntentLLM(pick="comparaison"))
    out = clf.classify("RGPD vs loi Informatique et Libertés ?")
    assert out.intent == "comparaison"


class DigitScoringLLM(BrokenJSONLLM):
    """choose() returns log-probs concentrated on one digit."""

    def __init__(self, peak: int):
        super().__init__(pick=None)
        self.peak = peak

    def choose(self, prompt, choices, system=None, normalize=True):
        self.choose_calls += 1
        scores = [0.0 if int(ch) == self.peak else -20.0
                  for ch in choices]
        return str(self.peak), scores


def test_filter_expected_score_via_choose():
    """Ambiguous prescore → expected score over digit candidates; the
    keep decision follows the distribution, method is 'choose'."""
    from rag_dpo_tpu.ingest.filter import RelevanceFilter

    text = "rgpd " * 2   # prescore 3: between drop(1) and keep(8)
    f = RelevanceFilter(llm=DigitScoringLLM(peak=8))
    d = f.decide("https://cnil.fr/guide", "Guide AIPD", text)
    assert d.method == "choose" and d.keep and abs(d.score - 8.0) < 0.01
    f2 = RelevanceFilter(llm=DigitScoringLLM(peak=2))
    d2 = f2.decide("https://cnil.fr/guide", "Guide AIPD", text)
    assert d2.method == "choose" and not d2.keep
    assert abs(d2.score - 2.0) < 0.01


class NatureChoosingLLM(BrokenJSONLLM):
    def generate(self, prompt, system=None, temperature=0.0,
                 json_mode=False, max_tokens=None) -> LLMResponse:
        return LLMResponse('{"nature": "POETIQUE", "importance": 7}',
                           self.model_name)


def test_doc_classifier_nature_fallback_via_choose():
    """Invalid nature in otherwise-valid JSON → choose over the 5
    natures instead of silently degrading to MIXTE; other JSON fields
    survive."""
    from rag_dpo_tpu.ingest.classify import DocumentClassifier

    clf = DocumentClassifier(NatureChoosingLLM(pick="TECHNIQUE"))
    c = clf.classify("d1", "Chiffrement des données",
                     "mesures de sécurité et configuration TLS")
    assert c.nature == "TECHNIQUE"
    assert c.importance == 7
    assert clf.llm.choose_calls == 1


def test_detect_topics_deterministic():
    from rag_dpo_tpu.rag.topics import RGPD_TOPICS, detect_topics

    got = detect_topics("Peut-on installer une caméra pour surveiller "
                        "les salariés ?")
    assert "vidéosurveillance" in got
    assert "ressources humaines et salariés" in got
    # accent folding: question typed without accents still matches
    assert detect_topics("duree de conservation des videos ?") == \
        ["durée de conservation"]
    assert detect_topics("bonjour") == []
    assert all(t in RGPD_TOPICS for t in got)


def test_fast_intent_path_skips_json_decode():
    """fast=True on a choice-capable provider: one choose() call, zero
    generate() calls, deterministic topics; without the capability the
    JSON path still runs."""
    from rag_dpo_tpu.rag.intent import IntentClassifier

    class CountingLLM(BrokenJSONLLM):
        generate_calls = 0

        def generate(self, *a, **k):
            self.generate_calls += 1
            return super().generate(*a, **k)

    llm = CountingLLM(pick="cas_pratique")
    clf = IntentClassifier(llm, fast=True)
    out = clf.classify("Un salarié refuse la vidéosurveillance ?")
    assert out.intent == "cas_pratique"
    assert "vidéosurveillance" in out.topics
    assert llm.choose_calls == 1 and llm.generate_calls == 0

    class NoChoose(BaseLLMProvider):
        model_name = "plain"
        generate_calls = 0

        def generate(self, prompt, system=None, temperature=0.0,
                     json_mode=False, max_tokens=None):
            self.generate_calls += 1
            return LLMResponse('{"intent": "factuel", "topics": []}',
                               self.model_name)

    plain = NoChoose()
    out = IntentClassifier(plain, fast=True).classify("Quel délai ?")
    assert out.intent == "factuel" and plain.generate_calls == 1


class GatedAgentLLM(BrokenJSONLLM):
    """choose() answers oui/non (and a digit for the 11-way coverage
    choose); counts generate() calls."""

    def __init__(self, verdict: str, coverage: str = "40"):
        super().__init__(pick=None)
        self.verdict = verdict
        self.coverage = coverage
        self.generate_calls = 0

    def generate(self, prompt, system=None, temperature=0.0,
                 json_mode=False, max_tokens=None) -> LLMResponse:
        self.generate_calls += 1
        if "Requête :" in prompt:
            return LLMResponse("sanctions délais notification",
                               self.model_name)
        return LLMResponse('{"sub_questions": ["a ?", "b ?"], '
                           '"coverage_pct": 40, '
                           '"missing_aspects": ["x"]}', self.model_name)

    def choose(self, prompt, choices, system=None, normalize=True):
        self.choose_calls += 1
        if set(choices) == {"oui", "non"}:
            return self.verdict, [0.0, 0.0]
        # 11-way coverage choose
        assert choices == [str(p) for p in range(0, 101, 10)]
        return self.coverage, [0.0] * len(choices)


def test_decompose_gate_skips_json_call():
    from rag_dpo_tpu.agent.tools import decompose_question

    llm = GatedAgentLLM("non")          # simple question: gate short-circuits
    assert decompose_question(llm, "Quel délai CNIL ?") == []
    assert llm.choose_calls == 1 and llm.generate_calls == 0

    llm = GatedAgentLLM("oui")          # composite: full JSON call runs
    subs = decompose_question(llm, "Délai CNIL et montant des sanctions ?")
    assert subs == ["a ?", "b ?"]
    assert llm.choose_calls == 1 and llm.generate_calls == 1


def test_completeness_gate_skips_json_call():
    from rag_dpo_tpu.agent.tools import check_answer_completeness

    llm = GatedAgentLLM("oui")          # complete answer: gate short-circuits
    r = check_answer_completeness(llm, "q", "réponse complète")
    assert r.coverage_pct == 100 and not r.missing_aspects
    assert llm.choose_calls == 1 and llm.generate_calls == 0

    # incomplete: the coverage % is an 11-way digit choose (one
    # prefill + tiny extend), and the only free decode is the SHORT
    # suggested-query generation (needed for re-retrieval)
    llm = GatedAgentLLM("non", coverage="40")
    r = check_answer_completeness(llm, "q", "réponse partielle")
    assert r.coverage_pct == 40
    assert r.suggested_queries == ["sanctions délais notification"]
    assert llm.choose_calls == 2 and llm.generate_calls == 1

    # incomplete but above the re-retrieval threshold: NO decode at all
    llm = GatedAgentLLM("non", coverage="90")
    r = check_answer_completeness(llm, "q", "réponse presque complète")
    assert r.coverage_pct == 90 and not r.suggested_queries
    assert llm.choose_calls == 2 and llm.generate_calls == 0


def test_chunk_classifier_two_option_uses_choose():
    from rag_dpo_tpu.ingest.classify import ChunkClassifier

    llm = BrokenJSONLLM(pick=None)      # always picks the runner-up
    clf = ChunkClassifier(llm=llm, ambiguity_gap=1000.0)  # force ambiguity
    features = {"has_article_refs": True, "has_steps": True}
    out = clf.classify("guide des étapes, article 30", features)
    assert llm.choose_calls == 1
    # GUIDE (2.0) ranks first, DOCTRINE (1.5) second — the stub picks
    # the runner-up, proving choose()'s verdict is what's returned
    assert out == "DOCTRINE"


def test_batched_choose_program_matches_single(gen):
    """The b-batched choose program scores each row exactly like b=1
    dispatches (same bucket): batching is a throughput move, never a
    semantics one."""
    params = gen.load()
    rng = np.random.default_rng(7)
    kb, s, cb, b = 4, 16, 4, 4
    pids = rng.integers(4, CFG.vocab_size, (b, s)).astype(np.int32)
    plens = rng.integers(3, s, (b,)).astype(np.int32)
    cids = rng.integers(4, CFG.vocab_size, (b, kb, cb)).astype(np.int32)
    clens = rng.integers(1, cb + 1, (b, kb)).astype(np.int32)
    batched = np.asarray(gen._choose(b, kb, s, cb)(
        params, jnp.asarray(pids), jnp.asarray(plens),
        jnp.asarray(cids), jnp.asarray(clens)))
    for i in range(b):
        solo = np.asarray(gen._choose(1, kb, s, cb)(
            params, jnp.asarray(pids[i:i + 1]),
            jnp.asarray(plens[i:i + 1]),
            jnp.asarray(cids[i:i + 1]), jnp.asarray(clens[i:i + 1])))
        np.testing.assert_allclose(batched[i], solo[0], atol=1e-4,
                                   rtol=1e-4)
        assert int(np.argmax(batched[i])) == int(np.argmax(solo[0]))


def test_choose_batching_coalesces_and_matches_unbatched():
    """Concurrent choose() through a choose_batch provider returns the
    same answers+scores as the unbatched provider, and the batcher
    stats prove real coalescing happened."""
    import threading

    from rag_dpo_tpu.providers.factory import create_tpu_llm

    plain = create_tpu_llm(arch="tiny", quantize_int8=False)
    batched = create_tpu_llm(arch="tiny", quantize_int8=False,
                             choose_batch=4)
    prompts = [f"Question numéro {i}: quelle intention ?"
               for i in range(8)]
    choices = ["factuel", "procedural", "comparatif"]
    want = [plain.choose(p, choices) for p in prompts]

    # warm the (b, kb, s, cb) programs so the storm coalesces instead
    # of serializing behind first-call compiles
    batched.choose(prompts[0], choices)

    got = [None] * len(prompts)
    barrier = threading.Barrier(len(prompts))

    def run(i):
        barrier.wait()
        got[i] = batched.choose(prompts[i], choices)

    ts = [threading.Thread(target=run, args=(i,))
          for i in range(len(prompts))]
    [t.start() for t in ts]
    [t.join() for t in ts]
    for i in range(len(prompts)):
        assert got[i][0] == want[i][0], (i, got[i], want[i])
        np.testing.assert_allclose(got[i][1], want[i][1], atol=1e-4)
    stats = batched.generator._choose_batcher.stats
    assert stats.n_requests == len(prompts) + 1
    assert stats.n_device_calls < stats.n_requests
    assert stats.max_batch_seen > 1


def test_warm_choose_precompiles_the_production_programs():
    """warm_choose compiles exactly the programs a production call
    with the same prompt/choices shape will hit (every batcher batch
    size) — a subsequent choose() adds NO new program."""
    from rag_dpo_tpu.providers.factory import create_tpu_llm

    llm = create_tpu_llm(arch="tiny", quantize_int8=False,
                         choose_batch=4)
    llm.warm_choose("Quelle est l'intention ?",
                    ["factuel", "procedural"])
    progs = set(llm.generator._programs)
    # b=1 (direct) plus b=2 and b=4 (batcher coalesced) all warmed
    assert sum(1 for key in progs if key[0] == "choose") == 3
    llm.choose("Quelle est l'intention ?", ["factuel", "procedural"])
    assert set(llm.generator._programs) == progs
