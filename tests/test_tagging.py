"""ChunkTagger: checkpointed resume, idempotence, columnar visibility."""

from __future__ import annotations

import numpy as np

from rag_dpo_tpu.index import DeviceIndex, IndexConfig
from rag_dpo_tpu.ingest.tagging import ChunkTagger
from rag_dpo_tpu.providers.base import BaseLLMProvider, LLMResponse


class CountingTagLLM(BaseLLMProvider):
    model_name = "tagger"

    def __init__(self, fail_after=None):
        self.n_calls = 0
        self.fail_after = fail_after

    def generate(self, prompt, system=None, temperature=0.0,
                 json_mode=False, max_tokens=None) -> LLMResponse:
        self.n_calls += 1
        if self.fail_after is not None and self.n_calls > self.fail_after:
            raise KeyboardInterrupt  # simulate an interrupted run
        if "amende" in prompt:  # cue must live in the EXCERPT — topic
            # names themselves appear in every prompt's vocabulary list
            return LLMResponse("sanctions et contrôles CNIL",
                               self.model_name)
        return LLMResponse("registre des traitements, sous-traitance",
                           self.model_name)


def _index(n=7):
    rng = np.random.default_rng(0)
    e = rng.standard_normal((n, 16)).astype(np.float32)
    idx = DeviceIndex(IndexConfig(dim=16, ell_width=2, row_block=4))
    idx.add([f"c{i}" for i in range(n)], e,
            [{"text": ("texte sanction amende" if i % 3 == 0
                       else "texte registre"), "nature": "GUIDE"}
             for i in range(n)])
    return idx


def test_tagging_resume_from_checkpoint(tmp_path):
    ckpt = tmp_path / "tags.json"
    idx = _index()
    llm = CountingTagLLM(fail_after=3)
    tagger = ChunkTagger(llm, checkpoint_path=ckpt, checkpoint_every=2)
    try:
        tagger.tag_index(idx, {})
    except KeyboardInterrupt:
        pass
    assert ckpt.exists(), "checkpoint must survive the interruption"

    llm2 = CountingTagLLM()
    tagger2 = ChunkTagger(llm2, checkpoint_path=ckpt)
    n = tagger2.tag_index(idx, {})
    # chunks 0-2 were tagged before the crash (metadata already carries
    # their tags); the resumed run only calls the LLM for the remaining 4
    assert llm2.n_calls == 4
    assert n == 4
    for i in range(7):
        assert idx.meta.row(i)["rgpd_topics"], i


def test_tagging_idempotent_second_run(tmp_path):
    idx = _index()
    llm = CountingTagLLM()
    tagger = ChunkTagger(llm, checkpoint_path=tmp_path / "t.json")
    assert tagger.tag_index(idx, {}) == 7
    calls = llm.n_calls
    assert tagger.tag_index(idx, {}) == 0  # already tagged: zero LLM work
    assert llm.n_calls == calls


def test_tags_visible_to_where_filters(tmp_path):
    """The columnar filter arrays must learn the tags, not only the raw
    metadata dicts (stale-column regression)."""
    idx = _index()
    ChunkTagger(CountingTagLLM(),
                checkpoint_path=tmp_path / "t.json").tag_index(idx, {})
    q = np.zeros((1, 16), np.float32)
    q[0, 0] = 1.0
    s, rows = idx.search_dense(
        q, 7, where={"rgpd_topics":
                     {"$contains": "sanctions et contrôles CNIL"}})
    hit = [int(r) for r in rows[0] if r >= 0]
    assert hit, "filter must match the newly written tags"
    for r in hit:
        assert r % 3 == 0  # only the 'sanction' chunks
