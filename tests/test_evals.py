import json
import pathlib

import pytest

from rag_dpo_tpu.evals import EvalConfig, EvalHarness, load_qa_dataset
from rag_dpo_tpu.evals.harness import (
    keyword_found,
    keyword_score,
    llm_judge_score,
    source_quality_score,
)
from rag_dpo_tpu.evals.retrieval_eval import recall_at_k
from rag_dpo_tpu.providers import FakeLLMProvider
from rag_dpo_tpu.providers.base import LLMResponse
from rag_dpo_tpu.rag.pipeline import RAGResponse


def test_load_reference_dataset():
    data = load_qa_dataset()
    assert len(data) == 48
    assert all("question" in d and "id" in d for d in data)


def test_vendored_dataset_is_self_contained():
    from rag_dpo_tpu.evals.harness import DEFAULT_DATASET

    assert str(DEFAULT_DATASET).startswith(
        str(pathlib.Path(__file__).resolve().parent.parent))
    assert DEFAULT_DATASET.exists()  # vendored file actually shipped
    # …and actually tracked by git, not swallowed by a data/ ignore rule
    import subprocess

    repo = pathlib.Path(__file__).resolve().parent.parent
    tracked = subprocess.run(
        ["git", "ls-files", "--error-unmatch",
         "rag_dpo_tpu/evals/data/qa_dataset.json"],
        cwd=repo, capture_output=True,
    )
    assert tracked.returncode == 0, "dataset not committed to git"
    with pytest.raises(FileNotFoundError):
        load_qa_dataset("/nonexistent/qa.json")


def test_conciseness_axis():
    from rag_dpo_tpu.evals.harness import conciseness_score

    short = "Réponse brève. " * 5                       # ~15 words
    assert conciseness_score(short, "definition")[0] == 1.0
    long = "mot " * 450
    s_fact, _ = conciseness_score(long, "definition", "factuel")
    assert 0.3 <= s_fact < 0.7                          # over soft max
    # intent-aware: a méthodologie answer of the same length is fine
    s_meth, _ = conciseness_score(long, "definition", "methodologique")
    assert s_meth > s_fact
    # refusals must be SHORT: the same words are heavily penalized
    s_ref, note = conciseness_score(long, "hors_perimetre", "refus")
    assert s_ref == 0.3 and "excessif" in note
    huge = "mot " * 5000
    assert conciseness_score(huge, "obligation")[0] == 0.3


def test_keyword_matching():
    assert keyword_found("personne physique", "toute personne physique x")
    assert keyword_found("identifiée ou identifiable",
                         "personne identifiable et identifiee")
    assert not keyword_found("sous-traitant", "le responsable seul")


def test_keyword_score_any_and_veto():
    item = {
        "must_include": ["72 heures"],
        "must_include_any": ["CNIL|autorité de contrôle"],
        "must_not_include": ["30 jours"],
    }
    s, missing = keyword_score(item, "Notification sous 72 heures à la CNIL")
    assert s == 1.0 and not missing
    s, missing = keyword_score(
        item, "Notification sous 72 heures à la CNIL sous 30 jours")
    assert s == pytest.approx(0.3)
    assert any(m.startswith("INTERDIT") for m in missing)
    s, _ = keyword_score(item, "Notification rapide à la CNIL")
    assert s == pytest.approx(0.5)


def test_keyword_score_dataset_n_of_m_schema():
    """The vendored dataset's must_include_any is a top-level dict
    {"min_count": N, "items": [...]} with |-alternates per item
    (reference run_eval.py:205-228) — full credit at ≥N matches,
    n/N partial credit below, averaged with the must_include
    fraction. A dict must never be iterated as keyword groups
    (regression: its keys 'min_count'/'items' scored as phantom
    always-missing checks)."""
    item = {
        "must_include": ["risque élevé"],
        "must_include_any": {
            "min_count": 2,
            "items": ["dpo", "évaluation des risques",
                      "registre|liste des traitements"],
        },
    }
    # must hit + 2 of 3 any-items (one via alternate) → 1.0
    s, missing = keyword_score(
        item, "En cas de risque élevé, le DPO tient la liste des "
              "traitements.")
    assert s == 1.0 and not missing
    # must hit + only 1 of required 2 → (1.0 + 0.5) / 2
    s, missing = keyword_score(
        item, "En cas de risque élevé, consulter le DPO.")
    assert s == pytest.approx(0.75)
    assert any(m.startswith("[any:") for m in missing)
    assert "min_count" not in str(missing)
    # must miss + both any-items → (0 + 1) / 2
    s, _ = keyword_score(
        item, "Le DPO réalise l'évaluation des risques.")
    assert s == pytest.approx(0.5)


def test_source_quality():
    item = {"expected_sources_keywords": ["violation", "notification"]}
    sources = [{"title": "Guide violation de données", "url": ""}]
    s = source_quality_score(item, sources, "texte sur la notification")
    assert s == 1.0
    assert source_quality_score(item, [], "réponse") == 0.0


def test_judge_veto():
    class Judge(FakeLLMProvider):
        def generate(self, *a, **k):
            return LLMResponse(json.dumps({
                "score": 95, "erreur_factuelle": True,
                "justification": "délai faux",
            }))

    s = llm_judge_score(Judge(), {"question": "q",
                                  "expected_answer_summary": "e"}, "a")
    assert s == pytest.approx(0.4)  # veto caps at 0.4


class _ScriptedPipeline:
    def __init__(self, answers):
        self.answers = answers
        self.i = 0

    def query(self, question, **kw):
        a = self.answers[self.i % len(self.answers)]
        self.i += 1
        return RAGResponse(
            answer=a, question=question,
            sources=[{"n": 1, "title": "Définition donnée personnelle",
                      "url": "https://cnil.fr/def"}],
            total_time=0.01,
        )


def test_harness_end_to_end_and_multi_run():
    dataset = [
        {
            "id": "q1", "question": "Qu'est-ce qu'une donnée personnelle ?",
            "category": "definition",
            "expected_answer_summary": "information sur personne physique",
            "must_include": ["personne physique"],
            "expected_sources_keywords": ["donnée personnelle"],
        },
        {
            "id": "q2", "question": "Délai de notification ?",
            "category": "obligation",
            "expected_answer_summary": "72 heures",
            "must_include": ["72"],
            "expected_sources_keywords": [],
        },
    ]
    pipe = _ScriptedPipeline([
        "Une donnée personnelle concerne une personne physique "
        "identifiable [Source 1].",
        "Le délai est de 72 heures [Source 1].",
    ])
    harness = EvalHarness(pipe, config=EvalConfig())
    report = harness.run(dataset)
    assert report["n_questions"] == 2
    assert report["global_score"] > 0.8
    assert set(report["per_category"]) == {"definition", "obligation"}
    multi = harness.run_multi(dataset, n_runs=2)
    assert multi["n_runs"] == 2
    assert multi["global_score"]["std"] == 0.0  # deterministic pipeline
    assert multi["per_question"]["q1"]["mean"] > 0.8


def test_recall_at_k():
    ours = [["a", "b", "c"], ["x", "y", "z"]]
    oracle = [["a", "c", "d"], ["x", "y", "z"]]
    assert recall_at_k(ours, oracle, 3) == pytest.approx((2 / 3 + 1.0) / 2)
