import json
import logging
import time

import pytest

from rag_dpo_tpu.rag.pipeline import RAGResponse
from rag_dpo_tpu.utils import (
    Alerter,
    AlertConfig,
    FrameworkConfig,
    PhaseTimer,
    QueryLogger,
    default_paths,
    load_config,
    setup_structured_logging,
)


def _resp(error=None, n_sources=1, total=2.0):
    return RAGResponse(
        answer="réponse [Source 1]",
        question="q",
        sources=[{"n": i + 1, "title": "t"} for i in range(n_sources)],
        total_time=total,
        generation_time=total / 2,
        error=error,
    )


def test_paths_env_override(tmp_path, monkeypatch):
    monkeypatch.setenv("RAGDPO_TPU_LOGS", str(tmp_path / "mylogs"))
    p = default_paths(tmp_path)
    assert p.logs == (tmp_path / "mylogs").resolve()
    p.ensure()
    assert p.logs.exists()
    assert p.queries_log.name == "queries.jsonl"


def test_config_defaults_file_env(tmp_path, monkeypatch):
    cfg = load_config()
    assert cfg.retrieval.rrf_k == 60
    assert cfg.retrieval.n_candidates == 40
    yaml = tmp_path / "c.yaml"
    yaml.write_text(
        "retrieval:\n  n_documents: 8\n  use_reranker: false\n"
        "llm:\n  model: 'autre:7b'\n"
    )
    cfg = load_config(yaml)
    assert cfg.retrieval.n_documents == 8
    assert cfg.retrieval.use_reranker is False
    assert cfg.llm.model == "autre:7b"
    cfg = load_config(yaml, env={"RAGDPO_RETRIEVAL_N_DOCUMENTS": "12",
                                 "RAGDPO_LLM_TEMPERATURE": "0.5"})
    assert cfg.retrieval.n_documents == 12
    assert cfg.llm.temperature == 0.5


def test_config_rejects_unknown_key(tmp_path):
    f = tmp_path / "bad.json"
    f.write_text(json.dumps({"retrieval": {"typo_key": 1}}))
    with pytest.raises(ValueError, match="typo_key"):
        load_config(f)


def test_example_config_covers_every_field():
    """configs/config.example.yaml loads cleanly, names EVERY field of
    the typed tree, and its values are exactly the defaults (the
    example can't drift from the dataclasses)."""
    import dataclasses
    import pathlib

    path = (pathlib.Path(__file__).resolve().parent.parent
            / "configs" / "config.example.yaml")
    text = path.read_text()
    cfg = load_config(path, env={})
    default = load_config(None, env={})
    assert cfg == default
    for sec in dataclasses.fields(default):
        assert f"{sec.name}:" in text, sec.name
        for f in dataclasses.fields(getattr(default, sec.name)):
            assert f"{f.name}:" in text, f"{sec.name}.{f.name}"


def test_structured_logging(tmp_path):
    log_file = tmp_path / "app.jsonl"
    logger = setup_structured_logging(log_file, console=False)
    logging.getLogger("test").info("hello", extra={"query_id": "abc",
                                                   "duration_ms": 12})
    for h in logger.handlers:
        h.flush()
    entry = json.loads(log_file.read_text().splitlines()[0])
    assert entry["message"] == "hello"
    assert entry["query_id"] == "abc"
    assert entry["duration_ms"] == 12


def test_query_logger_stats(tmp_path):
    ql = QueryLogger(tmp_path / "queries.jsonl")
    ql.log_query(_resp())
    qid = ql.log_query(_resp(error="boom"))
    ql.log_query(_resp(n_sources=0, total=100.0))
    ql.log_feedback(qid, 1)
    ql.log_feedback(qid, -1)
    stats = ql.get_stats()
    assert stats["n_queries"] == 3
    assert stats["error_rate"] == pytest.approx(1 / 3)
    assert stats["zero_citation_rate"] == pytest.approx(1 / 3)
    assert stats["satisfaction"] == 0.5
    assert len(stats["zero_citation_queries"]) == 1


def test_alerter_thresholds(tmp_path):
    ql = QueryLogger(tmp_path / "queries.jsonl")
    for _ in range(5):
        ql.log_query(_resp(total=100.0))  # slow queries
    alerter = Alerter(ql, tmp_path / "alerts.jsonl",
                      AlertConfig(avg_time_s=60.0))
    alerts = alerter.check_and_alert()
    kinds = {a["kind"] for a in alerts}
    assert "avg_time" in kinds
    assert (tmp_path / "alerts.jsonl").exists()
    # healthy load → no alerts
    ql2 = QueryLogger(tmp_path / "q2.jsonl")
    for _ in range(5):
        ql2.log_query(_resp(total=1.0))
    assert Alerter(ql2, tmp_path / "a2.jsonl").check_and_alert() == []


def test_phase_timer():
    t = PhaseTimer()
    with t.phase("a"):
        time.sleep(0.01)
    with t.phase("a"):
        pass
    with t.phase("b"):
        pass
    d = t.as_dict()
    assert d["a"] >= 0.01
    assert "b" in d
