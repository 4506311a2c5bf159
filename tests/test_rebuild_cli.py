"""Rebuild/update CLI entry points."""

import json

from rag_dpo_tpu.ingest.rebuild import main as rebuild_main


def test_rebuild_check_plan(tmp_path, capsys):
    rc = rebuild_main(["--check", "--root", str(tmp_path),
                       "--llm-mode", "fake"])
    assert rc == 0
    plan = json.loads(capsys.readouterr().out)
    assert plan["would_run"][0] == "filter"
    assert plan["would_run"][-1] == "tag"


def test_rebuild_check_from_and_only(tmp_path, capsys):
    rc = rebuild_main(["--check", "--from", "index", "--root",
                       str(tmp_path), "--llm-mode", "fake"])
    assert rc == 0
    plan = json.loads(capsys.readouterr().out)
    assert plan["would_run"] == ["index", "summaries", "cleanup", "tag"]

    rc = rebuild_main(["--check", "--only", "dedup", "--root",
                       str(tmp_path), "--llm-mode", "fake"])
    plan = json.loads(capsys.readouterr().out)
    assert plan["would_run"] == ["dedup"]


def test_rebuild_empty_corpus_runs(tmp_path, capsys):
    """All steps over an empty raw dir complete without error."""
    rc = rebuild_main(["--root", str(tmp_path), "--llm-mode", "fake",
                       "--steps", "filter,organize,dedup"])
    assert rc == 0
    reports = json.loads(capsys.readouterr().out)
    assert reports["filter"]["n_kept"] == 0
    assert reports["dedup"]["n_kept"] == 0


def test_update_cli_status(tmp_path, monkeypatch):
    """`update_cli --status` runs without network or index and reports
    the empty-state counters."""
    import json

    from rag_dpo_tpu.ingest import update_cli

    monkeypatch.setenv("RAGDPO_LLM_MODE", "fake")
    out = []
    monkeypatch.setattr("builtins.print", lambda *a, **k:
                        out.append(" ".join(str(x) for x in a)))
    rc = update_cli.main(["--status", "--root", str(tmp_path),
                          "--llm-mode", "fake"])
    assert rc == 0
    status = json.loads(out[-1])
    assert status["n_known_urls"] == 0
    assert status["index_exists"] is False
