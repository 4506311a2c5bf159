"""CLI integration: eval/dashboard subcommands + production index path."""

import json

import pytest

from rag_dpo_tpu.app import cli


def test_cli_eval_demo(tmp_path, monkeypatch, capsys):
    monkeypatch.setenv("RAGDPO_TPU_ROOT", str(tmp_path))
    rc = cli.main(["eval", "--limit", "2"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "score global" in out
    assert "rapport" in out


def test_cli_dashboard_empty(tmp_path, monkeypatch, capsys):
    monkeypatch.setenv("RAGDPO_TPU_ROOT", str(tmp_path))
    rc = cli.main(["dashboard"])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out)
    assert stats == {"n_queries": 0}  # fresh root, no traffic yet


def test_cli_uses_saved_index(tmp_path, monkeypatch, capsys):
    """With a saved index under --root, the CLI bootstraps the real
    stack instead of the demo corpus."""
    from rag_dpo_tpu.ingest.indexer import CorpusIndexer
    from rag_dpo_tpu.models import BgeM3Config, EncoderConfig
    from rag_dpo_tpu.providers import Embedder, EmbedderConfig
    from rag_dpo_tpu.utils.paths import default_paths

    from test_retrieval import CORPUS

    paths = default_paths(tmp_path).ensure()
    embedder = Embedder(EmbedderConfig(
        model=BgeM3Config(encoder=EncoderConfig.tiny(
            use_flash_attention=False), colbert_dim=32),
        batch_size=8,
    ))
    chunks = []
    for cid, text, meta in CORPUS:
        c = dict(meta)
        c["chunk_id"] = cid
        c["text"] = text
        chunks.append(c)
    index, _, _ = CorpusIndexer(embedder, ell_width=16).build(chunks)
    index.save(paths.index_dir)

    class Args:
        llm = None
        root = str(tmp_path)
        config = None
        agent = False

    # the bootstrap path needs a full-size embedder by default; inject via
    # monkeypatching the default EmbedderConfig used in bootstrap
    import rag_dpo_tpu.bootstrap as bootstrap

    orig = bootstrap.build_stack

    def patched(config=None, paths_=None, llm=None, **kw):
        return orig(config, paths_, llm=llm, embedder=embedder)

    monkeypatch.setattr(bootstrap, "build_stack", patched)
    pipe, ctx = cli._stack(Args())
    assert ctx["index"].n_rows == len(CORPUS)
    resp = pipe.query("notification violation CNIL")
    assert resp.answer


def test_cli_chat_streams_and_rates(tmp_path, monkeypatch, capsys):
    """Chat loop: streamed display (deltas then the renumbered final
    answer), feedback shortcut, clean exit on empty input."""
    monkeypatch.setenv("RAGDPO_TPU_ROOT", str(tmp_path))
    answers = iter(["Quel délai pour notifier une violation ?",
                    "+1", ""])
    monkeypatch.setattr("builtins.input", lambda *a: next(answers))
    rc = cli.main(["chat"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "assistant>" in out
    assert "réponse finale" in out         # streamed draft got replaced
    assert "merci pour le retour" in out   # feedback registered


def test_cli_chat_no_stream_mode(tmp_path, monkeypatch, capsys):
    monkeypatch.setenv("RAGDPO_TPU_ROOT", str(tmp_path))
    answers = iter(["Quel délai pour notifier une violation ?", ""])
    monkeypatch.setattr("builtins.input", lambda *a: next(answers))
    rc = cli.main(["chat", "--no-stream"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "assistant>" in out
    assert "réponse finale" not in out
