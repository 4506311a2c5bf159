"""Web-UI parity smoke tests with a stubbed streamlit (round-1 verdict
item 7): every page function renders end-to-end against the real demo
stack, and the chat page exercises the enterprise-tag multiselect,
source cards with origin badges, composite expanders and 👍 feedback."""

import pathlib

import pytest

from rag_dpo_tpu.app.streamlit_app import (
    build_system,
    render_about,
    render_chat,
    render_dashboard,
    render_documents,
    render_home,
    render_source_cards,
)


class _Ctx:
    def __init__(self, rec, label=""):
        self.rec = rec
        self.label = label

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False

    def write(self, *a, **k):
        self.rec.append(("write", a))

    def caption(self, *a, **k):
        self.rec.append(("caption", a))


class FakeSt:
    """Records every call; scripted return values per widget key/label."""

    def __init__(self, script=None):
        self.calls = []
        self.script = script or {}
        self.session_state = {}
        self.sidebar = self

    # --- widgets (return scripted or default values)
    def _get(self, kind, label, default):
        self.calls.append((kind, label))
        return self.script.get(label, default)

    def toggle(self, label, value=False, **k):
        return self._get("toggle", label, value)

    def selectbox(self, label, options, **k):
        return self._get("selectbox", label, options[0])

    def multiselect(self, label, options, **k):
        return self._get("multiselect", label, [])

    def select_slider(self, label, options, value=None, **k):
        return self._get("select_slider", label, value or options[0])

    def slider(self, label, lo, hi, value, **k):
        return self._get("slider", label, value)

    def chat_input(self, label, **k):
        return self._get("chat_input", label, None)

    def text_input(self, label, **k):
        return self._get("text_input", label, "")

    def button(self, label, **k):
        return self._get("button", label, False)

    def download_button(self, label, **k):
        return self._get("download_button", label, False)

    def file_uploader(self, label, **k):
        return self._get("file_uploader", label, None)

    # --- layout / output (recorded)
    def chat_message(self, role):
        self.calls.append(("chat_message", role))
        return _Ctx(self.calls)

    def expander(self, label, **k):
        self.calls.append(("expander", label))
        return _Ctx(self.calls, label)

    def columns(self, n):
        return [self for _ in range(n if isinstance(n, int) else len(n))]

    def write(self, *a, **k):
        self.calls.append(("write", a))

    def markdown(self, *a, **k):
        self.calls.append(("markdown", a))

    def subheader(self, *a, **k):
        self.calls.append(("subheader", a))

    def caption(self, *a, **k):
        self.calls.append(("caption", a))

    def metric(self, label, value, **k):
        self.calls.append(("metric", label, value))

    def table(self, *a, **k):
        self.calls.append(("table", a))

    def json(self, *a, **k):
        self.calls.append(("json", a))

    def success(self, *a, **k):
        self.calls.append(("success", a))

    def error(self, *a, **k):
        self.calls.append(("error", a))

    def warning(self, *a, **k):
        self.calls.append(("warning", a))

    def toast(self, *a, **k):
        self.calls.append(("toast", a))

    def labels(self, kind):
        return [c[1] for c in self.calls if c[0] == kind]


class FakeUpload:
    def __init__(self, name, data):
        self.name = name
        self._data = data

    def getvalue(self):
        return self._data


@pytest.fixture(scope="module")
def system(tmp_path_factory):
    # build_system resolves default_paths through the rag_dpo_tpu.utils
    # re-export — patch BOTH bindings so nothing writes into the repo
    import rag_dpo_tpu.utils as utils_mod
    import rag_dpo_tpu.utils.paths as paths_mod

    root = tmp_path_factory.mktemp("webapp")
    orig = paths_mod.default_paths
    patched = lambda base=None: orig(root)  # noqa: E731
    paths_mod.default_paths = patched
    utils_mod.default_paths = patched
    try:
        sys_obj = build_system()
    finally:
        paths_mod.default_paths = orig
        utils_mod.default_paths = orig
    return sys_obj


def test_home_renders(system):
    st = FakeSt()
    render_home(st, system)
    assert ("metric", "Extraits indexés",
            len(system["index"])) in st.calls


def test_chat_full_flow(system):
    system["tags"].ensure(["RH"])
    st = FakeSt(script={
        "Votre question RGPD…": "Quel délai pour notifier une violation "
                                "de données à la CNIL ?",
        "Documents d'entreprise (tags)": ["rh"],
        "Pipeline agent": False,
        "👍 Utile": True,
    })
    # widget keys are dynamic for feedback buttons: FakeSt matches on
    # label, so the scripted 👍 fires
    resp = render_chat(st, system)
    assert resp is not None and resp.answer
    # sidebar controls all rendered
    assert "Filtrer par nature" in st.labels("selectbox")
    assert "Documents d'entreprise (tags)" in st.labels("multiselect")
    assert "Profondeur de recherche" in st.labels("select_slider")
    # source cards rendered with origin badges
    if resp.sources:
        expanders = st.labels("expander")
        assert any("CNIL" in e or "ENTREPRISE" in e for e in expanders)
    # feedback recorded
    fb = system["qlog"].recent_feedback()
    assert fb and fb[-1]["rating"] == 1
    # history trimmed and persisted
    assert len(st.session_state["history"]) == 2


def test_chat_no_input_returns_none(system):
    st = FakeSt()
    assert render_chat(st, system) is None


def test_feedback_survives_streamlit_rerun(system):
    """A button click makes streamlit RERUN the script with chat_input
    = None; the feedback widgets must still render and register (round-2
    review finding: buttons gated behind the input branch were dead in
    production)."""
    st1 = FakeSt(script={
        "Votre question RGPD…": "Quelle base légale pour la paie ?"})
    resp = render_chat(st1, system)
    assert resp is not None
    qid = st1.session_state["last_qid"]

    st2 = FakeSt(script={"👎 À améliorer": True})
    st2.session_state = st1.session_state   # session persists on rerun
    assert render_chat(st2, system) is None  # no new input this pass
    fb = system["qlog"].recent_feedback()
    assert fb[-1]["rating"] == -1 and fb[-1]["query_id"] == qid


def test_source_cards_badges(system):
    st = FakeSt()
    render_source_cards(st, [
        {"n": 1, "title": "Guide CNIL", "url": "https://cnil.fr/x",
         "chunk_ids": ["a"]},
        {"n": 2, "title": "Procédure interne",
         "url": "enterprise://proc.docx", "chunk_ids": ["b"]},
    ])
    expanders = st.labels("expander")
    assert "🏛️ CNIL" in expanders[0]
    assert "🏢 ENTREPRISE" in expanders[1]


def test_dashboard_renders_stats_tables_alerts(system):
    st = FakeSt(script={"Vérifier les alertes": True})
    stats = render_dashboard(st, system)
    assert stats["n_queries"] >= 1  # chat test logged queries
    metrics = [c[1] for c in st.calls if c[0] == "metric"]
    assert "Requêtes" in metrics and "Satisfaction" in metrics
    assert len([c for c in st.calls if c[0] == "table"]) == 2
    assert "Exporter JSON" in st.labels("download_button")


def test_documents_upload_list_purge(system):
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).parent))
    from fixture_docs import make_docx

    st = FakeSt(script={
        "Document interne (pdf, docx, xlsx, odt, ods, html, txt)":
            FakeUpload("procedure.docx", make_docx()),
        "Nouveau tag (optionnel)": "juridique",
        "Indexer": True,
    })
    render_documents(st, system)
    docs = system["ingestor"].list_documents()
    assert docs and any("juridique" in d["tags"] for d in docs)

    # purge via the selectbox
    st2 = FakeSt(script={
        "Supprimer un document": docs[0]["doc_id"],
        "Purger": True,
    })
    render_documents(st2, system)
    assert all(d["doc_id"] != docs[0]["doc_id"]
               for d in system["ingestor"].list_documents())


def test_documents_corrupt_upload_shows_error(system):
    """A corrupt upload must render st.error, not crash the page."""
    st = FakeSt(script={
        "Document interne (pdf, docx, xlsx, odt, ods, html, txt)":
            FakeUpload("corrompu.docx", b"PK\x03\x04 truncated"),
        "Indexer": True,
    })
    render_documents(st, system)
    errs = st.labels("error")
    assert errs and "illisible" in errs[0][0]
    assert not st.labels("success")


def test_chat_streams_when_ctx_supports_empty(system):
    """When the chat message container supports `.empty()` (the real
    streamlit runtime), the chat page streams the draft into the slot
    and finishes by writing the post-processed final answer."""

    class _Slot:
        def __init__(self, rec):
            self.rec = rec

        def write(self, *a, **k):
            self.rec.append(("slot_write", a))

    class _StreamCtx(_Ctx):
        def empty(self):
            self.rec.append(("empty",))
            return _Slot(self.rec)

    class StreamSt(FakeSt):
        def chat_message(self, role):
            self.calls.append(("chat_message", role))
            return _StreamCtx(self.calls)

    st = StreamSt(script={
        "Votre question RGPD…": "Quel délai pour notifier une violation "
                                "de données à la CNIL ?",
        "Pipeline agent": False,
    })
    resp = render_chat(st, system)
    assert resp is not None and resp.answer
    slot_writes = [c[1] for c in st.calls if c[0] == "slot_write"]
    assert len(slot_writes) >= 2, "expected draft delta(s) + final"
    # the draft carries the streaming cursor; the final write is the
    # post-processed answer without it
    assert any("▌" in w[0] for w in slot_writes[:-1])
    assert slot_writes[-1][0] == resp.answer


def test_about_page_renders_stack_and_version(system):
    from rag_dpo_tpu import __version__

    st = FakeSt()
    render_about(st, system)
    md = " ".join(str(a) for _, a in
                  [c for c in st.calls if c[0] == "markdown"])
    assert "Pile technique" in md and "BGE-M3" in md
    metrics = {c[1]: c[2] for c in st.calls if c[0] == "metric"}
    assert metrics["Version"] == __version__
    assert metrics["Extraits indexés"] == len(system["index"])
    assert "Backend" in metrics


def test_dashboard_renders_system_section(system):
    """Device inventory + micro-batcher stats surface in the dashboard
    (VERDICT round-2 item 9; the data already served by /stats)."""
    from rag_dpo_tpu.serving import batched_dense_search

    system2 = dict(system)
    system2["search"] = batched_dense_search(system["index"])
    import numpy as np

    rng = np.random.default_rng(0)
    dim = system["index"].config.dim
    system2["search"](rng.standard_normal((2, dim)).astype(np.float32), 3)
    st = FakeSt()
    render_dashboard(st, system2)
    metrics = {c[1] for c in st.calls if c[0] == "metric"}
    assert {"Puces", "Extraits indexés",
            "Batch moyen (recherche)"} <= metrics
    caps = " ".join(str(a) for _, a in
                    [c for c in st.calls if c[0] == "caption"])
    assert "micro-batcher" in caps and "devices" in caps
    system2["search"].batcher.close()


def test_dashboard_renders_decode_pool_stats(system):
    """When the LLM serves through the continuous slot pool, the
    dashboard Système section surfaces its occupancy / prefix-cache /
    speculation counters (the same data /stats exposes)."""
    from rag_dpo_tpu.providers.factory import create_tpu_llm

    llm = create_tpu_llm(arch="tiny", quantize_int8=False,
                         scheduler="continuous", speculative=True,
                         max_batch=2, prefix_cache=2, prefill_chunk=32)
    try:
        llm.generate("Qu'impose l'article 32 du RGPD " + "contexte " * 20,
                     max_tokens=6)
        system2 = dict(system)
        system2["llm"] = llm
        st = FakeSt()
        render_dashboard(st, system2)
        caps = " ".join(str(a) for _, a in
                        [c for c in st.calls if c[0] == "caption"])
        assert "pool de décodage" in caps and "spéculation" in caps \
            and "préfixe" in caps, caps
        # preemption evictions surface once any happened
        llm._driver.engine.stats["preempted"] = 3
        st2 = FakeSt()
        render_dashboard(st2, system2)
        caps2 = " ".join(str(a) for _, a in
                         [c for c in st2.calls if c[0] == "caption"])
        assert "3 préemptées" in caps2, caps2
    finally:
        llm._driver.close()


def test_build_system_uses_bootstrap_when_index_exists(tmp_path,
                                                       monkeypatch):
    """Like the HTTP server: a saved index checkpoint routes the
    Streamlit system through the config-driven bootstrap instead of the
    demo stack."""
    from rag_dpo_tpu.app.streamlit_app import build_system
    from rag_dpo_tpu.ingest.indexer import CorpusIndexer
    from rag_dpo_tpu.providers import Embedder, FakeLLMProvider
    from rag_dpo_tpu.utils.paths import default_paths

    from test_retrieval import CORPUS

    monkeypatch.setenv("RAGDPO_TPU_ROOT", str(tmp_path))
    monkeypatch.setenv("RAGDPO_LLM_MODE", "fake")
    monkeypatch.setenv("RAGDPO_RETRIEVAL_USE_RERANKER", "false")
    paths = default_paths(tmp_path).ensure()
    embedder = Embedder()
    chunks = []
    for cid, text, meta in CORPUS:
        c = dict(meta)
        c["chunk_id"] = cid
        c["text"] = text
        chunks.append(c)
    index, _, _ = CorpusIndexer(embedder, ell_width=16).build(chunks)
    index.save(paths.index_dir)

    system = build_system()
    assert system["index"].n_rows == len(CORPUS)
    assert isinstance(system["llm"], FakeLLMProvider)
    resp = system["native"].query("délai de notification d'une violation")
    assert resp.answer and resp.sources


def test_enterprise_ingest_works_with_hybrid_disabled(tmp_path,
                                                      monkeypatch):
    """retrieval.hybrid=false leaves bm25_stats=None in the bootstrap;
    document upload must ingest dense-only instead of crashing on the
    sparse-array build (review finding)."""
    from rag_dpo_tpu.app.streamlit_app import build_system
    from rag_dpo_tpu.ingest.indexer import CorpusIndexer
    from rag_dpo_tpu.providers import Embedder
    from rag_dpo_tpu.utils.paths import default_paths

    from test_retrieval import CORPUS

    monkeypatch.setenv("RAGDPO_TPU_ROOT", str(tmp_path))
    monkeypatch.setenv("RAGDPO_LLM_MODE", "fake")
    monkeypatch.setenv("RAGDPO_RETRIEVAL_USE_RERANKER", "false")
    monkeypatch.setenv("RAGDPO_RETRIEVAL_HYBRID", "false")
    paths = default_paths(tmp_path).ensure()
    embedder = Embedder()
    chunks = []
    for cid, text, meta in CORPUS:
        c = dict(meta)
        c["chunk_id"] = cid
        c["text"] = text
        chunks.append(c)
    index, _, _ = CorpusIndexer(embedder, ell_width=16).build(chunks)
    index.save(paths.index_dir)

    system = build_system()
    doc = tmp_path / "up.txt"
    doc.write_text("Politique interne de conservation des données RH "
                   "pendant cinq ans.")
    out = system["ingestor"].ingest(doc, tags=["rh"])
    assert out["n_chunks"] >= 1
    resp = system["native"].query("conservation des données RH")
    assert resp.answer
