"""Full corpus-build integration: fake site → scrape → 9-step pipeline →
index → RAG query. The reference can't test this without live Ollama +
GPU; here it runs hermetically (FakeLLM + tiny encoder + CPU devices)."""

import json

import pytest

from rag_dpo_tpu.ingest.pipeline import IngestPipeline, PipelineContext, STEP_ORDER
from rag_dpo_tpu.ingest.scraper import FetchResult, Scraper, ScraperConfig
from rag_dpo_tpu.ingest.update import IncrementalUpdater
from rag_dpo_tpu.models import BgeM3Config, EncoderConfig
from rag_dpo_tpu.providers import Embedder, EmbedderConfig, FakeLLMProvider
from rag_dpo_tpu.utils.paths import default_paths

PAGES = {
    "https://site.test/fr/": """
      <html><head><title>Accueil</title></head><body>
      <div class="region-content">
      <p>Portail de la protection des données RGPD.</p>
      <a href="/fr/violation">Violations</a>
      <a href="/fr/aipd">AIPD</a>
      <a href="/fr/presse/com1">Presse</a>
      </div></body></html>""",
    "https://site.test/fr/violation": """
      <html><head><title>Notifier une violation</title></head><body>
      <div class="region-content">
      <h2>Notification à la CNIL</h2>
      <p>En cas de violation de données personnelles, le responsable de
      traitement notifie la CNIL dans les 72 heures conformément à
      l'article 33 du RGPD. Le registre des traitements doit être tenu à
      jour et le sous-traitant informe sans délai le responsable.</p>
      <h2>Communication aux personnes</h2>
      <p>Si la violation engendre un risque élevé pour les droits des
      personnes, la communication aux personnes concernées est requise par
      l'article 34. Le consentement ne couvre pas cette obligation de
      sécurité des données.</p>
      </div></body></html>""",
    "https://site.test/fr/aipd": """
      <html><head><title>Réaliser une AIPD</title></head><body>
      <div class="region-content">
      <h2>Champ d'application</h2>
      <p>L'analyse d'impact relative à la protection des données est
      obligatoire pour tout traitement susceptible d'engendrer un risque
      élevé. La CNIL publie la liste des traitements concernés et le
      registre mentionne chaque analyse conduite sur les données
      personnelles.</p>
      <h2>Étapes</h2>
      <p>Étape 1 : décrire le traitement de données. Étape 2 : évaluer la
      nécessité et la proportionnalité du traitement. Étape 3 : gérer les
      risques pour la sécurité des données personnelles.</p>
      </div></body></html>""",
    "https://site.test/fr/presse/com1": """
      <html><head><title>Communiqué</title></head><body>
      <div class="region-content"><p>Communiqué de presse.</p>
      </div></body></html>""",
}


def fake_fetch(url, if_modified_since="", **kw):
    html = PAGES.get(url)
    if html is None:
        return FetchResult(url=url, status=404)
    if if_modified_since == "fresh":
        return FetchResult(url=url, status=304)
    return FetchResult(url=url, status=200, content=html.encode(),
                       content_type="text/html",
                       last_modified="Mon, 01 Jan 2026 00:00:00 GMT")


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    paths = default_paths(root).ensure()
    scraper = Scraper(paths.raw,
                      ScraperConfig(scope_prefix="https://site.test/fr",
                                    delay_s=0.0),
                      fetch=fake_fetch)
    crawl = scraper.crawl(["https://site.test/fr/"])
    assert crawl["n_fetched"] == 4

    embedder = Embedder(EmbedderConfig(
        model=BgeM3Config(encoder=EncoderConfig.tiny(
            use_flash_attention=False), colbert_dim=32),
        batch_size=8,
    ))
    ctx = PipelineContext(paths=paths, llm=FakeLLMProvider(),
                          embedder=embedder)
    pipeline = IngestPipeline(ctx)
    reports = pipeline.run()
    return paths, ctx, reports, scraper


def test_pipeline_all_steps_ran(built):
    _, _, reports, _ = built
    assert list(reports) == STEP_ORDER
    assert reports["filter"]["n_dropped"] >= 1       # presse page dropped
    assert reports["chunk"]["n_chunks"] >= 4
    assert reports["index"]["n_indexed"] == reports["chunk"]["n_chunks"]
    assert reports["index"]["verification"]["self_retrieval_ok"]


def test_pipeline_artifacts_on_disk(built):
    paths, _, _, _ = built
    assert paths.processed_chunks.exists()
    assert paths.keep_manifest.exists()
    assert (paths.index_dir / "manifest.json").exists()
    chunks = [json.loads(l) for l in
              paths.processed_chunks.read_text().splitlines()]
    assert all("chunk_id" in c and "nature" in c for c in chunks)


def test_query_over_built_corpus(built):
    paths, ctx, _, _ = built
    from rag_dpo_tpu.rag import create_pipeline

    pipe = create_pipeline(
        ctx.index, ctx.embedder, FakeLLMProvider(),
        bm25_stats=ctx.bm25_stats, use_reranker=False,
    )
    resp = pipe.query("délai de notification d'une violation à la CNIL")
    assert resp.sources
    assert any("violation" in s["title"].lower() or
               "violation" in s.get("url", "") for s in resp.sources)


def test_incremental_update_304(built):
    paths, ctx, _, scraper = built
    # mark everything fresh → all 304, nothing changes
    for url, meta in scraper.state["visited"].items():
        if meta.get("status") == 200:
            meta["last_modified"] = "fresh"
    updater = IncrementalUpdater(scraper, ctx)
    status = updater.status()
    assert status["n_known_urls"] == 4
    result = updater.update()
    assert result["n_changed"] == 0
    assert result["n_unchanged"] == 4  # all fetched pages report 304


def test_scraper_resumable_state(built):
    paths, _, _, scraper = built
    s2 = Scraper(paths.raw, ScraperConfig(
        scope_prefix="https://site.test/fr", delay_s=0.0), fetch=fake_fetch)
    assert len(s2.state["visited"]) == len(scraper.state["visited"])
    # re-crawl skips all visited
    crawl = s2.crawl(["https://site.test/fr/"])
    assert crawl["n_fetched"] == 0


def test_scraper_backfill_metadata(built):
    """Local-only metadata migration (reference :787-863): hashes, page
    dates, schema stamp — zero HTTP (fetch would explode here)."""
    import json as _json

    paths, _, _, scraper = built
    # simulate a legacy metadata file: strip the enriched fields
    meta_files = sorted(paths.raw.rglob("*.meta.json"))
    assert meta_files
    legacy = _json.loads(meta_files[0].read_text())
    for key in ("content_hash", "url_hash", "schema_version"):
        legacy.pop(key, None)
    meta_files[0].write_text(_json.dumps(legacy, ensure_ascii=False))

    s = Scraper(paths.raw, ScraperConfig(delay_s=0.0),
                fetch=lambda *a, **k: (_ for _ in ()).throw(
                    AssertionError("backfill must not fetch")))
    stats = s.backfill_metadata()
    assert stats["processed"] >= 4
    assert stats["updated"] >= 1
    assert stats["errors"] == 0
    for mf in meta_files:
        meta = _json.loads(mf.read_text())
        assert meta["schema_version"] == "v2"
        assert len(meta["content_hash"]) == 64
        assert meta["url_hash"]


def test_extract_page_dates():
    from rag_dpo_tpu.ingest.scraper import extract_page_dates

    html = (b'<html><head><meta property="article:published_time" '
            b'content="2024-07-12T10:00:00+02:00"/></head></html>')
    assert extract_page_dates(html)["published_at"].startswith("2024-07-12")
    html2 = "<html><body>Publié le 3 février 2023.</body></html>".encode()
    assert extract_page_dates(html2)["published_at"] == "2023-02-03"
    html3 = b'<html><time datetime="2022-01-05">5 jan</time></html>'
    assert extract_page_dates(html3)["published_at"] == "2022-01-05"
    assert extract_page_dates(b"<html></html>")["published_at"] is None


def test_resume_from_step_in_fresh_process(built):
    """`--from index` in a FRESH context must reload persisted artifacts
    instead of indexing an empty corpus (round-2 review finding)."""
    paths, ctx, reports, _ = built
    n_chunks = reports["chunk"]["n_chunks"]
    fresh_ctx = PipelineContext(paths=paths, llm=FakeLLMProvider(),
                                embedder=ctx.embedder)
    fresh = IngestPipeline(fresh_ctx)
    out = fresh.run(from_step="index")
    assert out["index"]["n_indexed"] == n_chunks
    assert len(fresh_ctx.chunks) == n_chunks
    # processed_chunks.jsonl untouched by downstream steps
    lines = [l for l in paths.processed_chunks.read_text().splitlines()
             if l.strip()]
    assert len(lines) >= 1


def test_resume_chunk_never_clobbers_artifact(built, tmp_path):
    """Resuming at 'chunk' with NO reloadable docs must not overwrite a
    completed processed_chunks.jsonl with an empty file."""
    paths, ctx, _, _ = built
    before = paths.processed_chunks.read_text()
    empty_root = default_paths(tmp_path / "empty").ensure()
    # same pipeline code against a root with no scraped docs at all
    empty_ctx = PipelineContext(paths=empty_root, llm=FakeLLMProvider(),
                                embedder=ctx.embedder)
    # plant the completed artifact in the empty root
    empty_root.processed_chunks.parent.mkdir(parents=True, exist_ok=True)
    empty_root.processed_chunks.write_text(before)
    IngestPipeline(empty_ctx).step_chunk()
    assert empty_root.processed_chunks.read_text() == before


def test_incremental_update_merges_and_purges_stale(built):
    """update() must merge whole-corpus artifacts (not overwrite them
    with the changed subset) and tombstone a shrunk doc's extra chunks."""
    paths, ctx, _, scraper = built
    n_chunks_before = len([
        l for l in paths.processed_chunks.read_text().splitlines()
        if l.strip()])
    n_docs_before = len(json.loads(
        paths.document_metadata.read_text()))
    # mark one page changed; fake_fetch returns 200 for stale ims
    for url, meta in scraper.state["visited"].items():
        if meta.get("status") != 200:
            continue
        meta["last_modified"] = ("stale" if "violation" in url
                                 else "fresh")
    updater = IncrementalUpdater(scraper, ctx)
    result = updater.update()
    assert result["n_changed"] == 1
    # whole-corpus artifacts survived the single-doc update
    n_chunks_after = len([
        l for l in paths.processed_chunks.read_text().splitlines()
        if l.strip()])
    assert n_chunks_after >= n_chunks_before - 2  # only the doc changed
    assert len(json.loads(paths.document_metadata.read_text())) \
        >= n_docs_before
    # index still answers for untouched documents
    s, rows = ctx.index.search_dense(
        ctx.embedder.embed_queries(["analyse d'impact AIPD"]), 3)
    assert (rows[0] >= 0).any()
