"""Demo stack builder: a small CNIL-style corpus + full pipeline, offline.

Used by the CLI smoke test (`test_rag_cli.py`, the reference's `test_rag.py`
analog) and anywhere a working pipeline is needed without the full corpus
build: tiny encoder, deterministic weights, FakeLLM by default (or a real
HTTP endpoint when reachable).
"""

from __future__ import annotations

DEMO_CORPUS = [
    ("d0", "Rôle du DPO", "https://cnil.fr/fr/dpo-missions",
     "Missions du délégué",
     "Le délégué à la protection des données informe et conseille le "
     "responsable de traitement, contrôle le respect du RGPD et coopère "
     "avec la CNIL. Sa désignation est obligatoire pour les autorités "
     "publiques (article 37 RGPD)."),
    ("d1", "Notifier une violation", "https://cnil.fr/fr/violations",
     "Notification 72 heures",
     "En cas de violation de données personnelles, le responsable de "
     "traitement notifie la CNIL dans les 72 heures (article 33 RGPD). "
     "Si le risque est élevé pour les personnes, elles doivent aussi être "
     "informées (article 34)."),
    ("d2", "Analyse d'impact", "https://cnil.fr/fr/aipd",
     "Quand faire une AIPD",
     "L'analyse d'impact relative à la protection des données (AIPD) est "
     "obligatoire pour les traitements susceptibles d'engendrer un risque "
     "élevé (article 35 RGPD). Elle décrit le traitement, évalue la "
     "nécessité et gère les risques."),
    ("d3", "Registre des traitements", "https://cnil.fr/fr/registre",
     "Tenir le registre",
     "Le registre des activités de traitement (article 30 RGPD) recense "
     "les traitements de données personnelles : finalités, catégories de "
     "données, destinataires, durées de conservation et mesures de "
     "sécurité."),
    ("d4", "Sous-traitance", "https://cnil.fr/fr/sous-traitance",
     "Contrat article 28",
     "Le contrat de sous-traitance (article 28 RGPD) encadre le "
     "traitement par le sous-traitant : instructions documentées, "
     "confidentialité, sécurité, assistance et sort des données."),
    ("d5", "Durées de conservation", "https://cnil.fr/fr/durees",
     "Proportionnalité",
     "Les durées de conservation des données doivent être limitées et "
     "proportionnées à la finalité (article 5 RGPD). Un référentiel CNIL "
     "propose des durées par type de traitement."),
    ("d6", "Droits des personnes", "https://cnil.fr/fr/droits",
     "Répondre sous un mois",
     "Les demandes d'exercice de droits (accès, rectification, "
     "effacement, portabilité, opposition) appellent une réponse dans un "
     "délai d'un mois (article 12 RGPD), prolongeable de deux mois pour "
     "les demandes complexes."),
    ("d7", "Sanctions CNIL", "https://cnil.fr/fr/sanctions",
     "Amendes administratives",
     "La CNIL peut prononcer des amendes jusqu'à 20 millions d'euros ou "
     "4 % du chiffre d'affaires mondial (article 83 RGPD), ainsi que des "
     "mises en demeure et injonctions."),
]


def build_demo_stack(llm=None, agent: bool = False, use_reranker=True):
    """→ (pipeline, context dict). Offline-safe defaults."""
    from ..index import DeviceIndex, IndexConfig
    from ..models import BgeM3Config, EncoderConfig
    from ..providers import Embedder, EmbedderConfig, FakeLLMProvider
    from ..retrieval import SummaryBm25Index
    from ..retrieval.bm25 import (
        build_bm25_stats, build_ell_corpus, tokenize_corpus,
    )
    llm = llm or FakeLLMProvider()
    embedder = Embedder(EmbedderConfig(
        model=BgeM3Config(
            encoder=EncoderConfig.tiny(use_flash_attention=False),
            colbert_dim=32,
        ),
        batch_size=8,
    ))
    texts = [body for _, _, _, _, body in DEMO_CORPUS]
    metas = [
        {
            "text": body, "title": title, "heading": heading,
            "source_url": url, "doc_key": url.split("//")[1],
            "source": "CNIL", "nature": "DOCTRINE",
        }
        for _, title, url, heading, body in DEMO_CORPUS
    ]
    dense = embedder.embed(texts)["dense"]
    tokens = tokenize_corpus(texts)
    stats = build_bm25_stats(tokens)
    terms, impacts = build_ell_corpus(tokens, stats, ell_width=24)
    index = DeviceIndex(IndexConfig(dim=embedder.dim, ell_width=24,
                                    row_block=8))
    index.add([c for c, *_ in DEMO_CORPUS], dense, metas, terms, impacts)

    summary = SummaryBm25Index()
    summary.build([
        {"doc_key": m["doc_key"], "title": m["title"],
         "summary": m["text"], "url": m["source_url"]}
        for m in metas
    ])

    from ..retrieval.reranker import default_reranker

    reranker = default_reranker(
        embedder,
        model_config=EncoderConfig.tiny(use_flash_attention=False),
    ) if use_reranker else None

    ctx = {"index": index, "embedder": embedder, "bm25_stats": stats,
           "summary_index": summary, "llm": llm}
    if agent:
        from ..agent import create_agent_pipeline

        pipe = create_agent_pipeline(
            index, embedder, llm, bm25_stats=stats,
            summary_index=summary, reranker=reranker,
        )
    else:
        from ..rag import create_pipeline

        pipe = create_pipeline(
            index, embedder, llm, bm25_stats=stats,
            summary_index=summary, reranker=reranker,
            use_reranker=use_reranker,
        )
    return pipe, ctx
