"""Parity tests: C++ ingestion runtime vs the pure-Python path."""

import numpy as np
import pytest

from rag_dpo_tpu import native
from rag_dpo_tpu.retrieval.bm25 import build_bm25_stats, build_ell_corpus
from rag_dpo_tpu.tokenize.french import tokenize_french_text

pytestmark = pytest.mark.skipif(
    not native.is_available(),
    reason=f"native toolchain unavailable: {native.build_error()}",
)

SAMPLES = [
    "L'article 32-1 du RGPD impose la sécurité des données au "
    "sous-traitant.",
    "Notification d'une violation à la CNIL dans les 72 heures — "
    "article 33 !",
    "Durées de conservation proportionnées (référentiel CNIL, cœur du "
    "sujet).",
    "L'ŒUVRE complète : Æthique, naïveté, août, Noël, à-côtés…",
    "",
    "le la les et ou",  # all stopwords
]


@pytest.mark.parametrize("text", SAMPLES)
def test_tokenizer_parity(text):
    assert native.tokenize_french_native(text) == \
        tokenize_french_text(text)


def test_tokenizer_parity_random_french():
    rng = np.random.default_rng(0)
    words = ("données protection sécurité traité l'été où ça étés "
             "déjà-vu 32-1 café crème RGPD CNIL œuf moyen-âge").split()
    for _ in range(50):
        text = " ".join(rng.choice(words, size=rng.integers(1, 30)))
        assert native.tokenize_french_native(text) == \
            tokenize_french_text(text)


def test_ell_build_parity():
    texts = SAMPLES[:4] * 3 + ["sécurité des données personnelles santé"]
    stats_n, terms_n, impacts_n = native.build_ell_corpus_native(
        texts, ell_width=12)
    tokens = [tokenize_french_text(t) for t in texts]
    stats_p = build_bm25_stats(tokens)
    terms_p, impacts_p = build_ell_corpus(tokens, stats_p, ell_width=12)

    assert stats_n.n_docs == stats_p.n_docs
    assert set(stats_n.vocab) == set(stats_p.vocab)
    assert stats_n.avgdl == pytest.approx(stats_p.avgdl)
    # idf parity per term (ids may be assigned in different order)
    for term, pid in stats_p.vocab.items():
        nid = stats_n.vocab[term]
        assert stats_n.idf[nid] == pytest.approx(stats_p.idf[pid],
                                                 abs=1e-5)
    # impact parity: compare as {term: impact} per doc
    for d in range(len(texts)):
        py = {
            terms_p[d, s]: impacts_p[d, s]
            for s in range(terms_p.shape[1]) if terms_p[d, s] >= 0
        }
        py_named = {
            t: py[pid] for t, pid in stats_p.vocab.items() if pid in py
        }
        nat = {
            terms_n[d, s]: impacts_n[d, s]
            for s in range(terms_n.shape[1]) if terms_n[d, s] >= 0
        }
        nat_named = {
            t: nat[nid] for t, nid in stats_n.vocab.items() if nid in nat
        }
        assert set(py_named) == set(nat_named)
        for term in py_named:
            assert nat_named[term] == pytest.approx(py_named[term],
                                                    abs=1e-5)


def test_ell_query_scoring_parity():
    """End-to-end: native-built index scores queries identically."""
    import jax.numpy as jnp

    from rag_dpo_tpu.ops.sparse import ell_scores

    texts = [
        "violation de données notification CNIL 72 heures",
        "registre des traitements finalités durées",
        "sécurité chiffrement pseudonymisation des données",
    ] * 2
    stats_n, terms_n, impacts_n = native.build_ell_corpus_native(
        texts, ell_width=8)
    qt, qw = stats_n.query_terms("notification violation CNIL",
                                 max_terms=8)
    s_native = np.asarray(ell_scores(
        jnp.asarray(terms_n), jnp.asarray(impacts_n),
        jnp.asarray(qt[None]), jnp.asarray(qw[None])))[0]

    tokens = [tokenize_french_text(t) for t in texts]
    stats_p = build_bm25_stats(tokens)
    terms_p, impacts_p = build_ell_corpus(tokens, stats_p, ell_width=8)
    qt2, qw2 = stats_p.query_terms("notification violation CNIL",
                                   max_terms=8)
    s_py = np.asarray(ell_scores(
        jnp.asarray(terms_p), jnp.asarray(impacts_p),
        jnp.asarray(qt2[None]), jnp.asarray(qw2[None])))[0]
    np.testing.assert_allclose(s_native, s_py, atol=1e-5)


def test_native_speedup_on_bulk():
    import time

    text = ("le responsable de traitement notifie la violation de "
            "données personnelles à la CNIL dans les soixante-douze "
            "heures conformément à l'article 33 du règlement général "
            "sur la protection des données ") * 20
    texts = [text] * 300
    t0 = time.time()
    native.build_ell_corpus_native(texts, ell_width=32)
    t_native = time.time() - t0
    t0 = time.time()
    tokens = [tokenize_french_text(t) for t in texts]
    stats = build_bm25_stats(tokens)
    build_ell_corpus(tokens, stats, ell_width=32)
    t_python = time.time() - t0
    assert t_native < t_python, (t_native, t_python)


def test_tokenize_single_digit_head_in_double_hyphen_run():
    """Parity nit: '1--b' must keep the single-digit head '1' exactly
    like the Python regex tokenizer does."""
    import numpy as np
    from rag_dpo_tpu import native
    from rag_dpo_tpu.tokenize.french import tokenize_french_text

    if not native.is_available():
        import pytest
        pytest.skip("no C++ toolchain")
    for text in ("1--b article 83--bis", "aipd--2 x--7--y"):
        assert native.tokenize_french_native(text) == \
            tokenize_french_text(text), text


def test_fuzz_tokenizer_parity_random_unicode():
    """Native and Python tokenizers must agree on arbitrary text —
    random mixes of French words, accents, digits, hyphens, punctuation,
    multibyte codepoints and invalid-ish sequences."""
    import numpy as np

    from rag_dpo_tpu import native
    from rag_dpo_tpu.tokenize.french import tokenize_french_text

    if not native.is_available():
        import pytest
        pytest.skip("no C++ toolchain")

    rng = np.random.default_rng(0)
    pieces = ["données", "RGPD", "l'article", "72h", "sous-traitant",
              "œuvre", "cœur", "ÉTÉ", "naïve", "straße", "Æsir",
              "a-b-c", "--x--", "42", "º°§", "…", "«cité»", " ",
              "\t", "🙂", "Ω", "ça", "déjà-vu", "n°17", "CNIL."]
    for _ in range(60):
        n = int(rng.integers(1, 12))
        text = " ".join(rng.choice(pieces, size=n))
        if rng.integers(0, 4) == 0:
            text += "\xc3"  # dangling UTF-8 lead byte
        assert native.tokenize_french_native(text) == \
            tokenize_french_text(text), repr(text)
