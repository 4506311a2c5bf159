import numpy as np

from rag_dpo_tpu.tokenize import (
    FRENCH_STOPWORDS,
    HashedTokenizer,
    tokenize_french_text,
)
from rag_dpo_tpu.tokenize.base import bucket_length


def test_hashed_deterministic_and_padded():
    tok = HashedTokenizer(vocab_size=1000)
    enc = tok.encode_batch(["Bonjour le RGPD", "données personnelles"], 16)
    enc2 = tok.encode_batch(["Bonjour le RGPD", "données personnelles"], 16)
    np.testing.assert_array_equal(enc.input_ids, enc2.input_ids)
    assert enc.input_ids.shape == (2, 16)
    assert enc.input_ids[0, 0] == tok.cls_id
    assert enc.input_ids[0, enc.lengths[0] - 1] == tok.sep_id
    assert np.all(enc.input_ids[0, enc.lengths[0]:] == tok.pad_id)
    assert enc.input_ids.max() < 1000


def test_hashed_truncation():
    tok = HashedTokenizer(vocab_size=500)
    enc = tok.encode_batch(["mot " * 100], 12)
    assert enc.lengths[0] == 12


def test_hashed_pairs():
    tok = HashedTokenizer()
    enc = tok.encode_pairs([("question courte", "un long passage " * 30)], 64)
    assert enc.input_ids.shape == (1, 64)
    assert enc.input_ids[0, 0] == tok.cls_id


def test_french_tokenizer_keeps_articles_and_hyphens():
    toks = tokenize_french_text(
        "L'article 32-1 du RGPD impose la sécurité des données "
        "au sous-traitant."
    )
    assert "32-1" in toks
    assert "sous-traitant" in toks
    assert "rgpd" in toks
    assert "securite" in toks  # accents stripped
    assert "la" not in toks and "des" not in toks  # stopwords out


def test_french_stopwords_normalized():
    assert "le" in FRENCH_STOPWORDS
    assert tokenize_french_text("le la les") == []


def test_bucket_length():
    assert bucket_length(5) == 32
    assert bucket_length(100) == 128
    assert bucket_length(9000) == 8192
