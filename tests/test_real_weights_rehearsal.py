"""One-command convert→boot→query integration rehearsal (VERDICT r3 #6).

The four converter kinds are each roundtrip-tested in isolation
(tests/test_convert_script.py); this composes them the way a real
deployment would: generate tiny HF snapshots (decoder + BGE-M3 +
reranker + LLaVA), convert ALL FOUR through `scripts/convert_weights.py`,
boot the FULL production stack from the converted artifacts (saved index
checkpoint → bootstrap.build_stack → both pipelines → HTTP server), and
drive `/query` plus one vision chat call over real HTTP.

Role parity: `/root/reference/check_install.py` + `app.py:42-124` — the
reference's init path is exactly this composition with real artifacts.
"""

import json as _json
import pathlib
import subprocess
import sys
import threading as th
import urllib.error
import urllib.request

import numpy as np
import pytest


def _convert(kind, snapshot, out):
    r = subprocess.run(
        [sys.executable, "scripts/convert_weights.py", kind,
         str(snapshot), str(out)],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r.returncode == 0, f"{kind}: {r.stderr}"
    return out


_XLMR_KW = dict(
    vocab_size=512, hidden_size=32, num_hidden_layers=2,
    num_attention_heads=4, intermediate_size=64,
    max_position_embeddings=130, type_vocab_size=1, pad_token_id=1,
    hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    layer_norm_eps=1e-5, position_embedding_type="absolute",
)

_CORPUS = [
    {"chunk_id": f"doc_{i}", "text": t, "heading": h, "title": h,
     "doc_key": f"cnil.fr/{i}", "source_url": f"https://cnil.fr/fr/{i}",
     "source": "CNIL", "nature": "DOCTRINE"}
    for i, (h, t) in enumerate([
        ("Durée de conservation",
         "Durée de conservation. Les données clients sont conservées "
         "trois ans après le dernier contact, puis supprimées ou "
         "anonymisées."),
        ("Notification de violation",
         "Notification de violation. Toute violation de données doit "
         "être notifiée à la CNIL sous 72 heures."),
        ("Registre des traitements",
         "Registre des traitements. Le responsable tient un registre "
         "des activités de traitement, tenu à jour."),
        ("Sécurité des données",
         "Sécurité des données. Des mesures techniques et "
         "organisationnelles appropriées protègent les données."),
        ("Droits des personnes",
         "Droits des personnes. Accès, rectification, effacement, "
         "opposition et portabilité peuvent être exercés."),
        ("Analyse d'impact",
         "Analyse d'impact. Une AIPD est requise en cas de risque "
         "élevé pour les droits et libertés."),
    ])
]


@pytest.mark.slow
def test_convert_boot_query_vision_rehearsal(tmp_path, monkeypatch):
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp
    from transformers import (
        CLIPVisionConfig,
        LlamaConfig,
        LlamaForCausalLM,
        LlavaConfig as HFLlavaConfig,
        LlavaForConditionalGeneration,
        XLMRobertaConfig,
        XLMRobertaForSequenceClassification,
        XLMRobertaModel,
    )

    # ---- 1. four tiny HF snapshots → scripts/convert_weights.py
    txt_cfg = LlamaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=64,
        rms_norm_eps=1e-5, rope_theta=10000.0, attention_bias=False,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    LlamaForCausalLM(txt_cfg).eval().save_pretrained(
        tmp_path / "snap_decoder", safe_serialization=False)
    decoder_npz = _convert("decoder", tmp_path / "snap_decoder",
                           tmp_path / "decoder.npz")

    torch.manual_seed(2)
    XLMRobertaModel(XLMRobertaConfig(**_XLMR_KW)).eval().save_pretrained(
        tmp_path / "snap_bge", safe_serialization=False)
    torch.manual_seed(3)
    torch.save(torch.nn.Linear(32, 1).eval().state_dict(),
               tmp_path / "snap_bge" / "sparse_linear.pt")
    torch.save(torch.nn.Linear(32, 16).eval().state_dict(),
               tmp_path / "snap_bge" / "colbert_linear.pt")
    bge_npz = _convert("bge-m3", tmp_path / "snap_bge",
                       tmp_path / "bge.npz")

    torch.manual_seed(4)
    XLMRobertaForSequenceClassification(XLMRobertaConfig(
        num_labels=1, classifier_dropout=0.0, **_XLMR_KW)
    ).eval().save_pretrained(tmp_path / "snap_rr",
                             safe_serialization=False)
    rr_npz = _convert("reranker", tmp_path / "snap_rr",
                      tmp_path / "rr.npz")

    vis_cfg = CLIPVisionConfig(
        image_size=28, patch_size=7, hidden_size=32,
        num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, hidden_act="quick_gelu",
        attention_dropout=0.0, layer_norm_eps=1e-5)
    torch.manual_seed(0)
    LlavaForConditionalGeneration(HFLlavaConfig(
        vision_config=vis_cfg, text_config=txt_cfg,
        image_token_index=127, projector_hidden_act="gelu",
        vision_feature_layer=-2,
        vision_feature_select_strategy="default",
    )).eval().save_pretrained(tmp_path / "snap_llava",
                              safe_serialization=False)
    llava_npz = _convert("llava", tmp_path / "snap_llava",
                         tmp_path / "llava.npz")

    # ---- 2. production components FROM the converted artifacts
    from rag_dpo_tpu.models import BgeM3Config, EncoderConfig
    from rag_dpo_tpu.models.convert import load_params_npz
    from rag_dpo_tpu.models.decoder import DecoderConfig
    from rag_dpo_tpu.models.vit import ViTConfig
    from rag_dpo_tpu.providers import Embedder, EmbedderConfig
    from rag_dpo_tpu.providers.tpu_llm import TPULLMProvider
    from rag_dpo_tpu.retrieval.reranker import CrossEncoderReranker

    enc_cfg = EncoderConfig(
        vocab_size=512, hidden_size=32, num_layers=2, num_heads=4,
        intermediate_size=64, max_position_embeddings=130,
        type_vocab_size=1, pad_token_id=1, use_flash_attention=False,
    )
    embedder = Embedder(
        EmbedderConfig(model=BgeM3Config(encoder=enc_cfg,
                                         colbert_dim=16)),
        params=load_params_npz(bge_npz),
    )
    dec_cfg = DecoderConfig(
        vocab_size=128, hidden_size=32, num_layers=2, num_heads=4,
        num_kv_heads=2, intermediate_size=64, rope_theta=10000.0,
        max_seq_len=64, dtype=jnp.float32, param_dtype=jnp.float32,
    )
    llm = TPULLMProvider(dec_cfg, params=load_params_npz(decoder_npz),
                         max_new_tokens=8)
    llm.attach_vision(ViTConfig.tiny(dtype=jnp.float32),
                      params=load_params_npz(llava_npz)["params"])
    reranker = CrossEncoderReranker(
        model_config=enc_cfg, params=load_params_npz(rr_npz))

    # ---- 3. saved index checkpoint → config-driven bootstrap
    monkeypatch.setenv("RAGDPO_TPU_ROOT", str(tmp_path / "root"))
    from rag_dpo_tpu.bootstrap import build_stack
    from rag_dpo_tpu.ingest.indexer import CorpusIndexer
    from rag_dpo_tpu.utils.paths import default_paths

    paths = default_paths().ensure()
    index, stats, report = CorpusIndexer(
        embedder, ell_width=16).build(_CORPUS, mode="reset")
    # no self_retrieval_ok assert: a RANDOM torch-init XLM-R at
    # hidden=32 maps every text to a near-identical CLS vector
    # (layernorm-dominated), so dense self-retrieval legitimately
    # ties — the rehearsal tests the convert→boot→serve composition,
    # not the random snapshot's embedding quality
    assert report.n_indexed == len(_CORPUS)
    index.save(paths.index_dir)

    stack = build_stack(paths=paths, llm=llm, embedder=embedder,
                        reranker=reranker)
    assert stack.pipeline.reranker is reranker
    # random tiny weights never ground — don't pay the retry ladder
    stack.pipeline.max_quality_retries = 0

    # ---- 4. drive /query + one vision call over real HTTP
    from rag_dpo_tpu.app.server import serve

    system = {
        "pipe": stack.pipeline, "agent_pipe": stack.agent,
        "index": stack.index, "embedder": stack.embedder,
        "llm": stack.llm, "qlog": stack.query_logger,
    }
    srv = serve(port=0, system=system)
    th.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"

    def post(path, body):
        req = urllib.request.Request(
            url + path, data=_json.dumps(body).encode(),
            headers={"Content-Type": "application/json"})
        try:
            with urllib.request.urlopen(req, timeout=300) as resp:
                return resp.status, _json.loads(resp.read())
        except urllib.error.HTTPError as e:
            return e.code, _json.loads(e.read())

    code, data = post("/query", {
        "question": "Quel est le délai de notification d'une "
                    "violation de données ?"})
    assert code == 200, data
    assert isinstance(data["answer"], str) and data["answer"]
    assert not data.get("error")
    # `sources` carries only CITED sources — a random tiny decoder
    # never emits [Source N], so assert the retrieval stage itself
    # surfaced the corpus through the converted encoder instead
    resp = stack.pipeline.query(
        "Quel est le délai de notification d'une violation ?")
    assert resp.n_candidates > 0, "retrieval surfaced no candidates"
    assert resp.answer

    # vision: data-URI image through the OpenAI multimodal surface
    import base64
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray((np.arange(28 * 28 * 3).reshape(28, 28, 3) % 255
                     ).astype(np.uint8)).save(buf, format="PNG")
    uri = ("data:image/png;base64,"
           + base64.b64encode(buf.getvalue()).decode())
    code, data = post("/v1/chat/completions", {
        "messages": [{"role": "user", "content": [
            {"type": "text", "text": "Décris ce schéma."},
            {"type": "image_url", "image_url": {"url": uri}},
        ]}],
        "max_tokens": 6,
    })
    assert code == 200, data
    assert isinstance(
        data["choices"][0]["message"]["content"], str)
    srv.shutdown()
