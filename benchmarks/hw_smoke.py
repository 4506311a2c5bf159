#!/usr/bin/env python
"""Hardware smoke test: every Pallas kernel compiled + verified on TPU.

The CPU test suite runs kernels in interpret mode; Mosaic compilation has
its own constraints (tiling divisibility, unsupported primitives, VMEM
limits) that only surface on hardware. This script compiles and
numerically verifies each kernel against its jnp oracle on the real chip.
Exit 0 = all good. Run it whenever a kernel changes.
"""

import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    if dev.platform != "tpu":
        print(f"not a TPU backend ({dev.platform}) — nothing to smoke")
        return 0
    print(f"device: {dev}")
    failures = []

    def check(name, fn):
        try:
            fn()
            print(f"✅ {name}")
        except Exception as e:
            failures.append(name)
            print(f"❌ {name}: {type(e).__name__}: {str(e)[:300]}")

    rng = np.random.default_rng(0)

    def fused_topk_case():
        from rag_dpo_tpu.ops import cosine_topk_reference, fused_topk

        embs = jnp.asarray(rng.standard_normal((5000, 256)), jnp.float32)
        qs = jnp.asarray(rng.standard_normal((16, 256)), jnp.float32)
        s, i = fused_topk(qs, embs, 20, interpret=False)
        rs, _ = cosine_topk_reference(qs, embs, 20)
        np.testing.assert_allclose(np.asarray(s), np.asarray(rs),
                                   atol=1e-2)
    check("fused_topk (Pallas)", fused_topk_case)

    def flash_case():
        from rag_dpo_tpu.ops import attention_reference, flash_attention

        for b, h, s, dh in ((2, 4, 256, 64), (3, 2, 640, 128)):
            q = jnp.asarray(rng.standard_normal((b, h, s, dh)),
                            jnp.float32)
            lengths = jnp.asarray([s] + [max(1, s - 37)] * (b - 1),
                                  jnp.int32)
            out = flash_attention(q, q, q, lengths, interpret=False)
            ref = attention_reference(q, q, q, lengths)
            for row, L in enumerate(np.asarray(lengths)):
                np.testing.assert_allclose(
                    np.asarray(out)[row, :, :L],
                    np.asarray(ref)[row, :, :L], atol=2e-3, rtol=2e-3)
    check("flash_attention (Pallas, batch>1, ragged)", flash_case)

    def flash_bwd_case():
        import jax.numpy as jnp

        from rag_dpo_tpu.ops.flash_attention import attention_reference
        from rag_dpo_tpu.ops.flash_attention_bwd import (
            flash_attention_fused)

        b, h, s, dh = 2, 2, 256, 64
        q = jnp.asarray(rng.standard_normal((b, h, s, dh)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((b, h, s, dh)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((b, h, s, dh)), jnp.float32)
        lens = jnp.asarray([s, s - 41], jnp.int32)
        mask = (jnp.arange(s)[None, :] < lens[:, None])[:, None, :, None]

        def loss_fused(q, k, v):
            return jnp.sum(flash_attention_fused(
                q, k, v, lens, interpret=False) ** 2 * mask)

        def loss_ref(q, k, v):
            return jnp.sum(attention_reference(q, k, v, lens) ** 2 * mask)

        gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b_ in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       atol=5e-3, rtol=5e-3)
    check("flash_attention fused backward (Pallas)", flash_bwd_case)

    def maxsim_case():
        from rag_dpo_tpu.ops import maxsim, maxsim_reference

        qv = jnp.asarray(rng.standard_normal((2, 16, 128)), jnp.float32)
        dv = jnp.asarray(rng.standard_normal((64, 32, 128)), jnp.float32)
        qm = jnp.ones((2, 16), bool)
        dm = jnp.ones((64, 32), bool)
        out = maxsim(qv, qm, dv, dm, interpret=False)
        ref = maxsim_reference(qv, qm, dv, dm)
        # MXU f32 accumulation order differs from the jnp oracle; scores
        # are O(100s), so a few 1e-3-relative outliers are expected
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=5e-3, atol=5e-3)
    check("maxsim (Pallas)", maxsim_case)

    def ell_case():
        from rag_dpo_tpu.ops import ell_topk
        from rag_dpo_tpu.ops.sparse import ell_scores_reference

        terms = jnp.asarray(rng.integers(0, 500, (4096, 16)), jnp.int32)
        imps = jnp.abs(jnp.asarray(rng.standard_normal((4096, 16)),
                                   jnp.float32))
        qt = jnp.asarray(rng.integers(0, 500, (8, 8)), jnp.int32)
        qw = jnp.abs(jnp.asarray(rng.standard_normal((8, 8)),
                                 jnp.float32))
        s, i = ell_topk(terms, imps, qt, qw, k=10, interpret=False)
        ref = np.asarray(ell_scores_reference(terms, imps, qt, qw))
        expect = np.sort(ref, axis=1)[:, ::-1][:, :10]
        np.testing.assert_allclose(np.asarray(s), expect, rtol=1e-4,
                                   atol=1e-4)
    check("ell_topk (Pallas)", ell_case)

    def postings_case():
        from rag_dpo_tpu.ops.postings import (
            PostingsIndex, postings_candidates_topk)
        from rag_dpo_tpu.ops.sparse import ell_scores_reference

        terms = rng.integers(0, 300, (8000, 12)).astype(np.int32)
        imps = np.abs(rng.standard_normal((8000, 12))).astype(np.float32)
        idx = PostingsIndex.build(terms, imps, 300, cap=256)
        qt = jnp.asarray(rng.integers(0, 300, (4, 8)), jnp.int32)
        qw = jnp.abs(jnp.asarray(rng.standard_normal((4, 8)),
                                 jnp.float32))
        s, i = postings_candidates_topk(
            *idx.device_arrays(), jnp.asarray(terms), jnp.asarray(imps),
            qt, qw, k=10)
        ref = np.asarray(ell_scores_reference(
            jnp.asarray(terms), jnp.asarray(imps), qt, qw))
        got = np.asarray(s)[:, 0]
        expect = ref.max(axis=1)
        np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-4)
    check("postings engine (XLA)", postings_case)

    def int8_case():
        from rag_dpo_tpu.ops.quantize import (
            approx_topk_int8, quantize_rows)

        e = rng.standard_normal((20_000, 256)).astype(np.float32)
        e /= np.linalg.norm(e, axis=1, keepdims=True)
        q = e[[17, 444]]
        qi, qsc = quantize_rows(jnp.asarray(q))
        ei, esc = quantize_rows(jnp.asarray(e))
        s, i = approx_topk_int8(qi, qsc, ei, esc, k=5)
        assert np.asarray(i)[0, 0] == 17 and np.asarray(i)[1, 0] == 444
    check("int8 search (XLA)", int8_case)

    def int8_refined_case():
        from rag_dpo_tpu.ops.quantize import (
            approx_topk_int8_refined, quantize_rows)

        e = rng.standard_normal((20_000, 256)).astype(np.float32)
        e /= np.linalg.norm(e, axis=1, keepdims=True)
        q = jnp.asarray(e[[17, 444]])
        ei, esc = quantize_rows(jnp.asarray(e))
        s, i = approx_topk_int8_refined(q, ei, esc,
                                        jnp.asarray(e, jnp.bfloat16), 5)
        i = np.asarray(i)
        assert i[0, 0] == 17 and i[1, 0] == 444
        # refined scores are exact dot products, not int8 approximations
        np.testing.assert_allclose(np.asarray(s)[:, 0], 1.0, atol=2e-2)
    check("int8+refine search (XLA)", int8_refined_case)

    def fused_candidates_case():
        from rag_dpo_tpu.ops import (
            cosine_topk_reference, fused_candidates_topk)

        e = jnp.asarray(rng.standard_normal((10_000, 256)), jnp.float32)
        qs = jnp.asarray(rng.standard_normal((16, 256)), jnp.float32)
        s, i = fused_candidates_topk(qs, e, 20, interpret=False)
        rs, ri = cosine_topk_reference(qs, e, 20)
        # per-segment top-2 candidates: near-exact at this density
        np.testing.assert_allclose(np.asarray(s)[:, 0],
                                   np.asarray(rs)[:, 0], atol=1e-3)
    check("fused candidates matmul+seg-topk (Pallas)",
          fused_candidates_case)

    def index_paths_case():
        from rag_dpo_tpu.index import DeviceIndex, IndexConfig

        n, d = 3000, 128
        e = rng.standard_normal((n, d)).astype(np.float32)
        e /= np.linalg.norm(e, axis=1, keepdims=True)
        terms = rng.integers(0, 200, (n, 8)).astype(np.int32)
        imps = np.abs(rng.standard_normal((n, 8))).astype(np.float32)
        metas = [{"nature": "GUIDE" if i % 2 else "DOCTRINE"}
                 for i in range(n)]
        for quant in (False, True):
            idx = DeviceIndex(IndexConfig(
                dim=d, ell_width=8, row_block=512, quantize_int8=quant,
                postings_threshold=1000))
            idx.add([f"c{i}" for i in range(n)], e, metas, terms, imps)
            s, rows = idx.search_dense(e[[42]], 5)
            assert rows[0, 0] == 42, (quant, rows[0])
            s, rows = idx.search_dense(e[[42]], 5,
                                       where={"nature": "GUIDE"})
            assert 42 not in rows[0]  # c42 is DOCTRINE
            qt = np.concatenate([terms[7, :4], [-2, -2]]).reshape(1, -1)
            qw = np.where(qt >= 0, 1.0, 0.0).astype(np.float32)
            s, rows = idx.search_sparse(qt.astype(np.int32), qw, 10)
            assert 7 in rows[0]  # postings engine (n > threshold)
    check("DeviceIndex search paths (bf16+int8+postings)",
          index_paths_case)

    print(f"\n{len(failures)} failure(s)" if failures else "\nall kernels ok")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
