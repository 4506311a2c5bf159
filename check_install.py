#!/usr/bin/env python
"""Environment validation — the reference `check_install.py` analog.

Checks: Python version, JAX backend + device inventory, required packages,
optional host parsing libraries (per-format degradation), directory
layout, LLM endpoint reachability, and a tiny end-to-end device program.
Exit code 0 = ready.
"""

from __future__ import annotations

import importlib
import os
import sys

OK, WARN, FAIL = "✅", "⚠️ ", "❌"


def check(label: str, fn):
    try:
        detail = fn()
        print(f"{OK} {label}" + (f" — {detail}" if detail else ""))
        return True
    except Warning as w:
        print(f"{WARN} {label} — {w}")
        return True
    except Exception as e:
        print(f"{FAIL} {label} — {e}")
        return False


def main() -> int:
    results = []

    def py_version():
        if sys.version_info < (3, 10):
            raise RuntimeError(f"Python ≥3.10 requis, trouvé "
                               f"{sys.version.split()[0]}")
        return sys.version.split()[0]
    results.append(check("Python", py_version))

    def jax_devices():
        import jax

        devs = jax.devices()
        plat = devs[0].platform
        if plat not in ("tpu", "cpu"):
            raise Warning(f"backend inhabituel: {plat}")
        return f"{len(devs)} × {plat} ({devs[0].device_kind})"
    results.append(check("JAX devices", jax_devices))

    for pkg in ("flax", "optax", "numpy", "transformers"):
        results.append(check(
            f"package {pkg}",
            lambda p=pkg: importlib.import_module(p).__version__,
        ))

    def parsers():
        from rag_dpo_tpu.ingest.parsing import supported_formats

        formats = supported_formats()
        missing = {"pdf", "docx", "xlsx"} - set(formats)
        if missing:
            raise Warning(
                f"formats actifs {formats}; manquants {sorted(missing)} "
                "(PyMuPDF/python-docx/openpyxl non installés)"
            )
        return ", ".join(formats)
    results.append(check("parseurs de documents", parsers))

    def device_program():
        import jax
        import jax.numpy as jnp
        import numpy as np

        from rag_dpo_tpu.ops import approx_topk

        e = jnp.asarray(np.eye(8, 128, dtype=np.float32))
        s, i = approx_topk(e[:2], e, 3)
        assert int(np.asarray(i)[0, 0]) == 0
        return "approx_topk ok"
    results.append(check("programme device", device_program))

    def llm_endpoint():
        from rag_dpo_tpu.providers import HTTPLLMProvider

        url = os.environ.get("RAGDPO_LLM_BASE_URL",
                             "http://localhost:11434")
        if HTTPLLMProvider(base_url=url).is_available():
            return url
        raise Warning(f"{url} injoignable — le FakeLLM reste disponible")
    results.append(check("endpoint LLM", llm_endpoint))

    def dirs():
        from rag_dpo_tpu.utils.paths import default_paths

        default_paths().ensure()
        return "ok"
    results.append(check("arborescence data/", dirs))

    n_fail = results.count(False)
    print(f"\n{'Prêt.' if n_fail == 0 else f'{n_fail} problème(s).'}")
    return 0 if n_fail == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
