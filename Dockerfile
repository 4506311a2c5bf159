# rag-dpo-tpu application image (CPU/TPU-host flavor).
#
# The reference ships a CPU app image + GPU Ollama sidecar
# (docker-compose); here one image serves both the CPU fake-mesh and a
# TPU VM host (jax[tpu] resolves libtpu on Cloud TPU). The generator LLM
# remains an external Ollama-compatible endpoint (RAGDPO_LLM_BASE_URL).

FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app

COPY requirements.txt .
RUN pip install --no-cache-dir -r requirements.txt

COPY rag_dpo_tpu/ rag_dpo_tpu/
COPY native/ native/
COPY scripts/ scripts/
COPY test_rag_cli.py check_install.py bench.py ./

# pre-build the native ingestion runtime
RUN python -c "from rag_dpo_tpu import native; assert native.is_available(), native.build_error()"

ENV RAGDPO_TPU_ROOT=/app \
    RAGDPO_LLM_BASE_URL=http://ollama:11434

# download a packaged index at startup when none is mounted:
#   docker run -e RAGDPO_INDEX_URL=https://…/ragdpo_index.zip …
COPY scripts/entrypoint.sh /entrypoint.sh
ENTRYPOINT ["/bin/sh", "/entrypoint.sh"]
# web UI by default (reference parity: `streamlit run app.py`); swap CMD
# for `python -m rag_dpo_tpu.app.cli chat` for a terminal front-end
EXPOSE 8501
CMD ["python", "-m", "streamlit", "run", \
     "rag_dpo_tpu/app/streamlit_app.py", \
     "--server.headless", "true", "--server.address", "0.0.0.0"]
