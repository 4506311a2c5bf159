#!/bin/sh
# Auto-restore the index checkpoint when absent (reference entrypoint.sh
# analog: skip the multi-hour rebuild by downloading the packaged index).
set -e

if [ ! -f /app/data/index/manifest.json ] && [ -n "$RAGDPO_INDEX_URL" ]; then
    echo "no index found — downloading $RAGDPO_INDEX_URL"
    python scripts/download_index.py "$RAGDPO_INDEX_URL" \
        --dest /app/data/index || echo "index download failed; continuing"
fi

exec "$@"
