#!/usr/bin/env python
"""Package a built index checkpoint for distribution.

Role parity with `package_cnil_db.py`: the entire built index (sharded
arrays + metadata + summaries + BM25 vocab) zips into one distributable
artifact so deployments skip the multi-hour corpus rebuild ("resume" =
"download the checkpoint", SURVEY.md §5). Counterpart:
`scripts/download_index.py`.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import pathlib
import sys
import time
import zipfile


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--index-dir", default="data/index")
    ap.add_argument("--extra", nargs="*", default=[],
                    help="additional files (summaries, configs…)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    index_dir = pathlib.Path(args.index_dir)
    if not (index_dir / "manifest.json").exists():
        print(f"no index at {index_dir}", file=sys.stderr)
        return 1
    out = pathlib.Path(
        args.out or f"ragdpo_index_{time.strftime('%Y%m%d')}.zip"
    )
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for f in sorted(index_dir.rglob("*")):
            if f.is_file():
                zf.write(f, f"index/{f.relative_to(index_dir)}")
        for extra in args.extra:
            p = pathlib.Path(extra)
            if p.exists():
                zf.write(p, f"extra/{p.name}")
    sha = hashlib.sha256(out.read_bytes()).hexdigest()
    meta = {
        "file": out.name,
        "sha256": sha,
        "size_bytes": out.stat().st_size,
        "created": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "manifest": json.loads((index_dir / "manifest.json").read_text())
        .get("n_rows"),
    }
    out.with_suffix(".zip.json").write_text(json.dumps(meta, indent=2))
    print(json.dumps(meta))
    return 0


if __name__ == "__main__":
    sys.exit(main())
