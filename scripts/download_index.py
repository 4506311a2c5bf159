#!/usr/bin/env python
"""Download + install a packaged index checkpoint.

Role parity with `scripts/download_cnil_db.py` + `entrypoint.sh`: fetch
the release artifact if no local index exists, verify its SHA-256 against
the sidecar metadata, unzip into the data directory. Also accepts a local
zip path (offline installs).
"""

from __future__ import annotations

import argparse
import hashlib
import json
import pathlib
import sys
import urllib.request
import zipfile


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("source", help="URL or local path of the index zip")
    ap.add_argument("--dest", default="data/index")
    ap.add_argument("--sha256", help="expected digest (else sidecar .json)")
    ap.add_argument("--force", action="store_true")
    args = ap.parse_args()

    dest = pathlib.Path(args.dest)
    if (dest / "manifest.json").exists() and not args.force:
        print(f"index already present at {dest} (use --force to replace)")
        return 0

    if args.source.startswith(("http://", "https://")):
        tmp = pathlib.Path("/tmp/ragdpo_index.zip")
        print(f"downloading {args.source} …")
        urllib.request.urlretrieve(args.source, tmp)
        expected = args.sha256
        if expected is None:
            try:
                with urllib.request.urlopen(args.source + ".json",
                                            timeout=10) as r:
                    expected = json.loads(r.read()).get("sha256")
            except Exception:
                pass
        zip_path = tmp
    else:
        zip_path = pathlib.Path(args.source)
        expected = args.sha256
        sidecar = zip_path.with_suffix(".zip.json")
        if expected is None and sidecar.exists():
            expected = json.loads(sidecar.read_text()).get("sha256")

    if expected:
        got = hashlib.sha256(zip_path.read_bytes()).hexdigest()
        if got != expected:
            print(f"sha256 mismatch: {got} != {expected}",
                  file=sys.stderr)
            return 1

    dest.mkdir(parents=True, exist_ok=True)
    with zipfile.ZipFile(zip_path) as zf:
        for name in zf.namelist():
            if name.startswith("index/"):
                target = dest / name[len("index/"):]
                target.parent.mkdir(parents=True, exist_ok=True)
                target.write_bytes(zf.read(name))
    print(f"index installed → {dest}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
