#!/usr/bin/env python
"""Package the engine for spark-submit --py-files: → dist/engine.zip.

`python make_pyfiles.py` (re)builds the zip; `python make_pyfiles.py --check`
exits non-zero if the zip is stale (member set or bytes differ from the tree).
The same staleness predicate is asserted by tests/test_dist_freshness.py so a
stale artifact fails the pytest gate instead of shipping old plans.
"""

from __future__ import annotations

import os
import sys
import zipfile

ROOT = os.path.dirname(os.path.abspath(__file__))
PKG = "log_anomaly_detector_spark"
ZIP_PATH = os.path.join(ROOT, "dist", "engine.zip")


def tree_members() -> dict[str, bytes]:
    """arcname -> bytes for every package .py that belongs in the zip."""
    out: dict[str, bytes] = {}
    for dirpath, _dirs, files in os.walk(os.path.join(ROOT, PKG)):
        if "__pycache__" in dirpath:
            continue
        for fn in files:
            if fn.endswith(".py"):
                full = os.path.join(dirpath, fn)
                with open(full, "rb") as f:
                    out[os.path.relpath(full, ROOT)] = f.read()
    return out


def staleness(zip_path: str = ZIP_PATH) -> list[str]:
    """Return a list of human-readable diffs between the zip and the tree.

    Empty list == fresh. Checks both directions: files missing from the zip,
    zip members with no tree counterpart, and byte mismatches.
    """
    tree = tree_members()
    if not os.path.exists(zip_path):
        return [f"missing artifact: {zip_path}"]
    diffs: list[str] = []
    with zipfile.ZipFile(zip_path) as z:
        zipped = set(z.namelist())
        for name in sorted(set(tree) - zipped):
            diffs.append(f"tree file absent from zip: {name}")
        for name in sorted(zipped - set(tree)):
            diffs.append(f"stale zip member with no tree file: {name}")
        for name in sorted(set(tree) & zipped):
            if z.read(name) != tree[name]:
                diffs.append(f"bytes differ: {name}")
    return diffs


def build() -> str:
    os.makedirs(os.path.dirname(ZIP_PATH), exist_ok=True)
    with zipfile.ZipFile(ZIP_PATH, "w", zipfile.ZIP_DEFLATED) as z:
        for arcname, data in sorted(tree_members().items()):
            z.writestr(arcname, data)
    return ZIP_PATH


def main() -> None:
    if "--check" in sys.argv[1:]:
        diffs = staleness()
        if diffs:
            print("dist/engine.zip is STALE:", file=sys.stderr)
            for d in diffs:
                print(f"  {d}", file=sys.stderr)
            sys.exit(1)
        print("dist/engine.zip is fresh")
        return
    print(build())


if __name__ == "__main__":
    main()
