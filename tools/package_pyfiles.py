"""Build the ``--py-files`` archive for cluster submission.

``spark-submit --py-files dist/crawler4j_spark.zip`` ships the package to
the driver AND every executor (it lands on ``sys.path`` in the Python
workers, which is what makes the pandas-UDF kernels importable cluster
side). The archive is deterministic — sorted member order, fixed
timestamps — so re-building from the same tree is byte-identical and a
deploy artifact can be content-addressed.

Usage::

    python tools/package_pyfiles.py [-o dist/crawler4j_spark.zip]
"""

from __future__ import annotations

import argparse
import os
import zipfile

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: Fixed member timestamp (the zip epoch) → byte-identical rebuilds.
_EPOCH = (1980, 1, 1, 0, 0, 0)


def build(out_path: str | None = None, root: str = REPO_ROOT) -> str:
    """Zip ``crawler4j_spark/`` into *out_path* and return the path."""
    if out_path is None:
        out_path = os.path.join(root, "dist", "crawler4j_spark.zip")
    pkg = os.path.join(root, "crawler4j_spark")
    members = []
    for dirpath, dirnames, filenames in os.walk(pkg):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for fn in sorted(filenames):
            if fn.endswith(".py"):
                full = os.path.join(dirpath, fn)
                members.append((os.path.relpath(full, root), full))
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for arcname, full in members:
            with open(full, "rb") as f:
                data = f.read()
            info = zipfile.ZipInfo(arcname, date_time=_EPOCH)
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            zf.writestr(info, data)
    return out_path


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-o", "--out", default=None,
                    help="output zip path (default dist/crawler4j_spark.zip)")
    args = ap.parse_args()
    path = build(args.out)
    print(path)


if __name__ == "__main__":
    main()
