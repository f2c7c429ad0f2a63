"""Build the ``--py-files`` artifact for spark-submit.

Usage::

    python tools/build_pyfiles.py [out.zip]        # default dist/polycheck_spark.zip
    spark-submit --master yarn --py-files dist/polycheck_spark.zip \
        polycheck_spark/jobs/pip_join_job.py --pages ... --buckets ... --out ...

The zip carries the package rooted at ``polycheck_spark/`` so executors can
``import polycheck_spark`` without installing the wheel — the standard
cluster-submit path (cf. jobs/pip_join_job.py docstring).  ``__pycache__``
and test artifacts are excluded; the archive is deterministic (sorted
entries, zeroed timestamps) so repeated builds are byte-identical and
cacheable by the cluster's file distributor.
"""

from __future__ import annotations

import os
import sys
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str) -> str:
    pkg = os.path.join(ROOT, "polycheck_spark")
    entries = []
    for dirpath, dirnames, filenames in os.walk(pkg):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for fn in sorted(filenames):
            if fn.endswith((".pyc", ".pyo")):
                continue
            full = os.path.join(dirpath, fn)
            entries.append((full, os.path.relpath(full, ROOT)))
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for full, rel in entries:
            with open(full, "rb") as f:
                data = f.read()
            info = zipfile.ZipInfo(rel, date_time=(1980, 1, 1, 0, 0, 0))
            info.external_attr = 0o644 << 16
            z.writestr(info, data)
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(ROOT, "dist", "polycheck_spark.zip")
    path = build(out)
    n = len(zipfile.ZipFile(path).namelist())
    print(f"{path}: {n} files")
