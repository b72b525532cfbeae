"""Build dist/gondar_spark.zip for `spark-submit --py-files` (north rule:
the job launches via spark-submit on a multi-executor cluster — executors
must be able to import gondar_spark without a shared filesystem).

Usage: python tools/package_pyfiles.py [out_zip]
Then:  spark-submit --py-files dist/gondar_spark.zip main.py ...
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out: str) -> str:
    os.makedirs(os.path.dirname(out), exist_ok=True)
    pkg = os.path.join(REPO, "gondar_spark")
    # deterministic archive: sorted entries, fixed timestamp
    entries = []
    for root, _dirs, files in os.walk(pkg):
        for f in files:
            if f.endswith(".py"):
                full = os.path.join(root, f)
                entries.append((os.path.relpath(full, REPO), full))
    entries.sort()
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for arcname, full in entries:
            info = zipfile.ZipInfo(arcname, date_time=(2020, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            with open(full, "rb") as fh:
                z.writestr(info, fh.read())
    return out


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "dist", "gondar_spark.zip")
    path = build(out)
    n = len(zipfile.ZipFile(path).namelist())
    print(f"wrote {path} ({n} modules)")


if __name__ == "__main__":
    main()
