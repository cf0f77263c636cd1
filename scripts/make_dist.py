"""Build the spark-submit --py-files archive: dist/ocr_project_spark.zip.

Usage: python scripts/make_dist.py
Then:  spark-submit --py-files dist/ocr_project_spark.zip \
           ocr_project_spark/jobs/extract.py --pages ... --results ...
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    dist = os.path.join(REPO, "dist")
    os.makedirs(dist, exist_ok=True)
    out = os.path.join(dist, "ocr_project_spark.zip")
    pkg = os.path.join(REPO, "ocr_project_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for fname in sorted(files):
                if not fname.endswith(".py"):
                    continue
                path = os.path.join(root, fname)
                zf.write(path, os.path.relpath(path, REPO))
    print(out)


if __name__ == "__main__":
    main()
