"""Package the engine for `spark-submit --py-files`.

Produces dist/raster_join_spark.zip containing the package; a job script
then imports it normally on every executor:

    python tools/make_pyfiles.py
    spark-submit --py-files dist/raster_join_spark.zip examples/submit_job.py
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(REPO, "dist", "raster_join_spark.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    pkg = os.path.join(REPO, "raster_join_spark")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _, files in os.walk(pkg):
            for fn in files:
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(root, fn)
                rel = os.path.relpath(full, REPO)
                z.write(full, rel)
    return out_path


if __name__ == "__main__":
    print(build())
