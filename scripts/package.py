"""Build the spark-submit artifact: cartography_spark.zip.

The north-rule deployment shape is ``spark-submit --py-files
cartography_spark.zip job.py`` on a multi-executor cluster
(reference lifecycle analog: the ``cartography`` console script,
``cartography/cli.py``). Usage::

    python scripts/package.py [out.zip]
    spark-submit --master spark://... --py-files /tmp/cartography_spark.zip \
        -m cartography_spark.cli sync --store ... # or your own job file
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out: str) -> str:
    pkg = os.path.join(REPO, "cartography_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, REPO))
    return out


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/cartography_spark.zip"
    print(build(out))
