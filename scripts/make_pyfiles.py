#!/usr/bin/env python
"""Package harvester_spark for spark-submit --py-files.

Produces dist/harvester_spark.zip containing the package, importable on
executors. Usage:

  python scripts/make_pyfiles.py
  spark-submit --py-files dist/harvester_spark.zip scripts/submit_build.py \\
      --input <docs parquet/iceberg> --output <index dir>
"""

from __future__ import annotations

import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def main() -> Path:
    dist = REPO / "dist"
    dist.mkdir(exist_ok=True)
    out = dist / "harvester_spark.zip"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for p in sorted((REPO / "harvester_spark").rglob("*.py")):
            zf.write(p, p.relative_to(REPO))
    print(out)
    return out


if __name__ == "__main__":
    main()
