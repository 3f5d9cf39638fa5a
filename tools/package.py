"""Build the --py-files archive for spark-submit deployment.

Usage: python tools/package.py [out.zip]     (default dist/ivory_spark.zip)

Produces a zip containing the ivory_spark package, suitable for
  spark-submit --py-files dist/ivory_spark.zip tools/run_index.py ...
on a real cluster (the analogue of shipping Ivory's job jar).
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "dist", "ivory_spark.zip")
    out_dir = os.path.dirname(out)
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
    pkg = os.path.join(REPO, "ivory_spark")
    n = 0
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
                    n += 1
    print(f"wrote {out} ({n} modules)")


if __name__ == "__main__":
    main()
