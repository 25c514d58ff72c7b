"""Build the --py-files zip for spark-submit deployment.

Replaces the reference's engine-zip distribution (``routes.py:330-370``
zips model dirs + config.ini for clients to download): here the unit
of deployment is the pure-Python package itself; model artifacts (the
glyph templates) are module constants inside it, so one zip carries
everything an executor needs.

Usage: python scripts/package_pyfiles.py [dist_dir]
"""

from __future__ import annotations

import os
import sys
import zipfile

PKG = "pero_ocr_api_spark"


def build(dist_dir: str = "dist") -> str:
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.makedirs(os.path.join(repo_root, dist_dir), exist_ok=True)
    out = os.path.join(repo_root, dist_dir, f"{PKG}.zip")
    src = os.path.join(repo_root, PKG)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(src):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                rel = os.path.relpath(full, repo_root)
                zf.write(full, rel)
    return out


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else "dist"))
