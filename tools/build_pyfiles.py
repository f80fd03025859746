"""Package ``webcrawler_spark`` into a zip for ``spark-submit --py-files``.

The north_rule deployment shape is ``spark-submit --py-files`` on a
multi-executor cluster; this is the packaging half. Usage:

    python tools/build_pyfiles.py dist/webcrawler_spark.zip
    spark-submit --master <url> --py-files dist/webcrawler_spark.zip \
        tools/submit_crawl.py --store /path/store ...

Only ``.py`` sources are shipped (the engine has no data files); the zip
root holds the package directory itself so ``import webcrawler_spark``
resolves on driver and executors with no install step.
"""

from __future__ import annotations

import os
import sys
import zipfile


def build(out_path: str, repo_root: str | None = None) -> str:
    repo_root = repo_root or os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    )
    pkg = os.path.join(repo_root, "webcrawler_spark")
    out_dir = os.path.dirname(os.path.abspath(out_path))
    os.makedirs(out_dir, exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, dirnames, filenames in sorted(os.walk(pkg)):
            dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
            for f in sorted(filenames):
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, repo_root))
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "dist/webcrawler_spark.zip"
    print(build(out))
