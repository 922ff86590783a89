"""Build the --py-files artifact: dist/vector_spark.zip.

The north rule's deployment mode is ``spark-submit --py-files`` on a
multi-executor cluster; this produces the exact artifact that command
ships to executors.  Smoke-tested in tests/test_spark_submit.py by
actually running bench.py under spark-submit with the zip.
"""

from __future__ import annotations

import os
import zipfile


def build(out_path: str = "dist/vector_spark.zip") -> str:
    root = os.path.dirname(os.path.abspath(__file__))
    os.makedirs(os.path.join(root, "dist"), exist_ok=True)
    out = os.path.join(root, out_path)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        pkg = os.path.join(root, "vector_spark")
        for dirpath, _dirnames, filenames in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for fn in filenames:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    zf.write(full, os.path.relpath(full, root))
    return out


if __name__ == "__main__":
    print(build())
