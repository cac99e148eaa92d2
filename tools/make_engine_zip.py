"""Package search_engine_spark for ``spark-submit --py-files``.

    python tools/make_engine_zip.py engine.zip
"""

from __future__ import annotations

import os
import sys
import zipfile


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "engine.zip"
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(root, "search_engine_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    zf.write(full, os.path.relpath(full, root))
    print(out)


if __name__ == "__main__":
    main()
