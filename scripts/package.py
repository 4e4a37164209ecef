"""Build dist/engine.zip for spark-submit --py-files (north_rule launch shape):

    python scripts/package.py
    spark-submit --py-files dist/engine.zip scripts/build_index.py --out ...
"""

from __future__ import annotations

import zipfile
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]


def main() -> None:
    dist = ROOT / "dist"
    dist.mkdir(exist_ok=True)
    out = dist / "engine.zip"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for py in sorted((ROOT / "ucuddle_search_engine_spark").rglob("*.py")):
            z.write(py, py.relative_to(ROOT))
    print(f"wrote {out} ({out.stat().st_size} bytes)")


if __name__ == "__main__":
    main()
