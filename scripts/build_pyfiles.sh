#!/usr/bin/env bash
# Package the engine for spark-submit --py-files (the north-rule launch
# mode: multi-executor clusters receive the package as one zip).
#
#   scripts/build_pyfiles.sh
#   spark-submit --master local[32] \
#       --py-files dist/web_crawler_spark.zip bench.py
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/web_crawler_spark.zip
python - <<'EOF'
import zipfile
from pathlib import Path

with zipfile.ZipFile("dist/web_crawler_spark.zip", "w") as z:
    for p in sorted(Path("web_crawler_spark").rglob("*.py")):
        z.write(p, p.as_posix())
print("wrote dist/web_crawler_spark.zip")
EOF
