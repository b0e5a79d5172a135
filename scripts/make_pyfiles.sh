#!/usr/bin/env bash
# Build the --py-files zip for spark-submit.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/smart_geocubes_spark.zip
python - <<'EOF'
import zipfile, pathlib
root = pathlib.Path(".")
with zipfile.ZipFile("dist/smart_geocubes_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for p in sorted(root.glob("smart_geocubes_spark/**/*.py")):
        z.write(p, p.as_posix())
print("wrote dist/smart_geocubes_spark.zip")
EOF
