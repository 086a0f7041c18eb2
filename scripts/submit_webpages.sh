#!/usr/bin/env bash
# Package the library and run the flagship web-pages sketch job the way
# it runs on a real cluster: spark-submit --py-files (north_rule).
# Usage: scripts/submit_webpages.sh [n_docs] [checkpoint_dir] [master]
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
N_DOCS="${1:-1000000}"
CKPT="${2:-/tmp/webpages_ckpt}"
MASTER="${3:-local[${SPARK_GRAFT_CPUS:-32}]}"
ZIP="$(mktemp -d)/tdigest_spark.zip"

python - "$REPO" "$ZIP" <<'EOF'
import os, sys, zipfile
repo, dest = sys.argv[1], sys.argv[2]
os.chdir(repo)
with zipfile.ZipFile(dest, "w") as z:
    for root, _, files in os.walk("tdigest_spark"):
        for f in files:
            if f.endswith(".py"):
                z.write(os.path.join(root, f))
EOF

exec spark-submit \
  --master "$MASTER" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.shuffle.partitions=32 \
  --conf spark.ui.showConsoleProgress=false \
  --py-files "$ZIP" \
  "$REPO/tdigest_spark/jobs/webpages.py" \
  --n-docs "$N_DOCS" --checkpoint-dir "$CKPT" "${@:4}"
