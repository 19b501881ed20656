#!/usr/bin/env bash
# Local smoke of the cluster launch shape: package the engine as --py-files,
# run the KG pipeline via spark-submit on a synthesized corpus.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
CORES="${SPARK_GRAFT_CPUS:-8}"
NDOCS="${1:-500}"
WORK="${TMPDIR:-/tmp}/spark_submit_smoke"
rm -rf "$WORK" && mkdir -p "$WORK"

python3 - <<EOF
import sys; sys.path.insert(0, "$REPO")
from aiwhispr_spark.sources.synthetic import write_corpus_parquet
write_corpus_parquet("$WORK/docs.parquet", n_docs=$NDOCS)
EOF

( cd "$REPO" && zip -qr "$WORK/aiwhispr_spark.zip" aiwhispr_spark -i '*.py' )

spark-submit \
  --master "local[$CORES]" \
  --conf spark.sql.shuffle.partitions="$CORES" \
  --conf spark.ui.enabled=false \
  --py-files "$WORK/aiwhispr_spark.zip" \
  "$REPO/scripts/run_pipeline.py" \
  --input "$WORK/docs.parquet" \
  --output "$WORK/kg" \
  --run-id smoke

echo "--- resume pass (expect 0 new docs) ---"
spark-submit \
  --master "local[$CORES]" \
  --conf spark.sql.shuffle.partitions="$CORES" \
  --conf spark.ui.enabled=false \
  --py-files "$WORK/aiwhispr_spark.zip" \
  "$REPO/scripts/run_pipeline.py" \
  --input "$WORK/docs.parquet" \
  --output "$WORK/kg" \
  --resume \
  --run-id smoke-resume
