#!/usr/bin/env bash
# North-rule scaling evidence in the PRESCRIBED deployment shape: the same
# spark-submit --py-files job at N and 4N parallelism on the same corpus.
#
# No real cluster exists in this sandbox, so N and 4N executors are stood in
# by local[N] and local[4N] (see BASELINE.md "Why N=2" — 32 vCPUs are 16
# physical cores + SMT, so 2→8 is the faithful core-scaling pair).  Each
# measurement is its own spark-submit (one JVM per measurement); docs/s uses
# the pipeline-only seconds printed by run_pipeline.py (KG_DONE), not JVM
# startup.
#
# Usage: scripts/scaling_submit.sh [n_docs] [N]     (defaults 30000, 2)
# Prints one JSON line: throughputs at N and 4N plus the efficiency.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
NDOCS="${1:-30000}"
N="${2:-2}"
WORK="${TMPDIR:-/tmp}/scaling_submit"
rm -rf "$WORK" && mkdir -p "$WORK"

python3 - <<EOF
import sys; sys.path.insert(0, "$REPO")
from tools.stress_pipeline import generate_corpus
# parallel shard writer (serial write_corpus_parquet costs ~9 min at 1M docs)
generate_corpus("$WORK/docs.parquet", $NDOCS, n_entities=200,
                n_files=64 if $NDOCS >= 4000 else 1, workers=16)
EOF

( cd "$REPO" && zip -qr "$WORK/aiwhispr_spark.zip" aiwhispr_spark -i '*.py' )

run_at() {
  local cores="$1"
  spark-submit \
    --master "local[$cores]" \
    --conf spark.sql.shuffle.partitions="$cores" \
    --conf spark.ui.enabled=false \
    --py-files "$WORK/aiwhispr_spark.zip" \
    "$REPO/scripts/run_pipeline.py" \
    --input "$WORK/docs.parquet" \
    --output "$WORK/kg_$cores" \
    --partitions "$cores" \
    --run-id "scale$cores" 2>/dev/null \
    | grep -o 'seconds=[0-9.]*' | cut -d= -f2
}

S_N="$(run_at "$N")"
S_4N="$(run_at $((N * 4)))"

python3 - <<EOF
import json
n_docs, n = $NDOCS, $N
s_n, s_4n = float("$S_N"), float("$S_4N")
t_n, t_4n = n_docs / s_n, n_docs / s_4n
print(json.dumps({
    "deploy_shape": "spark-submit --py-files",
    "n_docs": n_docs,
    f"docs_per_sec_local{n}": round(t_n, 1),
    f"docs_per_sec_local{n * 4}": round(t_4n, 1),
    "scaling_efficiency": round(t_4n / (4 * t_n), 3),
}))
EOF
