#!/bin/bash
# Relation-evaluation launch wrapper (reference scripts/rel_test.sh).
# Reuses the config the training run dumped into its output dir, so a
# finished run evaluates with exactly its training-time settings:
#   scripts/rel_test.sh runs/my-experiment [extra dotted overrides...]
set -euo pipefail
cd "$(dirname "$0")/.."

archive_dir="${1:?usage: rel_test.sh <output_dir-of-a-training-run> [overrides...]}"
shift || true

python tools/relation_test_net.py \
    --config "$archive_dir/config.json" \
    output_dir="$archive_dir" \
    test.ims_per_batch=1 \
    "$@"
