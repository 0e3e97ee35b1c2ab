#!/bin/bash
# Relation-training launch wrapper (reference scripts/rel_train.sh).
#
# TPU-native launch model: ONE process per host; jax.distributed picks up
# the TPU pod topology from the environment (no torch.distributed.launch /
# nproc_per_node — all chips on the host belong to this process, and
# multi-host pods run this same script on every worker, e.g. via
#   gcloud compute tpus tpu-vm ssh $TPU --worker=all --command=".../rel_train.sh").
set -euo pipefail
cd "$(dirname "$0")/.."

exp_name="${EXPERIMENT_NAME:-veto_vg_predcls}"
out_dir="${OUTPUT_DIR:-runs/${exp_name}-$(date +%Y-%m-%d_%H%M)}"

python tools/relation_train_net.py \
    --config "configs/veto_vg_predcls.yaml" \
    output_dir="$out_dir" \
    solver.val_period=2000 \
    solver.checkpoint_period=2000 \
    "$@"
