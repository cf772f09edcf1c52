#!/bin/sh
# Run the 6-arm convergence sweep ONE PROCESS PER ARM, then merge.
# A single process running all six arms leaks ~15-20 GB of host memory per
# arm through the axon client and gets OOM-killed around arm 3; per-arm
# processes sidestep the leak and make the sweep resumable (existing arm
# partials under results/_sweep_arms/ are reused).
# Usage: tools/run_convergence_sweep.sh [steps]
set -e
STEPS=${1:-3000}
cd "$(dirname "$0")/.."
# order: PSGD first, then AdamW strongest-first — if the run is cut short,
# the merge still has the arms that matter most (it accepts a subset and
# records the actual best-of-N)
for arm in psgd_lr0.00025_fixed psgd_lr0.00025_cosine adamw_lr0.0003_fixed \
           adamw_lr0.0003_cosine adamw_lr0.001_fixed adamw_lr0.001_cosine; do
  echo "=== arm: $arm" >&2
  python bench.py --convergence "$STEPS" --sweep --arm="$arm"
done
python bench.py --convergence "$STEPS" --sweep --merge
