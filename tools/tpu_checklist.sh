#!/usr/bin/env bash
# Run as soon as the TPU tunnel is live to (re)generate every hardware
# artifact of this round in dependency order.  Each step is independent;
# rerun any that fail.  Expect ~20-40s first-compile latency per program.
set -x
cd "$(dirname "$0")/.."

# 0. tunnel sanity (hangs if the tunnel is down — bail early)
timeout 120 python -c "import jax; print(jax.devices())" || exit 1

# 1. headline bench: step ratio vs AdamW, Q-update MFU, wide-1280 datapoint,
#    share_fit_apply p=1.0 datapoint (detail.psgd_p1.0_shared_ratio)
timeout 2400 python bench.py

# 2. NS-kernel width sweep (results/ns_widths_bf16.json)
timeout 2400 python tools/bench_ns_widths.py

# 3. GPT-2 350M proportions bench (results/gpt2_medium_bench.json)
timeout 2400 python bench.py --medium

# 4. TPU test profile (Pallas kernel parity + on-TPU sharded-path tests)
timeout 3600 env PSGD_TEST_TPU=1 python -m pytest \
  tests/test_pallas_kernels.py tests/test_tpu_sharded_paths.py -q

# 5. convergence on the committed real-text corpus (results/gpt2_convergence.json)
#    3000 steps is the committed r4 artifact (PSGD val 0.55x, quality at 5%
#    of steps); use 1000 for a quick check
timeout 5400 python bench.py --convergence 3000

# 6. Q-update overhead attribution (stderr table; no artifact)
timeout 2400 python tools/ablate_q_overhead.py
