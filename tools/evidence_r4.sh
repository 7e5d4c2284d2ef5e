#!/bin/bash
# Round-4 evidence runs (VERDICT r3 next #3): execute every self-reported
# r3 claim's tool with output checked into perf_logs/. Run AFTER bench.py
# has exited (one TPU client at a time). Each log starts with the exact
# command.
set -u
cd /root/repo
L=perf_logs

run() {
  local name="$1"; shift
  echo "== $name: $*" | tee "$L/$name.log"
  ( "$@" ) >> "$L/$name.log" 2>&1
  echo "== rc=$? $(date -u +%H:%M:%S)" >> "$L/$name.log"
}

# Wide-path training on TPU vs CPU — bit-identity of per-step records.
run wide_check_cpu env JAX_PLATFORMS=cpu python3 tools/wide_tpu_check.py 24
run wide_check_tpu env -u JAX_PLATFORMS python3 tools/wide_tpu_check.py 24
run wide_check_cpu_bpe env JAX_PLATFORMS=cpu python3 tools/wide_tpu_check.py 24 --bpe
run wide_check_tpu_bpe env -u JAX_PLATFORMS python3 tools/wide_tpu_check.py 24 --bpe

# Training-step anatomy (feeds the WP-vs-BPE gap work).
run train_anatomy_tpu env -u JAX_PLATFORMS python3 tools/train_anatomy.py

# Warm train-5K@1000 wall clock, skip-compaction on vs off (r4).
run wp_gap_skip_tpu env -u JAX_PLATFORMS SWT_SKIP_COMPACT=12 \
  python3 tools/wp_gap_probe.py
run wp_gap_noskip_tpu env -u JAX_PLATFORMS SWT_SKIP_COMPACT=0 \
  python3 tools/wp_gap_probe.py

# Encode crossover: link budget + per-slice scan costs, both backends.
run encode_crossover_cpu env JAX_PLATFORMS=cpu python3 tools/encode_crossover.py
run encode_crossover_tpu env -u JAX_PLATFORMS python3 tools/encode_crossover.py

# Scale runs: 8k + 32k training on the 85k corpus (now anchor-gated).
run scale_bench_tpu env -u JAX_PLATFORMS python3 tools/scale_bench.py

# Mesh encode on 8 virtual CPU devices (CPU-only; no TPU involvement).
run scale_bench_mesh env JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python3 tools/scale_bench.py --mesh-encode

echo "all evidence runs complete"
