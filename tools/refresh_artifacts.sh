#!/bin/bash
# Regenerate every committed perf artifact on the real chip, in value order.
# Each stage logs to /tmp/r5_<stage>.log and failures don't stop later stages.
# After the BENCH_* stages, tools/update_readme.py rewrites the README
# performance table from the refreshed JSONs (tests/test_readme_sync.py
# enforces the invariant).
set -u
cd "$(dirname "$0")/.."

run() {
  name=$1; shift
  echo "=== stage $name: $* ($(date +%H:%M:%S))"
  timeout "${STAGE_TIMEOUT:-1800}" "$@" > "/tmp/r5_${name}.log" 2>&1
  echo "=== stage $name done rc=$? ($(date +%H:%M:%S))"
}

run roofline  python tools/roofline.py
run attrib    python tools/kernel_lab5.py --attrib
run scaling   python tools/scaling.py
run commcheck python tools/comm_check.py
run profile   python tools/profile_fit.py
run suite     python bench.py --suite
run flagship  python bench.py --flagship
run scale     python bench.py --scale
STAGE_TIMEOUT=7200 run stream python bench.py --stream
# own process: fresh RSS budget for the axon transfer-buffer leak
STAGE_TIMEOUT=14400 run streamfit python bench.py --stream-fit80
run readme    python tools/update_readme.py
run tputests  env MENDELIHT_TEST_PLATFORM=tpu python -m pytest \
    tests/test_pallas.py -q -k on_tpu
echo "ALL DONE $(date)"
