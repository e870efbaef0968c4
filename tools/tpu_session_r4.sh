#!/bin/bash
# Round-4 TPU session runbook — run when the axon tunnel is healthy.
# Ordered so the riskiest step (soak's mid-run SIGKILL, which can wedge the
# tunnel — TPU_NOTES quirk #5) comes LAST.  Each step is independently
# resumable; re-run the script and completed artifacts are skipped by hand.
set -x
cd "$(dirname "$0")/.."

# 0. health probe (fail fast instead of wedging the session)
timeout 120 python -c "import jax; print(jax.devices())" || exit 3

# 1. bench cold (compiles + AOT-serializes all four programs) then warm
python bench.py 2>&1 | tail -3
python bench.py 2>&1 | tail -2          # warm: should start in seconds

# 2. multichip dryrun exactly as the driver invokes it
timeout 900 python -c "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"

# 3. TPU corpus artifact at serving scale: ~300 audio-seconds, fast-int8,
#    AOT warm start, steady/warmup split
python tools/eval_corpus.py --full-report --synthetic 120 --allow_random \
  --mode fast-int8 --batch_size 8 --output_dir /tmp/tpu_corpus \
  --report_json /tmp/tpu_corpus/report.json 2>&1 | tail -20
# -> copy into docs/CORPUS_REPORT_TPU.json with a provenance note

# 4. MFU lever A/B (stage split first, then candidates) — interactive

# 5. LAST: full-size soak with mid-run kill + resume (~1-1.5 h)
python experiments/codec/soak.py --output_folder /tmp/soak_full --steps 300 \
  --aot_dir .aot_cache/gan --batch_size 8 --segment_seconds 1.0 2>&1 | tail -20
# -> copy /tmp/soak_full/SOAK_REPORT.json into docs/
