#!/bin/bash
# Round-3 final measurement pass (run on the chip, ~30-50 min with compiles):
# roofline -> bench -> quality -> full 2,760-frame replay with kill+resume.
# Each step appends to /tmp/round3_measure.log; artifacts land at the repo root.
set -x
cd "$(dirname "$0")/.."
python benchmarks/roofline.py            2>&1 | tail -2
python bench.py                          2>&1 | tail -1 | tee /tmp/bench_final.json
python bench.py --quality                2>&1 | tail -1 | tee /tmp/quality_final.json
rm -rf runs/replay_a runs/replay_b
python benchmarks/run_replay.py --frames 2760 --round 3 2>&1 | tail -1
