#!/bin/bash
# Remat x ray-batch training sweep on the real chip (VERDICT r3 item 2).
# One TPU client at a time; each point is a bounded subprocess so an OOM
# or relay death can't poison the rest.  Appends JSON lines to $OUT.
set -u
OUT=${OUT:-/tmp/sweep_train.jsonl}
CFG=${CFG:-train_nerf}
ITERS_SMALL=${ITERS_SMALL:-20}
ITERS_LARGE=${ITERS_LARGE:-6}
: > "$OUT"
for rays in ${RAYS:-128 2048 8192 32768 65536 131072}; do
  iters=$ITERS_SMALL
  if [ "$rays" -ge 32768 ]; then iters=$ITERS_LARGE; fi
  for remat in 0 1; do
    echo "=== $CFG rays=$rays remat=$remat iters=$iters ===" >&2
    line=$(timeout "${POINT_BUDGET_S:-900}" env BENCH_INNER=1 \
      BENCH_CONFIG=$CFG BENCH_TRAIN_RAYS=$rays BENCH_REMAT=$remat \
      BENCH_ITERS=$iters python bench.py 2>/tmp/sweep_point_err.log \
      | tail -1)
    # validate up front: an OOM'd/killed run can emit a non-JSON (or
    # empty) last line, which must become an error record, not a lost
    # point (r4: the 16384/32768-plain OOM points vanished this way)
    if ! echo "$line" | python -c "import json,sys; json.loads(sys.stdin.read())" 2>/dev/null; then
      why=$(grep -m1 -o "Ran out of memory[^.]*\." /tmp/sweep_point_err.log || echo "failed")
      line="{\"metric\": \"$CFG\", \"error\": \"$why\"}"
      tail -3 /tmp/sweep_point_err.log >&2
    fi
    echo "$line" | python -c "
import json,sys
r=json.loads(sys.stdin.read()); r['remat_req']=$remat; r['rays_req']=$rays
print(json.dumps(r))" >> "$OUT"
    tail -1 "$OUT" >&2
  done
done
echo "sweep done -> $OUT" >&2
