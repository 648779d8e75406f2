"""Per-kernel batch-per-block (bpb) sweep at the flagship shape.

A uniform bpb=2 regressed the train step (266 vs 249 ms); this isolates
which kernel(s), if any, benefit. Run solo on the TPU.
"""

import json
import sys

sys.path.insert(0, "/root/repo")
import jax

from midi_emotion_tpu.ops import pallas_attention as pa
from perf_bwd_breakdown import build, timed

if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    for which in ("fwd", "dkdv", "dqde"):
        for bpb in (1, 2, 4):
            pa.BATCH_PER_BLOCK = {"fwd": 1, "dqde": 1, "dkdv": 1}
            pa.BATCH_PER_BLOCK[which] = bpb
            try:
                ms = timed(build(which))
                r = {"kernel": which, "bpb": bpb, "ms_per_layer": round(ms, 3)}
            except Exception as e:
                r = {"kernel": which, "bpb": bpb, "error": repr(e)[:160]}
            print(json.dumps(r), flush=True)
