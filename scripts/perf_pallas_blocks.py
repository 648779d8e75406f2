"""Pallas flash block-size sweep on the real chip (solo process)."""
import json
import sys

sys.path.insert(0, "/root/repo")
from midi_emotion_tpu.ops import pallas_attention as pa
from scripts.perf_train_configs import run

for bq, bk in [(256, 256), (512, 512), (256, 512), (512, 256)]:
    pa.BLOCK_Q, pa.BLOCK_K = bq, bk
    for remat, policy in [(False, "full"), (True, "dots")]:
        try:
            r = run(remat, policy, "pallas")
        except Exception as e:
            r = dict(remat=remat, policy=policy, error=repr(e)[:300])
        r["bq"], r["bk"] = bq, bk
        print(json.dumps(r), flush=True)
