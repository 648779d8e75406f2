import json, sys
sys.path.insert(0, "/root/repo")
from midi_emotion_tpu.ops import pallas_attention as pa
pa.SREL_MAX_BYTES = 0
from scripts.perf_train_configs import run

for bq, bk in [(128, 256), (128, 512), (256, 256)]:
    pa.BLOCK_Q, pa.BLOCK_K = bq, bk
    try:
        r = run(False, "full", "pallas")
    except Exception as e:
        r = dict(error=repr(e)[:200])
    r["bq"], r["bk"] = bq, bk
    print(json.dumps(r), flush=True)
