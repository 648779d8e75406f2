import json, sys
sys.path.insert(0, "/root/repo")
from midi_emotion_tpu.ops import pallas_attention as pa
from scripts.perf_train_configs import run

for bq, bk in [(256, 256), (512, 512), (256, 512)]:
    pa.BLOCK_Q, pa.BLOCK_K = bq, bk
    try:
        r = run(False, "full", "pallas")
    except Exception as e:
        r = dict(error=repr(e)[:300])
    r["bq"], r["bk"], r["path"] = bq, bk, "xla-srel"
    print(json.dumps(r), flush=True)
