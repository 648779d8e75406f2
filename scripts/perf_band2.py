import json, sys
sys.path.insert(0, "/root/repo")
from midi_emotion_tpu.ops import pallas_attention as pa
pa.SREL_MAX_BYTES = 0  # force the band strategy
from scripts.perf_train_configs import run

for bq, bk in [(256, 256), (512, 512), (256, 1024)]:
    pa.BLOCK_Q, pa.BLOCK_K = bq, bk
    try:
        r = run(False, "full", "pallas")
    except Exception as e:
        r = dict(error=repr(e)[:200])
    r["bq"], r["bk"], r["path"] = bq, bk, "band-bf16skew"
    print(json.dumps(r), flush=True)
