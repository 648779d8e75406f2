"""Re-time the top train configs with 10 pipelined steps (the remote tunnel
adds ~100-300 ms per *call* when only 3 steps amortize it)."""
import json, sys
sys.path.insert(0, "/root/repo")
from midi_emotion_tpu.ops import pallas_attention as pa
from scripts.perf_train_configs import run

for tag, remat, policy, attn, bq, bk in [
    ("pallas256", False, "full", "pallas", 256, 256),
    ("pallas512", False, "full", "pallas", 512, 512),
    ("xla-dots", True, "dots", "xla", 256, 256),
]:
    pa.BLOCK_Q, pa.BLOCK_K = bq, bk
    r = run(remat, policy, attn)
    r["tag"] = tag
    print(json.dumps(r), flush=True)
