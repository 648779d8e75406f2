"""Loader throughput micro-benchmark: must sustain >= 2x the train step's
batch consumption (flagship step ~0.5 s at B=8 -> need < 0.25 s/batch)."""
import json
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
from synth_data import make_dataset
from midi_emotion_tpu.data.loader import Loader, epochs_multiprocess

root = tempfile.mkdtemp()
folder, records = make_dataset(root, n_songs=64, bars_per_song=200, seed=0)
B, L, N = 8, 1216, 30

for workers in (0, 2, 4, 8):
    loader = Loader(folder, records, L, "continuous_concat",
                    min_n_instruments=2, seed=1)
    if workers == 0:
        it = loader.epochs(B)
    else:
        it = epochs_multiprocess(loader, B, num_workers=workers, seed=3)
    next(it)  # warm caches / fork pool
    t0 = time.time()
    for _ in range(N):
        next(it)
    dt = (time.time() - t0) / N
    if workers:
        it.close()
    print(json.dumps({"workers": workers, "s_per_batch": round(dt, 4),
                      "batches_per_s": round(1 / dt, 2)}), flush=True)
