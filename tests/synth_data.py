"""Synthetic dataset fabrication shared by loader/training tests."""

import os

import numpy as np

from midi_emotion_tpu.data.loader import save_song_shard


def make_bar(rng, n_events=40, n_instruments=4):
    """Random (event, value) bar with >= n_instruments distinct instruments."""
    ins = rng.choice(5, size=n_events) % n_instruments
    onoff = rng.randint(0, 2, size=n_events)
    ev = ins * 2 + onoff
    val = rng.randint(21, 109, size=n_events)
    # sprinkle timeshifts
    ts = rng.randint(0, n_events, size=n_events // 4)
    ev[ts] = 10
    val[ts] = rng.choice(np.arange(8, 1008, 8), size=len(ts))
    return np.stack([ev, val], axis=1).astype(np.int16)


def make_dataset(root, n_songs=12, bars_per_song=8, seed=0, discrete=False):
    """Create shards + feature records. Returns (data_folder, records)."""
    rng = np.random.RandomState(seed)
    folder = os.path.join(root, "shards")
    os.makedirs(folder, exist_ok=True)
    records = []
    v_syms = ["<V-2>", "<V-1>", "<V0>", "<V1>", "<V2>"]
    a_syms = ["<A-2>", "<A-1>", "<A0>", "<A1>", "<A2>"]
    for i in range(n_songs):
        fid = f"song{i:03d}"
        bars = [make_bar(rng) for _ in range(bars_per_song)]
        save_song_shard(os.path.join(folder, fid + ".npz"), fid, bars)
        if discrete:
            rec = {
                "file": fid,
                "valence": v_syms[i % 5],
                "arousal": a_syms[(i + 2) % 5],
            }
        else:
            rec = {
                "file": fid,
                "valence": float(rng.uniform(-1, 1)),
                "arousal": float(rng.uniform(-1, 1)),
            }
        records.append(rec)
    return folder, records


def make_feature_csv(path, n_songs=40, seed=0):
    """Fabricate a full_dataset_features_summarized.csv-like file."""
    rng = np.random.RandomState(seed)
    rows = ["file,valence,note_density_per_instrument,n_instruments,is_matched"]
    for i in range(n_songs):
        v = rng.uniform(-0.9, 0.9)
        nd = rng.uniform(0.5, 12.0)
        matched = i % 4 != 3
        rows.append(
            f"song{i:03d},{v:.4f},{nd:.4f},{rng.randint(2, 6)},{matched}"
        )
    with open(path, "w") as f:
        f.write("\n".join(rows) + "\n")
