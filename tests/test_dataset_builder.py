"""Dataset-builder tests: string matching parity with the reference,
match-score reversal, dedup, feature extraction, summarize, and the full
pipeline driver over a synthetic corpus with a fake Spotify client."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

import conftest

from midi_emotion_tpu.data import dataset_builder as db
from midi_emotion_tpu.data import midi_io


def test_fix_string_and_matching():
    # only ONE trailing space is stripped (utils.py:191-192)
    assert db.fix_string("Hello_World (live) ") == "hello world "
    assert db.fix_string("Don's Song") == "don song"
    assert db.strip_artist("The Beatles feat. Someone") == "beatles "
    assert db.matching_strings_flexible("abc", "abc") == 1.0
    assert db.matching_strings_flexible("", "x") == 0.0
    assert db.matching_strings_flexible("abcd", "abXd") == 0.75


@pytest.mark.skipif(not conftest.reference_available(), reason="no reference")
def test_string_matching_parity():
    import types

    for stub in ("spotipy", "spotipy.oauth2", "pypianoroll", "pretty_midi"):
        mod = types.ModuleType(stub)
        if stub == "spotipy":
            mod.Spotify = lambda **kw: None
        if stub == "spotipy.oauth2":
            mod.SpotifyClientCredentials = lambda **kw: None
        sys.modules.setdefault(stub, mod)
    conftest.purge_reference_modules()
    sys.path.insert(0, "/root/reference/src/create_dataset")
    import utils as ref_utils

    cases = [
        ("Hello_World (live) ", "hello world!"),
        ("Don's Song", "dons song"),
        ("A", ""),
        ("Track (remix) [edit]", "track"),
    ]
    for a, b in cases:
        assert db.fix_string(a) == ref_utils.fix_string(a)
        assert db.matching_strings_flexible(a, b) == ref_utils.matching_strings_flexible(a, b)
        assert db.strip_artist(a) == ref_utils.strip_artist(a)


def test_reverse_and_best_match():
    scores = {
        "TR1": {"fileA": 0.9, "fileB": 0.5},
        "TR2": {"fileA": 0.95},
    }
    rev = db.reverse_match_scores(scores)
    assert list(rev["fileA"].keys())[0] == "TR2"  # highest first
    best = db.best_match_scores(rev)
    assert best["fileA"] == ("TR2", 0.95)
    assert best["fileB"] == ("TR1", 0.5)


def test_unique_files():
    f2h = {"a": "h1", "b": "h1", "c": "h2", "d": "empty_pianoroll"}
    best = {"b": ("TR", 0.9)}
    uniq = db.unique_files(f2h, best)
    assert sorted(uniq) == ["b", "c"]  # b beats a (match score), d dropped


def _write_roll(path, seed=0):
    rng = np.random.RandomState(seed)
    roll = np.zeros((96 * 4, 128), np.uint8)
    for _ in range(20):
        t = rng.randint(0, 96 * 4 - 10)
        roll[t : t + 8, rng.randint(30, 100)] = 100
    midi_io.save_pianoroll_npz(path, {"PIANO": roll, "BASS": roll[:, ::-1]})


def test_content_hash_dedup(tmp_path):
    a, b, c = (str(tmp_path / f"{n}.npz") for n in "abc")
    _write_roll(a, seed=1)
    _write_roll(b, seed=1)  # identical content
    _write_roll(c, seed=2)
    ha, hb, hc = map(db.pianoroll_content_hash, (a, b, c))
    assert ha == hb != hc
    bad = str(tmp_path / "bad.npz")
    np.savez(bad, junk=np.zeros(3))
    assert db.pianoroll_content_hash(bad) == "empty_pianoroll"


def test_midi_features(tmp_path):
    p = str(tmp_path / "s.npz")
    _write_roll(p)
    f = db.midi_features_from_pianoroll(p)
    assert f["n_instruments"] == 2
    assert f["tempo"] == 120.0
    assert f["note_density"] > 0 and f["duration"] > 0


def test_summarize():
    merged = {
        "f1": {
            "midi_features": {"note_density": 8.0, "n_instruments": 4,
                              "tempo": 120, "duration": 60},
            "matched_features": {
                "spotify_audio_features": {"valence": 0.7}
            },
        },
        "f2": {
            "midi_features": {"note_density": 4.0, "n_instruments": 2,
                              "tempo": 100, "duration": 30},
            "matched_features": {},
        },
        "f3": {
            "midi_features": {"note_density": 4.0, "n_instruments": 2,
                              "tempo": 100, "duration": 30},
            "matched_features": {
                "spotify_audio_features": {"valence": 0.0}  # NaN-ed
            },
        },
    }
    rows = {r["file"]: r for r in db.summarize(merged)}
    assert rows["f1"]["valence"] == 0.7
    assert rows["f1"]["note_density_per_instrument"] == 2.0
    assert rows["f1"]["is_matched"] is True
    assert rows["f2"]["is_matched"] is False and np.isnan(rows["f2"]["valence"])
    assert np.isnan(rows["f3"]["valence"])


class FakeSpotify:
    """Injectable client with the spotipy surface used by stage 3."""

    def tracks(self, ids):
        return {
            "tracks": [
                {
                    "uri": f"spotify:track:{i}",
                    "name": f"song {i}",
                    "artists": [{"name": "artist"}],
                    "album": {"name": f"album {i}"},
                }
                for i in ids
            ]
        }

    def audio_features(self, ids):
        return [{"valence": 0.42, "energy": 0.5} for _ in ids]


def test_fetch_spotify_features_resumable(tmp_path):
    csv_path = str(tmp_path / "incomplete.csv")
    t2s = {
        "TR1": {"song_id": "SO1", "title": "t1", "artist": "a", "release": "r"},
        "TR2": {"song_id": "SO2", "title": "t2", "artist": "a", "release": "r"},
    }
    s2sp = {"SO1": ["id1"], "SO2": []}
    out = db.fetch_spotify_features(t2s, s2sp, FakeSpotify(), csv_path)
    assert out["TR1"]["spotify_audio_features"]["valence"] == 0.42
    assert out["TR2"]["spotify_audio_features"] is None
    # resume: nothing re-fetched, same result
    out2 = db.fetch_spotify_features(t2s, s2sp, FakeSpotify(), csv_path)
    assert out2.keys() == out.keys()


def test_pipeline_driver(tmp_path):
    """End-to-end stages 4-9 over a synthetic corpus (no MSD/Spotify:
    stage-1/2/3 caches pre-seeded, as offline users would)."""
    data_dir = tmp_path / "corpus"
    os.makedirs(data_dir)
    for i, name in enumerate(["aaa", "bbb", "ccc"]):
        sub = data_dir / name[0]
        os.makedirs(sub, exist_ok=True)
        _write_roll(str(sub / f"{name}.npz"), seed=(0 if name == "bbb" else i))

    out_dir = tmp_path / "features"
    os.makedirs(out_dir)
    # pre-seed the network stages' caches
    json.dump(
        {"TRX": {"song_id": "SOX", "title": "t", "artist": "a", "release": "r"}},
        open(out_dir / "trackid_to_songid.json", "w"),
    )
    json.dump({"SOX": []}, open(out_dir / "songid_to_spotify.json", "w"))
    json.dump(
        {"TRX": {"spotify_audio_features": {"valence": 0.66}}},
        open(out_dir / "trackid_to_spotify_features.json", "w"),
    )
    match_scores = str(tmp_path / "match_scores.json")
    json.dump({"TRX": {"aaa": 0.8}}, open(match_scores, "w"))

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [
            sys.executable, os.path.join(os.path.dirname(conftest.__file__),
                                         "..", "create_dataset", "run.py"),
            "--match_scores", match_scores,
            "--dataset_dir", str(data_dir),
            "--out_dir", str(out_dir),
            "--n_workers", "1",
        ],
        capture_output=True, text=True, env=env,
    )
    assert r.returncode == 0, r.stderr
    csv_path = out_dir / "full_dataset_features_summarized.csv"
    assert csv_path.exists()
    import pandas as pd

    df = pd.read_csv(csv_path)
    # aaa==bbb content: deduped to the matched one (aaa); ccc unmatched
    assert set(df["file"]) == {"aaa", "ccc"}
    row = df[df["file"] == "aaa"].iloc[0]
    assert row["is_matched"] and row["valence"] == 0.66
    assert not df[df["file"] == "ccc"].iloc[0]["is_matched"]


def test_msd_metadata_via_h5(tmp_path):
    """Fabricate an MSD-summary-layout h5 (pytables-style compound tables
    under /metadata/songs and /analysis/songs) and scan it."""
    import h5py

    p = str(tmp_path / "msd.h5")
    meta_dt = np.dtype(
        [("song_id", "S18"), ("title", "S64"), ("artist_name", "S64"),
         ("release", "S64")]
    )
    ana_dt = np.dtype([("track_id", "S18")])
    with h5py.File(p, "w") as f:
        meta = np.array(
            [(b"SOAAA", b"Song A", b"Artist A", b"Album A"),
             (b"SOBBB", b"Song B", b"Artist B", b"Album B")],
            dtype=meta_dt,
        )
        ana = np.array([(b"TRAAA",), (b"TRBBB",)], dtype=ana_dt)
        f.create_dataset("/metadata/songs", data=meta)
        f.create_dataset("/analysis/songs", data=ana)

    out = db.msd_trackid_to_metadata(p, ["TRBBB"])
    assert list(out) == ["TRBBB"]
    assert out["TRBBB"]["song_id"] == "SOBBB"
    assert out["TRBBB"]["artist"] == "Artist B"
