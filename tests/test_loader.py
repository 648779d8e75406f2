"""Data pipeline tests: shard round-trip, stochastic training policy
invariants, exhaustive chunking, generations loader, feature preprocessing."""

import os

import numpy as np
import pytest

import conftest
from synth_data import make_dataset, make_feature_csv

from midi_emotion_tpu.data.loader import (
    Loader,
    LoaderExhaustive,
    LoaderGenerations,
    filter_collate,
    load_song_shard,
    save_song_shard,
)
from midi_emotion_tpu.data.features import preprocess_features
from midi_emotion_tpu.vocab import CLS, DEFAULT_VOCAB


def test_shard_roundtrip(tmp_path):
    bars = [
        np.array([[1, 60], [10, 8], [0, 60]], np.int16),
        np.array([[5, 40], [4, 40]], np.int16),
    ]
    p = str(tmp_path / "s.npz")
    save_song_shard(p, "s", bars)
    back = load_song_shard(p)
    assert len(back) == 2
    np.testing.assert_array_equal(back[0], bars[0])
    np.testing.assert_array_equal(back[1], bars[1])


@pytest.mark.parametrize("mode", ["none", "continuous_concat", "continuous_token"])
def test_loader_shapes(tmp_path, mode):
    folder, records = make_dataset(str(tmp_path))
    L = 64
    loader = Loader(folder, records, L, mode, min_n_instruments=2, seed=1)
    batch = next(loader.batches(4))
    if mode == "continuous_token":
        assert batch["input"].shape == (4, L - 2)
        assert batch["target"].shape == (4, L)
        assert (batch["target"][:, :2] == 0).all()  # left pad
    else:
        assert batch["input"].shape == (4, L)
        assert batch["target"].shape == (4, L)
    if mode == "none":
        assert np.isnan(batch["condition"]).all()
    else:
        assert np.isfinite(batch["condition"]).all()
    # target is input shifted by one where not padded
    if mode != "continuous_token":
        inp, tgt = batch["input"], batch["target"]
        live = (inp[:, 1:] != 0)
        np.testing.assert_array_equal(
            tgt[:, :-1][live], inp[:, 1:][live]
        )


def test_loader_discrete(tmp_path):
    folder, records = make_dataset(str(tmp_path), discrete=True)
    loader = Loader(folder, records, 64, "discrete_token", min_n_instruments=2, seed=2)
    assert loader.get_vocab_len() > 1007
    maps = loader.get_maps()
    assert "<V-2>" in maps["tuple2idx"]
    batch = next(loader.batches(4))
    assert batch["input"].shape == (4, 64)
    # when a sequence starts at a bar, the first two tokens are emotion ids
    starts = batch["input"][:, 0] >= 1007
    # over several batches at bar_start_prob=0.5 both cases appear
    seen_cond = starts.any()
    for _ in range(5):
        b = next(loader.batches(4))
        seen_cond = seen_cond or (b["input"][:, 0] >= 1007).any()
    assert seen_cond


def test_loader_regression(tmp_path):
    folder, records = make_dataset(str(tmp_path))
    loader = Loader(
        folder, records, 64, "none", regression=True, min_n_instruments=2, seed=3
    )
    cls_id = loader.vocab.extra_id(CLS)
    b = next(loader.batches(4))
    assert "target" not in b
    assert (b["input"][:, 0] == cls_id).all()
    assert np.isfinite(b["condition"]).all()


def test_loader_overfit_returns_same(tmp_path):
    folder, records = make_dataset(str(tmp_path))
    loader = Loader(folder, records, 32, "none", overfit=True, min_n_instruments=2)
    a = loader.sample(0)
    b = loader.sample(5)
    np.testing.assert_array_equal(a[0], b[0])


def test_loader_min_instruments_rejection(tmp_path):
    folder, records = make_dataset(str(tmp_path))
    loader = Loader(folder, records, 32, "none", min_n_instruments=5, n_try=2, seed=0)
    # songs only have 4 instruments -> every draw fails
    assert loader.sample(0) is None
    with pytest.raises(RuntimeError):
        loader.collect([0, 1], max_redraw=4)


def test_exhaustive_loader(tmp_path):
    folder, records = make_dataset(str(tmp_path))
    le = LoaderExhaustive(folder, records, 32, "continuous_concat")
    assert len(le) > 0
    b = next(le.batches(2))
    assert b["input"].shape == (2, 32)
    assert b["target"].shape == (2, 32)
    # deterministic: same chunks again
    le2 = LoaderExhaustive(folder, records, 32, "continuous_concat")
    b2 = next(le2.batches(2))
    np.testing.assert_array_equal(b["input"], b2["input"])


def test_generations_loader(tmp_path):
    gen = tmp_path / "gen"
    os.makedirs(gen)
    rng = np.random.RandomState(0)
    ids = rng.randint(2, 1007, size=300).astype(np.int32)
    np.save(str(gen / "inds_7_0_V08_A-06.npy"), ids)
    lg = LoaderGenerations(str(gen), 32)
    assert len(lg) > 0
    b = next(lg.batches(2))
    assert b["input"].shape == (2, 32)
    cls_id = lg.vocab.extra_id(CLS)
    assert (b["input"][:, 0] == cls_id).all()
    np.testing.assert_allclose(b["condition"][0], [0.8, -0.6])


def test_filter_collate():
    s1 = (np.zeros(4, np.int32), np.zeros(2, np.float32), np.ones(4, np.int32))
    out = filter_collate([s1, None, s1])
    assert out["input"].shape == (2, 4)
    assert filter_collate([None]) == {}


def test_preprocess_features(tmp_path):
    csv = str(tmp_path / "f.csv")
    make_feature_csv(csv, n_songs=60)
    train, test = preprocess_features(csv, conditional=True)
    assert len(train) > 0 and len(test) > 0
    vals = [r["valence"] for r in train + test]
    assert max(vals) <= 1.0 and min(vals) >= -1.0
    # binned mode produces token strings
    train_b, test_b = preprocess_features(csv, n_bins=5, conditional=True)
    assert all(isinstance(r["valence"], str) for r in train_b)
    assert train_b[0]["valence"].startswith("<V")
    # test split deterministic and sorted by file
    train2, test2 = preprocess_features(csv, conditional=True)
    assert [r["file"] for r in test] == [r["file"] for r in test2]


@pytest.mark.skipif(not conftest.reference_available(), reason="no reference")
def test_feature_parity_with_reference(tmp_path):
    import sys

    conftest.purge_reference_modules()
    sys.path.insert(0, "/root/reference/src")
    from data.preprocess_features import preprocess_features as ref_pp

    csv = str(tmp_path / "f.csv")
    make_feature_csv(csv, n_songs=80, seed=4)
    ours_train, ours_test = preprocess_features(csv, conditional=True)
    ref_train, ref_test = ref_pp(csv, conditional=True)
    assert ours_train == ref_train
    assert ours_test == ref_test
    ours_train, ours_test = preprocess_features(csv, n_bins=5, conditional=True)
    ref_train, ref_test = ref_pp(csv, n_bins=5, conditional=True)
    assert ours_train == ref_train
    assert ours_test == ref_test


def test_prefetch_preserves_stream(tmp_path):
    from midi_emotion_tpu.data.loader import prefetch

    folder, records = make_dataset(str(tmp_path))
    a = Loader(folder, records, 32, "none", min_n_instruments=2, seed=7)
    b = Loader(folder, records, 32, "none", min_n_instruments=2, seed=7)
    direct = list(a.batches(4))
    fetched = list(prefetch(b.batches(4), size=2))
    assert len(direct) == len(fetched)
    for x, y in zip(direct, fetched):
        np.testing.assert_array_equal(x["input"], y["input"])


def test_multiprocess_epochs_shapes_and_determinism(tmp_path):
    """Worker-pool loading (the reference's num_workers=8): batches have
    training shapes, and the stream is deterministic given the seed
    regardless of worker count."""
    from midi_emotion_tpu.data.loader import epochs_multiprocess

    folder, records = make_dataset(str(tmp_path))
    L = 48
    mk = lambda: Loader(
        folder, records, L, "continuous_concat", min_n_instruments=2, seed=1
    )

    def take(n_workers, n_batches=5):
        it = epochs_multiprocess(mk(), 4, num_workers=n_workers, seed=3)
        out = [next(it) for _ in range(n_batches)]
        it.close()  # terminates the pool
        return out

    gold = mk().collect([0, 1, 2, 3])  # single-process shapes
    a = take(2)
    b = take(3)
    for ba, bb in zip(a, b):
        assert ba["input"].shape == gold["input"].shape
        assert ba["condition"].shape == gold["condition"].shape
        assert ba["target"].shape == gold["target"].shape
        np.testing.assert_array_equal(ba["input"], bb["input"])
        np.testing.assert_array_equal(ba["target"], bb["target"])


def test_multiprocess_epochs_empty_split_raises(tmp_path):
    from midi_emotion_tpu.data.loader import epochs_multiprocess

    folder, records = make_dataset(str(tmp_path))
    loader = Loader(folder, [], 48, "none", min_n_instruments=2)
    with pytest.raises(ValueError):
        next(epochs_multiprocess(loader, 4, num_workers=2))
