"""MSD HDF5 accessor tests: synthetic aggregate file + API-surface parity
with the reference's vendored getter library (which we deliberately did
NOT copy -- see PARITY.md; these tests prove the h5py table-driven
replacement covers the same surface with the same slicing semantics)."""

import re

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from midi_emotion_tpu.data import msd_hdf5

REF_GETTERS = "/root/reference/src/create_dataset/hdf5_getters.py"


@pytest.fixture()
def msd_file(tmp_path):
    """Three-song aggregate file in the MSD layout (compound songs tables
    with idx_* columns; variable-length arrays concatenated beside them)."""
    path = tmp_path / "msd_summary.h5"
    n = 3
    rng = np.random.RandomState(0)

    seg_counts = [4, 2, 3]
    terms_counts = [2, 3, 1]
    seg_idx = np.concatenate([[0], np.cumsum(seg_counts)[:-1]])
    terms_idx = np.concatenate([[0], np.cumsum(terms_counts)[:-1]])

    with h5py.File(path, "w") as h5:
        meta_dt = np.dtype(
            [
                ("artist_name", "S32"),
                ("title", "S32"),
                ("release", "S32"),
                ("song_id", "S32"),
                ("artist_familiarity", "<f8"),
                ("idx_similar_artists", "<i4"),
                ("idx_artist_terms", "<i4"),
                ("idx_artist_terms_freq", "<i4"),
                ("idx_artist_terms_weight", "<i4"),
            ]
        )
        meta = np.zeros(n, meta_dt)
        meta["artist_name"] = [b"artist%d" % i for i in range(n)]
        meta["title"] = [b"title%d" % i for i in range(n)]
        meta["release"] = [b"release%d" % i for i in range(n)]
        meta["song_id"] = [b"SO%d" % i for i in range(n)]
        meta["artist_familiarity"] = [0.1, 0.5, 0.9]
        for f in ("idx_artist_terms", "idx_artist_terms_freq",
                  "idx_artist_terms_weight"):
            meta[f] = terms_idx
        meta["idx_similar_artists"] = terms_idx
        h5.create_dataset("metadata/songs", data=meta)
        total_terms = sum(terms_counts)
        h5.create_dataset(
            "metadata/artist_terms",
            data=np.array([b"t%d" % i for i in range(total_terms)]),
        )
        h5.create_dataset(
            "metadata/artist_terms_freq",
            data=np.arange(total_terms, dtype=np.float64),
        )
        h5.create_dataset(
            "metadata/artist_terms_weight",
            data=np.arange(total_terms, dtype=np.float64) * 2.0,
        )
        h5.create_dataset(
            "metadata/similar_artists",
            data=np.array([b"AR%d" % i for i in range(total_terms)]),
        )

        ana_dt = np.dtype(
            [
                ("track_id", "S32"),
                ("tempo", "<f8"),
                ("duration", "<f8"),
                ("idx_segments_start", "<i4"),
                ("idx_segments_pitches", "<i4"),
                ("idx_segments_timbre", "<i4"),
            ]
        )
        ana = np.zeros(n, ana_dt)
        ana["track_id"] = [b"TR%d" % i for i in range(n)]
        ana["tempo"] = [120.0, 90.0, 150.0]
        ana["duration"] = [100.0, 200.0, 300.0]
        for f in ("idx_segments_start", "idx_segments_pitches",
                  "idx_segments_timbre"):
            ana[f] = seg_idx
        h5.create_dataset("analysis/songs", data=ana)
        total_seg = sum(seg_counts)
        h5.create_dataset(
            "analysis/segments_start",
            data=np.arange(total_seg, dtype=np.float64),
        )
        h5.create_dataset(
            "analysis/segments_pitches", data=rng.rand(total_seg, 12)
        )
        h5.create_dataset(
            "analysis/segments_timbre", data=rng.rand(total_seg, 12)
        )

        mb_dt = np.dtype([("year", "<i4"), ("idx_artist_mbtags", "<i4")])
        mb = np.zeros(n, mb_dt)
        mb["year"] = [1990, 2000, 2010]
        mb["idx_artist_mbtags"] = [0, 1, 2]
        h5.create_dataset("musicbrainz/songs", data=mb)
        h5.create_dataset(
            "musicbrainz/artist_mbtags",
            data=np.array([b"tag0", b"tag1", b"tag2"]),
        )
        h5.create_dataset(
            "musicbrainz/artist_mbtags_count",
            data=np.array([1, 2, 3], np.int32),
        )
    return path


def test_scalars_and_num_songs(msd_file):
    with msd_hdf5.open_h5_file_read(msd_file) as h5:
        assert msd_hdf5.get_num_songs(h5) == 3
        assert msd_hdf5.get_artist_name(h5, 1) == b"artist1"
        assert msd_hdf5.get_title(h5) == b"title0"  # songidx defaults to 0
        assert msd_hdf5.get_track_id(h5, 2) == b"TR2"
        assert msd_hdf5.get_tempo(h5, 2) == 150.0
        assert msd_hdf5.get_year(h5, 0) == 1990
        assert msd_hdf5.get_artist_familiarity(h5, 1) == 0.5


def test_array_slicing_aggregate(msd_file):
    """Middle song slices [idx, next_idx); LAST song slices to the end --
    the aggregate convention (hdf5_getters.py:145-154)."""
    with msd_hdf5.open_h5_file_read(msd_file) as h5:
        # terms counts are [2, 3, 1]
        np.testing.assert_array_equal(
            msd_hdf5.get_artist_terms(h5, 0), [b"t0", b"t1"]
        )
        np.testing.assert_array_equal(
            msd_hdf5.get_artist_terms(h5, 1), [b"t2", b"t3", b"t4"]
        )
        np.testing.assert_array_equal(
            msd_hdf5.get_artist_terms(h5, 2), [b"t5"]
        )
        # seg counts are [4, 2, 3]
        np.testing.assert_array_equal(
            msd_hdf5.get_segments_start(h5, 1), [4.0, 5.0]
        )
        assert msd_hdf5.get_segments_pitches(h5, 0).shape == (4, 12)
        assert msd_hdf5.get_segments_timbre(h5, 2).shape == (3, 12)
        np.testing.assert_array_equal(
            msd_hdf5.get_artist_mbtags(h5, 2), [b"tag2"]
        )


def test_api_surface_matches_reference():
    """Every get_* the reference library defines exists here (and vice
    versa), extracted mechanically from its def lines."""
    with open(REF_GETTERS) as f:
        src = f.read()
    ref = sorted(set(re.findall(r"^def (get_\w+)", src, re.M)))
    ref.remove("get_num_songs")  # implemented, but not field getters
    assert sorted(msd_hdf5.getter_names()) == ref
    for name in ref:
        assert callable(getattr(msd_hdf5, name))
    assert callable(msd_hdf5.open_h5_file_read)
    assert callable(msd_hdf5.get_num_songs)


def test_pytables_style_root_access(msd_file):
    """The handle also serves the reference's pytables attribute style
    (hdf5_getters.py:33-53): h5.root.<group>.songs.nrows, .cols.<col>[i],
    and bare array nodes sliced directly -- so reference-style caller code
    works on our handle unchanged (PARITY 3b interop)."""
    with msd_hdf5.open_h5_file_read(msd_file) as h5:
        assert h5.root.metadata.songs.nrows == 3
        assert h5.root.metadata.songs.cols.artist_name[1] == b"artist1"
        assert h5.root.analysis.songs.cols.tempo[2] == 150.0
        # array node, sliced like a pytables EArray
        np.testing.assert_array_equal(
            h5.root.metadata.artist_terms[0:2], [b"t0", b"t1"]
        )
        # 2-D array node keeps its feature axis
        assert h5.root.analysis.segments_pitches[:].shape[1] == 12
        # unknown attributes raise AttributeError, not KeyError
        with pytest.raises(AttributeError):
            h5.root.metadata.nope
        with pytest.raises(AttributeError):
            h5.root.metadata.songs.cols.nope
        # the path style the table-driven getters use still works
        assert h5["metadata/songs"].shape[0] == 3
