"""Vocabulary golden tests: the base vocab must be exactly 1007 ids with the
reference's (event, value) ordering (data_processing.py:183-222)."""

import numpy as np
import pytest

import conftest

from midi_emotion_tpu.vocab import DEFAULT_VOCAB, Vocab, emotion_bin_tokens


def test_base_vocab_size():
    assert DEFAULT_VOCAB.base_size == 1007
    assert len(DEFAULT_VOCAB) == 1007
    assert DEFAULT_VOCAB.pad_id == 0
    assert DEFAULT_VOCAB.start_id == 1
    assert DEFAULT_VOCAB.timeshift_base == 882
    assert DEFAULT_VOCAB.n_timeshift == 125


def test_maps_structure():
    maps = DEFAULT_VOCAB.get_maps()
    assert len(maps["tuple2idx"]) == 1007
    assert maps["tuple2idx"]["<PAD>"] == 0
    assert maps["tuple2idx"]["<START>"] == 1
    # first note token: OFF_DRUMS pitch 21 -> event 0
    assert maps["tuple2idx"][(0, 21)] == 2
    assert maps["idx2event"][0] == "OFF_DRUMS"
    assert maps["idx2event"][1] == "ON_DRUMS"
    assert maps["idx2event"][10] == "TIMESHIFT"
    # last note token: ON_STRINGS pitch 108
    assert maps["tuple2idx"][(9, 108)] == 881
    # timeshifts
    assert maps["tuple2idx"][(10, 8)] == 882
    assert maps["tuple2idx"][(10, 1000)] == 1006
    # drums are not transposable
    assert maps["transposable_event_inds"] == [2, 3, 4, 5, 6, 7, 8, 9]


def test_encode_decode_roundtrip():
    v = DEFAULT_VOCAB
    ids = np.arange(2, v.base_size)
    ev, val = v.decode_ids(ids)
    back = v.encode_tuples(ev, val)
    np.testing.assert_array_equal(back, ids)


def test_special_decode():
    ev, val = DEFAULT_VOCAB.decode_ids(np.array([0, 1]))
    assert (ev == -1).all()


def test_is_timeshift():
    v = DEFAULT_VOCAB
    assert not v.is_timeshift(np.array([0]))[0]
    assert not v.is_timeshift(np.array([881]))[0]
    assert v.is_timeshift(np.array([882]))[0]
    assert v.is_timeshift(np.array([1006]))[0]


def test_extra_tokens():
    v = DEFAULT_VOCAB.with_extra_tokens(emotion_bin_tokens(5))
    assert len(v) == 1017
    assert v.extra_id("<A-1>") == 1007  # sorted order
    mask = v.special_mask()
    assert mask[0] and mask[1] and mask[1007:].all()
    assert not mask[2:1007].any()


def test_transpose():
    v = DEFAULT_VOCAB
    maps = v.get_maps()
    # ON_PIANO (event 7) pitch 60 transposed +3 -> pitch 63
    i = maps["tuple2idx"][(7, 60)]
    j = maps["tuple2idx"][(7, 63)]
    assert v.transpose_ids(np.array([i]), 3)[0] == j
    # drums unchanged
    d = maps["tuple2idx"][(1, 60)]
    assert v.transpose_ids(np.array([d]), 3)[0] == d
    # out of range stays
    hi = maps["tuple2idx"][(7, 108)]
    assert v.transpose_ids(np.array([hi]), 3)[0] == hi
    # timeshift / special unchanged
    assert v.transpose_ids(np.array([0, 1, 900]), 2).tolist() == [0, 1, 900]


def test_serialization_roundtrip():
    v = DEFAULT_VOCAB.with_extra_tokens(["<CLS>"])
    v2 = Vocab.from_dict(v.to_dict())
    assert v2 == v


def test_from_maps_roundtrip():
    v = DEFAULT_VOCAB.with_extra_tokens(emotion_bin_tokens(5))
    v2 = Vocab.from_maps(v.get_maps())
    assert v2 == v


@pytest.mark.skipif(
    not __import__("conftest").reference_available(), reason="reference not mounted"
)
def test_maps_match_reference():
    """Byte-for-byte parity with the reference get_maps()."""
    import sys
    import types

    # data_processing imports pypianoroll at module level; stub it (we only
    # need get_maps, which is pure Python)
    sys.modules.setdefault("pypianoroll", types.ModuleType("pypianoroll"))
    conftest.purge_reference_modules()
    sys.path.insert(0, "/root/reference/src")
    try:
        from data.data_processing import get_maps as ref_get_maps
    except ImportError:
        pytest.skip("reference imports unavailable")
    ref = ref_get_maps()
    ours = DEFAULT_VOCAB.get_maps()
    assert ours["event2idx"] == ref["event2idx"]
    assert ours["tuple2idx"] == ref["tuple2idx"]
    assert ours["idx2tuple"] == ref["idx2tuple"]
    assert ours["transposable_event_inds"] == ref["transposable_event_inds"]
