"""Native C++ tokenizer: bit-identical to the numpy codec, incl. the bar
segmentation walk, on randomized streams."""

import numpy as np
import pytest

import conftest

from midi_emotion_tpu.ops import native
from midi_emotion_tpu.data import codec

pytestmark = pytest.mark.skipif(
    not native.available(), reason="g++ unavailable or build failed"
)


def _random_stream(seed, n=400):
    rng = np.random.RandomState(seed)
    times = np.round(np.cumsum(rng.randint(0, 900, size=n)) / 1000.0, 6)
    events = rng.randint(0, 10, size=n).astype(np.int16)
    values = rng.randint(21, 109, size=n).astype(np.int16)
    return times, events, values


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_events_match_numpy(seed):
    times, events, values = _random_stream(seed)
    special = np.zeros(len(times), bool)
    a = codec.timed_events_to_tuples(times, events, values, special)
    b = native.tokenize_events(times, events, values, special)
    np.testing.assert_array_equal(a, b)


def test_events_with_specials():
    times = np.array([0.0, 1.5, 3.2, 3.2])
    events = np.array([1, 0, 0, 3], np.int16)
    values = np.array([60, 0, 0, 70], np.int16)
    special = np.array([False, True, True, False])
    a = codec.timed_events_to_tuples(times, events, values, special)
    b = native.tokenize_events(times, events, values, special)
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("seed", [3, 4])
def test_bars_match_numpy_codec(seed):
    """Full bar segmentation: native vs the Python/numpy notes_to_bars."""
    from midi_emotion_tpu.data.midi_io import Note

    rng = np.random.RandomState(seed)
    notes = []
    for ins in ["PIANO", "BASS", "DRUMS"]:
        t = 0.0
        for _ in range(60):
            t += float(rng.randint(1, 300)) / 125.0
            dur = float(rng.randint(1, 120)) / 125.0
            notes.append(
                Note(100, int(rng.randint(30, 100)), round(t, 6),
                     round(t + dur, 6), ins)
            )
    end = max(n.end for n in notes)
    downbeats = np.arange(0.0, end + 2.0, 2.0)

    want = codec.notes_to_bars(notes, downbeats)

    timed = codec.notes_to_timed_events(notes)
    times = np.array([t for t, _ in timed])
    evs = np.array([s[0] for _, s in timed], np.int16)
    vals = np.array([s[1] for _, s in timed], np.int16)
    got = native.tokenize_bars(times, evs, vals, downbeats)

    assert got is not None and want is not None
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)


def test_bars_too_few_downbeats():
    times = np.array([0.0, 1.0])
    ev = np.array([1, 0], np.int16)
    val = np.array([60, 60], np.int16)
    assert native.tokenize_bars(times, ev, val, np.array([0.0])) is None
