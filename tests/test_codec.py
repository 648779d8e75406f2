"""Codec tests: timeshift quantization semantics, bar segmentation, the
MIDI round-trip property (tokens -> MIDI -> tokens is exact up to the 8 ms
quantization already applied), and parity with the reference encoder."""

import numpy as np
import pytest

import conftest
from midi_emotion_tpu.data import codec, midi_io
from midi_emotion_tpu.vocab import DEFAULT_VOCAB


def make_notes():
    """Small deterministic multi-instrument song."""
    rng = np.random.RandomState(0)
    notes = []
    for ins in ["PIANO", "BASS", "DRUMS", "GUITAR"]:
        t = 0.0
        for _ in range(30):
            t += float(rng.randint(1, 40)) * 0.008
            dur = float(rng.randint(1, 50)) * 0.008
            pitch = int(rng.randint(30, 100))
            notes.append(midi_io.Note(100, pitch, round(t, 6), round(t + dur, 6), ins))
    return notes


def test_timed_events_sorted():
    notes = make_notes()
    timed = codec.notes_to_timed_events(notes)
    times = [t for t, _ in timed]
    assert times == sorted(times)
    assert len(timed) == 2 * len(notes)


def test_timeshift_quantization():
    # gap of 2500 ms -> two 1000s + 500; gap of 4 ms -> rounds half-to-even
    # to 0 but is clamped to one step of 8
    times = np.array([0.0, 2.5, 2.504])
    events = np.array([1, 1, 1])
    values = np.array([60, 61, 62])
    special = np.array([False, False, False])
    out = codec.timed_events_to_tuples(times, events, values, special)
    expected = [
        (1, 60),
        (10, 1000),
        (10, 1000),
        (10, 496),  # 500/8 = 62.5 -> half-to-even -> 62 -> 496 (ref round())
        (1, 61),
        (10, 8),
        (1, 62),
    ]
    assert [tuple(r) for r in out.tolist()] == expected


def test_round_half_even():
    # 12 ms -> 12/8 = 1.5 -> banker's rounding -> 2 steps = 16 ms
    # 4 ms -> 0.5 -> 0 -> clamped to 8
    # 20 ms -> 2.5 -> 2 -> 16
    for gap_ms, want in [(12, 16), (4, 8), (20, 16), (28, 32)]:
        out = codec.timed_events_to_tuples(
            np.array([0.0, gap_ms / 1000.0]),
            np.array([1, 1]),
            np.array([60, 60]),
            np.array([False, False]),
        )
        assert out[1].tolist() == [10, want], gap_ms


def test_bars_roundtrip():
    vocab = DEFAULT_VOCAB
    notes = make_notes()
    end = max(n.end for n in notes)
    downbeats = np.arange(0, end + 2.0, 2.0)  # 2-second bars
    bars = codec.notes_to_bars(notes, downbeats)
    assert bars is not None and len(bars) > 0
    flat = np.concatenate(bars, axis=0)
    ids = codec.tuples_to_ids(flat, vocab)

    # reverse: ids -> tracks; re-encode and compare
    tracks = codec.ids_to_tracks(ids, vocab)
    notes2 = []
    for tr in tracks:
        for n in tr.notes:
            n.instrument = tr.name.upper()
            notes2.append(n)
    assert len(notes2) > 0

    # Bar segmentation may drop notes (bars with <=2 events are discarded,
    # unmatched ON/OFF pairs are ignored by the decoder) -- but after one
    # decode, encode->decode must be a fixpoint: every surviving note is on
    # the 8 ms grid and properly paired.
    def encode(notes_list):
        timed = codec.notes_to_timed_events(notes_list)
        times = np.array([t for t, _ in timed])
        evs = np.array([s[0] for _, s in timed])
        vals = np.array([s[1] for _, s in timed])
        out = codec.timed_events_to_tuples(
            times, evs, vals, np.zeros(len(timed), dtype=bool)
        )
        return codec.tuples_to_ids(out, vocab)

    def decode(ids_arr):
        out = []
        for tr in codec.ids_to_tracks(ids_arr, vocab):
            for n in tr.notes:
                n.instrument = tr.name.upper()
                out.append(n)
        return out

    notes3 = decode(encode(notes2))

    def key(ns):
        # the encoder is translation-invariant (the time cursor starts at the
        # first event, data_processing.py:110), so compare relative times
        t0 = min(n.start for n in ns)
        return sorted(
            (n.instrument, n.pitch, round((n.start - t0) * 125), round((n.end - t0) * 125))
            for n in ns
        )

    assert key(notes3) == key(notes2)


def test_n_instruments():
    vocab = DEFAULT_VOCAB
    maps = vocab.get_maps()
    ids = np.array(
        [
            maps["tuple2idx"][(7, 60)],  # ON_PIANO
            maps["tuple2idx"][(6, 60)],  # OFF_PIANO
            maps["tuple2idx"][(5, 40)],  # ON_BASS
            maps["tuple2idx"][(10, 8)],  # TIMESHIFT
            0,
        ]
    )
    assert codec.n_instruments_from_ids(ids, vocab) == 2
    syms = codec.ids_to_strings(ids, vocab)
    assert codec.get_n_instruments(syms) == 2


def test_midi_file_roundtrip(tmp_path):
    vocab = DEFAULT_VOCAB
    notes = make_notes()
    timed = codec.notes_to_timed_events(notes)
    times = np.array([t for t, _ in timed])
    evs = np.array([s[0] for _, s in timed])
    vals = np.array([s[1] for _, s in timed])
    tuples = codec.timed_events_to_tuples(
        times, evs, vals, np.zeros(len(timed), dtype=bool)
    )
    ids = codec.tuples_to_ids(tuples, vocab)
    tracks = codec.ids_to_tracks(ids, vocab)

    path = str(tmp_path / "out.mid")
    midi_io.write_midi(tracks, path)
    back = midi_io.read_midi(path)
    n_in = sum(len(t.notes) for t in tracks)
    n_out = sum(len(t.notes) for t in back)
    assert n_in == n_out
    # pitches and times survive up to tick quantization (~2.3 ms at 440
    # ticks/sec)
    got = sorted((n.pitch, n.start) for t in back for n in t.notes)
    want = sorted((n.pitch, n.start) for t in tracks for n in t.notes)
    for (gp, gt), (wp, wt) in zip(got, want):
        assert gp == wp
        assert abs(gt - wt) < 0.005


def test_pianoroll_npz(tmp_path):
    # build a tiny two-track pianoroll, save, load, tokenize
    roll_piano = np.zeros((96 * 4, 128), dtype=np.uint8)
    roll_piano[0:24, 60] = 100
    roll_piano[24:48, 64] = 100
    roll_bass = np.zeros((96 * 4, 128), dtype=np.uint8)
    roll_bass[0:96, 40] = 90
    path = str(tmp_path / "song.npz")
    midi_io.save_pianoroll_npz(
        path, {"PIANO": roll_piano, "BASS": roll_bass}, tempo=120.0, beat_resolution=24
    )
    pr = midi_io.load_pianoroll_npz(path)
    assert pr.tempo == 120.0
    notes = [n for t in pr.tracks for n in t.notes]
    assert len(notes) == 3
    downbeats = pr.downbeat_times()
    # 120bpm, 4/4 -> bar = 2s; 384 steps at 24/beat = 16 beats = 4 bars
    assert downbeats[1] - downbeats[0] == pytest.approx(2.0)
    bars = codec.notes_to_bars(notes, downbeats)
    assert bars is not None and len(bars) >= 1


@pytest.mark.skipif(not conftest.reference_available(), reason="no reference")
def test_parity_with_reference_encoder():
    """Token-for-token parity of the delta-time tokenizer with the
    reference timed_tuples_to_tuples (data_processing.py:104-131)."""
    import sys
    import types

    sys.modules.setdefault("pypianoroll", types.ModuleType("pypianoroll"))
    conftest.purge_reference_modules()
    sys.path.insert(0, "/root/reference/src")
    from data.data_processing import get_maps, timed_tuples_to_tuples

    maps = get_maps()
    rng = np.random.RandomState(1)
    t = np.cumsum(rng.randint(0, 700, size=200)) / 1000.0
    evs = rng.randint(0, 10, size=200)
    vals = rng.randint(21, 109, size=200)

    ref_events = [(float(t[i]), (int(evs[i]), int(vals[i]))) for i in range(200)]
    ref_out = timed_tuples_to_tuples(ref_events, maps["event2idx"])

    ours = codec.timed_events_to_tuples(
        t, evs, vals, np.zeros(len(t), dtype=bool)
    )
    assert [tuple(r) for r in ours.tolist()] == [tuple(r) for r in ref_out]
