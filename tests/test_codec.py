"""Octuple codec invariants and round-trip stability."""
import numpy as np
import pytest

from pianobart_tpu import vocab as V
from pianobart_tpu.midi import Instrument, MidiFile, Note, TempoChange, TimeSignature
from pianobart_tpu.tokenizer import (midi_to_octuple, octuple_to_midi,
                                     pad_segment, process_file, segment_song,
                                     velocity_label)
from tests.test_midi_io import make_song


def test_encoding_fields_in_bounds(rng):
    enc = midi_to_octuple(make_song(rng, drum=True))
    assert len(enc) > 0
    arr = np.array(enc)
    assert arr.shape[1] == 8
    for f in range(8):
        assert arr[:, f].min() >= 0
        assert arr[:, f].max() <= V.TOKEN_BOUNDARY[f]
    # sorted lexicographically
    assert enc == sorted(enc)
    # drums land at Program 128 / Pitch >= 128 (convert.py:214,227)
    drums = arr[arr[:, 2] == 128]
    assert len(drums) == 16
    assert (drums[:, 3] >= 128).all()


def test_known_quantization():
    # One note at beat 1 (tick 480), duration one beat, velocity 64, 120bpm 4/4.
    midi = MidiFile(ticks_per_beat=480)
    midi.tempo_changes = [TempoChange(120.0, 0)]
    midi.time_signature_changes = [TimeSignature(4, 4, 0)]
    inst = Instrument(program=0)
    inst.notes = [Note(velocity=64, pitch=60, start=480, end=960)]
    midi.instruments = [inst]
    enc = midi_to_octuple(midi)
    assert enc == [(0, 16, 0, 60, V.duration_to_bin(16), 16,
                    V.ts_to_bin(4, 4), V.tempo_to_bin(120.0))]


def test_roundtrip_stable(rng):
    """encode -> decode -> encode must be a fixed point (quantization idempotent)."""
    enc1 = midi_to_octuple(make_song(rng, n_notes=96))
    midi2 = octuple_to_midi(enc1)
    enc2 = midi_to_octuple(midi2)
    a1 = np.array(enc1)
    a2 = np.array(enc2)
    assert a1.shape == a2.shape
    # bar/pos/program/pitch/duration identical; velocity/ts/tempo re-quantize
    # to the same bins by construction
    np.testing.assert_array_equal(a1, a2)


def test_velocity_label_map():
    assert velocity_label(0) == 0 and velocity_label(15) == 0
    assert velocity_label(16) == 0 and velocity_label(31) == 0
    assert velocity_label(32) == 1 and velocity_label(47) == 1
    assert velocity_label(111) == 5  # (111-32)//16 + 1
    assert velocity_label(112) == 5 and velocity_label(127) == 5


def test_segment_song_renumbering():
    # Synthetic stream crossing the 255-bar boundary twice.
    rows = [(b, 0, 0, 60, 4, 16, V.ts_to_bin(4, 4), 30) for b in range(0, 700, 7)]
    segs = segment_song(rows)
    assert len(segs) == 3
    for seg in segs:
        assert seg[-1] == tuple(V.EOS)
        bars = [r[0] for r in seg[:-1]]
        assert min(bars) >= 0 and max(bars) <= V.MAX_BAR
    # first segment covers bars 0..255 inclusive (strict > in the split)
    assert max(r[0] for r in segs[0][:-1]) == 252  # largest multiple of 7 <= 255
    # second segment original bars 259.. renumbered by -256
    assert segs[1][0][0] == 259 - 256


def test_pad_segment():
    seg = [(0, 0, 0, 60, 4, 16, 8, 30)] * 10
    out = pad_segment(list(seg))
    assert len(out) == V.MAX_WINDOW
    assert out[10] == tuple(V.PAD)
    # over-long: truncate to window-1 + EOS
    long_seg = [(0, 0, 0, 60, 4, 16, 8, 30)] * 2000
    out = pad_segment(list(long_seg))
    assert len(out) == V.MAX_WINDOW
    assert out[-1] == tuple(V.EOS)
    out_last = pad_segment(list(long_seg), last=True)
    assert len(out_last) == V.MAX_WINDOW and out_last[-1] == tuple(V.EOS)


def test_process_file_pretrain(rng):
    res = process_file(make_song(rng), task="pretrain", pad=True)
    assert res.ok
    arr = np.array(res.sequences[0])
    assert arr.shape == (1024, 8)
    # exactly one EOS row per padded window (check.py:113-116 invariant)
    assert int((arr[:, 0] == V.EOS[0]).sum()) == 1


def test_process_file_generate(rng):
    res = process_file(make_song(rng, n_notes=400), task="generate")
    assert res.ok and len(res.sequences) >= 1
    intro = np.array(res.sequences[0])
    cont = np.array(res.labels[0])
    assert intro.shape == (1024, 8) and cont.shape == (1024, 8)
    assert int((intro[:, 0] == V.EOS[0]).sum()) == 1
    # intro ends at a bar boundary: its last content bar < first cont bar + 1
    intro_bars = intro[intro[:, 0] < 256, 0]
    cont_bars = cont[cont[:, 0] < 256, 0]
    assert intro_bars.max() <= cont_bars.min()


def test_process_file_melody_labels(rng):
    song = make_song(rng)
    song.instruments[0].name = "MELODY"
    song.instruments[1].name = "PIANO"
    res = process_file(song, task="melody", pad=False)
    assert res.ok
    rows = res.sequences[0]
    labels = res.labels[0]
    assert len(rows) == len(labels)
    assert set(labels) <= {0, 1, 2, 3}
    assert all(len(r) == 8 for r in rows)


def test_dedup(rng):
    song = make_song(rng)
    seen = {}
    assert process_file(song, dedup_seen=seen, file_name="a").ok
    dup = process_file(song, dedup_seen=seen, file_name="b")
    assert dup.status == "duplicate"


def test_native_codec_bit_identical(rng):
    """C++ parse+quantize == Python path on random songs (all tasks)."""
    from pianobart_tpu.midi import native
    from pianobart_tpu.midi.writer import midi_bytes
    from pianobart_tpu.midi.parser import read_midi_bytes
    if not native.available():
        pytest.skip("native toolchain unavailable")
    for trial in range(8):
        song = make_song(rng, n_notes=int(rng.integers(20, 200)),
                         n_tracks=int(rng.integers(1, 4)),
                         drum=bool(rng.integers(0, 2)))
        song.instruments[0].name = ["MELODY", "BRIDGE", "PIANO", "x"][trial % 4]
        data = midi_bytes(song)
        for task in ("pretrain", "melody", "velocity"):
            py = midi_to_octuple(read_midi_bytes(data), task)
            nat = native.midi_bytes_to_octuple(data, task)
            assert nat == [tuple(r) for r in py]


def test_process_bytes_matches_process_file(rng):
    from pianobart_tpu.midi.writer import midi_bytes
    from pianobart_tpu.midi.parser import read_midi_bytes
    from pianobart_tpu.tokenizer import process_bytes
    song = make_song(rng, n_notes=120)
    data = midi_bytes(song)
    a = process_file(read_midi_bytes(data), task="pretrain")
    b = process_bytes(data, task="pretrain")
    assert a.status == b.status
    assert [list(map(tuple, s)) for s in a.sequences] == \
           [list(map(tuple, s)) for s in b.sequences]


def test_native_codec_bit_identical_on_realistic_corpus(rng, tmp_path):
    """C++ parse+quantize == Python path on the REALISTIC corpus generator
    (public-domain repertoire, multi-track arrangements, mid-piece tempo and
    time-signature changes, drum tracks, overlapping/zero-length notes) —
    the messiness real pipelines choke on, not just make_song grids."""
    import sys
    from pianobart_tpu.midi import native
    if not native.available():
        pytest.skip("native toolchain unavailable")
    sys.path.insert(0, "/root/repo")
    from scripts.make_corpus import (bach_prelude, fur_elise, ode_to_joy,
                                     pachelbel_canon, procedural_song)
    from pianobart_tpu.midi.writer import midi_bytes
    from pianobart_tpu.midi.parser import read_midi_bytes

    songs = [bach_prelude(rng), pachelbel_canon(rng, 3), ode_to_joy(rng, 2),
             fur_elise(rng)]
    for style in ("Nocturne", "Ragtime", "Etude", "Minimal", "Folk", "Band"):
        songs.append(procedural_song(rng, style, int(rng.integers(8, 40))))
    checked = 0
    for song in songs:
        data = midi_bytes(song)
        py = midi_to_octuple(read_midi_bytes(data), "pretrain")
        nat = native.midi_bytes_to_octuple(data, "pretrain")
        assert nat == [tuple(r) for r in py]
        checked += len(py)
    assert checked > 1000  # non-trivial token volume
