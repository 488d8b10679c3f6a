"""Corrupted-input robustness + Python↔C++ codec parity.

The framework's tokenizer tolerates real-world dataset messiness
(truncated downloads, bit-rotted files) instead of crashing mid-run —
`/root/reference` inherits miditoolkit's hard failures here (SURVEY §5
failure tolerance).  Policy, shared EXACTLY by the Python parser
(midi/parser.py) and the C++ fast path (midi/native/midi_codec.cpp):

* header shorter than 14 bytes -> ValueError;
* a track body that truncates mid-event: keep every completed event AND
  flush still-open notes at the final tick;
* unknown status bytes (stray system-realtime 0xF8-0xFE) or a data byte
  with no running status: stop that track, keep what parsed.

A round-3 fuzz found the two paths diverging on all three (the Python
flush was skipped when truncation raised IndexError; it also hard-raised
where the native codec tolerantly stops).  This test pins the alignment.
"""
import os
import tempfile

import numpy as np
import pytest

from pianobart_tpu.midi import Instrument, MidiFile, Note
from pianobart_tpu.midi.parser import read_midi_bytes
from pianobart_tpu.midi.writer import write_midi
from pianobart_tpu.tokenizer.codec import midi_to_octuple

try:
    from pianobart_tpu.midi.native import midi_bytes_to_octuple
    _HAVE_NATIVE = midi_bytes_to_octuple is not None
except Exception:                                        # pragma: no cover
    _HAVE_NATIVE = False


def _good_file() -> bytes:
    mf = MidiFile()
    inst = Instrument(program=0, is_drum=False, name="piano")
    for i in range(50):
        inst.notes.append(Note(start=i * 60, end=i * 60 + 55,
                               pitch=40 + (i % 40), velocity=70))
    mf.instruments.append(inst)
    path = tempfile.mktemp(suffix=".mid")
    write_midi(mf, path)
    try:
        return open(path, "rb").read()
    finally:
        os.unlink(path)


def test_python_parser_never_crashes_on_corruption():
    good = _good_file()
    rng = np.random.default_rng(0)
    cases = [good[:cut] for cut in range(len(good))]
    for _ in range(200):
        data = bytearray(good)
        for _ in range(rng.integers(1, 8)):
            data[rng.integers(0, len(data))] = rng.integers(0, 256)
        cases.append(bytes(data))
    for trial in range(100):
        junk = rng.integers(0, 256, rng.integers(1, 500),
                            dtype=np.uint8).tobytes()
        cases.append(b"MThd" + junk if trial % 2 else junk)
    parsed = 0
    for data in cases:
        try:
            read_midi_bytes(data)  # ValueError is the only allowed failure
            parsed += 1
        except ValueError:
            pass
    assert parsed > len(cases) // 2  # tolerance actually engages


def test_short_header_rejected():
    good = _good_file()
    for cut in range(14):
        with pytest.raises(ValueError):
            read_midi_bytes(good[:cut])


def test_truncation_flushes_open_notes():
    """Cutting mid-track must keep the completed notes AND close the
    still-open one at the final tick (the pre-fix parser dropped it)."""
    good = _good_file()
    full = len(read_midi_bytes(good).instruments[0].notes)
    # find a cut that yields a partial parse with at least one note
    seen = set()
    for cut in range(20, len(good)):
        midi = read_midi_bytes(good[:cut])
        if midi.instruments:
            seen.add(len(midi.instruments[0].notes))
    assert full in seen          # full file reachable
    assert len(seen) > 10        # truncation produces graded partials


@pytest.mark.skipif(not _HAVE_NATIVE, reason="native codec not built")
def test_native_python_parity_on_corrupted_input():
    """Byte-for-byte Octuple parity AND identical accept/reject decisions
    between the C++ fast path and the Python path on corrupted files."""
    good = _good_file()
    rng = np.random.default_rng(0)
    cases = [good[:cut] for cut in range(0, len(good), 3)]
    for _ in range(150):
        data = bytearray(good)
        for _ in range(rng.integers(1, 8)):
            data[rng.integers(0, len(data))] = rng.integers(0, 256)
        cases.append(bytes(data))
    for trial in range(60):
        junk = rng.integers(0, 256, rng.integers(1, 500),
                            dtype=np.uint8).tobytes()
        cases.append(b"MThd" + junk if trial % 2 else junk)

    compared = 0
    for data in cases:
        try:
            nat = midi_bytes_to_octuple(data)
        except ValueError:
            nat = None
        try:
            py = midi_to_octuple(read_midi_bytes(data))
        except ValueError:
            py = None
        assert (nat is None) == (py is None), data.hex()[:80]
        if nat is None:
            continue
        a, b = np.asarray(nat), np.asarray(py)
        assert a.shape == b.shape, data.hex()[:80]
        if a.size:
            assert (a == b).all(), data.hex()[:80]
        compared += 1
    assert compared > len(cases) // 2


@pytest.mark.skipif(not _HAVE_NATIVE, reason="native codec not built")
def test_native_python_parity_on_crafted_divergences():
    """Four inputs that round-3 review CONFIRMED diverged between the two
    paths; each must now give the identical outcome."""
    def both(data):
        try:
            nat = midi_bytes_to_octuple(data)
        except ValueError:
            nat = "VE"
        try:
            py = midi_to_octuple(read_midi_bytes(data))
        except ValueError:
            py = "VE"
        return nat, py

    good = _good_file()

    # 1. embedded MThd too close to the end (C++ read OOB; Python raised)
    nat, py = both(b"\x00" * 10 + b"MThd")
    assert nat == "VE" and py == "VE"

    # 2. truncated tempo meta: declared 3 bytes, 2 present (Python used to
    # process a clamped garbage tempo; C++ dropped the event)
    def track(body):
        return (b"MThd" + (6).to_bytes(4, "big") + (1).to_bytes(2, "big")
                + (1).to_bytes(2, "big") + (480).to_bytes(2, "big")
                + b"MTrk" + len(body).to_bytes(4, "big") + body)
    trunc_tempo = track(
        b"\x00\x90\x3c\x40" b"\x60\x80\x3c\x00" b"\x00\xff\x51\x03\x07\xa1")
    nat, py = both(trunc_tempo)
    assert not isinstance(nat, str) and not isinstance(py, str)
    assert np.array_equal(np.asarray(nat), np.asarray(py))

    # 3. time-signature exponent 32 (C++ shift wrapped to a VALID denom;
    # Python rejected 2**32)
    ts32 = track(
        b"\x00\xff\x58\x04\x02\x20\x18\x08"
        b"\x00\x90\x3c\x40" b"\x60\x80\x3c\x00")
    nat, py = both(ts32)
    assert nat == "VE" and py == "VE"

    # 4. track name with a LEADING NUL must still label MELODY both ways
    named = track(
        b"\x00\xff\x03\x07\x00MELODY"
        b"\x00\x90\x3c\x40" b"\x60\x80\x3c\x00")
    nat = midi_bytes_to_octuple(named, task="melody")
    midi = read_midi_bytes(named)
    py = midi_to_octuple(midi, task="melody")
    assert np.array_equal(np.asarray(nat), np.asarray(py))
    assert midi.instruments[0].name == "MELODY"
