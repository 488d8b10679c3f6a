"""MIDI parser/writer round-trip tests."""
import numpy as np

from pianobart_tpu.midi import (Instrument, MidiFile, Note, TempoChange,
                                TimeSignature, midi_bytes, read_midi_bytes)


def make_song(rng, n_notes=64, n_tracks=2, drum=False):
    midi = MidiFile(ticks_per_beat=480)
    midi.tempo_changes = [TempoChange(tempo=120.0, time=0),
                          TempoChange(tempo=90.0, time=4 * 480 * 8)]
    midi.time_signature_changes = [TimeSignature(4, 4, 0),
                                   TimeSignature(3, 4, 4 * 480 * 16)]
    for t in range(n_tracks):
        inst = Instrument(program=t * 24, is_drum=False, name=f"TRK{t}")
        tick = 0
        for _ in range(n_notes):
            dur = int(rng.integers(60, 960))
            inst.notes.append(Note(
                velocity=int(rng.integers(1, 127)),
                pitch=int(rng.integers(21, 108)),
                start=tick, end=tick + dur))
            tick += int(rng.integers(30, 480))
        midi.instruments.append(inst)
    if drum:
        d = Instrument(program=0, is_drum=True, name="DRUMS")
        d.notes = [Note(velocity=100, pitch=36, start=i * 240, end=i * 240 + 120)
                   for i in range(16)]
        midi.instruments.append(d)
    return midi


def test_roundtrip_notes(rng):
    song = make_song(rng, drum=True)
    parsed = read_midi_bytes(midi_bytes(song))
    assert parsed.ticks_per_beat == 480
    # tempo & time signature metas survive
    assert [round(t.tempo) for t in parsed.tempo_changes] == [120, 90]
    assert [(t.numerator, t.denominator) for t in parsed.time_signature_changes] \
        == [(4, 4), (3, 4)]
    # every instrument preserved with identical note content
    assert len(parsed.instruments) == len(song.instruments)
    for orig, got in zip(song.instruments, parsed.instruments):
        assert got.program == orig.program
        assert got.is_drum == orig.is_drum
        assert got.name == orig.name
        a = sorted((n.start, n.end, n.pitch, n.velocity) for n in orig.notes)
        b = sorted((n.start, n.end, n.pitch, n.velocity) for n in got.notes)
        assert a == b


def test_note_off_pairs_oldest(rng):
    # Two overlapping same-pitch notes: offs close them FIFO.
    song = MidiFile()
    inst = Instrument(program=0, name="X")
    inst.notes = [Note(velocity=80, pitch=60, start=0, end=240),
                  Note(velocity=90, pitch=60, start=120, end=480)]
    song.instruments.append(inst)
    parsed = read_midi_bytes(midi_bytes(song))
    notes = sorted((n.start, n.end) for n in parsed.instruments[0].notes)
    assert notes == [(0, 240), (120, 480)]


def test_running_status_and_velocity0_noteoff():
    # Hand-rolled track using running status and vel-0 note-offs.
    track = bytes([
        0x00, 0x90, 60, 100,   # note on ch0
        0x60, 62, 100,         # running status: second note on
        0x60, 60, 0,           # vel-0 note off
        0x60, 62, 0,
    ])
    chunk = b"MTrk" + len(track).to_bytes(4, "big") + track
    header = b"MThd" + (6).to_bytes(4, "big") + (0).to_bytes(2, "big") \
        + (1).to_bytes(2, "big") + (480).to_bytes(2, "big")
    parsed = read_midi_bytes(header + chunk)
    notes = sorted((n.pitch, n.start, n.end) for n in parsed.instruments[0].notes)
    assert notes == [(60, 0, 0x60 * 2), (62, 0x60, 0x60 * 3)]
