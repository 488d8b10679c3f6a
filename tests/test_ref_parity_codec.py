"""Golden parity: our codec vs the reference encoder executed in-process.

Runs the unmodified reference ``MIDI_to_encoding`` / ``encoding_to_MIDI`` /
``padding`` (via the miditoolkit shim in :mod:`tests.ref_shim`) on the same
inputs as our implementations and demands bit-identical outputs.
"""
import numpy as np
import pytest

from pianobart_tpu import vocab as V
from pianobart_tpu.midi import (Instrument, MidiFile, Note, TempoChange,
                                TimeSignature)
from pianobart_tpu.tokenizer import (midi_to_octuple, octuple_to_midi,
                                     pad_segment, segment_song)
from tests.ref_shim import load_reference_convert
from tests.test_midi_io import make_song

ref = load_reference_convert()
pytestmark = pytest.mark.skipif(ref is None, reason="reference repo absent")


def odd_meter_song(rng):
    midi = MidiFile(ticks_per_beat=384)
    midi.tempo_changes = [TempoChange(63.7, 0), TempoChange(181.0, 384 * 40)]
    midi.time_signature_changes = [TimeSignature(6, 8, 0),
                                   TimeSignature(4, 4, 384 * 6 * 4)]
    inst = Instrument(program=41, name="strings")
    tick = 17
    for _ in range(300):
        dur = int(rng.integers(10, 3000))
        inst.notes.append(Note(velocity=int(rng.integers(1, 127)),
                               pitch=int(rng.integers(0, 127)),
                               start=tick, end=tick + dur))
        tick += int(rng.integers(1, 700))
    midi.instruments = [inst]
    return midi


@pytest.mark.parametrize("maker", [lambda r: make_song(r, drum=False), odd_meter_song])
def test_encoding_bit_identical(rng, maker):
    song = maker(rng)
    ours = midi_to_octuple(song)
    theirs = ref.MIDI_to_encoding(song)
    assert [tuple(t) for t in theirs] == [tuple(t) for t in ours]


def test_drum_encoding_fixes_reference_oov_bug(rng):
    """Drums: the reference emits out-of-vocab ids (Program 129, Pitch+256);
    we emit the documented in-vocab form (Program 128, Pitch+128) that the
    reference *decoder* expects.  See codec.py module docstring."""
    song = make_song(rng, drum=True)
    ours = np.array(midi_to_octuple(song))
    theirs = np.array([list(t) for t in ref.MIDI_to_encoding(song)])
    ref_drums = theirs[theirs[:, 2] == 129]
    our_drums = ours[ours[:, 2] == 128]
    assert len(ref_drums) == len(our_drums) > 0
    # reference drum ids overflow the vocabulary; ours stay in range
    assert ref_drums[:, 3].max() > V.TOKEN_BOUNDARY[3]
    assert our_drums[:, 3].max() <= V.TOKEN_BOUNDARY[3]
    # non-drum rows bit-identical
    np.testing.assert_array_equal(theirs[theirs[:, 2] != 129],
                                  ours[ours[:, 2] != 128])


@pytest.mark.parametrize("task", ["melody", "velocity"])
def test_encoding_with_labels_bit_identical(rng, task):
    song = make_song(rng)
    song.instruments[0].name = "MELODY"
    ours = midi_to_octuple(song, task)
    theirs = ref.MIDI_to_encoding(song, task)
    assert [tuple(t) for t in theirs] == [tuple(t) for t in ours]


def test_decoding_bit_identical(rng):
    enc = midi_to_octuple(make_song(rng, n_notes=128, drum=True))
    ours = octuple_to_midi(enc)
    theirs = ref.encoding_to_MIDI([list(e) for e in enc])
    # Same notes per program
    def flat(m):
        return sorted((i.program, i.is_drum, n.start, n.end, n.pitch, n.velocity)
                      for i in m.instruments for n in i.notes)
    assert flat(theirs) == flat(ours)
    assert [(t.numerator, t.denominator, t.time)
            for t in theirs.time_signature_changes] == \
           [(t.numerator, t.denominator, t.time)
            for t in ours.time_signature_changes]
    assert [(round(t.tempo, 9), t.time) for t in theirs.tempo_changes] == \
           [(round(t.tempo, 9), t.time) for t in ours.tempo_changes]


def test_padding_bit_identical(rng):
    enc = midi_to_octuple(make_song(rng, n_notes=40))
    for last in (False, True):
        ours = pad_segment(list(enc), last=last)
        theirs = ref.padding("x", list(enc), window=1024, last=last)
        assert [tuple(t) for t in theirs] == [tuple(t) for t in ours]
    # over-long case
    long_enc = midi_to_octuple(make_song(rng, n_notes=900, n_tracks=2))
    if len(long_enc) > 1024:
        for last in (False, True):
            ours = pad_segment(list(long_enc), last=last)
            theirs = ref.padding("x", list(long_enc), window=1024, last=last)
            assert [tuple(t) for t in theirs] == [tuple(t) for t in ours]


def test_data_split_bit_identical(rng):
    from pianobart_tpu.tokenizer import data_split
    flat = np.array(midi_to_octuple(make_song(rng, n_notes=700)))
    np.testing.assert_array_equal(ref.data_split(flat), data_split(flat))


def test_segmentation_matches_reference_F(rng, tmp_path, capsys):
    """Full-file parity: reference F() (file IO + segmentation + padding)."""
    song = make_song(rng, n_notes=1200, n_tracks=3)
    # push bars past 255 to force segmentation: slow tempo + long song
    path = tmp_path / "song.mid"
    song.dump(str(path))

    ref.midi_dict.clear()
    theirs = ref.F(str(path), task="pretrain", pad=True)
    capsys.readouterr()
    assert theirs, "reference F failed on generated file"

    parsed = MidiFile.parse(str(path))
    enc = midi_to_octuple(parsed)
    ours = [pad_segment(s) for s in segment_song(enc)]
    assert len(theirs) == len(ours)
    for a, b in zip(theirs, ours):
        assert [tuple(t) for t in a] == [tuple(t) for t in b]
