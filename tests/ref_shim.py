"""Test-only miditoolkit shim + reference module loader.

The reference tokenizer (``/root/reference/Data/data_generation/convert.py``)
imports ``miditoolkit``, which this environment does not ship.  For golden
parity tests we register a minimal stand-in backed by our own MIDI object
model and parser, then import the reference module unmodified.  This executes
the reference code against identical inputs — the strongest available
bit-identical check of our codec.  Only tests import this module.
"""
import importlib.util
import os
import sys
import types

from pianobart_tpu.midi import events as _ev
from pianobart_tpu.midi.parser import read_midi

REF_CONVERT = "/root/reference/Data/data_generation/convert.py"


def _install_miditoolkit_shim():
    if "miditoolkit" in sys.modules:
        return

    class ShimMidiFile(_ev.MidiFile):
        def __init__(self, path=None, **kw):
            super().__init__(**kw)
            if path is not None:
                parsed = read_midi(path)
                self.ticks_per_beat = parsed.ticks_per_beat
                self.instruments = parsed.instruments
                self.tempo_changes = parsed.tempo_changes
                self.time_signature_changes = parsed.time_signature_changes

    def _note(velocity=0, pitch=0, start=0, end=0):
        return _ev.Note(velocity=velocity, pitch=pitch, start=start, end=end)

    root = types.ModuleType("miditoolkit")
    midi_mod = types.ModuleType("miditoolkit.midi")
    parser_mod = types.ModuleType("miditoolkit.midi.parser")
    containers = types.ModuleType("miditoolkit.containers")

    parser_mod.MidiFile = ShimMidiFile
    midi_mod.parser = parser_mod
    containers.Note = _note
    containers.Instrument = lambda program=0, is_drum=False, name="": _ev.Instrument(
        program=program, is_drum=is_drum, name=name)
    containers.TimeSignature = lambda numerator=4, denominator=4, time=0: \
        _ev.TimeSignature(numerator=numerator, denominator=denominator, time=time)
    containers.TempoChange = lambda tempo=120.0, time=0: _ev.TempoChange(
        tempo=tempo, time=time)

    root.midi = midi_mod
    root.containers = containers
    root.MidiFile = ShimMidiFile
    sys.modules["miditoolkit"] = root
    sys.modules["miditoolkit.midi"] = midi_mod
    sys.modules["miditoolkit.midi.parser"] = parser_mod
    sys.modules["miditoolkit.containers"] = containers


def load_reference_convert():
    """Import the reference convert.py (read-only) with the shim installed."""
    if not os.path.exists(REF_CONVERT):
        return None
    _install_miditoolkit_shim()
    spec = importlib.util.spec_from_file_location("ref_convert", REF_CONVERT)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod
