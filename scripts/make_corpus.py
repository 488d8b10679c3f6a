"""Build a realistic MIDI corpus for end-to-end validation.

This environment has no network egress, so the POP909/Pianist8/EMOPIA zips
the reference trains on (`convert.py:569-651`, README.md:56-100) cannot be
downloaded.  The documented fallback (round-1 verdict item 2) is a corpus
with the statistics real pipelines choke on, built from:

* programmatic note-accurate renderings of public-domain repertoire
  (Bach BWV 846 prelude figuration, Pachelbel's Canon ground + divisions,
  Beethoven's Ode to Joy theme with variations, Fuer Elise A-section);
* procedural composers with distinct styles (nocturne, rag, etude, minimal,
  odd-meter folk) built on real harmonic progressions, phrase structure,
  voice-leading melodies, dynamics arcs and multi-track arrangements;
* real-world messiness: mid-piece tempo/time-signature changes, overlapping
  and zero-length notes, drum tracks, >255-bar pieces (forces bar-window
  re-segmentation, convert.py:423-445), dense tremolo passages (>1024
  tokens per segment), duplicate files (dedup path), and truncated files
  (per-file error tolerance, convert.py:511-515).

Layout: ``<out>/<Composer>/Q<q>_<name>.mid`` — the composer directory feeds
the composer task's path labels, the ``Q<n>`` prefix the emotion task's.

Usage: python scripts/make_corpus.py [out_dir] [n_files] [seed]
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pianobart_tpu.midi.events import (Instrument, MidiFile, Note,
                                       TempoChange, TimeSignature)

TPB = 480  # ticks per beat
BEAT = TPB
BAR4 = 4 * BEAT

MAJOR = [0, 2, 4, 5, 7, 9, 11]
MINOR = [0, 2, 3, 5, 7, 8, 10]
# Harmonic minor (raised leading tone).  The round-4 verdict's emotion-task
# ceiling analysis: natural minor shares its pitch-class SET with its
# relative major, so with randomized roots the mode — hence the valence bit
# of the Russell-quadrant label — was nearly unlearnable from pitch content.
# Harmonic minor's augmented second makes the set distinct from every major
# transposition (and matches practice: real minor-mode repertoire raises
# the 7th in dominant-function contexts — cf. Fuer Elise's G#).
HARMONIC_MINOR = [0, 2, 3, 5, 7, 8, 11]

# Diatonic triads (scale degrees) for common progressions.
PROGRESSIONS = [
    [0, 4, 5, 3],        # I V vi IV
    [0, 5, 3, 4],        # I vi IV V
    [1, 4, 0, 0],        # ii V I I
    [0, 3, 4, 4],        # I IV V V
    [5, 3, 0, 4],        # vi IV I V
    [0, 6, 3, 4],        # I vii IV V (modal flavour)
]


def scale_pitch(root: int, scale, degree: int, octave: int = 0) -> int:
    return root + scale[degree % 7] + 12 * (degree // 7 + octave)


def triad(root: int, scale, degree: int):
    return [scale_pitch(root, scale, degree + k) for k in (0, 2, 4)]


# ---------------------------------------------------------------------------
# public-domain repertoire (programmatic, note-accurate patterns)
# ---------------------------------------------------------------------------

def bach_prelude(rng) -> MidiFile:
    """BWV 846 prelude figuration: per-bar 5-note chords arpeggiated
    16th-note pattern (p1 p2 p3 p4 p5 p3 p4 p5) x2 per bar."""
    # (bass, tenor, + 3 upper notes), first bars of the famous progression,
    # then continued through a circle-of-fifths sequence.
    bars = [
        (60, 64, 67, 72, 76), (60, 62, 69, 74, 77), (59, 62, 67, 74, 77),
        (60, 64, 67, 72, 76), (60, 64, 69, 76, 81), (60, 62, 66, 69, 74),
        (59, 62, 67, 74, 79), (59, 60, 64, 67, 72), (57, 60, 64, 67, 72),
        (50, 57, 62, 66, 72), (55, 59, 62, 67, 71), (55, 58, 64, 67, 73),
        (53, 57, 62, 65, 74), (53, 56, 62, 65, 71), (52, 55, 60, 64, 72),
        (52, 53, 57, 60, 65), (50, 53, 57, 60, 65), (43, 50, 59, 62, 65),
    ]
    m = MidiFile(ticks_per_beat=TPB)
    m.tempo_changes = [TempoChange(72.0, 0)]
    m.time_signature_changes = [TimeSignature(4, 4, 0)]
    piano = Instrument(program=0, name="piano")
    t = 0
    step = BEAT // 2  # 8th notes (two notes per beat in the original feel)
    for p1, p2, p3, p4, p5 in bars:
        for rep in range(2):
            order = [p1, p2, p3, p4, p5, p3, p4, p5]
            for k, pitch in enumerate(order):
                start = t + rep * (len(order) * step // 2) + k * step // 2
                vel = 52 + (6 if k in (0, 2) else 0) + rng.integers(-3, 4)
                piano.notes.append(Note(int(np.clip(vel, 1, 127)), pitch,
                                        start, start + step))
        t += BAR4
    m.instruments = [piano]
    return m


def pachelbel_canon(rng, n_rounds: int = 6) -> MidiFile:
    """Canon in D: ground bass + chord realization + division variations."""
    root = 62  # D
    ground = [62, 57, 59, 54, 55, 62, 55, 57]  # D A B F# G D G A
    degrees = [0, 4, 5, 2, 3, 0, 3, 4]
    m = MidiFile(ticks_per_beat=TPB)
    m.tempo_changes = [TempoChange(64.0, 0)]
    m.time_signature_changes = [TimeSignature(4, 4, 0)]
    cello = Instrument(program=42, name="cello")
    piano = Instrument(program=0, name="piano")
    violin = Instrument(program=40, name="violin")
    t = 0
    for r in range(n_rounds):
        for i, (b, d) in enumerate(zip(ground, degrees)):
            start = t + i * 2 * BEAT
            cello.notes.append(Note(58, b - 12, start, start + 2 * BEAT))
            for p in triad(root, MAJOR, d):
                piano.notes.append(Note(48 + rng.integers(0, 6), p,
                                        start, start + 2 * BEAT))
            # divisions get denser each round (the canon's variation idea)
            divs = [2, 2, 4, 4, 8, 8][r % 6]
            dur = 2 * BEAT // divs
            chord = triad(root, MAJOR, d)
            for k in range(divs):
                p = chord[k % 3] + 12 + (12 if r >= 4 else 0)
                vel = 62 + int(10 * np.sin(k / max(divs - 1, 1) * np.pi))
                violin.notes.append(Note(vel, p, start + k * dur,
                                         start + (k + 1) * dur))
        t += len(ground) * 2 * BEAT
    m.instruments = [cello, piano, violin]
    return m


ODE = [4, 4, 5, 7, 7, 5, 4, 2, 0, 0, 2, 4, 4, 2, 2,
       4, 4, 5, 7, 7, 5, 4, 2, 0, 0, 2, 4, 2, 0, 0]
ODE_DUR = [1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1.5, .5, 2,
           1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1.5, .5, 2]


def ode_to_joy(rng, variations: int = 3) -> MidiFile:
    """Ode to Joy theme (9th symphony finale) + simple variations."""
    root = 60
    m = MidiFile(ticks_per_beat=TPB)
    m.tempo_changes = [TempoChange(120.0, 0)]
    m.time_signature_changes = [TimeSignature(4, 4, 0)]
    piano = Instrument(program=0)
    t = 0
    for var in range(variations):
        for deg, dur in zip(ODE, ODE_DUR):
            ticks = int(dur * BEAT)
            pitch = scale_pitch(root, MAJOR, deg)
            vel = 70 + 8 * (var % 2) + rng.integers(-4, 5)
            piano.notes.append(Note(int(np.clip(vel, 1, 127)), pitch,
                                    t, t + ticks))
            if var >= 1:  # add a third below
                piano.notes.append(Note(54, pitch - (3 if deg in (0, 4) else 4),
                                        t, t + ticks))
            if var >= 2:  # alberti bass
                for k in range(int(dur * 2)):
                    bp = [root - 24, root - 12, root - 17, root - 12][k % 4]
                    piano.notes.append(Note(46, bp, t + k * BEAT // 2,
                                            t + (k + 1) * BEAT // 2))
            t += ticks
    m.instruments = [piano]
    return m


FUR_ELISE = [76, 75, 76, 75, 76, 71, 74, 72, 69, None, 60, 64, 69, 71,
             None, 64, 68, 71, 72, None, 64, 76, 75, 76, 75, 76, 71, 74,
             72, 69, None, 60, 64, 69, 71, None, 64, 72, 71, 69]


def fur_elise(rng) -> MidiFile:
    m = MidiFile(ticks_per_beat=TPB)
    m.tempo_changes = [TempoChange(75.0, 0)]
    m.time_signature_changes = [TimeSignature(3, 8, 0)]
    piano = Instrument(program=0)
    t = 0
    step = BEAT // 2
    for loop in range(4):
        for p in FUR_ELISE:
            if p is not None:
                piano.notes.append(Note(60 + rng.integers(-5, 6), p,
                                        t, t + step))
            t += step
    m.instruments = [piano]
    return m


# ---------------------------------------------------------------------------
# procedural composers (distinct, parameterized styles)
# ---------------------------------------------------------------------------

def melody_line(rng, root, scale, prog, n_bars, beats_per_bar, register=12,
                vel_bias=0):
    """Phrase-structured melody: chord tones on strong beats, stepwise
    passing notes between, 4-bar phrases with AABA-style reuse.

    Mode-specific cadences (round-4 verdict do-this #1): every 4th bar ends
    with an authentic cadential figure into the tonic — leading-tone
    ascent (7̂→1̂, the harmonic-minor semitone) in minor, supertonic descent
    (2̂→1̂, a whole tone) in major — so phrase endings carry the valence
    bit melodically.  ``vel_bias`` keys dynamics to valence.
    """
    minor = scale is not MAJOR
    phrases = {}
    notes = []
    deg = 7  # start an octave up
    for bar in range(n_bars):
        phrase_id = (bar // 4) % 4
        bar_in_phrase = bar % 4
        key = (phrase_id if phrase_id != 2 else 0, bar_in_phrase)
        chord_deg = prog[bar % len(prog)]
        if key in phrases and rng.random() < 0.7:
            bar_notes = [(b, d, p) for (b, d, p) in phrases[key]]
        else:
            cadence = bar_in_phrase == 3 and beats_per_bar >= 2
            fill_beats = beats_per_bar - 2 if cadence else beats_per_bar
            bar_notes = []
            beat = 0.0
            while beat < fill_beats:
                dur = float(rng.choice([0.5, 0.5, 1.0, 1.0, 2.0],
                                       p=[.3, .2, .3, .1, .1]))
                dur = min(dur, fill_beats - beat)
                if abs(beat - round(beat)) < 1e-6 and rng.random() < 0.7:
                    choice = [chord_deg, chord_deg + 2, chord_deg + 4]
                    target = int(rng.choice(choice)) + 7
                    deg = target
                else:
                    deg += int(rng.choice([-1, 1]))
                bar_notes.append((beat, dur, deg))
                beat += dur
            if cadence:
                # approach the octave tonic (deg 7): from below through the
                # leading tone in minor, from above through the supertonic
                # in major
                bar_notes.append((fill_beats, 1.0, 6 if minor else 8))
                bar_notes.append((fill_beats + 1.0, 1.0, 7))
                deg = 7
            phrases[key] = bar_notes
        for beat, dur, d in bar_notes:
            start = int((bar * beats_per_bar + beat) * BEAT)
            pitch = scale_pitch(root, scale, d) + register - 12
            arc = np.sin((bar % 16) / 16 * np.pi)  # 16-bar dynamic arc
            vel = int(np.clip(58 + vel_bias + 25 * arc + rng.integers(-6, 7),
                              1, 127))
            notes.append(Note(vel, int(np.clip(pitch, 21, 108)),
                              start, start + int(dur * BEAT)))
    return notes


def accompaniment(rng, root, scale, prog, n_bars, beats_per_bar, style,
                  vel_bias=0):
    notes = []
    vb = vel_bias
    for bar in range(n_bars):
        chord = triad(root - 12, scale, prog[bar % len(prog)])
        t0 = bar * beats_per_bar * BEAT
        if style == "block":
            for p in chord:
                notes.append(Note(44 + vb, p, t0, t0 + beats_per_bar * BEAT))
        elif style == "arp":
            seq = chord + [chord[1]]
            n = int(beats_per_bar * 2)
            for k in range(n):
                notes.append(Note(46 + vb, seq[k % len(seq)],
                                  t0 + k * BEAT // 2,
                                  t0 + (k + 1) * BEAT // 2))
        elif style == "stride":
            for k in range(int(beats_per_bar)):
                if k % 2 == 0:
                    notes.append(Note(56 + vb, chord[0] - 12, t0 + k * BEAT,
                                      t0 + k * BEAT + BEAT // 2))
                else:
                    for p in chord:
                        notes.append(Note(48 + vb, p, t0 + k * BEAT,
                                          t0 + k * BEAT + BEAT // 2))
        elif style == "tremolo":  # dense: exercises >1024-token segments
            n = int(beats_per_bar * 8)
            for k in range(n):
                p = chord[k % 3]
                notes.append(Note(40 + vb + (k % 2) * 8, p,
                                  t0 + k * BEAT // 8,
                                  t0 + (k + 1) * BEAT // 8))
    return notes


def drum_track(rng, n_bars, beats_per_bar):
    drums = Instrument(program=0, is_drum=True, name="drums")
    for bar in range(n_bars):
        t0 = bar * beats_per_bar * BEAT
        for k in range(int(beats_per_bar)):
            t = t0 + k * BEAT
            if k % 2 == 0:
                drums.notes.append(Note(90, 36, t, t + BEAT // 4))  # kick
            else:
                drums.notes.append(Note(80, 38, t, t + BEAT // 4))  # snare
            drums.notes.append(Note(55, 42, t, t + BEAT // 8))      # hats
            drums.notes.append(Note(50, 42, t + BEAT // 2, t + BEAT // 2 + BEAT // 8))
    return drums


STYLES = {
    # name: (acc_style, tempo range, minor_prob, time sigs, register)
    "Nocturne": ("arp", (52, 76), 0.7, [(4, 4), (6, 8), (12, 8)], 12),
    "Ragtime": ("stride", (88, 120), 0.1, [(2, 4), (4, 4)], 12),
    "Etude": ("tremolo", (100, 144), 0.4, [(4, 4), (3, 4)], 12),
    "Minimal": ("block", (60, 96), 0.3, [(4, 4), (5, 4), (7, 8)], 12),
    "Folk": ("block", (84, 126), 0.5, [(3, 4), (5, 4), (7, 8), (4, 4)], 12),
    "Band": ("arp", (96, 132), 0.2, [(4, 4,)], 12),
}


def procedural_song(rng, style_name: str, n_bars: int,
                    quadrant: int | None = None) -> MidiFile:
    """``quadrant`` (1-4) pins mode+initial tempo to that Russell quadrant
    (see :func:`emotion_quadrant`) so the corpus can balance emotion
    classes — an unbalanced draw left the round-3 test split with an n=2
    class (verdict weak #5).  None keeps the style's natural distribution.
    """
    acc_style, (t_lo, t_hi), minor_p, sigs, reg = STYLES[style_name]
    root = int(rng.integers(48, 60))
    # minor songs use HARMONIC minor: its pitch-class set is distinct from
    # every major transposition, so the valence bit of the emotion label is
    # learnable from pitch content (round-4 verdict do-this #1)
    scale = HARMONIC_MINOR if rng.random() < minor_p else MAJOR
    prog = list(rng.choice(len(PROGRESSIONS), 1))
    prog = PROGRESSIONS[prog[0]]
    num, den = sigs[int(rng.integers(0, len(sigs)))]
    beats_per_bar = num * 4 / den
    tempo = float(rng.integers(t_lo, t_hi + 1))
    if quadrant is not None:
        scale = HARMONIC_MINOR if quadrant in (2, 3) else MAJOR
        if quadrant in (1, 2):   # high arousal: initial tempo >= 90
            tempo = float(rng.integers(max(t_lo, 90), max(t_hi, 96) + 1))
        else:                    # low arousal: initial tempo < 90
            tempo = float(rng.integers(min(t_lo, 56), 90))
    # valence-keyed dynamics: positive-valence (major) songs play brighter,
    # negative-valence (minor) softer — a second, velocity-field channel
    # for the valence bit, independent of the tempo/arousal channel
    vel_bias = -8 if scale is not MAJOR else 8

    m = MidiFile(ticks_per_beat=TPB)
    m.tempo_changes = [TempoChange(tempo, 0)]
    m.time_signature_changes = [TimeSignature(num, den, 0)]

    # POP909-style track names: the reference's melody labels come from the
    # TRACK NAME (convert.py:45-67,212-213 — MELODY/BRIDGE/PIANO, else
    # OTHER), so the corpus must use them for the melody-extraction finetune
    # to carry signal (round-2 verdict: "lead"/"acc" made every note OTHER).
    lead = Instrument(program=0 if style_name != "Band" else 73,
                      name="MELODY")
    lead.notes = melody_line(rng, root, scale, prog, n_bars, beats_per_bar,
                             reg, vel_bias=vel_bias)
    acc = Instrument(program=0 if style_name != "Band" else 48, name="PIANO")
    acc.notes = accompaniment(rng, root, scale, prog, n_bars, beats_per_bar,
                              acc_style, vel_bias=vel_bias)
    m.instruments = [lead, acc]
    if rng.random() < 0.7:  # secondary/counter melody an octave below
        bridge = Instrument(program=0 if style_name != "Band" else 71,
                            name="BRIDGE")
        bridge.notes = melody_line(rng, root, scale, prog, n_bars,
                                   beats_per_bar, reg - 12,
                                   vel_bias=vel_bias)
        # sparser than the lead: keep roughly every other note
        bridge.notes = bridge.notes[::2]
        m.instruments.append(bridge)

    # real-world messiness
    if rng.random() < 0.35:  # mid-piece tempo change(s)
        for _ in range(int(rng.integers(1, 4))):
            at = int(rng.integers(1, max(n_bars - 1, 2))) * beats_per_bar * BEAT
            m.tempo_changes.append(TempoChange(
                float(np.clip(tempo * rng.uniform(0.7, 1.4), 30, 200)),
                int(at)))
    if rng.random() < 0.2 and n_bars >= 16:  # time-signature change
        num2, den2 = sigs[int(rng.integers(0, len(sigs)))]
        m.time_signature_changes.append(
            TimeSignature(num2, den2, int(n_bars // 2 * beats_per_bar * BEAT)))
    if style_name == "Band":
        m.instruments.append(drum_track(rng, n_bars, beats_per_bar))
    if rng.random() < 0.25:  # overlapping doubled notes
        for n in list(lead.notes[:: max(1, len(lead.notes) // 10)]):
            lead.notes.append(Note(n.velocity - 10, n.pitch, n.start,
                                   min(n.end + BEAT, n.end * 2)))
    if rng.random() < 0.15:  # zero-length glitch notes (sequencer exports)
        for n in list(acc.notes[:: max(1, len(acc.notes) // 20)]):
            acc.notes.append(Note(n.velocity, n.pitch, n.start, n.start))
    # expose the ACTUAL mode for the emotion label: inferring it from the
    # first note's pitch class was random noise (round-3 review) — the
    # valence bit of Q labels carried no signal for procedural songs
    m.is_minor = scale is not MAJOR
    return m


def emotion_quadrant(m: MidiFile, minor: bool) -> int:
    fast = m.tempo_changes[0].tempo >= 90
    if fast and not minor:
        return 1   # happy/excited
    if fast and minor:
        return 2   # tense/angry
    if minor:
        return 3   # sad
    return 4       # calm


# ---------------------------------------------------------------------------


# Bump whenever generated corpus SEMANTICS change (labels, signal content):
# real_data_e2e.py stamps this into the corpus completion marker and refuses
# to reuse a stale corpus under new claims (round-5 review: the round-5
# learnable-valence changes would otherwise silently re-measure a
# natural-minor round-4 corpus in an existing workdir).
CORPUS_VERSION = 2  # 2 = learnable valence (harmonic minor, cadences, dynamics)


def make_corpus(out_dir: str, n_files: int = 160, seed: int = 2024):
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)
    count = 0

    def put(composer, midi, tag, minor=False):
        nonlocal count
        q = emotion_quadrant(midi, minor)
        d = os.path.join(out_dir, composer)
        os.makedirs(d, exist_ok=True)
        path = os.path.join(d, f"Q{q}_{tag}.mid")
        midi.dump(path)
        count += 1
        return path

    # public-domain pieces (with mild per-copy performance variation)
    for i in range(4):
        put("Bach", bach_prelude(rng), f"bwv846_{i}")
        put("Pachelbel", pachelbel_canon(rng, n_rounds=4 + i), f"canon_{i}")
        put("Beethoven", ode_to_joy(rng, variations=2 + i % 3), f"ode_{i}")
        put("Beethoven", fur_elise(rng), f"elise_{i}", minor=True)  # A minor

    # procedural composers; cycle the target quadrant so the emotion task
    # sees ~balanced classes (round-3 verdict weak #5: n=2 test class)
    styles = list(STYLES)
    per_style = max(1, (n_files - count - 6) // len(styles))
    q_cycle = 0
    for style in styles:
        for i in range(per_style):
            if i == 0 and style == "Etude":
                n_bars = int(rng.integers(280, 400))  # >255 bars: forces
                # the bar-window re-segmentation path (convert.py:423-445)
            elif i == 1 and style == "Minimal":
                n_bars = int(rng.integers(260, 300))
            else:
                n_bars = int(rng.integers(16, 120))
            q_cycle += 1
            m = procedural_song(rng, style, n_bars,
                                quadrant=(q_cycle % 4) + 1)
            put(style, m, f"{style.lower()}_{i}", minor=m.is_minor)

    # duplicates (dedup path) and corrupt files (error tolerance)
    dup_src = procedural_song(rng, "Folk", 24)
    put("Folk", dup_src, "dup_a", minor=dup_src.is_minor)
    put("Folk", dup_src, "dup_b", minor=dup_src.is_minor)
    bad_dir = os.path.join(out_dir, "Broken")
    os.makedirs(bad_dir, exist_ok=True)
    with open(os.path.join(bad_dir, "Q3_truncated.mid"), "wb") as f:
        from pianobart_tpu.midi.writer import midi_bytes
        raw = midi_bytes(procedural_song(rng, "Folk", 12))
        f.write(raw[: len(raw) // 3])
    with open(os.path.join(bad_dir, "Q3_garbage.mid"), "wb") as f:
        f.write(b"MThd\x00\x00\x00\x06\x00\x01\x00\x02\x01\xe0" +
                bytes(rng.integers(0, 256, 512, dtype=np.uint8)))
    count += 2
    print(f"wrote {count} files under {out_dir}")
    return out_dir


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "Data/corpus"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 160
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 2024
    make_corpus(out, n, seed)
