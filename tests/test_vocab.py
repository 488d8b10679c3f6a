"""Vocabulary invariants + parity with the reference Octuple.pkl when present."""
import os

import numpy as np
import pytest

from pianobart_tpu import vocab as V

REF_PKL = "/root/reference/Data/Octuple.pkl"
REF_DICT = "/root/reference/Data/dict.txt"


def test_field_sizes():
    # Data/dict.txt has exactly 1280 lines: these sizes are load-bearing.
    assert V.FIELD_SIZES == (262, 134, 135, 262, 134, 38, 260, 55)
    assert V.TOTAL_VOCAB == 1280
    assert V.FIELD_OFFSETS == (0, 262, 396, 531, 793, 927, 965, 1225)


def test_special_ids():
    # PAD..SEP occupy boundary+1..boundary+6 (make_dict.py:31-61 layout).
    assert V.PAD == (256, 128, 129, 256, 128, 32, 254, 49)
    assert V.EOS == tuple(p + 3 for p in V.PAD)
    for f in range(8):
        assert V.SEP[f] == V.FIELD_SIZES[f] - 1


def test_quantizer_roundtrips():
    # velocity
    for v in range(128):
        b = V.velocity_to_bin(v)
        assert 0 <= b <= V.MAX_VELOCITY_TOK
        assert V.velocity_to_bin(V.bin_to_velocity(b)) == b
    # tempo: log-quantized, clamped to [16, 256]
    assert V.tempo_to_bin(120.0) == round(np.log2(120 / 16) * 12)
    for e in range(V.MAX_TEMPO_TOK + 1):
        assert V.tempo_to_bin(V.bin_to_tempo(e)) == e
    assert V.tempo_to_bin(1.0) == 0
    assert V.tempo_to_bin(10_000.0) == V.MAX_TEMPO_TOK
    # duration geometric table
    assert V.DUR_ENC.shape[0] == sum(16 * 2 ** i for i in range(8))
    assert V.duration_to_bin(0) == 0
    for e in range(V.MAX_DURATION_TOK + 1):
        assert V.duration_to_bin(V.bin_to_duration(e)) == e
    # time signatures
    assert V.ts_to_bin(4, 4) == V.TS_DICT[(4, 4)]
    assert V.time_signature_reduce(8, 8) == (8, 8)
    assert V.time_signature_reduce(5, 1) == (1, 1)
    assert V.time_signature_reduce(6, 8) == (6, 8)
    assert V.time_signature_reduce(4, 256) == (1, 64)
    assert len(V.TS_LIST) == V.MAX_TS_TOK + 1


def test_e2w_w2e_consistency():
    vocab = V.VOCAB
    for f in vocab.fields:
        assert len(vocab.e2w[f]) == vocab.e2w[f][f"{f} <SEP>"] + 1
        for name, idx in vocab.e2w[f].items():
            assert vocab.w2e[f][idx] == name


@pytest.mark.skipif(not os.path.exists(REF_PKL), reason="reference pickle absent")
def test_parity_with_reference_pickle():
    V.OctupleVocab.from_pickle(REF_PKL)  # raises on mismatch


@pytest.mark.skipif(not os.path.exists(REF_DICT), reason="reference dict absent")
def test_dict_txt_line_count():
    with open(REF_DICT) as f:
        lines = [l for l in f if l.strip()]
    assert len(lines) == V.TOTAL_VOCAB


def test_make_dict_artifacts_match_reference(tmp_path):
    """`cli make-dict` emits Octuple.pkl + dict.txt matching the shipped
    reference artifacts (up to Python float-repr of tempo names)."""
    import os
    import pickle

    import pytest

    from pianobart_tpu.cli import main

    ref_txt = "/root/reference/Data/dict.txt"
    if not os.path.exists(ref_txt):
        pytest.skip("reference absent")
    assert main(["make-dict", "--out_dir", str(tmp_path)]) == 0

    ref = open(ref_txt).read().splitlines()
    mine = open(tmp_path / "dict.txt").read().splitlines()
    assert len(ref) == len(mine) == 1280
    diffs = [(a, b) for a, b in zip(ref, mine) if a != b]
    for a, b in diffs:  # only float-repr drift in tempo names is allowed
        assert a.startswith("Tempo ") and b.startswith("Tempo ")
        fa = float(a.split(" ", 1)[1].split(":")[0])
        fb = float(b.split(" ", 1)[1].split(":")[0])
        assert abs(fa - fb) < 1e-9

    with open("/root/reference/Data/Octuple.pkl", "rb") as f:
        e2w_ref, _ = pickle.load(f)
    with open(tmp_path / "Octuple.pkl", "rb") as f:
        e2w_mine, _ = pickle.load(f)
    for field in e2w_ref:
        assert set(e2w_ref[field].values()) == set(e2w_mine[field].values())
