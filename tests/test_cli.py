"""CLI smoke tests: every subcommand parses; pretrain runs end-to-end."""
import os

import numpy as np
import pytest

from pianobart_tpu.cli import build_parser, main
from tests.test_midi_io import make_song


def test_all_subcommands_parse():
    p = build_parser()
    p.parse_args(["pretrain"])
    p.parse_args(["finetune", "--task", "melody", "--dataset", "POP909"])
    p.parse_args(["finetune-generation"])
    p.parse_args(["ablation"])
    p.parse_args(["tokenize", "--dataset", "x"])
    p.parse_args(["demo", "--input", "x.mid"])
    p.parse_args(["eval-gen", "--dataroot", "d"])
    p.parse_args(["merge", "--models", "a", "b", "--head_from", "a"])
    p.parse_args(["concat", "--dataroot", "d", "--datasets", "a",
                  "--output", "o.npy"])
    p.parse_args(["convert-ckpt", "--ckpt", "a", "--output", "b"])
    p.parse_args(["export-ckpt", "--ckpt", "a", "--output", "b"])
    p.parse_args(["check", "--file", "f.npy"])
    p.parse_args(["serve"])


def test_cli_pretrain_end_to_end(tmp_path, rng, monkeypatch):
    monkeypatch.chdir(tmp_path)
    os.makedirs("songs")
    for i in range(8):
        make_song(rng, n_notes=60).dump(f"songs/s{i}.mid")
    assert main(["tokenize", "--dataset", "songs", "--task", "pretrain",
                 "--pad"]) == 0
    import shutil
    for split in ("train", "valid", "test"):
        src = f"Data/output_pretrain/songs/songs_{split}.npy"
        if os.path.exists(src):
            shutil.copyfile(
                src, f"Data/output_pretrain/songs/songs_{split}_split.npy")
    assert main(["pretrain", "--dataroot", "Data/output_pretrain",
                 "--datasets", "songs", "--batch_size", "2", "--epochs", "1",
                 "--hs", "64", "--layers", "1", "--ffn_dims", "64",
                 "--heads", "4", "--dtype", "f32", "--name", "smoke",
                 "--mesh", "2x1x1"]) == 0
    assert os.path.exists("result/pretrain/smoke/log")
    assert os.path.exists("result/pretrain/smoke/best")

    # batch not divisible by the device count and no explicit --mesh: the
    # CLI must refuse with guidance instead of silently idling 7 devices
    import pytest
    with pytest.raises(SystemExit, match="divisible"):
        main(["pretrain", "--dataroot", "Data/output_pretrain",
              "--datasets", "songs", "--batch_size", "2", "--epochs", "1",
              "--hs", "64", "--layers", "1", "--ffn_dims", "64",
              "--heads", "4", "--dtype", "f32", "--name", "smoke2"])


def test_cli_pretrain_on_virtual_mesh(tmp_path, rng, monkeypatch):
    """Multi-device pretrain through the CLI (dp*tp mesh on 8 CPU devices)."""
    monkeypatch.chdir(tmp_path)
    os.makedirs("songs")
    for i in range(8):
        make_song(rng, n_notes=60).dump(f"songs/s{i}.mid")
    main(["tokenize", "--dataset", "songs", "--task", "pretrain", "--pad"])
    import shutil
    for split in ("train", "valid", "test"):
        src = f"Data/output_pretrain/songs/songs_{split}.npy"
        if os.path.exists(src):
            shutil.copyfile(
                src, f"Data/output_pretrain/songs/songs_{split}_split.npy")
    assert main(["pretrain", "--dataroot", "Data/output_pretrain",
                 "--datasets", "songs", "--batch_size", "4", "--epochs", "1",
                 "--hs", "64", "--layers", "1", "--ffn_dims", "64",
                 "--heads", "4", "--dtype", "f32", "--name", "meshsmoke",
                 "--mesh", "4x2x1"]) == 0
    assert os.path.exists("result/pretrain/meshsmoke/best")


def test_cli_sequence_parallel_pretrain_end_to_end(tmp_path, rng, monkeypatch):
    """Long-context training is a USER-FACING feature now: tokenize with
    --max_seq_len 2048 --no_pad, then `pretrain --mesh 2x1x4` routes through
    the ring-attention sequence-parallel step on the virtual mesh."""
    monkeypatch.chdir(tmp_path)
    os.makedirs("songs")
    for i in range(6):
        make_song(rng, n_notes=400).dump(f"songs/s{i}.mid")
    assert main(["tokenize", "--dataset", "songs", "--task", "pretrain",
                 "--no_pad", "--max_seq_len", "2048"]) == 0
    arr = np.load("Data/output_pretrain/songs/songs_train_split.npy")
    assert arr.shape[1:] == (2048, 8)

    assert main(["pretrain", "--dataroot", "Data/output_pretrain",
                 "--datasets", "songs", "--batch_size", "4", "--epochs", "1",
                 "--hs", "64", "--layers", "1", "--ffn_dims", "64",
                 "--heads", "4", "--dtype", "f32", "--name", "spsmoke",
                 "--max_seq_len", "2048", "--mesh", "2x1x4"]) == 0
    assert os.path.exists("result/pretrain/spsmoke/best")
    log = open("result/pretrain/spsmoke/log").read()
    assert "Epoch 1" in log

    # window/config mismatch must fail fast with guidance
    with pytest.raises(SystemExit, match="max_seq_len"):
        main(["pretrain", "--dataroot", "Data/output_pretrain",
              "--datasets", "songs", "--batch_size", "4", "--epochs", "1",
              "--hs", "64", "--layers", "1", "--ffn_dims", "64",
              "--heads", "4", "--dtype", "f32", "--name", "spbad",
              "--max_seq_len", "1024", "--mesh", "2x1x4"])


def test_cli_concat_merges_shards(tmp_path, monkeypatch):
    """`concat` mirrors reference concatenate.py:16-38: merge per-dataset
    *_split.npy shards into one (N, S, 8) array."""
    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(0)
    total = 0
    for ds, n in (("pop", 3), ("asap", 2)):
        os.makedirs(f"data/{ds}")
        for split, k in (("train", n), ("test", 1), ("valid", 1)):
            arr = rng.integers(0, 100, (k, 16, 8)).astype(np.int64)
            np.save(f"data/{ds}/{ds}_{split}_split.npy", arr)
            total += k
    assert main(["concat", "--dataroot", "data", "--datasets", "pop", "asap",
                 "--output", "pretrain.npy"]) == 0
    merged = np.load("pretrain.npy")
    assert merged.shape == (total, 16, 8)


def test_cli_eval_gen_saves_stacked_outputs(tmp_path, monkeypatch):
    """`eval-gen` decodes every test sample (tail batch padded, then cut)
    and saves one stacked (N, S, 8) array (reference eval_generation.py)."""
    monkeypatch.chdir(tmp_path)
    import pianobart_tpu.vocab as V
    rng = np.random.default_rng(1)
    N, S = 3, 32
    X = np.zeros((N, S, 8), dtype=np.int64)
    for f in range(8):
        X[..., f] = rng.integers(0, V.TOKEN_BOUNDARY[f], (N, S))
    os.makedirs("data")
    np.save("data/tiny_test.npy", X)
    assert main(["eval-gen", "--dataroot", "data", "--datasets", "tiny",
                 "--output", "gen.npy", "--hs", "64", "--layers", "1",
                 "--ffn_dims", "64", "--heads", "4", "--dtype", "f32",
                 "--batch_size", "2", "--max_seq_len", "32",
                 "--mesh", "2x1x1"]) == 0
    out = np.load("gen.npy")
    assert out.shape == (N, S, 8)          # every sample, tail included
    for f in range(8):                      # in-vocab (specials allowed)
        assert (out[..., f] <= V.EOS[f]).all()


def test_cli_msgpack_ckpt_mismatch_fails_fast(tmp_path, monkeypatch):
    """--ckpt pointing at a .msgpack whose keys match nothing in the model
    must exit with guidance instead of training from random init."""
    monkeypatch.chdir(tmp_path)
    from flax import serialization
    with open("bogus.msgpack", "wb") as f:
        f.write(serialization.to_bytes({"wrong_key": {"w": np.zeros(3)}}))
    os.makedirs("data")
    X = np.zeros((4, 32, 8), dtype=np.int64)
    np.save("data/data_train_split.npy", X)
    np.save("data/data_test_split.npy", X)
    with pytest.raises(SystemExit, match="none match"):
        main(["pretrain", "--dataroot", ".", "--datasets", "data",
              "--batch_size", "2", "--epochs", "1", "--hs", "64",
              "--layers", "1", "--ffn_dims", "64", "--heads", "4",
              "--dtype", "f32", "--max_seq_len", "32", "--name", "x",
              "--mesh", "2x1x1", "--ckpt", "bogus.msgpack"])


def test_cli_serve_warm_flag_prewarms_every_service(monkeypatch, capsys):
    """`serve --warm` must call GenerationService.warmup() once per
    registered model BEFORE entering the request loop (the pre-warm is the
    serving bench's enabling fix: a cold decode bucket costs a multi-minute
    compile mid-request), and plain `serve` must not."""
    import pianobart_tpu.cli as cli

    class FakeService:
        def __init__(self):
            self.warm_calls = 0

        def warmup(self):
            self.warm_calls += 1
            return {1: 0.01}

    class FakeApp:
        def __init__(self):
            self.services = {"a": FakeService(), "b": FakeService()}
            self.ran = False

        def run(self, host, port):
            self.ran = True

    made = []

    def fake_create_app(**kw):
        app = FakeApp()
        made.append(app)
        return app

    import pianobart_tpu.serve.app as serve_app
    monkeypatch.setattr(serve_app, "create_app", fake_create_app)

    assert cli.main(["serve", "--warm"]) == 0
    app = made[-1]
    assert app.ran
    assert all(s.warm_calls == 1 for s in app.services.values())
    out = capsys.readouterr().out
    assert "warmed 'a' decode buckets" in out

    assert cli.main(["serve"]) == 0
    app2 = made[-1]
    assert app2.ran
    assert all(s.warm_calls == 0 for s in app2.services.values())
