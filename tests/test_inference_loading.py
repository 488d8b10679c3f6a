"""Inference-params loading: eval_shape skeleton + device residency.

Round-4 serving fix: the serving/demo load path used to run a real
``model.init`` (compile + full forward just for shapes; 983 s cold start
at flagship dims through the remote helper) and left restored params as
HOST numpy — which jax re-uploads on EVERY generate dispatch (~15 s/call
for the 550 MB flagship tree through the axon tunnel, measured 37x the
device-resident decode).  ``decode.load_inference_params`` is the shared
fix; these tests pin its contract on CPU at tiny dims.
"""
import jax
import jax.numpy as jnp
import numpy as np

from pianobart_tpu.decode import generate, load_inference_params
from pianobart_tpu.models import PianoBartLM, tiny_config
from pianobart_tpu.train.state import (CheckpointManager, TrainState,
                                       make_optimizer)


def _tiny_state(cfg, seed=0):
    from flax import linen as nn
    model = PianoBartLM(cfg)
    S = cfg.max_len
    rng = jax.random.PRNGKey(seed)
    ids = jnp.zeros((1, S, 8), jnp.int32)
    m = jnp.ones((1, S))
    variables = nn.meta.unbox(model.init(rng, ids, ids, m, m))
    return TrainState.create(apply_fn=model.apply,
                             params=variables["params"],
                             tx=make_optimizer())


def _save_tiny_ckpt(tmp_path, cfg, seed=0):
    state = _tiny_state(cfg, seed)
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(0, state, {"weighted_acc": 1.0}, is_best=True)
    return str(tmp_path / "ckpt"), state.params


def test_load_is_device_resident_and_value_exact(tmp_path):
    cfg = tiny_config()
    ckpt, saved = _save_tiny_ckpt(tmp_path, cfg)
    params = load_inference_params(cfg, ckpt)
    leaves = jax.tree_util.tree_leaves(params)
    assert leaves, "empty param tree"
    for leaf in leaves:
        # the whole point: committed jax Arrays, not host numpy
        assert isinstance(leaf, jax.Array), type(leaf)
    flat_l, _ = jax.tree_util.tree_flatten(params["params"])
    flat_s, _ = jax.tree_util.tree_flatten(saved)
    assert len(flat_l) == len(flat_s)
    for got, want in zip(flat_l, flat_s):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_load_without_checkpoint_initializes_and_generates(tmp_path):
    cfg = tiny_config()
    params = load_inference_params(cfg, None, rng_seed=3)
    for leaf in jax.tree_util.tree_leaves(params):
        assert isinstance(leaf, jax.Array)
    out = generate(params, np.zeros((1, cfg.max_len, 8), np.int32), cfg=cfg,
                   max_steps=4)
    assert np.asarray(out).shape == (1, cfg.max_len, 8)


def test_trunk_only_msgpack_fills_head_from_init(tmp_path):
    """A trunk-only graft leaves the lm_head uncovered; the loader must
    fill those leaves with real init values, never ShapeDtypeStructs."""
    from flax import serialization
    cfg = tiny_config()
    state = _tiny_state(cfg, seed=7)
    trunk = jax.tree.map(lambda x: np.asarray(x) + 1.0,
                         state.params["pianobart"])
    path = tmp_path / "trunk.msgpack"
    path.write_bytes(serialization.msgpack_serialize(
        {"pianobart": jax.tree.map(np.asarray, trunk)}))

    params = load_inference_params(cfg, str(path))
    for leaf in jax.tree_util.tree_leaves(params):
        assert isinstance(leaf, jax.Array)
        assert not isinstance(leaf, jax.ShapeDtypeStruct)
    # trunk leaves came from the msgpack ...
    got = jax.tree_util.tree_leaves(params["params"]["pianobart"])
    want = jax.tree_util.tree_leaves(trunk)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
    # ... and the head has concrete (initialized) values
    assert "lm_head" in params["params"]


def test_serving_service_uses_device_params(tmp_path):
    """GenerationService._ensure goes through the shared loader (tiny cfg
    injected so the test never builds the flagship model)."""
    from pianobart_tpu.serve.app import GenerationService
    cfg = tiny_config()
    ckpt, _ = _save_tiny_ckpt(tmp_path, cfg)
    svc = GenerationService(ckpt=ckpt, cfg=cfg)
    svc._ensure()
    assert svc.cfg is cfg
    for leaf in jax.tree_util.tree_leaves(svc.params):
        assert isinstance(leaf, jax.Array)


def test_serving_retries_empty_continuations(tmp_path, monkeypatch):
    """An empty continuation is retried with a fresh seed before failing
    (parity with run_demo's retry; reference one-shots + prints
    "Generate Fail!", demo.py:102)."""
    from pianobart_tpu.serve import demo as demo_mod
    from pianobart_tpu.midi import (Instrument, MidiFile, Note, TempoChange,
                                    TimeSignature)
    from pianobart_tpu.serve.app import GenerationService

    m = MidiFile(ticks_per_beat=480)
    m.tempo_changes = [TempoChange(120.0, 0)]
    m.time_signature_changes = [TimeSignature(4, 4, 0)]
    tr = Instrument(program=0, name="MELODY")
    for i in range(16):
        tr.notes.append(Note(64, 60 + i % 12, i * 240, i * 240 + 200))
    m.instruments = [tr]
    midi_in = tmp_path / "in.mid"
    m.dump(str(midi_in))

    cfg = tiny_config()
    svc = GenerationService(ckpt=None, cfg=cfg, batch_window_s=0.0)
    calls = []

    def fake_window_to_midi(octuple, out_path):
        calls.append(np.asarray(octuple).shape)
        return len(calls) >= 3  # fail twice, succeed third

    monkeypatch.setattr(demo_mod, "window_to_midi", fake_window_to_midi)
    ok, info = svc.generate(str(midi_in), str(tmp_path / "out.mid"), seed=5)
    assert ok
    assert info["retries"] == 2
    assert len(calls) == 3
