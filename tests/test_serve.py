"""HTTP serving API tests (WSGI, no network needed)."""
import io
import json
import shutil

import numpy as np
import pytest

from pianobart_tpu.serve.app import create_app
from pianobart_tpu.midi.writer import midi_bytes
from tests.test_midi_io import make_song


def wsgi_call(app, method, path, body=b"", content_type=None):
    captured = {}

    def start_response(status, headers):
        captured["status"] = status
        captured["headers"] = dict(headers)

    environ = {
        "REQUEST_METHOD": method,
        "PATH_INFO": path,
        "wsgi.input": io.BytesIO(body),
        "CONTENT_LENGTH": str(len(body)),
    }
    if content_type:
        environ["CONTENT_TYPE"] = content_type
    out = b"".join(app(environ, start_response))
    return captured["status"], captured["headers"], out


def multipart(field, filename, data):
    boundary = "XtestX"
    body = (f"--{boundary}\r\nContent-Disposition: form-data; "
            f'name="{field}"; filename="{filename}"\r\n'
            f"Content-Type: application/octet-stream\r\n\r\n"
            ).encode() + data + f"\r\n--{boundary}--\r\n".encode()
    return body, f"multipart/form-data; boundary={boundary}"


@pytest.fixture
def app(tmp_path, monkeypatch, rng):
    monkeypatch.chdir(tmp_path)

    def fake_generate(midi_in, midi_out, seed=0):
        shutil.copyfile(midi_in, midi_out)  # echo "model"
        return True

    return create_app(generate_fn=fake_generate)


def test_health(app):
    status, _, body = wsgi_call(app, "GET", "/api/health")
    assert status == "200 OK"
    j = json.loads(body)
    assert j["status"] == "ok" and j["model_loaded"] is False


def test_index_page(app):
    status, headers, body = wsgi_call(app, "GET", "/")
    assert status == "200 OK"
    assert b"PianoBART" in body
    assert b"/api/upload" in body and b"/api/generate/" in body


def test_upload_generate_download_roundtrip(app, rng):
    data = midi_bytes(make_song(rng, n_notes=30))
    body, ctype = multipart("file", "song.mid", data)
    status, _, out = wsgi_call(app, "POST", "/api/upload", body, ctype)
    assert status == "200 OK"
    name = json.loads(out)["file"]

    status, _, out = wsgi_call(app, "GET", f"/api/generate/pianobart/{name}")
    assert status == "200 OK"
    gen = json.loads(out)
    assert gen["file"].startswith("gen_")

    status, headers, blob = wsgi_call(app, "GET", f"/api/outputs/{gen['file']}")
    assert status == "200 OK"
    assert blob == data  # fake generator echoes input


def test_upload_without_file(app):
    body, ctype = multipart("other", "x.mid", b"123")
    status, _, out = wsgi_call(app, "POST", "/api/upload", body, ctype)
    assert status == "400 Bad Request"


def test_generate_missing_file(app):
    status, _, out = wsgi_call(app, "GET", "/api/generate/pianobart/nope.mid")
    assert status == "404 Not Found"


def test_unknown_routes(app):
    assert wsgi_call(app, "GET", "/api/secrets/passwd")[0] == "404 Not Found"
    assert wsgi_call(app, "GET", "/nope")[0] == "404 Not Found"


def test_model_registry_selection(tmp_path, monkeypatch, rng):
    """The <model> path segment selects a registered checkpoint (the
    round-2 verdict: it was accepted and ignored); unknown names 404 with
    the available registry."""
    monkeypatch.chdir(tmp_path)
    served = []

    def fake_generate(midi_in, midi_out, seed=0):
        shutil.copyfile(midi_in, midi_out)
        served.append(midi_out)
        return True

    app = create_app(ckpts={"base": "ck_a", "finetuned": "ck_b"},
                     generate_fn=fake_generate)

    status, _, body = wsgi_call(app, "GET", "/api/health")
    j = json.loads(body)
    assert set(j["models"]) == {"base", "finetuned"}
    assert j["models"]["base"]["ckpt"] == "ck_a"

    data = midi_bytes(make_song(rng, n_notes=30))
    body, ctype = multipart("file", "song.mid", data)
    _, _, out = wsgi_call(app, "POST", "/api/upload", body, ctype)
    name = json.loads(out)["file"]

    status, _, out = wsgi_call(app, "GET", f"/api/generate/finetuned/{name}")
    assert status == "200 OK"
    assert json.loads(out)["model"] == "finetuned"

    status, _, out = wsgi_call(app, "GET", f"/api/generate/nope/{name}")
    assert status == "404 Not Found"
    j = json.loads(out)
    assert j["models"] == ["base", "finetuned"]


def test_generate_outputs_namespaced_per_model(tmp_path, monkeypatch, rng):
    """Two models generating from the SAME upload must write distinct
    output files — the round-3 review caught gen_<file> collisions where
    the second model silently overwrote the first's MIDI/WAV."""
    monkeypatch.chdir(tmp_path)

    def fake_generate(midi_in, midi_out, seed=0):
        with open(midi_out, "wb") as f:
            f.write(midi_out.encode())  # distinguishable payload
        return True

    app = create_app(ckpts={"base": "ck_a", "finetuned": "ck_b"},
                     generate_fn=fake_generate)
    data = midi_bytes(make_song(rng, n_notes=30))
    body, ctype = multipart("file", "song.mid", data)
    _, _, out = wsgi_call(app, "POST", "/api/upload", body, ctype)
    name = json.loads(out)["file"]

    outs = {}
    for model in ("base", "finetuned"):
        status, _, out = wsgi_call(app, "GET", f"/api/generate/{model}/{name}")
        assert status == "200 OK"
        outs[model] = json.loads(out)["file"]
    assert outs["base"] != outs["finetuned"]
    for model, fname in outs.items():
        assert model in fname
        status, _, body2 = wsgi_call(app, "GET", f"/api/outputs/{fname}")
        assert status == "200 OK"


def test_parse_ckpt_registry():
    from pianobart_tpu.serve.app import parse_ckpt_registry
    assert parse_ckpt_registry(None) == {"pianobart": None}
    assert parse_ckpt_registry(["a/b"]) == {"pianobart": "a/b"}
    assert parse_ckpt_registry(["x=p1", "y=p2", "bare"]) == {
        "x": "p1", "y": "p2", "pianobart": "bare"}
    # '=' inside a path component is NOT a registration: hyperparameter-
    # named run dirs (lr=1e-3) must stay bare paths
    assert parse_ckpt_registry(["result/pretrain/lr=1e-3/best"]) == {
        "pianobart": "result/pretrain/lr=1e-3/best"}
    assert parse_ckpt_registry(["=weird/path"]) == {
        "pianobart": "=weird/path"}
    with pytest.raises(SystemExit, match="duplicate"):
        parse_ckpt_registry(["x=p1", "x=p2"])


def test_generation_service_micro_batching():
    """Concurrent submits are coalesced into ONE batched decode (the
    reference serves strictly batch-1, model.py:29-31)."""
    import threading
    import time as _time

    import numpy as np

    from pianobart_tpu.serve.app import GenerationService

    svc = GenerationService(max_batch=8, batch_window_s=0.05)
    calls = []

    def fake_decode(intros, seeds):
        calls.append(len(seeds))
        _time.sleep(0.01)
        return intros + 1  # identifiable per-request output

    svc._decode_batch = fake_decode

    n = 6
    results = [None] * n
    def worker(i):
        intro = np.full((16, 8), i, dtype=np.int32)
        results[i] = svc.submit(intro, seed=i)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    for i in range(n):
        assert results[i] is not None
        np.testing.assert_array_equal(results[i], np.full((16, 8), i + 1))
    # the queue actually batched: fewer decode calls than requests
    assert sum(svc.batch_sizes_served) == n
    assert max(svc.batch_sizes_served) > 1


def test_generation_service_warmup_buckets():
    """warmup() compiles the decode at every reachable power-of-two bucket
    (and only those), so no live request ever pays a bucket's first
    compile (round-5 serve_bench: a cold bucket-2 drain stalled a
    measured volley 128 s)."""
    from types import SimpleNamespace

    from pianobart_tpu.serve.app import GenerationService

    for max_batch, expect in [(8, [1, 2, 4, 8]), (6, [1, 2, 4, 8]),
                              (1, [1]), (16, [1, 2, 4, 8, 16])]:
        svc = GenerationService(max_batch=max_batch)
        svc._ready = True  # skip model load
        svc.cfg = SimpleNamespace(max_len=16)
        calls = []
        svc._decode_batch = lambda intros, seeds: (
            calls.append(intros.shape), intros)[1]
        timings = svc.warmup()
        assert [s[0] for s in calls] == expect, (max_batch, calls)
        assert all(s[1:] == (16, 8) for s in calls)
        assert sorted(timings) == expect
        # warmup buckets == exactly what the worker's drain can produce
        assert {svc._bucket_of(n) for n in range(1, max_batch + 1)} == set(expect)

    # injectable-generate_fn services (tests/CPU smoke) have nothing to warm
    svc = GenerationService(generate_fn=lambda a, b, c: True)
    assert svc.warmup() == {}


def test_generation_service_warmup_real_decode():
    """warmup() through the REAL decode path (tiny config, CPU): compiles
    each bucket once, and a post-warm submit is served from cache —
    bounded well under one bucket's compile time."""
    import time as _time

    import jax.numpy as jnp
    import numpy as np

    from pianobart_tpu.models import PianoBartConfig
    from pianobart_tpu.serve.app import GenerationService

    cfg = PianoBartConfig(d_model=32, encoder_layers=1, decoder_layers=1,
                          ffn_dim=64, num_heads=2, max_len=16,
                          dtype=jnp.float32)
    svc = GenerationService(ckpt=None, max_batch=2, batch_window_s=0.01,
                            cfg=cfg)
    timings = svc.warmup()
    assert sorted(timings) == [1, 2]
    t0 = _time.time()
    out = svc.submit(np.zeros((16, 8), np.int64), seed=7)
    warm_submit_s = _time.time() - t0
    assert out.shape == (16, 8)
    # generous bound: a warm bucket-1 decode is a cache-hit dispatch, far
    # below the slowest bucket's compile
    assert warm_submit_s < max(timings.values()), (warm_submit_s, timings)


def test_generation_service_error_propagates():
    import numpy as np
    import pytest

    from pianobart_tpu.serve.app import GenerationService

    svc = GenerationService(batch_window_s=0.0)

    def boom(intros, seeds):
        raise RuntimeError("decode failed")

    svc._decode_batch = boom
    with pytest.raises(RuntimeError, match="decode failed"):
        svc.submit(np.zeros((4, 8), np.int32))
    # worker survives a failing batch and serves the next one
    svc._decode_batch = lambda intros, seeds: intros
    out = svc.submit(np.ones((4, 8), np.int32))
    np.testing.assert_array_equal(out, np.ones((4, 8), np.int32))


def test_demo_loads_merged_msgpack(tmp_path, rng, monkeypatch):
    """`demo --ckpt merged_params.msgpack` (output of `pbx merge`) grafts the
    merged trunk — regression: this path raised UnpicklingError (the loader
    fell through to the torch-pickle branch)."""
    import jax
    import jax.numpy as jnp
    from flax import linen as nn, serialization
    from pianobart_tpu.models import PianoBartConfig, PianoBartLM
    from pianobart_tpu.serve.demo import run_demo

    monkeypatch.chdir(tmp_path)
    # exactly the config run_demo builds from its flags (default emb_size)
    cfg = PianoBartConfig(d_model=64, encoder_layers=2, decoder_layers=2,
                          ffn_dim=128, num_heads=4, max_len=32,
                          dtype=jnp.bfloat16)
    model = PianoBartLM(cfg)
    S = cfg.max_len
    ids = jnp.zeros((1, S, 8), jnp.int32)
    m = jnp.ones((1, S))
    params = nn.meta.unbox(
        model.init(jax.random.PRNGKey(0), ids, ids, m, m))["params"]
    with open("merged.msgpack", "wb") as f:
        f.write(serialization.to_bytes({"pianobart": params["pianobart"]}))

    make_song(rng, n_notes=30).dump("in.mid")
    run_demo(input_path="in.mid", output_path="out.mid",
             ckpt="merged.msgpack", max_seq_len=cfg.max_len,
             hs=cfg.d_model, layers=cfg.encoder_layers,
             ffn_dims=cfg.ffn_dim, heads=cfg.num_heads)


def test_multipart_preserves_trailing_bytes():
    """Binary uploads ending in CR/LF or '--' must survive byte-for-byte:
    rstrip()+removesuffix('--') used to truncate them (round-3 review)."""
    import io
    from pianobart_tpu.serve.app import _parse_multipart_file

    for payload in (b"MThd\x00\x01\n\r\n", b"data--", b"x\r\n\r\n",
                    b"plain", b"ends-with-lf\n"):
        body, ctype = multipart("file", "a.mid", payload)
        environ = {"CONTENT_TYPE": ctype,
                   "CONTENT_LENGTH": str(len(body)),
                   "wsgi.input": io.BytesIO(body)}
        name, data = _parse_multipart_file(environ, "file")
        assert name == "a.mid"
        assert data == payload, payload


def test_run_demo_retries_seeds_until_nonempty(tmp_path, monkeypatch, rng):
    """A sampled-illegal first token must not kill the demo: run_demo retries
    fresh seeds (reusing the compiled decode) before giving up — the
    reference's one-shot 'Generate Fail!' (demo.py:102) is strictly worse."""
    import os

    import jax.numpy as jnp
    import numpy as np
    import pianobart_tpu.decode as decode
    from pianobart_tpu import vocab as V
    from pianobart_tpu.serve.demo import run_demo

    monkeypatch.chdir(tmp_path)
    make_song(rng, n_notes=30).dump("in.mid")
    S = 32
    calls = []

    def fake_generate(params, ids, rng=None, cfg=None, **kw):
        calls.append(1)
        grid = np.zeros((1, S, 8), np.int32)
        if len(calls) < 3:                      # first 2 seeds: illegal row 0
            grid[:, :, :] = np.asarray(V.PAD)
        else:                                   # 3rd seed: valid content
            grid[0, 4] = np.asarray(V.PAD) + 3  # EOS row
        return jnp.asarray(grid)

    monkeypatch.setattr(decode, "generate", fake_generate)
    run_demo(input_path="in.mid", output_path="out.mid", max_seq_len=S,
             hs=64, layers=1, ffn_dims=128, heads=2)
    assert len(calls) == 3
    assert os.path.exists("out.mid")

    # retries exhausted -> no file, no crash
    calls.clear()
    monkeypatch.setenv("PBX_DEMO_RETRIES", "2")
    run_demo(input_path="in.mid", output_path="out2.mid", max_seq_len=S,
             hs=64, layers=1, ffn_dims=128, heads=2)
    assert len(calls) == 2
    assert not os.path.exists("out2.mid")


def test_generate_reports_attempts_distinguishing_exhaustion(monkeypatch):
    """info['attempts'] counts ALL decode attempts (1-based): exhausting
    every retry reports attempts == PBX_DEMO_RETRIES with ok=False, while a
    last-attempt success has the same zero-based 'retries' value — the
    round-4 advisor flagged the two as indistinguishable."""
    import numpy as np

    from pianobart_tpu.serve import app as app_mod
    from pianobart_tpu.serve.app import GenerationService

    svc = GenerationService.__new__(GenerationService)
    svc._generate_fn = None
    svc._ready = True

    class Cfg:
        max_len = 4
    svc.cfg = Cfg()
    monkeypatch.setenv("PBX_DEMO_RETRIES", "3")
    monkeypatch.setattr(app_mod.GenerationService, "_ensure",
                        lambda self: None, raising=False)

    class Req:
        result = np.zeros((4, 8), np.int32)
        served_n = 1

    svc._submit_req = lambda intro, seed: Req()
    import pianobart_tpu.serve.demo as demo_mod
    monkeypatch.setattr(demo_mod, "midi_to_window",
                        lambda p, s: np.zeros((1, 4, 8), np.int32))

    # every attempt fails -> attempts == 3, ok False
    monkeypatch.setattr(demo_mod, "window_to_midi", lambda w, p: False)
    ok, info = svc.generate("in.mid", "out.mid", seed=0)
    assert not ok and info["attempts"] == 3 and info["retries"] == 2

    # success on the SECOND attempt -> attempts == 2, ok True
    state = {"n": 0}

    def second_try(w, p):
        state["n"] += 1
        return state["n"] >= 2
    monkeypatch.setattr(demo_mod, "window_to_midi", second_try)
    ok, info = svc.generate("in.mid", "out.mid", seed=0)
    assert ok and info["attempts"] == 2 and info["retries"] == 1
