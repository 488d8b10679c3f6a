"""HTTP serving backend.

Equivalent of the reference Flask app (``gui/backend/app.py``):

* ``POST /api/upload``                — store a MIDI, render audio preview
* ``GET  /api/generate/<model>/<f>``  — continuation for an uploaded MIDI
* ``GET  /api/<folder>/<file>``       — artifact download
* ``GET  /api/health``                — liveness + model info (new)

Audio rendering shells out to FluidSynth when available (the reference uses
``midi2audio``, app.py:45); without it the endpoints still serve MIDI.
The generation model is loaded ONCE and reused across requests (the
reference reloads the full checkpoint per request, app.py:71-93).
"""
from __future__ import annotations

import os
import shutil
import subprocess
import time
import uuid
from typing import Optional

UPLOAD_DIR = "uploads"
OUTPUT_DIR = "outputs"


def _render_audio(midi_path: str, wav_path: str) -> bool:
    exe = shutil.which("fluidsynth")
    if not exe:
        return False
    try:
        subprocess.run([exe, "-ni", "-F", wav_path, midi_path],
                       check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


class GenerationService:
    """Holds the jitted model + params; thread-safe enough for Flask dev use."""

    def __init__(self, ckpt: Optional[str] = None, max_seq_len: int = 1024):
        self.ckpt = ckpt
        self.max_seq_len = max_seq_len
        self._ready = False

    def _ensure(self):
        if self._ready:
            return
        import jax
        import jax.numpy as jnp
        from flax import linen as nn
        from ..models import PianoBartConfig, PianoBartLM
        self.cfg = PianoBartConfig(dtype=jnp.bfloat16)
        model = PianoBartLM(self.cfg)
        rng = jax.random.PRNGKey(0)
        S = self.cfg.max_len
        ids = jnp.zeros((1, S, 8), jnp.int32)
        m = jnp.ones((1, S))
        params = nn.meta.unbox(model.init(rng, ids, ids, m, m))
        if self.ckpt:
            if os.path.isdir(self.ckpt):
                from ..train.state import CheckpointManager
                restored = CheckpointManager(self.ckpt).restore_params(
                    params["params"])
                params = {"params": restored}
            else:
                from ..compat.torch_import import import_checkpoint
                tree = import_checkpoint(self.ckpt, self.cfg)
                merged = dict(params["params"])
                merged.update({k: v for k, v in tree.items() if k in merged})
                params = {"params": merged}
        self.params = params
        self._ready = True

    def generate(self, midi_in: str, midi_out: str, seed: int = 0) -> bool:
        self._ensure()
        import jax
        import jax.numpy as jnp
        from ..decode import generate as gen
        from .demo import midi_to_window, window_to_midi
        import numpy as np
        intro = jnp.asarray(midi_to_window(midi_in, self.cfg.max_len))
        out = gen(self.params, intro, rng=jax.random.PRNGKey(seed),
                  cfg=self.cfg)
        return window_to_midi(np.asarray(out[0]), midi_out)


def create_app(ckpt: Optional[str] = None):
    from flask import Flask, jsonify, request, send_from_directory

    app = Flask(__name__)
    os.makedirs(UPLOAD_DIR, exist_ok=True)
    os.makedirs(OUTPUT_DIR, exist_ok=True)
    service = GenerationService(ckpt=ckpt)

    @app.get("/api/health")
    def health():
        return jsonify({"status": "ok", "ckpt": ckpt,
                        "model_loaded": service._ready})

    @app.post("/api/upload")
    def upload():
        f = request.files.get("file")
        if f is None or not f.filename:
            return jsonify({"error": "no file"}), 400
        name = f"{uuid.uuid4().hex[:8]}_{os.path.basename(f.filename)}"
        path = os.path.join(UPLOAD_DIR, name)
        f.save(path)
        wav = path.rsplit(".", 1)[0] + ".wav"
        audio = _render_audio(path, wav)
        return jsonify({"file": name,
                        "audio": os.path.basename(wav) if audio else None})

    @app.get("/api/generate/<model>/<path:fname>")
    def generate(model, fname):
        src = os.path.join(UPLOAD_DIR, os.path.basename(fname))
        if not os.path.exists(src):
            return jsonify({"error": "not uploaded"}), 404
        out_name = f"gen_{os.path.basename(fname)}"
        out = os.path.join(OUTPUT_DIR, out_name)
        t0 = time.time()
        ok = service.generate(src, out)
        if not ok:
            return jsonify({"error": "generation produced no notes"}), 500
        wav = out.rsplit(".", 1)[0] + ".wav"
        audio = _render_audio(out, wav)
        return jsonify({"file": out_name,
                        "audio": os.path.basename(wav) if audio else None,
                        "latency_s": round(time.time() - t0, 3)})

    @app.get("/api/<folder>/<path:fname>")
    def download(folder, fname):
        root = {"uploads": UPLOAD_DIR, "outputs": OUTPUT_DIR}.get(folder)
        if root is None:
            return jsonify({"error": "unknown folder"}), 404
        return send_from_directory(os.path.abspath(root),
                                   os.path.basename(fname))

    return app
