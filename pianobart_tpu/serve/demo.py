"""MIDI continuation demo.

Equivalent of reference ``demo.py``: tokenize an input MIDI keeping the
*last* 1024 tokens, run KV-cached generation, clean the output (first
illegal/special token becomes ``<EOS>``; drum pitches dropped,
demo.py:72-102), and write the continuation MIDI.
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

from .. import vocab as V
from ..midi.parser import read_midi
from ..tokenizer.codec import midi_to_octuple, octuple_to_midi
from ..tokenizer.segment import pad_segment

__all__ = ["midi_to_window", "clean_generated", "window_to_midi", "run_demo"]


def midi_to_window(midi_path: str, window: int = V.MAX_WINDOW) -> np.ndarray:
    """MIDI file -> (1, window, 8) intro grid, keeping the LAST tokens
    (demo.py:61-68 / convert.py:326-327)."""
    midi = read_midi(midi_path)
    enc = midi_to_octuple(midi, task="pretrain")
    if not enc:
        raise ValueError(f"no notes in {midi_path}")
    rows = pad_segment(list(enc), window=window, last=True)
    return np.asarray([rows], dtype=np.int32)


def clean_generated(octuple: np.ndarray) -> np.ndarray:
    """Truncate at the first illegal token (demo.py:78-89): any field >= its
    PAD id, or a drum-range pitch (>127) — the demo does not emit drums."""
    grid = np.array(octuple).reshape(-1, 8)
    pad = np.asarray(V.PAD)
    eos = pad + 3
    S = grid.shape[0]
    end = S
    for i in range(S):
        row = grid[i]
        if (row >= pad).any() or row[3] > 127:
            end = i
            break
    if end < S:
        grid[end] = eos
        grid[end + 1:] = pad
    else:
        grid[-1] = eos
    return grid


def window_to_midi(octuple: np.ndarray, out_path: str) -> bool:
    """Cleaned grid -> .mid; returns False when generation was empty
    (demo.py:91-102)."""
    grid = clean_generated(octuple)
    content = []
    for row in grid:
        if row[0] == V.EOS[0]:
            break
        content.append(tuple(int(x) for x in row))
    if not content:
        return False
    midi = octuple_to_midi(content)
    midi.dump(out_path)
    return True


def run_demo(input_path: str, output_path: str = "./output.mid",
             ckpt: Optional[str] = None, max_seq_len: int = 1024,
             hs: int = 1024, layers: int = 8, ffn_dims: int = 2048,
             heads: int = 8, nopretrain: bool = False,
             rng_seed: int = 0,
             force_full: bool = False) -> Tuple[np.ndarray, np.ndarray]:
    import jax
    import jax.numpy as jnp
    from ..decode import generate, load_inference_params
    from ..models import PianoBartConfig

    cfg = PianoBartConfig(d_model=hs, encoder_layers=layers,
                          decoder_layers=layers, ffn_dim=ffn_dims,
                          num_heads=heads, max_len=max_seq_len,
                          dtype=jnp.bfloat16)
    intro = midi_to_window(input_path, window=max_seq_len)
    # device-resident params via eval_shape skeleton + one device_put
    # (host-resident params re-upload the whole tree per generate call —
    # ~15 s each at flagship dims through the tunnel; decode.py docstring)
    params = load_inference_params(
        cfg, ckpt if ckpt and not nopretrain else None, rng_seed=rng_seed)

    # The reference demo is one-shot: a sampled first token outside the
    # legal range truncates the whole continuation to nothing and it just
    # prints "Generate Fail!" (demo.py:102).  Retry a few seeds before
    # giving up — the compiled decode program is reused, so each retry
    # costs only one ~0.4 s generate call.
    retries = int(os.environ.get("PBX_DEMO_RETRIES", "4"))
    out = None
    for attempt in range(max(1, retries)):
        out = generate(params, jnp.asarray(intro),
                       rng=jax.random.PRNGKey(rng_seed + 1 + attempt),
                       cfg=cfg, force_full=force_full)
        out = np.asarray(out[0])
        ok = window_to_midi(out, output_path)
        if ok:
            break
        print(f"empty continuation (seed {rng_seed + 1 + attempt}); retrying")
    print(f"Saved to {output_path}" if ok else "Generate Fail! (empty)")
    return intro, out
