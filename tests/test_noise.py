"""Corruption ops: invariants + statistical parity with reference gen_mask."""
import importlib.util
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pianobart_tpu import vocab as V
from pianobart_tpu.ops import noise

S = 64
P = 0.15


@pytest.fixture
def sample(rng):
    x = np.zeros((S, 8), dtype=np.int32)
    x[:, 0] = np.arange(S) // 4
    x[:, 1] = np.arange(S) % 4
    x[:, 3] = rng.integers(0, 128, S)
    x[-1] = V.EOS
    return jnp.asarray(x)


def key(i=0):
    return jax.random.PRNGKey(i)


def test_token_deletion_invariants(sample):
    x = np.asarray(sample)
    out, loss = noise.token_deletion(key(1), sample, P)
    out, loss = np.asarray(out), np.asarray(loss)
    n_del = int(S * P)
    # tail is PAD
    assert (out[S - n_del:] == np.asarray(V.PAD)).all()
    # survivors keep order: out[:S-n_del] is a subsequence of x
    it = iter(map(tuple, x.tolist()))
    assert all(tuple(r) in it or True for r in out[:S - n_del])  # order check below
    xi = 0
    for r in map(tuple, out[:S - n_del].tolist()):
        while xi < S and tuple(x[xi]) != r:
            xi += 1
        assert xi < S, "survivor rows out of order"
        xi += 1
    # loss is a suffix
    idx = np.where(loss)[0]
    assert len(idx) > 0 and (np.diff(idx) == 1).all() and idx[-1] == S - 1


def test_token_deletion_uniformity(sample):
    hits = np.zeros(S)
    for i in range(200):
        _, loss = noise.token_deletion(key(i), sample, P)
        first = int(np.argmax(np.asarray(loss)))
        hits[first] += 1
    # first deleted index = min of a uniform subset: concentrated near 0
    assert hits[:S // 4].sum() > hits[S // 4:].sum()


def test_token_mask_counts(sample):
    k = round(S * P)
    n80, n10 = round(k * 0.8), round(k * 0.1)
    out, loss = noise.token_mask(key(2), sample, P)
    out, loss = np.asarray(out), np.asarray(loss)
    assert int(loss.sum()) == k
    mask_rows = (out == np.asarray(V.MASK)).all(-1)
    assert mask_rows.sum() == n80
    # masked/random rows only at loss positions
    changed = (out != np.asarray(sample)).any(-1)
    assert (changed <= loss.astype(bool)).all()


def test_sentence_permutation_preserves_multiset(sample):
    out, loss = noise.sentence_permutation(key(3), sample)
    out = np.asarray(out)
    x = np.asarray(sample)
    assert sorted(map(tuple, out.tolist())) == sorted(map(tuple, x.tolist()))
    # intra-bar order preserved
    for b in np.unique(x[:, 0]):
        np.testing.assert_array_equal(out[out[:, 0] == b], x[x[:, 0] == b])
    np.testing.assert_array_equal(np.asarray(loss), (out != x).any(-1))


def test_token_infilling_invariants(sample):
    x = np.asarray(sample)
    saw_mask = False
    for i in range(10):
        out, loss = noise.token_infilling(key(10 + i), sample, P)
        out = np.asarray(out)
        assert out.shape == (S, 8)
        mask_rows = (out == np.asarray(V.MASK)).all(-1)
        saw_mask = saw_mask or mask_rows.any()
        # non-mask non-pad rows appear in the original, in order
        content = out[~mask_rows]
        orig = list(map(tuple, x.tolist()))
        xi = 0
        for r in map(tuple, content.tolist()):
            if r == tuple(V.PAD):
                continue
            while xi < len(orig) and orig[xi] != r:
                xi += 1
            assert xi < len(orig), "infilled rows out of order"
            xi += 1
    assert saw_mask, "no MASK inserted across 10 draws"


def test_infilling_zero_percent_identity(sample):
    out, loss = noise.token_infilling(key(4), sample, 0.0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(sample))
    assert int(np.asarray(loss).sum()) == 0


def test_document_rotation(sample):
    out, loss = noise.document_rotation(key(5), sample)
    out = np.asarray(out)
    x = np.asarray(sample)
    # find rotation r
    matches = [r for r in range(S) if (np.roll(x, -r, axis=0) == out).all()]
    assert matches, "output is not a rotation"
    r = matches[0]
    assert np.asarray(loss).all() == (r != 0)


def test_bar_level_variants_run(sample):
    for fn in (noise.bar_mask, noise.bar_deletion):
        out, loss = fn(key(6), sample, 0.3)
        assert np.asarray(out).shape == (S, 8)
    out, loss = noise.bar_infilling(key(7), sample, 0.3)
    assert np.asarray(out).shape == (S, 8)
    out, loss = noise.token_mask_element(key(8), sample, P)
    assert np.asarray(loss).shape == (S, 8)
    assert int(np.asarray(loss).sum()) == round(S * 8 * P)


def test_corrupt_batch_shapes(sample):
    batch = jnp.stack([sample] * 6)
    out, lm = noise.corrupt_batch(key(9), batch, P)
    assert out.shape == (6, S, 8) and lm.shape == (6, S, 8)
    # loss mask uniform across fields
    lm = np.asarray(lm)
    assert (lm == lm[..., :1]).all()
    # at least some corruption happened
    assert lm.sum() > 0


# ---------------------------------------------------------------------------
# Statistical parity with the reference gen_mask (torch, CPU).
# ---------------------------------------------------------------------------
REF = "/root/reference"


@pytest.fixture(scope="module")
def ref_pretrainer():
    if not os.path.exists(os.path.join(REF, "pretrain.py")):
        pytest.skip("reference absent")
    torch = pytest.importorskip("torch")
    import pickle
    sys.path.insert(0, REF)
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_pianobart2", os.path.join(REF, "PianoBart.py"))
        ref_pb = importlib.util.module_from_spec(spec)
        sys.modules["PianoBart"] = ref_pb
        spec.loader.exec_module(ref_pb)
        sys.modules["model"] = None  # force re-import below
        spec2 = importlib.util.spec_from_file_location(
            "ref_model2", os.path.join(REF, "model.py"))
        ref_model = importlib.util.module_from_spec(spec2)
        sys.modules["model"] = ref_model
        spec2.loader.exec_module(ref_model)
        # the reference targets transformers 4.29 which still exported AdamW;
        # patch AFTER the Bart import above (transformers' lazy-module
        # machinery replaces sys.modules["transformers"] on first real use).
        if not hasattr(sys.modules["transformers"], "AdamW"):
            sys.modules["transformers"].AdamW = torch.optim.AdamW
        spec3 = importlib.util.spec_from_file_location(
            "ref_pretrain", os.path.join(REF, "pretrain.py"))
        ref_pre = importlib.util.module_from_spec(spec3)
        spec3.loader.exec_module(ref_pre)
        with open(os.path.join(REF, "Data/Octuple.pkl"), "rb") as f:
            e2w, w2e = pickle.load(f)
        from transformers import BartConfig
        pb = ref_pb.PianoBart(
            BartConfig(max_position_embeddings=S, d_model=16,
                       encoder_layers=1, decoder_layers=1,
                       encoder_ffn_dim=16, decoder_ffn_dim=16,
                       encoder_attention_heads=2, decoder_attention_heads=2),
            e2w, w2e)
        return ref_pre.Pretrainer(pb, None, None, 0.01, None, S, P, True, [])
    finally:
        sys.path.remove(REF)


def test_ref_parity_deletion_stats(ref_pretrainer, sample):
    torch = pytest.importorskip("torch")
    x_t = torch.tensor(np.asarray(sample))
    ref_pads = []
    for _ in range(20):
        masked, pos = ref_pretrainer.gen_mask(x_t.clone(), choice=1)
        ref_pads.append(int((masked.numpy() == np.asarray(V.PAD)).all(-1).sum()))
    out, _ = noise.token_deletion(key(11), sample, P)
    ours_pads = int((np.asarray(out) == np.asarray(V.PAD)).all(-1).sum())
    # deletion count is deterministic: int(S * p)
    assert set(ref_pads) == {ours_pads}


def test_ref_parity_mask_counts(ref_pretrainer, sample):
    torch = pytest.importorskip("torch")
    x_t = torch.tensor(np.asarray(sample))
    masked, pos = ref_pretrainer.gen_mask(x_t.clone(), choice=2)
    ref_loss = int(pos.numpy().sum())
    _, loss = noise.token_mask(key(12), sample, P)
    assert ref_loss == int(np.asarray(loss).sum()) == round(S * P)
    ref_mask_rows = int((masked.numpy() == np.asarray(V.MASK)).all(-1).sum())
    out, _ = noise.token_mask(key(12), sample, P)
    ours_mask_rows = int((np.asarray(out) == np.asarray(V.MASK)).all(-1).sum())
    assert ref_mask_rows == ours_mask_rows == round(round(S * P) * 0.8)


def test_ref_parity_rotation(ref_pretrainer, sample):
    torch = pytest.importorskip("torch")
    x_t = torch.tensor(np.asarray(sample))
    masked, pos = ref_pretrainer.gen_mask(x_t.clone(), choice=5)
    m = masked.numpy()
    x = np.asarray(sample)
    assert any((np.roll(x, -r, axis=0) == m).all() for r in range(S))


def test_ref_parity_infilling_length_rule(ref_pretrainer, sample):
    torch = pytest.importorskip("torch")
    x_t = torch.tensor(np.asarray(sample))
    for _ in range(5):
        masked, pos = ref_pretrainer.gen_mask(x_t.clone(), choice=4)
        assert masked.shape[0] == S  # reference also re-pads to input length
