"""Model merging toolkit tests (+ parity with reference merging methods)."""
import numpy as np
import pytest

from pianobart_tpu.merge import (average_merging, combine, fisher_merging,
                                 mask_model_weights, mask_tensor,
                                 regmean_merging, task_arithmetic,
                                 task_vector, ties_merging)


def tree(scale=1.0, seed=0):
    rng = np.random.default_rng(seed)
    return {"a": {"kernel": rng.normal(size=(4, 3)) * scale,
                  "bias": rng.normal(size=(3,)) * scale},
            "b": {"kernel": rng.normal(size=(3, 2)) * scale}}


def test_task_vector_and_combine():
    pre, fin = tree(seed=1), tree(seed=2)
    tv = task_vector(pre, fin)
    np.testing.assert_allclose(tv["a"]["kernel"],
                               fin["a"]["kernel"] - pre["a"]["kernel"])
    back = combine(pre, tv, 1.0)
    np.testing.assert_allclose(back["b"]["kernel"], fin["b"]["kernel"])


def test_average():
    ms = [tree(seed=i) for i in range(3)]
    avg = average_merging(ms)
    np.testing.assert_allclose(
        avg["a"]["bias"], np.mean([m["a"]["bias"] for m in ms], axis=0))


def test_task_arithmetic():
    pre = tree(seed=0)
    ms = [tree(seed=1), tree(seed=2)]
    out = task_arithmetic(pre, ms, scaling=0.5)
    expect = pre["a"]["kernel"] + 0.5 * (
        (ms[0]["a"]["kernel"] - pre["a"]["kernel"])
        + (ms[1]["a"]["kernel"] - pre["a"]["kernel"]))
    np.testing.assert_allclose(out["a"]["kernel"], expect)


def test_mask_tensor_random_rescale():
    rng = np.random.default_rng(0)
    x = np.ones((100, 100))
    out = mask_tensor(x, 0.8, True, "random", rng)
    kept = out != 0
    assert 0.1 < kept.mean() < 0.3          # ~20% kept
    np.testing.assert_allclose(out[kept], 5.0)  # 1/(1-0.8)


def test_mask_tensor_magnitude():
    rng = np.random.default_rng(0)
    x = np.arange(1, 101, dtype=float)
    out = mask_tensor(x, 0.5, False, "magnitude", rng)
    assert (out[:50] == 0).all() and (out[50:] != 0).all()


def test_mask_model_weights_delta():
    pre, fin = tree(seed=3), tree(seed=4)
    out = mask_model_weights(fin, pre, weight_mask_rate=1.0,
                             use_weight_rescale=False, mask_strategy="random")
    # rate 1.0 drops the whole delta -> returns the pretrained model
    np.testing.assert_allclose(out["a"]["kernel"], pre["a"]["kernel"])


def test_ties_sign_election():
    pre = {"w": np.zeros(4)}
    m1 = {"w": np.array([1.0, -1.0, 2.0, 0.0])}
    m2 = {"w": np.array([3.0, 1.0, -0.5, 0.0])}
    out = ties_merging(pre, [m1, m2], param_value_mask_rate=0.0, scaling=1.0)
    # index 0: both positive -> mean 2.0; index 1: sum is 0 -> majority sign
    # (+) keeps +1; index 2: sum positive keeps 2.0
    np.testing.assert_allclose(out["w"][0], 2.0)
    np.testing.assert_allclose(out["w"][2], 2.0)


def test_fisher_merging_prefers_confident_model():
    m1 = {"w": np.array([1.0])}
    m2 = {"w": np.array([3.0])}
    f1 = {"w": np.array([10.0])}
    f2 = {"w": np.array([0.1])}
    out = fisher_merging([m1, m2], [f1, f2], normalize=False)
    assert abs(out["w"][0] - 1.0) < 0.1     # dominated by high-fisher model


def test_regmean_exact_for_linear_models():
    # two linear models fitted to different data; regmean with true grams
    # reproduces the least-squares join
    rng = np.random.default_rng(0)
    X1 = rng.normal(size=(50, 4))
    X2 = rng.normal(size=(50, 4))
    W1 = rng.normal(size=(4, 2))
    W2 = rng.normal(size=(4, 2))
    g1 = {"lin/kernel": X1.T @ X1}
    g2 = {"lin/kernel": X2.T @ X2}
    out = regmean_merging([{"lin": {"kernel": W1}}, {"lin": {"kernel": W2}}],
                          [g1, g2])
    expect = np.linalg.solve(X1.T @ X1 + X2.T @ X2,
                             X1.T @ X1 @ W1 + X2.T @ X2 @ W2)
    np.testing.assert_allclose(out["lin"]["kernel"], expect, rtol=1e-8)


# -- parity with the reference implementation (torch) -----------------------
REF = "/root/reference/clear code"


@pytest.fixture(scope="module")
def ref_merging():
    import os
    import sys
    if not os.path.exists(REF):
        pytest.skip("reference absent")
    torch = pytest.importorskip("torch")
    sys.path.insert(0, REF)
    try:
        from model_merging_methods.merging_methods import MergingMethod
        import torch.nn as nn

        def make_model(seed):
            torch.manual_seed(seed)
            return nn.Sequential(nn.Linear(4, 3), nn.Linear(3, 2))

        return MergingMethod, make_model
    finally:
        sys.path.remove(REF)


def _sd_to_tree(model):
    return {k.replace(".", "/"): v.detach().numpy()
            for k, v in model.named_parameters()}


def _tree_nested(flat):
    out = {}
    for k, v in flat.items():
        node = out
        parts = k.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return out


@pytest.mark.parametrize("method,kwargs", [
    ("average_merging", {}),
    ("task_arithmetic", {"scaling_coefficient": 0.7}),
    ("ties_merging", {"scaling_coefficient": 1.0,
                      "param_value_mask_rate": 0.5}),
])
def test_parity_with_reference(ref_merging, method, kwargs):
    import torch
    MergingMethod, make_model = ref_merging
    pre = make_model(0)
    models = [make_model(1), make_model(2)]

    merger = MergingMethod(method)
    ref_out = merger.merging_models(
        merged_model=pre, models_to_merge=models,
        exclude_param_names_regex=[], **kwargs)

    pre_tree = _tree_nested(_sd_to_tree(pre))
    model_trees = [_tree_nested(_sd_to_tree(m)) for m in models]
    if method == "average_merging":
        ours = average_merging(model_trees)
    elif method == "task_arithmetic":
        ours = task_arithmetic(pre_tree, model_trees, kwargs["scaling_coefficient"])
    else:
        ours = ties_merging(pre_tree, model_trees,
                            kwargs["param_value_mask_rate"],
                            kwargs["scaling_coefficient"])

    for name, val in ref_out.items():
        node = ours
        for p in name.replace(".", "/").split("/"):
            node = node[p]
        np.testing.assert_allclose(val.detach().numpy(), node, rtol=1e-5,
                                   atol=1e-6)


def test_collect_dense_grams_interceptor():
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    from pianobart_tpu.merge import collect_dense_grams

    class Net(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(3, name="out")(nn.relu(nn.Dense(5, name="hid")(x)))

    net = Net()
    x = jax.random.normal(jax.random.PRNGKey(0), (16, 4))
    variables = net.init(jax.random.PRNGKey(1), x)
    grams = collect_dense_grams(net, variables, [(x,), (x * 2,)])
    assert set(grams) == {"hid/kernel", "out/kernel"}
    assert grams["hid/kernel"].shape == (4, 4)
    assert grams["out/kernel"].shape == (5, 5)
    # gram of inputs: average of x^T x / n over the two batches
    expect = (np.asarray(x).T @ np.asarray(x) / 16
              + np.asarray(x * 2).T @ np.asarray(x * 2) / 16) / 2
    np.testing.assert_allclose(grams["hid/kernel"], expect, rtol=1e-5)


def test_run_merge_head_from_carries_non_trunk_subtrees(tmp_path, monkeypatch):
    """--head_from bundles the donor checkpoint's task heads with the merged
    trunk: without it, msgpack consumers (demo/eval-gen) re-initialize every
    non-trunk subtree at RANDOM (decode.load_inference_params falls back to a
    real init for leaves the checkpoint misses) — the reference instead loads
    merged backbones into a finetuned model that keeps its own head
    (model_merge.py:60-78)."""
    import argparse

    from flax import serialization

    from pianobart_tpu.merge import cli as merge_cli

    def fake_load(path, cfg):
        seed = {"pre.ck": 0, "gen.ck": 1, "vel.ck": 2}[path]
        full = {"pianobart": tree(seed=seed)}
        if path != "pre.ck":
            full["lm_head"] = {"proj": {"kernel": np.full((2, 2), seed * 1.0)}}
        return full

    monkeypatch.setattr(merge_cli, "_load_params", fake_load)
    # the random-init reference the donor's heads are checked against
    # (run_merge refuses heads identical to it — see the guard test below)
    monkeypatch.setattr(merge_cli, "_lm_template", lambda cfg: {
        "pianobart": tree(seed=9),
        "lm_head": {"proj": {"kernel": np.full((2, 2), -99.0)}}})
    out = str(tmp_path / "merged.msgpack")
    args = argparse.Namespace(
        models=["gen.ck", "vel.ck"], pretrained="pre.ck",
        method="task_arithmetic", scaling_coefficient=1.0,
        head_from="gen.ck", output=out)
    merge_cli.run_merge(args)
    got = serialization.msgpack_restore(open(out, "rb").read())
    assert set(got) == {"pianobart", "lm_head"}
    np.testing.assert_allclose(got["lm_head"]["proj"]["kernel"],
                               np.full((2, 2), 1.0))
    # trunk is the merged tree, not the donor's
    expect = (tree(seed=0)["a"]["kernel"]
              + (tree(seed=1)["a"]["kernel"] - tree(seed=0)["a"]["kernel"])
              + (tree(seed=2)["a"]["kernel"] - tree(seed=0)["a"]["kernel"]))
    np.testing.assert_allclose(got["pianobart"]["a"]["kernel"], expect)

    # default (no --head_from) stays trunk-only
    args.head_from = None
    args.output = str(tmp_path / "trunk_only.msgpack")
    merge_cli.run_merge(args)
    got2 = serialization.msgpack_restore(open(args.output, "rb").read())
    assert set(got2) == {"pianobart"}


def test_run_merge_head_from_refuses_random_template_heads(tmp_path,
                                                           monkeypatch):
    """A donor whose non-trunk subtree came back IDENTICAL to the
    random-init template never supplied that head (restore-onto-template
    keeps template leaves for missing keys, e.g. a classification
    checkpoint has no LM head): bundling it would silently ship a random
    head behind a success message — run_merge must refuse (round-5
    review)."""
    import argparse

    import pytest

    from pianobart_tpu.merge import cli as merge_cli

    template_head = {"proj": {"kernel": np.full((2, 2), -99.0)}}

    def fake_load(path, cfg):
        seed = {"pre.ck": 0, "cls.ck": 1, "vel.ck": 2}[path]
        # cls.ck is a classification checkpoint: its restore keeps the
        # template's random lm_head untouched
        return {"pianobart": tree(seed=seed),
                "lm_head": {"proj": {"kernel": template_head["proj"]
                                     ["kernel"].copy()}}}

    monkeypatch.setattr(merge_cli, "_load_params", fake_load)
    monkeypatch.setattr(merge_cli, "_lm_template", lambda cfg: {
        "pianobart": tree(seed=9), "lm_head": template_head})
    args = argparse.Namespace(
        models=["cls.ck", "vel.ck"], pretrained="pre.ck",
        method="task_arithmetic", scaling_coefficient=1.0,
        head_from="cls.ck", output=str(tmp_path / "out.msgpack"))
    with pytest.raises(SystemExit, match="identical to the random-init"):
        merge_cli.run_merge(args)
    assert not (tmp_path / "out.msgpack").exists()


def test_run_merge_head_from_reuses_loaded_model(tmp_path, monkeypatch):
    """head_from pointing at one of --models must not reload the
    checkpoint (a flagship restore costs a full model.init + ~550 MB
    orbax read)."""
    import argparse

    from pianobart_tpu.merge import cli as merge_cli

    loads = []

    def fake_load(path, cfg):
        loads.append(path)
        seed = {"pre.ck": 0, "gen.ck": 1, "vel.ck": 2}[path]
        return {"pianobart": tree(seed=seed),
                "lm_head": {"proj": {"kernel": np.full((2, 2), seed * 1.0)}}}

    monkeypatch.setattr(merge_cli, "_load_params", fake_load)
    monkeypatch.setattr(merge_cli, "_lm_template", lambda cfg: {
        "pianobart": tree(seed=9),
        "lm_head": {"proj": {"kernel": np.full((2, 2), -99.0)}}})
    args = argparse.Namespace(
        models=["gen.ck", "vel.ck"], pretrained="pre.ck",
        method="task_arithmetic", scaling_coefficient=1.0,
        head_from="gen.ck", output=str(tmp_path / "out.msgpack"))
    merge_cli.run_merge(args)
    assert loads.count("gen.ck") == 1, loads
