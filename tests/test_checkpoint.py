"""Checkpoint converter coverage: every flax param must be fillable from a
reference-schema torch state_dict (synthesized with the right key names
and shapes — the actual .pth is not available offline)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from centermask2_tpu.models import CenterMask
from centermask2_tpu.checkpoint.convert_torch import (
    convert_checkpoint,
    fold_frozen_bn,
    merge_params,
)


def get_leaf(tree, path):
    node = tree
    for p in path.split("/"):
        if p not in node:
            return None
        node = node[p]
    return node


def synth_torch_sd(flax_params, mapping, rng):
    """Build a torch-layout state dict covering every mapped flax param."""
    sd = {}
    for tkey, fpath, kind in mapping:
        if kind.startswith("conv"):
            leaf = get_leaf(flax_params, fpath + "/kernel")
            if leaf is None:
                continue
            kh, kw, i, o = leaf.shape
            sd[tkey + ".weight"] = rng.randn(o, i, kh, kw).astype(np.float32)
            if get_leaf(flax_params, fpath + "/bias") is not None:
                sd[tkey + ".bias"] = rng.randn(o).astype(np.float32)
        elif kind == "bn":
            leaf = get_leaf(flax_params, fpath + "/frozen_scale")
            if leaf is None:
                continue
            c = leaf.shape[0]
            sd[tkey + ".weight"] = rng.rand(c).astype(np.float32) + 0.5
            sd[tkey + ".bias"] = rng.randn(c).astype(np.float32)
            sd[tkey + ".running_mean"] = rng.randn(c).astype(np.float32)
            sd[tkey + ".running_var"] = rng.rand(c).astype(np.float32) + 0.1
        elif kind == "gn":
            leaf = get_leaf(flax_params, fpath + "/gn/scale")
            if leaf is None:
                continue
            c = leaf.shape[0]
            sd[tkey + ".weight"] = rng.rand(c).astype(np.float32)
            sd[tkey + ".bias"] = rng.randn(c).astype(np.float32)
        elif kind in ("linear", "linear_chw"):
            leaf = get_leaf(flax_params, fpath + "/kernel")
            if leaf is None:
                continue
            i, o = leaf.shape
            sd[tkey + ".weight"] = rng.randn(o, i).astype(np.float32)
            sd[tkey + ".bias"] = rng.randn(o).astype(np.float32)
        elif kind == "deconv":
            leaf = get_leaf(flax_params, fpath)
            if leaf is None:
                continue
            kh, kw, o, i = leaf.shape
            sd[tkey + ".weight"] = rng.randn(i, o, kh, kw).astype(np.float32)
            sd[tkey + ".bias"] = rng.randn(o).astype(np.float32)
        elif kind == "scalar":
            leaf = get_leaf(flax_params, fpath + "/scale")
            if leaf is None:
                continue
            sd[tkey + ".scale"] = rng.randn(1).astype(np.float32)
    return sd


@pytest.mark.parametrize("body,dw", [("V-39-eSE", False), ("V-19-slim-dw-eSE", True)])
def test_full_coverage(body, dw):
    model = CenterMask(conv_body=body, dtype=jnp.float32,
                       post_nms_topk_test=5, pre_nms_topk_test=20,
                       nms_candidates=20)
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))))
    flax_params = jax.tree.map(lambda x: np.zeros(x.shape, np.float32),
                               variables["params"])

    _, report = convert_checkpoint({}, conv_body=body)
    rng = np.random.RandomState(0)
    sd = synth_torch_sd(flax_params, report["mapping"], rng)
    assert len(sd) > 100

    converted, report2 = convert_checkpoint(sd, conv_body=body)
    merged, missing = merge_params(flax_params, converted)
    assert missing == [], f"unfilled params: {missing[:20]}"
    assert report2["unused_torch_keys"] == []

    # structure identical
    assert jax.tree.structure(merged) == jax.tree.structure(flax_params)


def test_resnet_full_coverage():
    """Every ResNet-50 flax param is fillable from a detectron2-schema
    state dict (stem.conv1 / res{s}.{b}.conv{c}[.norm] / shortcut)."""
    model = CenterMask(backbone_type="resnet",
                       fpn_in_features=("res3", "res4", "res5"),
                       dtype=jnp.float32, post_nms_topk_test=5,
                       pre_nms_topk_test=20, nms_candidates=20)
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))))
    flax_params = jax.tree.map(lambda x: np.zeros(x.shape, np.float32),
                               variables["params"])

    _, report = convert_checkpoint({}, backbone="resnet")
    rng = np.random.RandomState(0)
    sd = synth_torch_sd(flax_params, report["mapping"], rng)
    converted, report2 = convert_checkpoint(sd, backbone="resnet")
    merged, missing = merge_params(flax_params, converted)
    assert missing == [], f"unfilled params: {missing[:20]}"
    assert report2["unused_torch_keys"] == []


def test_frozen_bn_fold_numeric():
    w = np.array([2.0, 0.5])
    b = np.array([1.0, -1.0])
    mean = np.array([0.5, 0.25])
    var = np.array([4.0, 1.0])
    scale, shift = fold_frozen_bn(w, b, mean, var, eps=0.0)
    x = np.array([3.0, 2.0])
    expect = (x - mean) / np.sqrt(var) * w + b
    np.testing.assert_allclose(x * scale + shift, expect, rtol=1e-6)


def test_mobilenet_full_coverage():
    """Every MobileNetV2 flax param is fillable from the reference's
    key schema (features.0.{0,1} stem; features.{i}.conv.{seq} blocks,
    mobilenet.py:22-116) — incl. depthwise conv weight layout."""
    model = CenterMask(backbone_type="mobilenet",
                       fpn_in_features=("res3", "res4", "res5"),
                       dtype=jnp.float32, post_nms_topk_test=5,
                       pre_nms_topk_test=20, nms_candidates=20)
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))))
    flax_params = jax.tree.map(lambda x: np.zeros(x.shape, np.float32),
                               variables["params"])

    _, report = convert_checkpoint({}, backbone="mobilenet")
    rng = np.random.RandomState(0)
    sd = synth_torch_sd(flax_params, report["mapping"], rng)
    converted, report2 = convert_checkpoint(sd, backbone="mobilenet")
    merged, missing = merge_params(flax_params, converted)
    assert missing == [], f"unfilled params: {missing[:20]}"
    assert report2["unused_torch_keys"] == []
