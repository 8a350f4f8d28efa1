import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as TF

from centermask2_tpu.models.backbones import FPN, MobileNetV2, VoVNet
from centermask2_tpu.models.backbones.vovnet import OSAModule


def test_vovnet39_output_shapes():
    model = VoVNet(body="V-39-eSE", out_features=("stage2", "stage3", "stage4", "stage5"),
                   dtype=jnp.float32)
    x = jnp.zeros((1, 256, 256, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out["stage2"].shape == (1, 64, 64, 256)
    assert out["stage3"].shape == (1, 32, 32, 512)
    assert out["stage4"].shape == (1, 16, 16, 768)
    assert out["stage5"].shape == (1, 8, 8, 1024)


def test_vovnet_block_counts():
    # V-39 has block_per_stage [1,1,2,2]: OSA4_2 / OSA5_2 exist, OSA3_2 doesn't
    model = VoVNet(body="V-39-eSE", dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))["params"]
    assert "OSA4_2" in params and "OSA5_2" in params
    assert "OSA3_2" not in params
    # FrozenBN params present and named for optimizer masking
    assert "frozen_scale" in params["stem_1"]["norm"]


def _np_osa_oracle(x_nchw, params, layer_per_block, identity):
    """Torch composition of the OSA dataflow (input + k convs concat -> 1x1
    -> eSE -> residual) used as numerical oracle."""
    xt = torch.from_numpy(x_nchw)
    identity_feat = xt
    outputs = [xt]
    cur = xt
    for i in range(layer_per_block):
        w, s, b = params[f"layer{i}"]
        cur = TF.conv2d(cur, torch.from_numpy(w), padding=1)
        cur = cur * torch.from_numpy(s)[None, :, None, None] + torch.from_numpy(b)[None, :, None, None]
        cur = TF.relu(cur)
        outputs.append(cur)
    cat = torch.cat(outputs, dim=1)
    w, s, b = params["concat"]
    agg = TF.conv2d(cat, torch.from_numpy(w))
    agg = agg * torch.from_numpy(s)[None, :, None, None] + torch.from_numpy(b)[None, :, None, None]
    agg = TF.relu(agg)
    fw, fb = params["ese"]
    pooled = agg.mean(dim=(2, 3), keepdim=True)
    gate = TF.conv2d(pooled, torch.from_numpy(fw), torch.from_numpy(fb))
    agg = agg * (TF.relu6(gate + 3.0) / 6.0)
    if identity:
        agg = agg + identity_feat
    return agg.numpy()


def test_osa_module_matches_torch_oracle():
    rng = np.random.RandomState(0)
    C, S, K = 16, 12, 3  # in_ch, stage_ch, layers
    x = rng.randn(1, C, 8, 8).astype(np.float32)

    mod = OSAModule(stage_ch=S, concat_ch=C, layer_per_block=K, identity=True,
                    dtype=jnp.float32)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    p = jax.tree.map(np.asarray, variables["params"])

    torch_params = {}
    for i in range(K):
        lp = p[f"layer{i}"]
        torch_params[f"layer{i}"] = (
            np.transpose(lp["conv"]["kernel"], (3, 2, 0, 1)),
            lp["norm"]["frozen_scale"], lp["norm"]["frozen_bias"],
        )
    torch_params["concat"] = (
        np.transpose(p["concat"]["conv"]["kernel"], (3, 2, 0, 1)),
        p["concat"]["norm"]["frozen_scale"], p["concat"]["norm"]["frozen_bias"],
    )
    torch_params["ese"] = (
        np.transpose(p["ese"]["fc"]["kernel"], (3, 2, 0, 1)),
        p["ese"]["fc"]["bias"],
    )

    ref = _np_osa_oracle(x, torch_params, K, identity=True)
    got = mod.apply(variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_fpn_shapes_and_topdown():
    fpn = FPN(in_strides=[8, 16, 32], out_channels=256, top_block="p6p7",
              dtype=jnp.float32)
    feats = [jnp.zeros((1, 64, 64, 512)), jnp.zeros((1, 32, 32, 768)),
             jnp.zeros((1, 16, 16, 1024))]
    params = fpn.init(jax.random.PRNGKey(0), feats)
    out = fpn.apply(params, feats)
    assert set(out.keys()) == {"p3", "p4", "p5", "p6", "p7"}
    assert out["p3"].shape == (1, 64, 64, 256)
    assert out["p5"].shape == (1, 16, 16, 256)
    assert out["p6"].shape == (1, 8, 8, 256)
    assert out["p7"].shape == (1, 4, 4, 256)


def test_fpn_topdown_fusion_math():
    """p4 output must equal conv3x3(lateral(c4) + upsample(lateral(c5)))."""
    fpn = FPN(in_strides=[16, 32], out_channels=8, top_block=None, dtype=jnp.float32)
    rng = np.random.RandomState(1)
    c4 = jnp.asarray(rng.randn(1, 6, 6, 4).astype(np.float32))
    c5 = jnp.asarray(rng.randn(1, 3, 3, 4).astype(np.float32))
    params = fpn.init(jax.random.PRNGKey(0), [c4, c5])
    out = fpn.apply(params, [c4, c5])
    p = params["params"]

    def conv(x, pp, pad):
        return jax.lax.conv_general_dilated(
            x, pp["kernel"], (1, 1), [(pad, pad)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + pp["bias"]

    lat5 = conv(c5, p["fpn_lateral5"], 0)
    lat4 = conv(c4, p["fpn_lateral4"], 0)
    up = jnp.repeat(jnp.repeat(lat5, 2, axis=1), 2, axis=2)
    expect_p4 = conv(lat4 + up, p["fpn_output4"], 1)
    np.testing.assert_allclose(np.asarray(out["p4"]), np.asarray(expect_p4),
                               rtol=1e-5, atol=1e-5)


def test_mobilenetv2_shapes():
    model = MobileNetV2(dtype=jnp.float32)
    x = jnp.zeros((1, 224, 224, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out["res2"].shape == (1, 56, 56, 24)
    assert out["res3"].shape == (1, 28, 28, 32)
    assert out["res4"].shape == (1, 14, 14, 96)
    assert out["res5"].shape == (1, 7, 7, 320)


def test_resnet50_shapes():
    from centermask2_tpu.models.backbones import ResNet, resnet_feature_channels

    model = ResNet(depth=50, out_features=("res2", "res3", "res4", "res5"),
                   dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    ch = resnet_feature_channels()
    for i, stride in zip(range(2, 6), (4, 8, 16, 32)):
        f = out[f"res{i}"]
        assert f.shape == (1, 64 // stride, 64 // stride, ch[f"res{i}"]), f.shape


def test_bottleneck_matches_torch_oracle():
    """BottleneckBlock (stride_in_1x1, projection shortcut) vs a direct
    torch composition with frozen-BN affines."""
    import torch
    import torch.nn.functional as TF

    from centermask2_tpu.models.backbones.resnet import BottleneckBlock

    rng = np.random.RandomState(0)
    x = rng.randn(1, 16, 10, 10).astype(np.float32)  # NCHW for torch
    blk = BottleneckBlock(out_channels=32, bottleneck_channels=8, stride=2,
                          stride_in_1x1=True, dtype=jnp.float32)
    xt = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    variables = blk.init(jax.random.PRNGKey(1), xt)
    p = jax.tree.map(np.asarray, variables["params"])

    def tconv(t, node, stride=1, pad=0):
        w = torch.from_numpy(np.transpose(node["conv"]["kernel"], (3, 2, 0, 1)))
        t = TF.conv2d(t, w, stride=stride, padding=pad)
        s = torch.from_numpy(node["norm"]["frozen_scale"])
        b = torch.from_numpy(node["norm"]["frozen_bias"])
        return t * s[None, :, None, None] + b[None, :, None, None]

    t = torch.from_numpy(x)
    out = TF.relu(tconv(t, p["conv1"], stride=2))
    out = TF.relu(tconv(out, p["conv2"], stride=1, pad=1))
    out = tconv(out, p["conv3"])
    short = tconv(t, p["shortcut"], stride=2)
    ref = TF.relu(out + short).numpy()

    got = np.transpose(np.asarray(blk.apply(variables, xt)), (0, 3, 1, 2))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_resnet_centermask_from_cfg():
    from centermask2_tpu.config import get_cfg
    from centermask2_tpu.models import build_centermask

    cfg = get_cfg()
    cfg.MODEL.BACKBONE.NAME = "build_fcos_resnet_fpn_backbone"
    cfg.MODEL.FCOS.POST_NMS_TOPK_TEST = 5
    cfg.MODEL.FCOS.PRE_NMS_TOPK_TEST = 20
    cfg.TPU.NMS_CANDIDATES = 20
    cfg.TPU.COMPUTE_DTYPE = "float32"
    model = build_centermask(cfg)
    assert model.backbone_type == "resnet"
    x = jnp.zeros((1, 64, 64, 3))
    params = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), x))
    assert "res5_2" in params["params"]["backbone"]


def test_host_s2d_input_matches_plain_backbone():
    """VoVNet(s2d_input=True) on host space-to-depth'd input must equal
    the plain backbone on the raw image (same params)."""
    from centermask2_tpu.data.preprocess import stem_space_to_depth
    from centermask2_tpu.models.backbones import VoVNet

    rng = np.random.RandomState(3)
    x = rng.randn(1, 64, 64, 3).astype(np.float32) * 10
    plain = VoVNet(body="V-19-slim-eSE", dtype=jnp.float32)
    s2d = VoVNet(body="V-19-slim-eSE", s2d_input=True, dtype=jnp.float32)
    params = plain.init(jax.random.PRNGKey(0), jnp.asarray(x))
    xd = jnp.asarray(stem_space_to_depth(x))
    assert xd.shape == (1, 17, 17, 48)
    out_p = plain.apply(params, jnp.asarray(x))
    out_s = s2d.apply(params, xd)
    for k in out_p:
        # zero-embedded kernels change the f32 accumulation order ->
        # ~1e-5-level noise on isolated elements, nothing structural
        np.testing.assert_allclose(np.asarray(out_s[k]), np.asarray(out_p[k]),
                                   rtol=3e-4, atol=5e-5)


def test_s2d_stem_exactly_matches_plain_conv_stem():
    """The space-to-depth stem rewrite must be numerically identical to the
    plain conv3x3/s2 stem (same params)."""
    from centermask2_tpu.models.backbones.vovnet import S2DStemConv
    from centermask2_tpu.layers import ConvNormAct

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 34, 42, 3).astype(np.float32))
    s2d = S2DStemConv(16, norm="FrozenBN", dtype=jnp.float32)
    plain = ConvNormAct(16, strides=(2, 2), norm="FrozenBN", dtype=jnp.float32)
    params = s2d.init(jax.random.PRNGKey(0), x)
    # same param tree (conv/kernel + norm/frozen_*): reuse directly
    out_s2d = s2d.apply(params, x)
    out_plain = plain.apply(params, x)
    assert out_s2d.shape == out_plain.shape == (1, 17, 21, 16)
    np.testing.assert_allclose(np.asarray(out_s2d), np.asarray(out_plain),
                               rtol=1e-5, atol=1e-5)


def test_mobilenet_block_matches_torch_through_converter():
    """InvertedResidual (expand + depthwise + pw-linear, frozen BN,
    relu6, residual) vs a direct torch composition, with weights going
    through convert_mobilenet's key schema — the numerical check behind
    the coverage test (reference mobilenet.py:38-76)."""
    import torch
    import torch.nn.functional as TF

    from centermask2_tpu.checkpoint.convert_torch import (Converter,
                                                          convert_mobilenet,
                                                          merge_params)
    from centermask2_tpu.models.backbones.mobilenet import MobileNetV2

    rng = np.random.RandomState(0)
    model = MobileNetV2(dtype=jnp.float32)
    x = rng.randn(1, 64, 64, 3).astype(np.float32) * 5
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    flax_params = jax.tree.map(np.asarray, variables["params"])

    # synthesize a torch sd over the full schema, convert, merge
    cv = Converter({})
    convert_mobilenet(cv, "backbone.bottom_up.", "")
    from test_checkpoint import synth_torch_sd
    sd = synth_torch_sd(flax_params, cv.report()["mapping"], rng)
    # keep activations O(1) through 17 blocks: std-1 random convs push
    # values onto the relu6 clamp boundaries where 1-ulp fp differences
    # flip branches and compound with depth
    for k, v in sd.items():
        if k.endswith(".weight") and v.ndim == 4:
            sd[k] = v * 0.1
    cv2 = Converter(sd)
    convert_mobilenet(cv2, "backbone.bottom_up.", "")
    merged, missing = merge_params(flax_params, cv2.nest())
    assert missing == []
    out = model.apply({"params": jax.tree.map(jnp.asarray, merged)},
                      jnp.asarray(x))

    # torch forward of the same schema
    def t(k):
        return torch.from_numpy(sd[k])

    def conv_bn(y, key, stride, groups=1, relu=True, pad=None):
        w = t(f"{key[0]}.weight")
        if pad is None:
            pad = (w.shape[-1] - 1) // 2
        y = TF.conv2d(y, w, stride=stride, padding=pad, groups=groups)
        g, b, m, v = (t(f"{key[1]}.{s}") for s in
                      ("weight", "bias", "running_mean", "running_var"))
        scale = g / torch.sqrt(v + 1e-5)
        y = y * scale[None, :, None, None] + (b - m * scale)[None, :, None, None]
        return torch.clamp(y, 0.0, 6.0) if relu else y

    from centermask2_tpu.models.backbones.mobilenet import (
        INVERTED_RESIDUAL_SETTING, RETURN_FEATURES_INDICES)

    bb = "backbone.bottom_up."
    y = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    y = conv_bn(y, (f"{bb}features.0.0", f"{bb}features.0.1"), 2)
    feats = {}
    idx, res_i, in_ch = 0, 2, 32
    for texp, c, n, s in INVERTED_RESIDUAL_SETTING:
        for i in range(n):
            idx += 1
            stride = s if i == 0 else 1
            hidden = int(round(in_ch * texp))
            z = y
            seq = (0, 3, 6) if texp != 1 else (0, 3)
            base = f"{bb}features.{idx}.conv"
            if texp != 1:
                z = conv_bn(z, (f"{base}.0", f"{base}.1"), 1)
                z = conv_bn(z, (f"{base}.3", f"{base}.4"), stride,
                            groups=hidden)
                z = conv_bn(z, (f"{base}.6", f"{base}.7"), 1, relu=False)
            else:
                z = conv_bn(z, (f"{base}.0", f"{base}.1"), stride,
                            groups=hidden)
                z = conv_bn(z, (f"{base}.3", f"{base}.4"), 1, relu=False)
            y = y + z if (stride == 1 and in_ch == c) else z
            in_ch = c
            if idx in RETURN_FEATURES_INDICES:
                feats[f"res{res_i}"] = y
                res_i += 1

    for k in out:
        ref = np.transpose(feats[k].numpy(), (0, 2, 3, 1))
        # 17 blocks of unnormalized random weights -> activations O(100);
        # fp reassociation noise reaches ~6e-3 absolute
        np.testing.assert_allclose(np.asarray(out[k]), ref,
                                   rtol=1e-3, atol=2e-2)
