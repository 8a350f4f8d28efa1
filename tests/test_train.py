import jax
import jax.numpy as jnp
import pytest
import numpy as np

from centermask2_tpu.train import make_optimizer, warmup_multistep_schedule


def test_warmup_multistep_schedule():
    s = warmup_multistep_schedule(0.01, (60000, 80000), gamma=0.1,
                                  warmup_factor=1e-3, warmup_iters=1000)
    assert abs(float(s(0)) - 0.01 * 1e-3) < 1e-9
    assert abs(float(s(500)) - 0.01 * (1e-3 * 0.5 + 0.5)) < 1e-9
    assert abs(float(s(1000)) - 0.01) < 1e-9
    assert abs(float(s(59999)) - 0.01) < 1e-9
    assert abs(float(s(60000)) - 0.001) < 1e-9
    assert abs(float(s(80001)) - 0.0001) < 1e-10


def test_optimizer_freezes_frozen_params_and_updates_rest():
    params = {
        "conv": {"kernel": jnp.ones((2, 2))},
        "norm": {"frozen_scale": jnp.ones((2,)), "frozen_bias": jnp.zeros((2,))},
        "gn": {"gn": {"scale": jnp.ones((2,)), "bias": jnp.zeros((2,))}},
    }
    opt = make_optimizer(0.1, (100,), warmup_iters=0, warmup_factor=1.0,
                         params_example=params)
    state = opt.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = opt.update(grads, state, params)
    # frozen params: exactly zero update
    assert float(jnp.abs(updates["norm"]["frozen_scale"]).max()) == 0.0
    assert float(jnp.abs(updates["norm"]["frozen_bias"]).max()) == 0.0
    # conv kernel: lr * (grad + wd * w) = 0.1 * (1 + 1e-4)
    np.testing.assert_allclose(np.asarray(updates["conv"]["kernel"]),
                               -0.1 * (1 + 1e-4), rtol=1e-5)
    # gn scale AND bias: no base weight decay -> exactly -lr * grad
    # (d2 assigns WEIGHT_DECAY_NORM, default 0, to all norm-module params)
    np.testing.assert_allclose(np.asarray(updates["gn"]["gn"]["scale"]),
                               -0.1, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(updates["gn"]["gn"]["bias"]),
                               -0.1, rtol=1e-6)


def test_gradient_clipping_modes():
    """SOLVER.CLIP_GRADIENTS.CLIP_TYPE: "value" clips elementwise,
    "norm" rescales the whole pytree to a global L2 norm (d2's
    torch clip_grad_norm_ semantics)."""
    import optax
    params = {"conv": {"kernel": jnp.zeros((2, 2))}}
    grads = {"conv": {"kernel": jnp.array([[3.0, -4.0], [0.0, 0.0]])}}

    opt_v = make_optimizer(1.0, (100,), warmup_iters=0, warmup_factor=1.0,
                           weight_decay=0.0, momentum=0.0,
                           clip_value=1.0, clip_type="value",
                           params_example=params)
    upd, _ = opt_v.update(grads, opt_v.init(params), params)
    np.testing.assert_allclose(np.asarray(upd["conv"]["kernel"]),
                               [[-1.0, 1.0], [0.0, 0.0]], atol=1e-7)

    opt_n = make_optimizer(1.0, (100,), warmup_iters=0, warmup_factor=1.0,
                           weight_decay=0.0, momentum=0.0,
                           clip_value=1.0, clip_type="norm",
                           params_example=params)
    upd, _ = opt_n.update(grads, opt_n.init(params), params)
    # global norm 5 -> scaled by 1/5
    np.testing.assert_allclose(np.asarray(upd["conv"]["kernel"]),
                               [[-0.6, 0.8], [0.0, 0.0]], atol=1e-6)

    with pytest.raises(ValueError):
        make_optimizer(1.0, (100,), clip_value=1.0, clip_type="bogus",
                       params_example=params)


def test_weight_decay_norm_applies_to_norm_modules():
    """SOLVER.WEIGHT_DECAY_NORM decays norm params (bias included) at its
    own rate while conv kernels keep the base rate."""
    params = {
        "conv": {"kernel": jnp.ones((2, 2))},
        "gn": {"gn": {"scale": jnp.ones((2,)), "bias": jnp.ones((2,))}},
    }
    opt = make_optimizer(0.1, (100,), warmup_iters=0, warmup_factor=1.0,
                         weight_decay=1e-4, weight_decay_norm=1e-2,
                         params_example=params)
    state = opt.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = opt.update(grads, state, params)
    np.testing.assert_allclose(np.asarray(updates["conv"]["kernel"]),
                               -0.1 * (1 + 1e-4), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(updates["gn"]["gn"]["scale"]),
                               -0.1 * (1 + 1e-2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(updates["gn"]["gn"]["bias"]),
                               -0.1 * (1 + 1e-2), rtol=1e-5)


def test_freeze_at_masks_backbone_stages():
    """MODEL.BACKBONE.FREEZE_AT=2 (the V-39 3x recipe) must zero updates
    for stem_* and OSA2_* backbone params while OSA3+ still train
    (reference vovnet.py:455-469)."""
    params = {
        "backbone": {
            "stem_1": {"conv": {"kernel": jnp.ones((3, 3))}},
            "OSA2_1": {"layer0": {"conv": {"kernel": jnp.ones((3, 3))}}},
            "OSA3_1": {"layer0": {"conv": {"kernel": jnp.ones((3, 3))}}},
        },
        "fcos_head": {"cls_tower": {"conv0": {"kernel": jnp.ones((3, 3))}}},
    }
    opt = make_optimizer(0.1, (100,), warmup_iters=0, warmup_factor=1.0,
                         freeze_at=2, params_example=params)
    state = opt.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = opt.update(grads, state, params)
    bb = updates["backbone"]
    assert float(jnp.abs(bb["stem_1"]["conv"]["kernel"]).max()) == 0.0
    assert float(jnp.abs(bb["OSA2_1"]["layer0"]["conv"]["kernel"]).max()) == 0.0
    assert float(jnp.abs(bb["OSA3_1"]["layer0"]["conv"]["kernel"]).max()) > 0.0
    assert float(jnp.abs(
        updates["fcos_head"]["cls_tower"]["conv0"]["kernel"]).max()) > 0.0


def test_freeze_at_covers_resnet_and_mobilenet_names():
    """FREEZE_AT must also freeze ResNet res{s}_{b} stages (detectron2
    semantics) and MobileNetV2 features[0..freeze_at-1] — without
    features1 over-matching features10."""
    params = {
        "backbone": {
            "stem_conv1": {"conv": {"kernel": jnp.ones((2,))}},
            "res2_0": {"conv1": {"conv": {"kernel": jnp.ones((2,))}}},
            "res3_0": {"conv1": {"conv": {"kernel": jnp.ones((2,))}}},
            "features0_conv": {"kernel": jnp.ones((2,))},
            "features1": {"conv1": {"kernel": jnp.ones((2,))}},
            "features2": {"conv1": {"kernel": jnp.ones((2,))}},
            "features10": {"conv1": {"kernel": jnp.ones((2,))}},
        },
    }
    opt = make_optimizer(0.1, (100,), warmup_iters=0, warmup_factor=1.0,
                         freeze_at=2, params_example=params)
    state = opt.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = opt.update(grads, state, params)
    bb = updates["backbone"]

    def mx(tree):
        return float(max(jnp.abs(leaf).max() for leaf in jax.tree.leaves(tree)))

    assert mx(bb["stem_conv1"]) == 0.0
    assert mx(bb["res2_0"]) == 0.0
    assert mx(bb["res3_0"]) > 0.0
    assert mx(bb["features0_conv"]) == 0.0
    assert mx(bb["features1"]) == 0.0
    assert mx(bb["features2"]) > 0.0
    assert mx(bb["features10"]) > 0.0


@pytest.mark.slow
def test_batchnorm_training_updates_running_stats():
    """MODEL.VOVNET.NORM 'BN'/'SyncBN' trains real batch statistics:
    batch_stats live in TrainState.model_state, update through the
    forward pass, and SyncBN psums moments across the mesh."""
    from centermask2_tpu.models import CenterMask, GroundTruth
    from centermask2_tpu.parallel import make_mesh, shard_batch
    from centermask2_tpu.train import create_train_state, make_train_step

    model = CenterMask(
        conv_body="V-19-slim-eSE", backbone_norm="SyncBN",
        mask_on=False, maskiou_on=False,
        pre_nms_topk_train=20, post_nms_topk_train=10, nms_candidates=20,
        dtype=jnp.float32)
    rng = np.random.RandomState(0)
    B = 2
    images = jnp.asarray(rng.randn(B, 64, 64, 3).astype(np.float32) * 20)
    gt = GroundTruth(
        boxes=jnp.tile(jnp.asarray([[[8, 8, 40, 40]]], jnp.float32), (B, 1, 1)),
        classes=jnp.zeros((B, 1), jnp.int32),
        valid=jnp.ones((B, 1), bool),
        mask_patches=jnp.zeros((B, 1, 8, 8)))

    variables = model.init(jax.random.PRNGKey(0), images[:1])
    assert "batch_stats" in variables
    opt = make_optimizer(0.01, (100,), params_example=None)
    state = create_train_state(variables, opt)
    assert state.model_state is not None

    mesh = make_mesh(jax.devices()[:2])
    state = jax.device_put(state, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec()))
    images, gt = shard_batch((images, gt), mesh)
    step = make_train_step(model, opt, mesh=mesh)
    before = jax.tree.leaves(state.model_state)[0].copy()
    state, metrics = step(state, images, gt, jax.random.PRNGKey(1))
    assert all(np.isfinite(float(v)) for v in metrics.values())
    after = jax.tree.leaves(state.model_state)[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))
    # inference path uses the running averages without mutation
    out = model.apply({**state.params, **state.model_state}, images[:1])
    assert np.isfinite(np.asarray(out.scores)).all()


def test_match_proposals_d2_interval_semantics():
    """Matcher(IOU_THRESHOLDS, IOU_LABELS) interval lookup: with
    thresholds [0.3, 0.7] / labels [0, -1, 1], IoU < 0.3 -> bg (0),
    0.3 <= IoU < 0.7 -> ignore (-1), IoU >= 0.7 -> fg (1)."""
    from centermask2_tpu.models.roi.heads import match_proposals

    gt = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
    gt_valid = jnp.ones((1,), bool)
    # IoUs vs gt: 1.0, ~0.5 (overlap 50), ~0.08
    props = jnp.asarray([
        [0.0, 0.0, 10.0, 10.0],
        [0.0, 0.0, 10.0, 5.0],
        [8.0, 8.0, 18.0, 18.0],
    ])
    idx, labels = match_proposals(gt, gt_valid, props,
                                  iou_thresholds=(0.3, 0.7),
                                  iou_labels=(0, -1, 1))
    assert labels.tolist() == [1, -1, 0]
    assert idx.tolist() == [0, 0, 0]
    # default single-threshold form unchanged
    _, labels1 = match_proposals(gt, gt_valid, props)
    assert labels1.tolist() == [1, 1, 0]


@pytest.mark.slow
def test_remat_backbone_same_gradients():
    """TPU.REMAT_BACKBONE (jax.checkpoint on the backbone) must be
    semantics-preserving: identical losses and gradients, just less
    activation memory."""
    from centermask2_tpu.models import CenterMask, GroundTruth

    kw = dict(conv_body="V-19-slim-eSE", mask_on=False, maskiou_on=False,
              pre_nms_topk_train=20, post_nms_topk_train=10,
              nms_candidates=20, dtype=jnp.float32)
    model = CenterMask(**kw)
    model_r = CenterMask(remat_backbone=True, **kw)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32) * 20)
    gt = GroundTruth(
        boxes=jnp.asarray([[[8, 8, 40, 40]]], jnp.float32),
        classes=jnp.zeros((1, 1), jnp.int32),
        valid=jnp.ones((1, 1), bool),
        mask_patches=jnp.zeros((1, 1, 8, 8)))
    variables = model.init(jax.random.PRNGKey(0), images)

    def total_loss(m):
        def f(v):
            losses = m.apply(v, images, gt, jax.random.PRNGKey(1),
                             method=CenterMask.loss)
            return sum(losses.values())
        return jax.jit(jax.value_and_grad(f))(variables)

    (l0, g0), (l1, g1) = total_loss(model), total_loss(model_r)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_s2d_stem_training_gradients_match_plain():
    """Training with TPU.S2D_STEM_INPUT (host s2d input + restructured
    stem) must reproduce the plain path's loss and gradients — stem
    params stay natural-layout, the kernel embedding is a linear
    (differentiable) transform, so checkpoints are interchangeable."""
    from centermask2_tpu.data.preprocess import stem_space_to_depth
    from centermask2_tpu.models import CenterMask, GroundTruth

    kw = dict(conv_body="V-19-slim-eSE", mask_on=True, maskiou_on=True,
              pre_nms_topk_train=20, post_nms_topk_train=10,
              nms_candidates=20, batch_size_per_image=16,
              max_fg_proposals=4, dtype=jnp.float32)
    model = CenterMask(**kw)
    model_s = CenterMask(s2d_input=True, **kw)
    rng = np.random.RandomState(0)
    x = rng.randn(1, 64, 64, 3).astype(np.float32) * 20
    images = jnp.asarray(x)
    images_s = jnp.asarray(stem_space_to_depth(x))
    gt = GroundTruth(
        boxes=jnp.asarray([[[8, 8, 40, 40]]], jnp.float32),
        classes=jnp.zeros((1, 1), jnp.int32),
        valid=jnp.ones((1, 1), bool),
        mask_patches=jnp.ones((1, 1, 8, 8)) * 0.7)
    variables = model.init(jax.random.PRNGKey(0), images)

    def total_loss(m, im):
        def f(v):
            losses = m.apply(v, im, gt, jax.random.PRNGKey(1),
                             method=CenterMask.loss)
            return sum(losses.values())
        return jax.jit(jax.value_and_grad(f))(variables)

    (l0, g0), (l1, g1) = total_loss(model, images), total_loss(model_s,
                                                               images_s)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
    flat0 = jax.tree_util.tree_leaves_with_path(g0)
    flat1 = {jax.tree_util.keystr(k): v
             for k, v in jax.tree_util.tree_leaves_with_path(g1)}
    assert len(flat0) == len(flat1)
    for k, a in flat0:
        b = flat1[jax.tree_util.keystr(k)]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5,
                                   err_msg=jax.tree_util.keystr(k))


@pytest.mark.slow
def test_dp_inference_matches_single_device():
    """Serving scale-out: batch sharded over a 2-device mesh produces
    the same outputs as the unsharded batched program."""
    from centermask2_tpu.models import CenterMask
    from centermask2_tpu.parallel import (
        default_image_sizes, make_dp_inference, make_mesh, replicate,
        shard_batch)

    model = CenterMask(
        conv_body="V-19-slim-eSE", mask_on=True, maskiou_on=True,
        pre_nms_topk_test=20, post_nms_topk_test=10, nms_candidates=20,
        dtype=jnp.float32)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32) * 20)
    params = model.init(jax.random.PRNGKey(0), images[:1])
    sizes = default_image_sizes(model, images)

    ref = model.apply(params, images, sizes,
                      method=CenterMask.inference_batched)

    mesh = make_mesh(jax.devices()[:2])
    infer = make_dp_inference(model, mesh)
    out = infer(replicate(params, mesh), *shard_batch((images, sizes), mesh))
    for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(out)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_dp_inference_s2d_layout():
    """DP serving with the host space-to-depth input layout: canvas_hw
    must undo the s2d grid on every shard identically."""
    from centermask2_tpu.data.preprocess import stem_space_to_depth
    from centermask2_tpu.models import CenterMask
    from centermask2_tpu.parallel import (
        default_image_sizes, make_dp_inference, make_mesh, replicate,
        shard_batch)

    model = CenterMask(
        conv_body="V-19-slim-eSE", mask_on=False, maskiou_on=False,
        pre_nms_topk_test=20, post_nms_topk_test=10, nms_candidates=20,
        s2d_input=True, dtype=jnp.float32)
    rng = np.random.RandomState(0)
    images = jnp.asarray(stem_space_to_depth(
        rng.randn(2, 64, 64, 3).astype(np.float32) * 20))
    params = model.init(jax.random.PRNGKey(0), images[:1])
    sizes = default_image_sizes(model, images)
    np.testing.assert_array_equal(np.asarray(sizes),
                                  [[64, 64], [64, 64]])  # un-s2d'd canvas

    ref = model.apply(params, images, sizes,
                      method=CenterMask.inference_batched)
    mesh = make_mesh(jax.devices()[:2])
    infer = make_dp_inference(model, mesh)
    out = infer(replicate(params, mesh), *shard_batch((images, sizes), mesh))
    for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(out)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_dp_inference_u8_pack_matches_f32():
    """DP serving fed the RAW uint8 s2d pack (+ per-image valid_hw, the
    4x-transfer-saving mode tools/infer.py --data-parallel now uses)
    must be bit-identical to the host-normalized f32 s2d path."""
    from centermask2_tpu.data.preprocess import s2d_pack_u8, s2d_preprocess
    from centermask2_tpu.models import CenterMask
    from centermask2_tpu.parallel import (
        default_image_sizes, make_dp_inference, make_mesh, replicate,
        shard_batch)

    model = CenterMask(
        conv_body="V-19-slim-eSE", mask_on=True, maskiou_on=True,
        pre_nms_topk_test=20, post_nms_topk_test=10, nms_candidates=20,
        s2d_input=True, dtype=jnp.float32)
    rng = np.random.RandomState(4)
    imgs = [(rng.rand(50, 61, 3) * 255).astype(np.uint8),
            (rng.rand(64, 40, 3) * 255).astype(np.uint8)]
    x_f32 = jnp.asarray(np.concatenate([s2d_preprocess(i, 64) for i in imgs]))
    x_u8 = jnp.asarray(np.concatenate([s2d_pack_u8(i, 64) for i in imgs]))
    hw = jnp.asarray([[50, 61], [64, 40]], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x_f32[:1])
    sizes = default_image_sizes(model, x_f32)

    mesh = make_mesh(jax.devices()[:2])
    infer = make_dp_inference(model, mesh)
    p_rep = replicate(params, mesh)
    out_f = infer(p_rep, *shard_batch((x_f32, sizes), mesh))
    out_u = infer(p_rep, *shard_batch((x_u8, sizes, hw), mesh))
    for a, b in zip(jax.tree.leaves(out_f), jax.tree.leaves(out_u)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def _parity_batch(B, n_gt=2):
    """Global batch with per-image VARYING gt geometry, so the FCOS
    num_pos/ctrness psum normalizers are exercised non-trivially (equal
    per-image counts would make the cross-replica sum a mathematical
    no-op). Each image carries exactly n_gt valid boxes."""
    from centermask2_tpu.models import GroundTruth

    rng = np.random.RandomState(3)
    images = jnp.asarray(rng.randn(B, 64, 64, 3).astype(np.float32) * 20)
    boxes = np.zeros((B, n_gt, 4), np.float32)
    classes = np.zeros((B, n_gt), np.int32)
    for i in range(B):
        for g in range(n_gt):
            x0 = 2.0 + 3.0 * i + 7.0 * g
            y0 = 3.0 + 2.0 * ((i + g) % 4)
            boxes[i, g] = [x0, y0, x0 + 14.0 + 2.0 * i, y0 + 20.0 + 3.0 * g]
            classes[i, g] = (i + g) % 3
    gt = GroundTruth(
        boxes=jnp.asarray(boxes), classes=jnp.asarray(classes),
        valid=jnp.ones((B, n_gt), bool),
        mask_patches=jnp.asarray(
            (rng.rand(B, n_gt, 16, 16) > 0.4).astype(np.float32)))
    return images, gt


def _run_parity_step(model, images, gt, n_devices):
    from centermask2_tpu.parallel import make_mesh, shard_batch
    from centermask2_tpu.train import create_train_state, make_train_step

    variables = model.init(jax.random.PRNGKey(0), images[:1])
    opt = make_optimizer(0.02, (100,), warmup_iters=0, warmup_factor=1.0,
                         params_example={"params": variables["params"]})
    state = create_train_state(variables, opt)
    mesh = make_mesh(jax.devices()[:n_devices])
    state = jax.device_put(state, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec()))
    im, g = shard_batch((images, gt), mesh)
    step = make_train_step(model, opt, mesh=mesh)
    # snapshot before the step: the input state is DONATED (trainer.py)
    params_before = jax.tree.map(np.asarray, state.params)
    new_state, metrics = step(state, im, g, jax.random.PRNGKey(1))
    deltas = jax.tree.map(lambda a, b: np.asarray(a) - b,
                          new_state.params, params_before)
    return deltas, jax.tree.map(float, metrics), new_state.model_state


@pytest.mark.slow
def test_gradient_parity_8dev_vs_1dev():
    """The multi-chip CORRECTNESS invariant the driver's dryrun doesn't
    check: one DP train step over an 8-device mesh must produce the same
    parameter update as the same global batch on 1 device (reference DDP
    semantics: per-replica losses with psum'd FCOS normalizers, grads
    pmean'd — utils/comm.py:5-11, fcos_outputs.py:92,113).

    Setup notes: per-image gt geometry VARIES (so the num_pos psum is
    non-trivial), and max_fg_proposals == n_gt with append_gt on, so
    every image saturates its fg cap and the ROI losses' local-mean
    normalization (the reference's own DDP semantics) is sharding-
    invariant. Proposal-sampler rng differs between shardings but only
    reorders BACKGROUND samples, which no loss consumes."""
    from centermask2_tpu.models import CenterMask

    B = 8
    model = CenterMask(
        conv_body="V-19-slim-eSE", mask_on=True, maskiou_on=True,
        pre_nms_topk_train=20, post_nms_topk_train=10, nms_candidates=20,
        batch_size_per_image=16, max_fg_proposals=2,
        dtype=jnp.float32)
    images, gt = _parity_batch(B, n_gt=2)

    d8, m8, _ = _run_parity_step(model, images, gt, 8)
    d1, m1, _ = _run_parity_step(model, images, gt, 1)

    for k in m1:
        assert abs(m1[k] - m8[k]) <= 1e-5 + 1e-4 * abs(m1[k]), (
            k, m1[k], m8[k])
    flat1 = jax.tree_util.tree_leaves_with_path(d1)
    flat8 = {jax.tree_util.keystr(k): v
             for k, v in jax.tree_util.tree_leaves_with_path(d8)}
    assert len(flat1) == len(flat8)
    n_nonzero = 0
    for k, a in flat1:
        b = flat8[jax.tree_util.keystr(k)]
        np.testing.assert_allclose(a, b, rtol=5e-3, atol=2e-7,
                                   err_msg=jax.tree_util.keystr(k))
        n_nonzero += int(np.abs(a).max() > 0)
    assert n_nonzero > 50  # the step actually moved the model


@pytest.mark.slow
def test_gradient_parity_8dev_vs_1dev_syncbn():
    """Same invariant with MODEL.VOVNET.NORM='SyncBN': the psum'd batch
    moments must make an 8x1 sharded batch statistically identical to
    the 1x8 batch (reference SyncBN contract), so params AND the updated
    running stats agree across shardings."""
    from centermask2_tpu.models import CenterMask

    B = 8
    model = CenterMask(
        conv_body="V-19-slim-eSE", backbone_norm="SyncBN",
        mask_on=False, maskiou_on=False,
        pre_nms_topk_train=20, post_nms_topk_train=10, nms_candidates=20,
        dtype=jnp.float32)
    images, gt = _parity_batch(B, n_gt=2)

    d8, m8, s8 = _run_parity_step(model, images, gt, 8)
    d1, m1, s1 = _run_parity_step(model, images, gt, 1)

    for k in m1:
        assert abs(m1[k] - m8[k]) <= 1e-5 + 1e-4 * abs(m1[k]), (
            k, m1[k], m8[k])
    for a, b in zip(jax.tree.leaves(d1), jax.tree.leaves(d8)):
        # atol: SyncBN moments are psum'd f32 partial sums; the 8-shard
        # mesh reassociates every layer's moments and the wobble
        # compounds through the depth (observed max delta drift 3e-5;
        # the FrozenBN variant of this test pins the tight 2e-7 bound).
        # A wrong-psum-semantics bug shifts deltas at their own scale
        # (~1e-3), far above this floor.
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1e-4)
    # updated running batch_stats agree (SyncBN moments are global)
    for a, b in zip(jax.tree.leaves(s1), jax.tree.leaves(s8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_dryrun_multichip_2dev():
    """The driver contract: full DP train step on a virtual mesh."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as ge

    assert len(jax.devices()) >= 2, "conftest should provide 8 CPU devices"
    ge.dryrun_multichip(2)


@pytest.mark.slow
def test_entry_traces():
    """The driver contract's other half: __graft_entry__.entry() must
    stay importable and its fn jit-traceable at the declared example
    args (abstract lowering only — no CPU execution of the 832 canvas)."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as ge

    fn, args = ge.entry()
    lowered = jax.jit(fn).lower(*args)
    assert lowered is not None


@pytest.mark.slow
def test_orbax_roundtrip(tmp_path):
    from centermask2_tpu.checkpoint.orbax_io import (
        latest_checkpoint,
        load_checkpoint,
        save_checkpoint,
    )

    state = {"params": {"w": jnp.arange(6.0).reshape(2, 3)},
             "step": jnp.asarray(7)}
    d = str(tmp_path / "ckpt")
    save_checkpoint(d, state, 7)
    save_checkpoint(d, state, 3)
    path = latest_checkpoint(d)
    assert path.endswith("step_7")
    restored = load_checkpoint(path, target=state)
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  np.asarray(state["params"]["w"]))
    assert int(restored["step"]) == 7


@pytest.mark.slow
@pytest.mark.parametrize("dtype_name", ["float32", "bfloat16"])
def test_overfit_single_image_detects_object(dtype_name):
    """Whole-loop correctness sanity: training on ONE synthetic image
    must let the model re-detect its own training object — GT assignment,
    losses, backward, optimizer, decode, NMS, and the mask head all have
    to be simultaneously right for this to converge (a sign error or a
    coordinate-frame mixup anywhere keeps the IoU near zero no matter
    how long it trains). The d2 world checks this the same way (fit a
    handful of images, eyeball detections); here it is an assertion.

    Two from-scratch gotchas this run must dodge (both shared with the
    torch reference, which only ever fine-tunes a pretrained backbone):
    (1) raw-pixel-scale inputs (~|150|) through an uncalibrated backbone
    give the unbounded maskiou regression head an L2 loss of ~40 and a
    global grad norm of ~2e4 at init — one SGD step diverges; feed
    normalized-scale inputs and clip by global norm. (2) bbox_pred's 4
    output channels init ~N(0, tiny) and near-constant over the object
    interior, so each channel is a coin flip to be relu-dead at every
    positive location (fcos head relu, reference fcos.py:238; reg
    gradients exist only at positives) — a dead channel pins that box
    edge to the location coordinate forever (measured: IoU plateaus at
    0.45 with x1 == loc_x for 175+ iters). A small positive bias on
    bbox_pred revives all channels.

    Runs in BOTH compute dtypes: bfloat16 is what train_net.py ships by
    default (TPU.COMPUTE_DTYPE, config/defaults.py) — the whole loop
    (assignment, losses, backward, SGD) must converge in that numeric
    path, not just the f32 one the oracles use."""
    import flax

    from centermask2_tpu.models import CenterMask, GroundTruth
    from centermask2_tpu.parallel import make_mesh, shard_batch
    from centermask2_tpu.train import (create_train_state, make_optimizer,
                                       make_train_step)

    model = CenterMask(
        conv_body="V-19-slim-eSE", mask_on=True, maskiou_on=True,
        num_classes=4,
        pre_nms_topk_test=50, post_nms_topk_test=10, nms_candidates=50,
        pre_nms_topk_train=50, post_nms_topk_train=20,
        batch_size_per_image=32, max_fg_proposals=8,
        dtype=jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32)

    # one 128x128 image, normalized scale: textured bright rectangle on
    # dark noise; the instance mask is the full gt box
    rng = np.random.RandomState(0)
    img = rng.randn(128, 128, 3).astype(np.float32) * 0.3 - 1.0
    gt_box = np.array([24.0, 40.0, 96.0, 104.0], np.float32)
    yy, xx = np.mgrid[0:64, 0:72].astype(np.float32)
    tex = np.stack([1.0 + xx / 36.0, 1.0 + yy / 32.0,
                    2.0 + np.sin(xx / 6.0) * 0.5], axis=-1)
    img[40:104, 24:96] = tex + rng.randn(64, 72, 3).astype(np.float32) * 0.1
    images = jnp.asarray(img[None])
    gt = GroundTruth(
        boxes=jnp.asarray(gt_box[None, None]),
        classes=jnp.asarray([[1]], jnp.int32),
        valid=jnp.ones((1, 1), bool),
        mask_patches=jnp.ones((1, 1, 28, 28), jnp.float32))

    variables = flax.core.unfreeze(model.init(jax.random.PRNGKey(0), images))

    def revive_bbox_pred(tree):
        for k, v in tree.items():
            if k == "bbox_pred":
                v["bias"] = v["bias"] + 1.0
            elif isinstance(v, dict):
                revive_bbox_pred(v)

    revive_bbox_pred(variables["params"])

    opt = make_optimizer(0.01, (100000,), warmup_iters=50,
                         clip_value=1.0, clip_type="norm",
                         params_example=None)
    state = create_train_state(variables, opt)
    mesh = make_mesh(jax.devices()[:1])
    state = jax.device_put(state, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec()))
    images_s, gt_s = shard_batch((images, gt), mesh)
    step = make_train_step(model, opt, mesh=mesh)

    infer = jax.jit(lambda p, im: model.apply(p, im))

    def best_detection(params):
        out = infer(params, images)
        scores = np.asarray(out.scores[0]) * np.asarray(out.valid[0])
        k = int(scores.argmax())
        box = np.asarray(out.pred_boxes[0, k])
        ix0, iy0 = max(box[0], gt_box[0]), max(box[1], gt_box[1])
        ix1, iy1 = min(box[2], gt_box[2]), min(box[3], gt_box[3])
        inter = max(ix1 - ix0, 0.0) * max(iy1 - iy0, 0.0)
        a = (box[2] - box[0]) * (box[3] - box[1])
        b = (gt_box[2] - gt_box[0]) * (gt_box[3] - gt_box[1])
        iou = inter / max(a + b - inter, 1e-6)
        mask = np.asarray(out.pred_masks[0, k, 0])
        return float(scores[k]), float(iou), float((mask > 0.5).mean())

    first_loss = None
    score = iou = mask_frac = 0.0
    ok = False
    key = jax.random.PRNGKey(1)
    for it in range(300):
        key, sub = jax.random.split(key)
        state, metrics = step(state, images_s, gt_s, sub)
        if first_loss is None:
            first_loss = float(metrics["total_loss"])
        if it >= 49 and (it + 1) % 25 == 0:
            score, iou, mask_frac = best_detection(state.params)
            if score > 0.25 and iou > 0.5 and mask_frac > 0.5:
                ok = True
                break
    last_loss = float(metrics["total_loss"])
    assert np.isfinite(last_loss)
    assert last_loss < 0.6 * first_loss, (first_loss, last_loss)
    assert ok, ("no confident re-detection after training: "
                f"score={score}, iou={iou}, mask_frac={mask_frac}, "
                f"loss {first_loss} -> {last_loss}")


@pytest.mark.slow
def test_train_step_bf16_drift_vs_f32():
    """The training analog of test_bf16_inference_drift_vs_f32
    (test_e2e_torch.py): train_net.py trains with COMPUTE_DTYPE=bfloat16
    by default (config/defaults.py TPU section), while every gradient
    oracle forces f32. One identical train step in both dtypes: the bf16
    step must produce finite losses close to f32's, update the params,
    and move them in the SAME direction (a dtype bug in the backward —
    sign flip, silent f32 promotion, saturated cast — decorrelates the
    update; bf16 rounding alone does not)."""
    from centermask2_tpu.models import CenterMask

    images, gt = _parity_batch(2, n_gt=2)
    runs = {}
    for name, dtype in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        model = CenterMask(
            conv_body="V-19-slim-eSE", mask_on=True, maskiou_on=True,
            pre_nms_topk_train=20, post_nms_topk_train=10,
            nms_candidates=20, batch_size_per_image=16, max_fg_proposals=2,
            dtype=dtype)
        deltas, metrics, _ = _run_parity_step(model, images, gt, 1)
        runs[name] = (deltas, metrics)

    d32, m32 = runs["f32"]
    d16, m16 = runs["bf16"]
    # finite, comparable losses (bf16 keeps ~3 decimal digits through
    # the forward; losses are f32 reductions of bf16 activations)
    for k in m32:
        assert np.isfinite(m16[k]), (k, m16)
        assert abs(m16[k] - m32[k]) <= 0.05 * abs(m32[k]) + 0.02, (
            k, m32[k], m16[k])

    # params moved, and in the same direction as the f32 step: global
    # cosine similarity over the concatenated update vector
    flat32 = np.concatenate([np.asarray(v, np.float64).ravel()
                             for v in jax.tree.leaves(d32)])
    flat16 = np.concatenate([np.asarray(v, np.float64).ravel()
                             for v in jax.tree.leaves(d16)])
    n32, n16 = np.linalg.norm(flat32), np.linalg.norm(flat16)
    assert n16 > 0, "bf16 step did not update the params"
    cos = float(flat32 @ flat16 / (n32 * n16))
    assert cos > 0.9, f"bf16 update decorrelated from f32: cos={cos}"
    # magnitude agreement (catches double-counted or dropped grad terms)
    assert 0.5 < n16 / n32 < 2.0, (n16, n32)
