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
    # gn scale: no weight decay -> exactly -lr * grad
    np.testing.assert_allclose(np.asarray(updates["gn"]["gn"]["scale"]),
                               -0.1, rtol=1e-6)


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


@pytest.mark.slow
def test_dryrun_multichip_2dev():
    """The driver contract: full DP train step on a virtual mesh."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as ge

    assert len(jax.devices()) >= 2, "conftest should provide 8 CPU devices"
    ge.dryrun_multichip(2)


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
