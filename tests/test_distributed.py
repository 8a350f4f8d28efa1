"""Multi-process data parallelism (2 processes x 4 virtual CPU devices).

The process-spanning half of the reference's distribution story:
detectron2 DDP training across ranks (reference train_net.py launch,
utils/comm.py:5-11) and the cross-rank eval gather
(coco_evaluation.py:154-160). Here: jax.distributed + a global mesh +
the SAME shard_map train step, and process_allgather-based prediction
merging (centermask2_tpu/parallel/distributed.py).

Children are plain python subprocesses (no pytest conftest): they pin
the CPU platform themselves and join a local Gloo cluster on a
parent-chosen free port.
"""

import json
import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _spawn_pair(script: str, tmp_path, extra_env=None, timeout=600):
    """Run `script` as 2 jax.distributed processes x 4 CPU devices each.
    The script sees PORT / PID / OUT env vars."""
    port = _free_port()
    path = tmp_path / "child.py"
    path.write_text(textwrap.dedent(script))
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(extra_env or {})
        env["CM2_PLATFORM"] = "cpu"
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                            + " --xla_force_host_platform_device_count=4")
        env.setdefault("JAX_COMPILATION_CACHE_DIR",
                       os.path.expanduser("~/.cache/jax_comp_cache"))
        env["PORT"] = str(port)
        env["PID"] = str(pid)
        env["OUT"] = str(tmp_path)
        procs.append(subprocess.Popen(
            [sys.executable, str(path)], cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for pr in procs:
        try:
            out, _ = pr.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (pr, out) in enumerate(zip(procs, outs)):
        assert pr.returncode == 0, f"proc {pid} failed:\n{out[-4000:]}"
    return outs


CHILD_PRELUDE = """
import os, sys, json
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize("127.0.0.1:" + os.environ["PORT"],
                           num_processes=2,
                           process_id=int(os.environ["PID"]))
pid = int(os.environ["PID"])
assert jax.process_count() == 2 and jax.local_device_count() == 4
sys.path.insert(0, os.path.join(os.environ["REPO"]))
sys.path.insert(0, os.path.join(os.environ["REPO"], "tests"))
"""


@pytest.mark.slow
def test_multiprocess_train_step_matches_single_process(tmp_path):
    """One GLOBAL train step over 2 processes x 4 devices must produce
    the same parameter update as the identical global batch on the
    single-process 8-device mesh (extends
    test_train.test_gradient_parity_8dev_vs_1dev across the process
    boundary: grads pmean'd over Gloo, FCOS normalizers psum'd)."""
    script = CHILD_PRELUDE + """
import jax.numpy as jnp
from test_train import _parity_batch
from centermask2_tpu.models import CenterMask
from centermask2_tpu.parallel import (global_mesh, replicate_from_host,
                                      shard_host_batch)
from centermask2_tpu.train import (create_train_state, make_optimizer,
                                   make_train_step)

model = CenterMask(
    conv_body="V-19-slim-eSE", mask_on=True, maskiou_on=True,
    pre_nms_topk_train=20, post_nms_topk_train=10, nms_candidates=20,
    batch_size_per_image=16, max_fg_proposals=2, dtype=jnp.float32)
images, gt = _parity_batch(8, n_gt=2)
# this process's local half of the global batch (global device order is
# process-major, so rows [4p, 4p+4) land on process p's devices)
local = jax.tree.map(lambda x: np.asarray(x)[4 * pid: 4 * pid + 4],
                     (images, gt))

variables = model.init(jax.random.PRNGKey(0), images[:1])
opt = make_optimizer(0.02, (100,), warmup_iters=0, warmup_factor=1.0,
                     params_example={"params": variables["params"]})
state = create_train_state(variables, opt)
params_before = jax.tree.map(np.asarray, state.params)

mesh = global_mesh()
state = replicate_from_host(jax.device_get(state), mesh)
im, g = shard_host_batch(local, mesh)
step = make_train_step(model, opt, mesh=mesh)
# AOT-compile (local, no collectives), then rendezvous: on a 1-core CI
# host the two children's multi-minute compiles skew more than the 30s
# Gloo context-init timeout allows at the first psum
compiled = step.lower(state, im, g, jax.random.PRNGKey(1)).compile()
from centermask2_tpu.parallel import barrier
barrier("post_compile", 1_800_000)
new_state, metrics = compiled(state, im, g, jax.random.PRNGKey(1))
metrics = jax.tree.map(float, jax.device_get(metrics))
deltas = jax.tree.map(lambda a, b: np.asarray(a) - b,
                      new_state.params, params_before)
if pid == 0:
    flat = {jax.tree_util.keystr(k): v for k, v in
            jax.tree_util.tree_leaves_with_path(deltas)}
    np.savez(os.path.join(os.environ["OUT"], "mp_deltas.npz"), **flat)
    with open(os.path.join(os.environ["OUT"], "mp_metrics.json"), "w") as f:
        json.dump(metrics, f)
print("child", pid, "ok")
"""
    _spawn_pair(script, tmp_path, extra_env={"REPO": REPO})

    # single-process 8-device result, in THIS pytest process (conftest
    # provides the 8-device CPU mesh)
    import jax
    import jax.numpy as jnp

    from test_train import _parity_batch, _run_parity_step
    from centermask2_tpu.models import CenterMask

    model = CenterMask(
        conv_body="V-19-slim-eSE", mask_on=True, maskiou_on=True,
        pre_nms_topk_train=20, post_nms_topk_train=10, nms_candidates=20,
        batch_size_per_image=16, max_fg_proposals=2, dtype=jnp.float32)
    images, gt = _parity_batch(8, n_gt=2)
    d1, m1, _ = _run_parity_step(model, images, gt, 8)

    mp_metrics = json.loads((tmp_path / "mp_metrics.json").read_text())
    for k in m1:
        assert abs(m1[k] - mp_metrics[k]) <= 1e-5 + 1e-4 * abs(m1[k]), (
            k, m1[k], mp_metrics[k])

    mp = np.load(tmp_path / "mp_deltas.npz")
    flat1 = {jax.tree_util.keystr(k): v for k, v in
             jax.tree_util.tree_leaves_with_path(d1)}
    assert set(mp.files) == set(flat1)
    n_nonzero = 0
    for k, a in flat1.items():
        np.testing.assert_allclose(np.asarray(a), mp[k], rtol=5e-3,
                                   atol=2e-7, err_msg=k)
        n_nonzero += int(np.abs(a).max() > 0)
    assert n_nonzero > 50


@pytest.mark.slow
def test_multiprocess_eval_merge(tmp_path):
    """Sharded evaluation across 2 processes: each scores a strided
    slice of a 4-image synthetic COCO set through the REAL
    evaluate_dataset loop; the merged rank-0 metrics must equal the
    single-process evaluation of the full set (the reference's
    comm.gather-then-rank-0-scores contract)."""
    from PIL import Image, ImageDraw

    ds_root = tmp_path / "ds"
    (ds_root / "images").mkdir(parents=True)
    images, anns = [], []
    for i in range(4):
        w, h = 160, 140
        im = Image.new("RGB", (w, h), (30 + 40 * i, 90, 140))
        d = ImageDraw.Draw(im)
        x0, y0, bw, bh = 20 + 12 * i, 25 + 6 * i, 70, 55
        d.rectangle([x0, y0, x0 + bw, y0 + bh], fill=(220, 60 + 40 * i, 40))
        im.save(ds_root / "images" / f"{i:012d}.jpg")
        images.append({"id": i, "file_name": f"{i:012d}.jpg",
                       "width": w, "height": h})
        anns.append({"id": i + 1, "image_id": i, "category_id": 1,
                     "bbox": [x0, y0, bw, bh], "area": bw * bh,
                     "iscrowd": 0,
                     "segmentation": [[x0, y0, x0 + bw, y0, x0 + bw,
                                       y0 + bh, x0, y0 + bh]]})
    with open(ds_root / "ann.json", "w") as f:
        json.dump({"images": images, "annotations": anns,
                   "categories": [{"id": 1, "name": "thing"}]}, f)

    eval_body = """
from centermask2_tpu.models import CenterMask
from centermask2_tpu.evaluation.loop import evaluate_dataset

model = CenterMask(conv_body="V-19-slim-eSE", mask_on=True,
                   maskiou_on=True, pre_nms_topk_test=50,
                   nms_candidates=50, post_nms_topk_test=20,
                   pre_nms_thresh_test=-1.0,  # random weights: keep
                   num_classes=1,             # detections on EVERY image,
                   dtype=jnp.float32)         # all mapped to the 1 category
import numpy as np
x0 = jnp.zeros((1, 128, 128, 3), jnp.float32)
variables = jax.jit(model.init)(jax.random.PRNGKey(0), x0)
results, _, ev = evaluate_dataset(
    model, variables, ann=ANN, image_root=ROOT, fixed_size=128,
    min_size=96, max_size=124, progress_every=0, distributed=DISTRIBUTED)
"""
    script = CHILD_PRELUDE + "import jax.numpy as jnp\n" + (
        eval_body.replace("ANN", repr(str(ds_root / "ann.json")))
                 .replace("ROOT", repr(str(ds_root / "images")))
                 .replace("DISTRIBUTED", "True")) + """
if pid == 0:
    # with thresh -1 every image yields detections, so the merged
    # proposal store must cover BOTH processes' slices (all 4 images)
    assert len(ev.proposals) == 4, (
        "merge should cover all 4 images: %d" % len(ev.proposals))
    with open(os.path.join(os.environ["OUT"], "mp_eval.json"), "w") as f:
        json.dump({"results": results,
                   "n_preds": len(ev.predictions)}, f)
else:
    assert results == {}, "non-main process must not score"
print("child", pid, "ok")
"""
    _spawn_pair(script, tmp_path, extra_env={"REPO": REPO})

    # single-process reference evaluation of the full set
    import jax
    import jax.numpy as jnp
    from centermask2_tpu.evaluation.loop import evaluate_dataset
    from centermask2_tpu.models import CenterMask

    model = CenterMask(conv_body="V-19-slim-eSE", mask_on=True,
                       maskiou_on=True, pre_nms_topk_test=50,
                       nms_candidates=50, post_nms_topk_test=20,
                       pre_nms_thresh_test=-1.0, num_classes=1,
                       dtype=jnp.float32)
    x0 = jnp.zeros((1, 128, 128, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x0)
    results, _, ev = evaluate_dataset(
        model, variables, ann=str(ds_root / "ann.json"),
        image_root=str(ds_root / "images"), fixed_size=128,
        min_size=96, max_size=124, progress_every=0)

    mp = json.loads((tmp_path / "mp_eval.json").read_text())
    assert mp["n_preds"] == len(ev.predictions)
    assert len(ev.predictions) > 0
    for task in ("bbox", "segm"):
        for k, v in results[task].items():
            got = mp["results"][task][k]
            if isinstance(v, float) and np.isnan(v):
                # e.g. per-category AP with no predictions in a class
                assert got is None or np.isnan(got), (task, k, got)
            else:
                assert got == pytest.approx(v, abs=1e-9), (task, k, v, got)


def test_all_gather_objects_single_process():
    """Single-process degenerate case used by every non-distributed
    caller: identity wrap, no multihost machinery touched."""
    from centermask2_tpu.parallel import all_gather_objects, process_subset

    obj = {"a": [1, 2], "b": np.arange(3)}
    out = all_gather_objects(obj)
    assert len(out) == 1 and out[0] is obj
    assert list(process_subset([1, 2, 3])) == [1, 2, 3]
