import jax
import jax.numpy as jnp
import numpy as np

from centermask2_tpu.structures import Instances, ImageList, boxes


def test_pairwise_iou_against_numpy_oracle():
    rng = np.random.RandomState(0)
    a = rng.rand(7, 4).astype(np.float32) * 100
    b = rng.rand(5, 4).astype(np.float32) * 100
    a[:, 2:] = a[:, :2] + np.abs(a[:, 2:]) + 1
    b[:, 2:] = b[:, :2] + np.abs(b[:, 2:]) + 1

    def iou_np(b1, b2):
        out = np.zeros((len(b1), len(b2)))
        for i, x in enumerate(b1):
            for j, y in enumerate(b2):
                ix0, iy0 = max(x[0], y[0]), max(x[1], y[1])
                ix1, iy1 = min(x[2], y[2]), min(x[3], y[3])
                iw, ih = max(ix1 - ix0, 0), max(iy1 - iy0, 0)
                inter = iw * ih
                ua = (
                    (x[2] - x[0]) * (x[3] - x[1])
                    + (y[2] - y[0]) * (y[3] - y[1])
                    - inter
                )
                out[i, j] = inter / ua if ua > 0 else 0
        return out

    got = np.asarray(boxes.pairwise_iou(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, iou_np(a, b), rtol=1e-5, atol=1e-6)


def test_boxes_clip_nonempty():
    b = jnp.array([[-5.0, -5.0, 10.0, 10.0], [3.0, 3.0, 3.0, 8.0]])
    clipped = boxes.clip(b, (8, 8))
    np.testing.assert_allclose(np.asarray(clipped[0]), [0, 0, 8, 8])
    mask = boxes.nonempty(clipped)
    assert bool(mask[0]) and not bool(mask[1])


def test_instances_pytree_and_gather():
    inst = Instances(
        (100, 120),
        scores=jnp.array([0.9, 0.5, 0.1, 0.0]),
        pred_classes=jnp.array([1, 2, 3, 0]),
        valid=jnp.array([True, True, True, False]),
    )
    # roundtrip through jit proves pytree registration
    out = jax.jit(lambda x: x)(inst)
    assert out.image_size == (100, 120)
    assert out.capacity == 4
    g = inst.gather(jnp.array([2, 0, 3]), jnp.array([True, True, False]))
    np.testing.assert_allclose(np.asarray(g.scores), [0.1, 0.9, 0.0])
    np.testing.assert_array_equal(np.asarray(g.valid), [True, True, False])
    assert int(g.num_valid()) == 2


def test_image_list_padding():
    imgs = [np.ones((100, 150, 3)), np.ones((120, 90, 3))]
    il = ImageList.from_tensors(imgs, size_divisibility=32)
    assert il.tensor.shape == (2, 128, 160, 3)
    assert il.image_sizes == [(100, 150), (120, 90)]
    # bottom/right zero padding (reference deploy_utils.py:85-90)
    arr = np.asarray(il.tensor)
    assert arr[0, :100, :150].min() == 1.0
    assert arr[0, 100:, :].max() == 0.0
    assert arr[0, :, 150:].max() == 0.0


def test_image_list_fixed_bucket():
    imgs = [np.ones((800, 1216, 3))]
    il = ImageList.from_tensors(imgs, pad_to=(1344, 1344))
    assert il.tensor.shape == (1, 1344, 1344, 3)
