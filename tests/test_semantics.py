import jax.numpy as jnp
import numpy as np
import pytest
import torch

from jpdse_tpu.ops.semantics import (
    instance_edges,
    one_hot_label,
    prepare_semantics,
    sem_mask,
)


def torch_get_edges(t: torch.Tensor) -> torch.Tensor:
    """Verbatim semantics of the reference get_edges (pix2pixHD_model.py:774-783)
    re-run under torch as the golden implementation."""
    edge = torch.zeros(t.size(), dtype=torch.uint8)
    edge[:, :, :, 1:] = edge[:, :, :, 1:] | (t[:, :, :, 1:] != t[:, :, :, :-1])
    edge[:, :, :, :-1] = edge[:, :, :, :-1] | (t[:, :, :, 1:] != t[:, :, :, :-1])
    edge[:, :, 1:, :] = edge[:, :, 1:, :] | (t[:, :, 1:, :] != t[:, :, :-1, :])
    edge[:, :, :-1, :] = edge[:, :, :-1, :] | (t[:, :, 1:, :] != t[:, :, :-1, :])
    return edge.float()


def test_one_hot_label():
    label = jnp.array([[[0, 2], [1, 3]]])  # (1,2,2)
    oh = one_hot_label(label, 4)
    assert oh.shape == (1, 2, 2, 4)
    np.testing.assert_array_equal(np.asarray(oh[0, 0, 0]), [1, 0, 0, 0])
    np.testing.assert_array_equal(np.asarray(oh[0, 1, 1]), [0, 0, 0, 1])


def test_instance_edges_matches_reference(rng):
    inst = rng.integers(0, 5, size=(2, 16, 24)).astype(np.int64)
    ours = np.asarray(instance_edges(jnp.asarray(inst))[..., 0])
    golden = torch_get_edges(torch.from_numpy(inst[:, None]))[:, 0].numpy()
    np.testing.assert_array_equal(ours, golden)


def test_sem_mask_reference_worked_example():
    """The worked example embedded at pix2pixHD_model.py:656-703 (case 1 & 2),
    transposed to NHWC."""
    real = jnp.array([[[[1.0, 3.0], [2.0, 4.0]]]]).reshape(1, 1, 2, 2)  # NHWC (1,1,2,2ch)
    # reference case layout: image (1,2,1,2) NCHW -> NHWC (1,1,2,C=2)
    img = jnp.array([[[[1.0, 3.0], [2.0, 4.0]]]])  # (1,1,2,2): pixel0=(1,3) pixel1=(2,4)
    # case 1: label ch0 = [1,1], ch1 = [0,0]
    label1 = jnp.array([[[[1.0, 0.0], [1.0, 0.0]]]])  # (1,1,2,2)
    m1 = sem_mask(img, label1, binary_mask=False, img_nc=2)
    # expected: block0 = img * label0 -> [[1,3],[2,4]], block1 = 0
    np.testing.assert_array_equal(
        np.asarray(m1), np.array([[[[1, 3, 0, 0], [2, 4, 0, 0]]]], dtype=np.float32)
    )
    # case 2: label ch0 = [1,0], ch1 = [0,1]
    label2 = jnp.array([[[[1.0, 0.0], [0.0, 1.0]]]])
    m2 = sem_mask(img, label2, binary_mask=False, img_nc=2)
    np.testing.assert_array_equal(
        np.asarray(m2), np.array([[[[1, 3, 0, 0], [0, 0, 2, 4]]]], dtype=np.float32)
    )


def test_sem_mask_binary_and_multiquality(rng):
    img = jnp.asarray(rng.normal(size=(1, 4, 4, 3)).astype(np.float32))
    label = jnp.asarray((rng.random((1, 4, 4, 5)) > 0.5).astype(np.float32))
    m = sem_mask(img, label, binary_mask=True, img_nc=3)
    assert m.shape == (1, 4, 4, 15)
    np.testing.assert_array_equal(
        np.asarray(m[..., 0:3]), np.asarray(jnp.broadcast_to(label[..., 0:1], (1, 4, 4, 3)))
    )
    # multi-quality: img already has L*img_nc channels
    img_mq = jnp.asarray(rng.normal(size=(1, 4, 4, 15)).astype(np.float32))
    m2 = sem_mask(img_mq, label, binary_mask=False, img_nc=3)
    np.testing.assert_allclose(
        np.asarray(m2[..., 3:6]),
        np.asarray(img_mq[..., 3:6] * label[..., 1:2]),
        rtol=1e-6,
    )
    with pytest.raises(ValueError):
        sem_mask(jnp.zeros((1, 4, 4, 7)), label, img_nc=3)


def test_prepare_semantics_concat():
    label = jnp.zeros((1, 4, 4), jnp.int32)
    inst = jnp.arange(16).reshape(1, 4, 4)
    out = prepare_semantics(label, inst, num_channels=3)
    assert out.shape == (1, 4, 4, 4)  # 3 one-hot + 1 edge
    out2 = prepare_semantics(label, None, 3, no_instance=True)
    assert out2.shape == (1, 4, 4, 3)
    out3 = prepare_semantics(None, inst, 3, no_label=True)
    assert out3.shape == (1, 4, 4, 1)
    assert prepare_semantics(None, None, 3, True, True) is None


def test_sem_wise_distortion_reference_worked_example():
    """pix2pixHD_model.py:656-703 worked examples, transposed to NHWC."""
    import jax.numpy as jnp
    from jpdse_tpu.ops.semantics import sem_wise_distortion

    # images: 1x1x2 spatial, 2 channels; labels 2 classes
    real = jnp.array([[[[1.0, 3.0], [2.0, 4.0]]]])  # (1,1,2,C=2)
    fake = jnp.array([[[[0.0, 9.0], [2.0, 11.0]]]])
    # case 1: class0 covers both pixels, class1 none
    # per-pixel L1 sums: pixel0 |1-0|+|3-9| = 7, pixel1 |2-2|+|4-11| = 7;
    # class0 mean = (7+7)/2 = 7 (intended semantics; the reference's printed
    # values come from its swapped sem_mask args, see ops/semantics.py)
    label1 = jnp.array([[[[1.0, 0.0], [1.0, 0.0]]]])
    d1 = sem_wise_distortion(label1, real, fake)
    np.testing.assert_allclose(np.asarray(d1), [7.0, 0.0])
    # case 2: class0 -> pixel0, class1 -> pixel1
    label2 = jnp.array([[[[1.0, 0.0], [0.0, 1.0]]]])
    d2 = sem_wise_distortion(label2, real, fake)
    np.testing.assert_allclose(np.asarray(d2), [7.0, 7.0])
