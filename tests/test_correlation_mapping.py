"""Fidelity gate: correspondence/IoU math against analytic expectations.

Ports the reference's two analytic fixtures (uniqueIds / sharedIds,
reference tests/test_correlation_mapping.py:15-132) plus the id-map
rescale roundtrip (reference :188-206), and adds a cross-check of our
device-side nearest-exact resize against cv2.INTER_NEAREST_EXACT.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from cp2_tpu.ops import (
    get_correlation_map,
    get_masked_correlation_map,
    masked_iou,
    nearest_exact_resize,
    rescale_ids,
)


def _unique_ids_case():
    batch_size = 4
    height, width = 10, 10
    crop_h, crop_w = height // 2, width // 2

    rng = np.random.RandomState(0)
    base_map = np.arange(1, batch_size * height * width + 1)
    rng.shuffle(base_map)
    base_map = base_map.reshape(batch_size, height, width)

    offset_h, offset_w = 1, 2
    map_a = base_map[:, :crop_h, :crop_w]
    map_b = base_map[:, offset_h : offset_h + crop_h, offset_w : offset_w + crop_w]

    mask_a = np.zeros((batch_size, crop_h, crop_w))
    mask_a[:, 2:4, 1:3] = 1
    mask_b = np.zeros((batch_size, crop_h, crop_w))
    mask_b[:, 1:3, 0:2] = 1

    return {
        "map_a": map_a,
        "map_b": map_b,
        "mask_a": mask_a,
        "mask_b": mask_b,
        # crops overlap in a 4x3 region = 12 shared unique ids; each crop has
        # 25 pixels -> union = 12 + 13 + 13
        "iou": np.full(batch_size, 12 / (12 + 25 - 12 + 25 - 12)),
        "iou_masked": np.full(batch_size, 1 / 3),
    }


def _shared_ids_case():
    base_map = np.array(
        [
            [
                [1, 2, 2, 3, 4, 5],
                [6, 2, 2, 3, 3, 3],
                [7, 8, 9, 10, 11, 12],
                [13, 8, 8, 8, 14, 15],
            ]
        ],
        dtype=np.float32,
    )
    map_a = base_map[:, 0:3, 1:4]
    map_b = base_map[:, 0:3, 2:5]
    mask_a = np.array([[[1, 1, 1], [1, 1, 1], [0, 0, 0]]], dtype=np.float32)
    mask_b = np.array([[[1, 0, 0], [1, 0, 0], [1, 0, 0]]], dtype=np.float32)
    return {
        "map_a": map_a,
        "map_b": map_b,
        "mask_a": mask_a,
        "mask_b": mask_b,
        "iou": np.array([4 / 7]),
        "iou_masked": np.array([2 / 3]),
    }


@pytest.mark.parametrize(
    "case", [_unique_ids_case, _shared_ids_case], ids=["uniqueIds", "sharedIds"]
)
def test_masked_correlation_iou(case):
    data = case()
    results = get_masked_correlation_map(
        jnp.asarray(data["map_a"], jnp.float32),
        jnp.asarray(data["map_b"], jnp.float32),
        jnp.asarray(data["mask_a"], jnp.float32),
        jnp.asarray(data["mask_b"], jnp.float32),
    )
    np.testing.assert_allclose(np.asarray(results["iou"]), data["iou"], rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(results["iou_masked"]), data["iou_masked"], rtol=1e-6
    )


def test_correlation_map_matches_bruteforce():
    data = _shared_ids_case()
    results = get_correlation_map(
        jnp.asarray(data["map_a"]), jnp.asarray(data["map_b"])
    )
    a = data["map_a"].reshape(1, -1)
    b = data["map_b"].reshape(1, -1)
    expected = a[:, :, None] == b[:, None, :]
    np.testing.assert_array_equal(np.asarray(results["corr_map"]), expected)
    np.testing.assert_array_equal(np.asarray(results["corr_map_a"]), expected.sum(2))
    np.testing.assert_array_equal(np.asarray(results["corr_map_b"]), expected.sum(1))


def test_masked_correspondences_share_ids():
    """Pixels flagged as corresponding must actually share an id."""
    data = _unique_ids_case()
    results = get_masked_correlation_map(
        jnp.asarray(data["map_a"], jnp.float32),
        jnp.asarray(data["map_b"], jnp.float32),
        jnp.asarray(data["mask_a"], jnp.float32),
        jnp.asarray(data["mask_b"], jnp.float32),
    )
    corr_mask = np.asarray(results["corr_mask"])
    a = data["map_a"].reshape(corr_mask.shape[0], -1)
    b = data["map_b"].reshape(corr_mask.shape[0], -1)
    n, x, y = np.nonzero(corr_mask)
    assert len(n) > 0
    np.testing.assert_array_equal(a[n, x], b[n, y])


@pytest.mark.parametrize("stride,match", [(1, True), (2, False)], ids=["stride1", "stride2"])
def test_pixel_ids_resize_roundtrip(stride, match):
    h, w = 10, 15
    pixel_ids = np.arange(1, h * w + 1).reshape(h, w)
    reduced = rescale_ids(jnp.asarray(pixel_ids), stride)
    assert reduced.shape[0] * stride == pixel_ids.shape[0]

    upsampled = np.asarray(nearest_exact_resize(reduced, (h, w)))
    assert upsampled.shape == pixel_ids.shape
    if match:
        np.testing.assert_array_equal(upsampled, pixel_ids)


@pytest.mark.parametrize("src,dst", [((10, 15), (20, 30)), ((7, 9), (14, 14)), ((16, 16), (5, 11))])
def test_nearest_exact_matches_cv2(src, dst):
    cv2 = pytest.importorskip("cv2")
    x = np.arange(src[0] * src[1], dtype=np.int32).reshape(src)
    ours = np.asarray(nearest_exact_resize(jnp.asarray(x), dst))
    ref = cv2.resize(x, dsize=(dst[1], dst[0]), interpolation=cv2.INTER_NEAREST_EXACT)
    np.testing.assert_array_equal(ours, ref)


def test_masked_iou_jits():
    import jax

    data = _shared_ids_case()
    fn = jax.jit(masked_iou)
    out = fn(
        jnp.asarray(data["map_a"].reshape(1, -1)),
        jnp.asarray(data["map_b"].reshape(1, -1)),
        jnp.asarray(data["mask_a"].reshape(1, -1)),
        jnp.asarray(data["mask_b"].reshape(1, -1)),
    )
    np.testing.assert_allclose(np.asarray(out), data["iou_masked"], rtol=1e-6)
