"""Serving export: AOT artifact round-trips match the live model.

The reference has no serving layer (SURVEY.md §1); these tests pin the
TPU-native extension in ``cp2_tpu/serving.py`` — export → serialize →
deserialize → call must reproduce the live inference function exactly,
with and without an embedded checkpoint, at fixed and symbolic batch.
"""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cp2_tpu.serving import export_segmentor, load_exported, make_inference_fn
from cp2_tpu.train.inference import init_segmentor

from tests.test_finetune_task import HW, TINY_SEG


def _rand_batch(n, seed=0):
    return np.random.RandomState(seed).randint(
        0, 256, (n, HW, HW, 3), np.uint8)


def test_export_roundtrip_whole(tmp_path):
    out = str(tmp_path / "tiny.shlo")
    _, meta = export_segmentor(
        TINY_SEG, None, out, img_hw=(HW, HW), batch_size=2,
        num_classes=2, bf16=False,
    )
    assert meta["bytes"] > 0 and meta["mode"] == "whole"
    with open(out + ".json") as f:
        assert json.load(f)["returns"] == "class_map"

    model, variables = init_segmentor(TINY_SEG, num_classes=2)
    live = jax.jit(make_inference_fn(model, variables))
    x = _rand_batch(2)
    got = np.asarray(load_exported(out).call(x))
    want = np.asarray(live(x))
    assert got.shape == (2, HW, HW) and got.dtype == np.int32
    np.testing.assert_array_equal(got, want)


def test_export_symbolic_batch(tmp_path):
    out = str(tmp_path / "tiny_b.shlo")
    export_segmentor(
        TINY_SEG, None, out, img_hw=(HW, HW), batch_size=None,
        num_classes=2, bf16=False,
    )
    art = load_exported(out)
    model, variables = init_segmentor(TINY_SEG, num_classes=2)
    live = jax.jit(make_inference_fn(model, variables))
    for n in (1, 3):
        x = _rand_batch(n, seed=n)
        np.testing.assert_array_equal(
            np.asarray(art.call(x)), np.asarray(live(x)))


def test_export_slide_logits(tmp_path):
    out = str(tmp_path / "tiny_slide.shlo")
    crop = (HW // 2, HW // 2)
    stride = (HW // 4, HW // 4)
    _, meta = export_segmentor(
        TINY_SEG, None, out, img_hw=(HW, HW), batch_size=1, mode="slide",
        num_classes=2, crop_size=crop, stride=stride, bf16=False,
        return_logits=True,
    )
    assert meta["crop_size"] == list(crop)
    model, variables = init_segmentor(TINY_SEG, num_classes=2)
    live = jax.jit(make_inference_fn(
        model, variables, mode="slide", num_classes=2,
        crop_size=crop, stride=stride, return_logits=True,
    ))
    x = _rand_batch(1)
    got = np.asarray(load_exported(out).call(x))
    want = np.asarray(live(x))
    assert got.shape == (1, HW, HW, 2)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_symbolic_batch_rejects_slide():
    with pytest.raises(ValueError, match="symbolic batch"):
        export_segmentor(TINY_SEG, None, None, img_hw=(HW, HW),
                         batch_size=None, mode="slide")


def test_export_embeds_checkpoint_weights(tmp_path):
    from cp2_tpu.checkpoint.io import save_checkpoint, wait_for_checkpoints

    model, variables = init_segmentor(TINY_SEG, num_classes=2)
    # perturb one kernel so the checkpointed model is distinguishable
    params = jax.tree_util.tree_map(lambda a: a, variables["params"])
    flat = jax.tree_util.tree_leaves_with_path(params)
    path0, leaf0 = flat[0]
    params = jax.tree_util.tree_map(
        lambda a: a + 0.5 if a is leaf0 else a, params)
    state = {"params": params,
             "batch_stats": variables.get("batch_stats", {})}
    ckpt_dir = str(tmp_path / "ckpt")
    save_checkpoint(ckpt_dir, 7, state)
    wait_for_checkpoints()

    out = str(tmp_path / "tiny_ckpt.shlo")
    export_segmentor(
        TINY_SEG, f"{ckpt_dir}/7", out, img_hw=(HW, HW), batch_size=1,
        num_classes=2, bf16=False, return_logits=True,
    )
    live = jax.jit(make_inference_fn(
        model, {"params": params,
                "batch_stats": variables.get("batch_stats", {})},
        return_logits=True))
    x = _rand_batch(1)
    got = np.asarray(load_exported(out).call(x))
    np.testing.assert_allclose(got, np.asarray(live(x)),
                               rtol=1e-5, atol=1e-5)
    # and it must differ from the unperturbed weights
    base = np.asarray(jax.jit(make_inference_fn(
        model, variables, return_logits=True))(x))
    assert np.abs(got - base).max() > 1e-3
