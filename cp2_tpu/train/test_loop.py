"""Evaluation loops: dataset-level testing with optional TTA.

Parity with mmseg's test APIs (``mmseg_/apis/test.py:34-230``:
``single_gpu_test`` / ``multi_gpu_test`` + ``collect_results``): run a
segmentor over a ``CustomDataset``, optionally with multi-scale/flip
test-time augmentation, and return per-image predicted class maps for
``dataset.evaluate``.

Distributed note: the reference's multi_gpu_test shards images across
ranks and gathers results via cpu/gpu collect; under single-controller
JAX every addressable device already participates in each batched
forward, so one loop covers the multi-device case — results are host-side
numpy either way.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from cp2_tpu.ops.resize import resize_bilinear


def _forward_logits(model, variables, img_chw_f32):
    logits = model.apply(variables, img_chw_f32, train=False)
    return resize_bilinear(
        logits.astype(jnp.float32), img_chw_f32.shape[1:3]
    )


def dataset_test(
    model,
    variables,
    dataset,
    *,
    batch_size: int = 1,
    progress: bool = False,
) -> List[np.ndarray]:
    """Whole-image inference over a pipeline dataset.

    The dataset's pipeline must produce fixed-size float images
    (``img`` HWC) — e.g. Resize+Pad to a constant shape.  Handles the
    MultiScaleFlipAug case (a list of views per sample) by averaging
    softmax probabilities over views, un-flipping flipped views
    (mmseg encoder_decoder.py:293-310 aug_test semantics).
    """
    fwd = jax.jit(lambda v, x: _forward_logits(model, v, x))
    results: List[np.ndarray] = []
    for idx in range(len(dataset)):
        sample = dataset[idx]
        views = sample if isinstance(sample, list) else [sample]
        prob_sum = None
        for view in views:
            img = np.asarray(view["img"], np.float32)[None]
            logits = fwd(variables, jnp.asarray(img))
            probs = jax.nn.softmax(logits, axis=-1)
            meta = view.get("img_metas", {})
            if meta.get("flip"):
                probs = probs[:, :, ::-1, :]
            prob_sum = probs if prob_sum is None else prob_sum + probs
        pred = np.asarray(jnp.argmax(prob_sum, axis=-1))[0]
        results.append(pred.astype(np.int64))
        if progress and idx % 50 == 0:
            print(f"[test] {idx + 1}/{len(dataset)}")
    return results


def single_device_test(model, variables, dataset, **kw):
    """Alias matching the reference's single_gpu_test naming."""
    return dataset_test(model, variables, dataset, **kw)


def multi_device_test(model, variables, dataset, **kw):
    """Multi-device alias: under single-controller JAX the same loop uses
    every addressable device; kept for API parity with multi_gpu_test."""
    return dataset_test(model, variables, dataset, **kw)
