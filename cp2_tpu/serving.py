"""Serving export: single-file AOT inference artifacts via ``jax.export``.

The reference has no serving layer (SURVEY.md §1: inference exists only
as the mmseg ``apis/`` helpers and Lightning ``test`` —
``mmseg_/apis/inference.py:11-99``,
``mmseg_/models/segmentors/encoder_decoder.py:181-243``).  This module is
a TPU-native extension of that surface: it freezes the finetuned
segmentor's FULL inference function — uint8 → /255 preprocess (the
finetune eval normalization, ``train/finetune.py::eval_with_norm``) →
EncoderDecoder forward in whole or slide mode → bilinear logit resize →
argmax class map — together with its weights into ONE serialized
StableHLO artifact.  A server deserializes and calls it without any
model code, config parsing, or checkpoint surgery, and the same file is
exported for both ``tpu`` and ``cpu`` so production serving and CI run
identical bytes.

Why AOT export instead of shipping the Python stack: under XLA the whole
pipeline is one compiled program anyway; serializing the exported
program pins the serving numerics at export time (no version-skew
retraces), removes the model zoo + orbax from the serving footprint, and
loads in milliseconds.  Shapes are static by TPU-serving convention;
``batch_size=None`` exports a symbolic batch dimension instead (whole
mode only — slide mode's window grid is computed from concrete shapes).

CLI::

    python -m cp2_tpu.serving --config cp2_tpu/configs/config_finetune.py \
        --checkpoint <ckpt_dir/step> --out /tmp/polyp_352.shlo \
        --hw 352 --batch 8 --selftest

"""

from __future__ import annotations

import argparse
import json
import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

from cp2_tpu.train.inference import (
    init_segmentor,
    slide_inference,
    whole_inference,
)

META_SUFFIX = ".json"


def make_inference_fn(
    model,
    variables,
    *,
    mode: str = "whole",
    num_classes: int = 2,
    crop_size: Optional[Tuple[int, int]] = None,
    stride: Optional[Tuple[int, int]] = None,
    preprocess: bool = True,
    return_logits: bool = False,
):
    """Self-contained inference closure over a built segmentor.

    Input is an (N, H, W, 3) image batch; with ``preprocess`` it is raw
    uint8/float pixels in [0, 255] and the eval normalization (x/255) is
    baked in.  Returns an (N, H, W) int32 class map, or the float32
    logits when ``return_logits``.
    """

    def fn(img):
        x = img.astype(jnp.float32)
        if preprocess:
            x = x / 255.0
        if mode == "whole":
            logits = whole_inference(model, variables, x)
        elif mode == "slide":
            logits = slide_inference(
                model, variables, x,
                crop_size=crop_size, stride=stride, num_classes=num_classes,
            )
        else:
            raise ValueError(f"unknown inference mode: {mode!r}")
        if return_logits:
            return logits
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    return fn


def export_segmentor(
    config,
    checkpoint_path: Optional[str] = None,
    out_path: Optional[str] = None,
    *,
    img_hw: Tuple[int, int] = (352, 352),
    batch_size: Optional[int] = 8,
    input_dtype=jnp.uint8,
    mode: str = "whole",
    num_classes: int = 2,
    crop_size: Tuple[int, int] = (256, 256),
    stride: Tuple[int, int] = (170, 170),
    bf16: bool = True,
    return_logits: bool = False,
    platforms: Sequence[str] = ("tpu", "cpu"),
):
    """Export the segmentor's inference function to a serving artifact.

    ``config`` is a config file path or a model config dict;
    ``checkpoint_path`` a finetune checkpoint dir (orbax ``<dir>/<step>``)
    whose weights are embedded as constants.  Writes the serialized
    program to ``out_path`` and its metadata to ``out_path + ".json"``;
    returns ``(exported, meta)``.
    """
    model, variables = init_segmentor(
        config, checkpoint_path, num_classes=num_classes,
        dtype=jnp.bfloat16 if bf16 else None,
    )
    fn = make_inference_fn(
        model, variables, mode=mode, num_classes=num_classes,
        crop_size=crop_size, stride=stride, return_logits=return_logits,
    )

    h, w = img_hw
    if batch_size is None:
        if mode != "whole":
            raise ValueError(
                "symbolic batch (batch_size=None) requires mode='whole': "
                "slide mode's window grid needs concrete shapes")
        spec = jax_export.symbolic_args_specs(
            jax.ShapeDtypeStruct((1, h, w, 3), input_dtype),
            f"b, {h}, {w}, 3",
        )
    else:
        spec = jax.ShapeDtypeStruct((batch_size, h, w, 3), input_dtype)

    exported = jax_export.export(jax.jit(fn), platforms=list(platforms))(spec)
    blob = exported.serialize()

    meta = {
        "mode": mode,
        "img_hw": list(img_hw),
        "batch_size": batch_size,
        "input_dtype": np.dtype(input_dtype).name,
        "num_classes": num_classes,
        "returns": "logits" if return_logits else "class_map",
        "preprocess": "x / 255 (raw [0,255] pixels in)",
        "bf16": bf16,
        "platforms": list(exported.platforms),
        "crop_size": list(crop_size) if mode == "slide" else None,
        "stride": list(stride) if mode == "slide" else None,
        "checkpoint": checkpoint_path,
        "bytes": len(blob),
    }
    if out_path:
        with open(out_path, "wb") as f:
            f.write(blob)
        with open(out_path + META_SUFFIX, "w") as f:
            json.dump(meta, f, indent=1)
    return exported, meta


def load_exported(path: str):
    """Deserialize a serving artifact; run it via ``.call(images)``."""
    with open(path, "rb") as f:
        return jax_export.deserialize(f.read())


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--config", required=True)
    p.add_argument("--checkpoint", default=None,
                   help="finetune checkpoint dir (orbax <run>/<step>)")
    p.add_argument("--out", required=True, help="artifact output path")
    p.add_argument("--hw", type=int, default=352)
    p.add_argument("--batch", type=int, default=8,
                   help="0 exports a symbolic batch dimension (whole mode)")
    p.add_argument("--mode", choices=("whole", "slide"), default="whole")
    p.add_argument("--num_classes", type=int, default=2)
    p.add_argument("--slide-crop", type=int, default=256)
    p.add_argument("--slide-stride", type=int, default=170)
    p.add_argument("--f32", action="store_true",
                   help="compute in f32 instead of bf16")
    p.add_argument("--logits", action="store_true",
                   help="return float32 logits instead of the class map")
    p.add_argument("--selftest", action="store_true",
                   help="deserialize the artifact and check it against the "
                        "live model on a random batch")
    args = p.parse_args(argv)

    _, meta = export_segmentor(
        args.config, args.checkpoint, args.out,
        img_hw=(args.hw, args.hw),
        batch_size=args.batch or None,
        mode=args.mode,
        num_classes=args.num_classes,
        crop_size=(args.slide_crop, args.slide_crop),
        stride=(args.slide_stride, args.slide_stride),
        bf16=not args.f32,
        return_logits=args.logits,
    )
    print(json.dumps(meta, indent=1))

    if args.selftest:
        model, variables = init_segmentor(
            args.config, args.checkpoint, num_classes=args.num_classes,
            dtype=None if args.f32 else jnp.bfloat16,
        )
        live = make_inference_fn(
            model, variables, mode=args.mode, num_classes=args.num_classes,
            crop_size=(args.slide_crop, args.slide_crop),
            stride=(args.slide_stride, args.slide_stride),
            return_logits=args.logits,
        )
        n = args.batch or 2
        x = np.random.RandomState(0).randint(
            0, 256, (n, args.hw, args.hw, 3), np.uint8)
        got = np.asarray(load_exported(args.out).call(x))
        want = np.asarray(jax.jit(live)(x))
        if args.logits:
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
        else:
            np.testing.assert_array_equal(got, want)
        print(f"selftest OK: artifact matches live model on "
              f"{x.shape} {os.path.basename(args.out)}")
    return meta


if __name__ == "__main__":
    main()
