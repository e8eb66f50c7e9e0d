"""Model zoo smoke tests: registry build, output strides, head shapes."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cp2_tpu.config import Config
from cp2_tpu.models import build_segmentor
from cp2_tpu import configs as _configs_pkg
import os

CONFIG_DIR = os.path.dirname(_configs_pkg.__file__)


def _init_and_run(cfg_name, hw=64, num_classes=None, batch=1):
    cfg = Config.fromfile(os.path.join(CONFIG_DIR, cfg_name))
    if num_classes is not None:
        cfg.model.decode_head.num_classes = num_classes
    model = build_segmentor(cfg)
    x = jnp.zeros((batch, hw, hw, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    return model, variables, out


@pytest.mark.slow
def test_pretrain_config_contrast_output_os16():
    # dilated ResNet-50: output stride 16, contrast head -> 128-d embedding
    _, _, out = _init_and_run("config_pretrain.py", hw=64)
    assert out.shape == (1, 4, 4, 128)


@pytest.mark.slow
def test_finetune_config_seg_logits():
    _, _, out = _init_and_run("config_finetune.py", hw=64, num_classes=2)
    assert out.shape == (1, 4, 4, 2)


@pytest.mark.slow
def test_moco_config_passthrough_os32():
    # standard strides: OS=32; FCNHead num_convs=0 passthrough -> 2048 channels
    cfg = Config.fromfile(os.path.join(CONFIG_DIR, "config_moco.py"))
    model = build_segmentor(cfg)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    feats = model.apply(
        variables, x, train=False, method=lambda m, img, train: m.extract_feat(img, train=train)
    )
    assert feats[-1].shape == (1, 2, 2, 2048)


def test_registry_unknown_type_raises():
    from cp2_tpu.models.registry import SEGMENTORS

    with pytest.raises(KeyError):
        SEGMENTORS.build({"type": "DoesNotExist"})


def test_config_fromfile_attribute_access():
    cfg = Config.fromfile(os.path.join(CONFIG_DIR, "config_pretrain.py"))
    assert cfg.model.type == "EncoderDecoder"
    assert cfg.model.backbone.strides == (1, 2, 2, 1)
    assert cfg.model.decode_head.contrast is True
    assert cfg.get("train_cfg") is None
