"""Shared tiny model/config for the multi-process equivalence tests."""

GLOBAL_BATCH = 8
HW = 32
STEPS = 2


def tiny_cfg():
    return dict(
        type="EncoderDecoder",
        backbone=dict(
            type="ResNet",
            depth=18,
            stem_channels=8,
            base_channels=8,
            dilations=(1, 1, 1, 2),
            strides=(1, 2, 2, 1),
            norm_cfg=dict(type="BN"),
            contract_dilation=True,
        ),
        decode_head=dict(
            type="ASPPHead",
            in_channels=64,
            channels=16,
            dilations=(1, 6),
            num_classes=2,
            norm_cfg=dict(type="BN"),
            dropout_ratio=0.0,  # determinism across the two runs
        ),
    )
