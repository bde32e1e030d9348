import pytest

from centerfusiondetect3d_tpu.config import (
    ConfigNode,
    default_config,
    load_config,
)


def test_attribute_access_and_freeze():
    c = default_config()
    assert c.MODEL.ARCH == "dla_34"
    c.freeze()
    with pytest.raises(AttributeError):
        c.MODEL.ARCH = "resnet"
    c.defrost()
    c.MODEL.ARCH = "dla_34"


def test_merge_from_list_coerces_types():
    c = default_config()
    c.merge_from_list(["TRAIN.LR", "5e-5", "MODEL.K", "50", "DATASET.RADAR_PC", "False"])
    assert c.TRAIN.LR == 5e-5
    assert c.MODEL.K == 50
    assert c.DATASET.RADAR_PC is False


def test_merge_from_yaml(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("MODEL:\n  INPUT_SIZE: [448, 800]\n  FRUSTUM: false\nTRAIN:\n  BATCH_SIZE: 8\n")
    c = default_config()
    c.merge_from_file(str(p))
    assert tuple(c.MODEL.INPUT_SIZE) == (448, 800)
    assert c.TRAIN.BATCH_SIZE == 8


def test_derived_heads_middle_fusion():
    c = load_config(num_classes=10)
    # base + nuscenes + middle-fusion secondary heads
    assert c.heads.heatmap == 10
    assert c.heads.reg == 2 and c.heads.widthHeight == 2
    assert c.heads.depth == 1 and c.heads.rotation == 8
    assert c.heads.dimension == 3 and c.heads.amodal_offset == 2
    assert c.heads.nuscenes_att == 8 and c.heads.velocity == 3
    assert c.heads.depth2 == 1 and c.heads.rotation2 == 8
    assert c.MODEL.OUTPUT_SIZE == (112, 200)
    assert c.MODEL.PYRAMID_OUT_SIZE == ((112, 200),)
    # tower widths: secondary + velocity/att get 3 layers
    assert list(c.head_conv.heatmap) == [256]
    assert list(c.head_conv.depth2) == [256, 256, 256]
    assert list(c.head_conv.velocity) == [256, 256, 256]


def test_camera_only_disables_fusion():
    c = load_config(opts=["DATASET.RADAR_PC", "False"], num_classes=10)
    assert c.MODEL.FRUSTUM is False
    assert c.MODEL.FUSION_STRATEGY is None
    assert "depth2" not in c.heads


def test_hashable_snapshot():
    c = load_config(num_classes=10)
    h = c.hashable()
    assert hash(h) == hash(load_config(num_classes=10).hashable())


def test_shipped_yamls_load_and_parity_pins_exact_semantics():
    """Every shipped config parses; the parity-eval config pins the fast
    TPU defaults OFF (exact DCN + exact top-k: strict reference semantics
    for NDS validation runs)."""
    import glob
    import os

    yamls = sorted(glob.glob(os.path.join("configs", "*.yaml")))
    assert len(yamls) >= 4, yamls
    for y in yamls:
        cfg = load_config(y, num_classes=10)
        assert cfg.NAME

    parity = load_config("configs/Centerfusion_parity.yaml", num_classes=10)
    assert parity.MODEL.APPROX_TOPK is False
    assert parity.MODEL.DLA.DCN_IMPL == "xla"
    assert parity.MODEL.DLA.DCN_DEEP_IMPL == ""
    assert parity.EVAL is True and parity.TEST.FLIP_TEST is True
