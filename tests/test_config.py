"""Config system tests: defaults, from_args overlay, camera param defaults."""

import argparse

from vit_colmap_tpu.utils.config import CameraConfig, Config


def _args(**kw):
    ns = argparse.Namespace(
        camera_model=None, camera_params=None, extractor=None,
        use_colmap_sift=False, vit_weights=None, model=None, backbone=None,
        max_keypoints=None, skip_matching=False, skip_reconstruction=False,
        skip_verification=False, min_num_matches=None, verbose=False,
    )
    for k, v in kw.items():
        setattr(ns, k, v)
    return ns


def test_defaults():
    c = Config()
    assert c.extractor.extractor_type == "vit"
    assert c.matching.max_ratio == 0.8
    assert c.matching.max_distance == 0.7
    assert c.matching.cross_check
    assert c.reconstruction.min_num_matches == 15
    assert c.do_matching and c.do_reconstruction
    assert "Extractor: vit" in c.summary()


def test_from_args_overlays():
    c = Config.from_args(
        _args(
            camera_model="PINHOLE",
            extractor="trainable_vit",
            vit_weights="/tmp/w",
            skip_reconstruction=True,
            min_num_matches=30,
            max_keypoints=512,
        )
    )
    assert c.camera.model == "PINHOLE"
    assert c.extractor.extractor_type == "trainable_vit"
    assert c.extractor.vit_weights_path == "/tmp/w"
    assert c.extractor.max_keypoints == 512
    assert not c.do_reconstruction
    assert c.reconstruction.min_num_matches == 30


def test_sfm_keypoint_budget():
    """trainable_vit SfM budget: score-ranked top-K by default, the
    reference's 20480 flood only when explicitly disabled (=0)."""
    from vit_colmap_tpu.pipeline.run_pipeline import Pipeline

    c = Config()
    assert c.extractor.sfm_max_keypoints == 4096
    c.extractor.extractor_type = "trainable_vit"
    assert Pipeline(c)._build_extractor().num_keypoints == 4096

    c2 = Config.from_args(_args(extractor="trainable_vit", sfm_max_keypoints=0))
    assert c2.extractor.sfm_max_keypoints == 0
    assert Pipeline(c2)._build_extractor().num_keypoints == 20480

    c3 = Config.from_args(_args(sfm_max_keypoints=1024))
    assert c3.extractor.sfm_max_keypoints == 1024


def test_use_colmap_sift_flag():
    c = Config.from_args(_args(use_colmap_sift=True))
    assert c.extractor.extractor_type == "colmap_sift"


def test_camera_params_parsing():
    c = Config.from_args(_args(camera_params="500,500,320,240"))
    assert c.camera.params == [500.0, 500.0, 320.0, 240.0]


def test_camera_default_params():
    assert CameraConfig("SIMPLE_PINHOLE").get_default_params(640, 480) == [
        640.0, 320.0, 240.0,
    ]
    assert CameraConfig("PINHOLE").get_default_params(640, 480) == [
        640.0, 640.0, 320.0, 240.0,
    ]
    assert CameraConfig("SIMPLE_RADIAL").get_default_params(640, 480) == [
        640.0, 320.0, 240.0, 0.0,
    ]
    assert CameraConfig("RADIAL").get_default_params(640, 480) == [
        640.0, 320.0, 240.0, 0.0, 0.0,
    ]


def test_to_dict_serializable():
    import json

    d = Config().to_dict()
    json.dumps(d)
    assert d["matching"]["max_ratio"] == 0.8
