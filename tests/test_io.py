import json
import os

import numpy as np
import pytest

from vslam_tpu.io import calib as calib_mod
from vslam_tpu.io import euroc, map_io

REF_CALIB = "/root/reference/calibration_file/euroc_v1_123_ds_calib.json"
SAMPLE_DIR = "/root/reference/data/euroc_V1"


@pytest.mark.skipif(not os.path.exists(REF_CALIB), reason="no reference data")
def test_load_reference_calibration():
    c = calib_mod.load_calibration(REF_CALIB)
    assert c.num_cams == 2
    assert c.cam_types == ["ds", "ds"]
    assert c.width == 752 and c.height == 480
    assert abs(c.intrinsics[0][0] - 351.037283216868) < 1e-9
    # stereo baseline ~11 cm
    assert abs(c.T_i_c[1][0] - 0.11) < 0.01


def test_calibration_roundtrip(tmp_path):
    c = calib_mod.load_calibration(REF_CALIB) if os.path.exists(REF_CALIB) \
        else None
    if c is None:
        pytest.skip("no reference calib")
    p = str(tmp_path / "calib.json")
    calib_mod.save_calibration(c, p)
    c2 = calib_mod.load_calibration(p)
    np.testing.assert_allclose(c.intrinsics, c2.intrinsics)
    np.testing.assert_allclose(c.T_i_c, c2.T_i_c)


@pytest.mark.skipif(not os.path.isdir(SAMPLE_DIR), reason="no sample frames")
def test_load_sample_dir_and_decode():
    seq = euroc.load_sample_dir(SAMPLE_DIR)
    assert seq.num_frames >= 100
    assert seq.timestamps[0] < seq.timestamps[-1]
    img = euroc.load_image(seq.image_paths[0][0])
    assert img.shape == (480, 752) and img.dtype == np.uint8


def test_euroc_csv_layout(tmp_path):
    # build a tiny mav0-style dataset
    d = tmp_path / "mav0"
    for cam in ("cam0", "cam1"):
        (d / cam / "data").mkdir(parents=True)
        with open(d / cam / "data.csv", "w") as f:
            f.write("#timestamp [ns],filename\n")
            f.write("100,0001.png\n200,0002.png\n")
    gt = d / "state_groundtruth_estimate0"
    gt.mkdir()
    with open(gt / "data.csv", "w") as f:
        f.write("#ts,px,py,pz,qw,qx,qy,qz,...\n")
        f.write("100,1,2,3,1,0,0,0,0,0,0,0,0,0,0,0,0\n")
        f.write("200,1.1,2,3,1,0,0,0,0,0,0,0,0,0,0,0,0\n")
    seq = euroc.load_sequence(str(d))
    assert seq.num_frames == 2
    assert seq.gt_positions is not None
    np.testing.assert_allclose(seq.gt_positions[0], [1, 2, 3])
    # EuRoC GT is qw-first; stored xyzw
    np.testing.assert_allclose(seq.gt_quats[0], [0, 0, 0, 1])
    assert seq.image_paths[0][0].endswith("cam0/data/0001.png")


def test_map_roundtrip_schema(tmp_path):
    p = str(tmp_path / "map.json")
    cams = [((0, 0), np.array([0, 0, 0, 0, 0, 0, 1.0])),
            ((5, 1), np.array([1, 2, 3, 0, 0, 0, 1.0]))]
    lms = [(7, np.array([1.0, 2, 3]))]
    est = np.array([[0, 0, 0], [1, 1, 1.0]])
    gt = np.array([[0, 0, 0.1], [1, 1, 1.1]])
    map_io.save_map(p, cams, lms, est, gt, 0.123)
    c2, l2, e2, g2, a2 = map_io.load_map(p)
    assert c2[1][0] == (5, 1)
    np.testing.assert_allclose(l2[0][1], [1, 2, 3])
    assert abs(a2 - 0.123) < 1e-12
    # exact schema the reference's load_map.py expects
    data = json.load(open(p))
    assert set(data.keys()) == {"value0", "value1", "value2", "value3",
                                "value4"}
    assert "c.T_w_c" in data["value0"][0]["value"]
    assert "lm.p" in data["value1"][0]["value"]
    assert set(data["value1"][0]["value"]["lm.p"]) == {"value0", "value1",
                                                       "value2"}


@pytest.mark.slow
def test_checkpoint_roundtrip(tmp_path):
    from vslam_tpu import synthetic
    from vslam_tpu.config import SlamConfig
    from vslam_tpu.pipeline.slam import SlamSystem
    from vslam_tpu.utils import checkpoint

    seq = synthetic.generate(num_frames=4, num_points=300, seed=1)
    cfg = SlamConfig(num_features=400, ransac_hypotheses=128,
                     max_landmarks=8192, max_keyframes=64,
                     max_inview_landmarks=512, window_cams=24,
                     window_points=2048, window_obs=6144, ba_max_iters=10,
                     enable_relocalization=False, enable_loop_closure=False)
    slam = SlamSystem(seq.calib, cfg)
    for l, r in seq.images[:3]:
        slam.process_frame(l, r)
    path = str(tmp_path / "ckpt")
    checkpoint.save(slam, path)

    slam2 = SlamSystem(seq.calib, cfg)
    checkpoint.load(slam2, path)
    assert slam2.frame == slam.frame
    np.testing.assert_array_equal(np.asarray(slam2.lm.pos),
                                  np.asarray(slam.lm.pos))
    np.testing.assert_array_equal(np.asarray(slam2.kf.pose_l),
                                  np.asarray(slam.kf.pose_l))
    # resumed run continues identically for the next frame
    i1 = slam.process_frame(*seq.images[3])
    i2 = slam2.process_frame(*seq.images[3])
    assert i1["matches"] == i2["matches"]
    assert i1["kind"] == i2["kind"]
