"""Fixture test for the one-command real-EuRoC table harness.

Builds a synthetic mav0-layout dataset tree (cam0/cam1 data.csv + PNG
frames + state_groundtruth_estimate0 CSV + cereal-schema calib JSON) and
runs ``tools/ate_table.py --dataset-root`` end-to-end, so the command is
known-good the day a real EuRoC download is reachable (VERDICT r3 #6;
reference: src/slam.cpp:1006-1079 loader + :1618-1722 evaluation +
README.md:36-48 table).
"""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import ate_table  # noqa: E402  (tools/ate_table.py)
from vslam_tpu import synthetic  # noqa: E402
from vslam_tpu.io import calib as calib_mod  # noqa: E402
from vslam_tpu.io import euroc  # noqa: E402


def _write_mav0(seq, root, name):
    """Write a SyntheticSequence as <root>/<name>/mav0/{cam0,cam1,gt}."""
    from PIL import Image

    mav0 = os.path.join(root, name, "mav0")
    for cam in (0, 1):
        os.makedirs(os.path.join(mav0, f"cam{cam}", "data"), exist_ok=True)
    os.makedirs(os.path.join(mav0, "state_groundtruth_estimate0"),
                exist_ok=True)

    rows = []
    for f, (img_l, img_r) in enumerate(seq.images):
        ts = int(seq.timestamps[f])
        fname = f"{ts}.png"
        Image.fromarray(img_l).save(
            os.path.join(mav0, "cam0", "data", fname))
        Image.fromarray(img_r).save(
            os.path.join(mav0, "cam1", "data", fname))
        rows.append(f"{ts},{fname}")
    for cam in (0, 1):
        with open(os.path.join(mav0, f"cam{cam}", "data.csv"), "w") as fh:
            fh.write("#timestamp [ns],filename\n" + "\n".join(rows) + "\n")

    # EuRoC GT order: ts, p_x, p_y, p_z, q_w, q_x, q_y, q_z, ...
    with open(os.path.join(mav0, "state_groundtruth_estimate0",
                           "data.csv"), "w") as fh:
        fh.write("#timestamp, p, q\n")
        for f in range(len(seq.images)):
            p = seq.poses[f]
            fh.write(f"{int(seq.timestamps[f])},{p[0]},{p[1]},{p[2]},"
                     f"{p[6]},{p[3]},{p[4]},{p[5]}\n")
    return mav0


@pytest.fixture(scope="module")
def mav0_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("euroc_root")
    seq = synthetic.generate(num_frames=12, num_points=500, seed=3)
    _write_mav0(seq, str(root), "SYN_01_easy")
    calib_path = str(root / "calib.json")
    calib_mod.save_calibration(seq.calib, calib_path)
    return str(root), calib_path, seq


def test_discover_sequences(mav0_tree):
    root, _, _ = mav0_tree
    seqs = ate_table.discover_sequences(root)
    assert [name for name, _ in seqs] == ["SYN_01_easy"]
    # a sequence dir given directly also resolves
    direct = ate_table.discover_sequences(os.path.join(root, "SYN_01_easy"))
    assert len(direct) == 1 and direct[0][1].endswith("mav0")


def test_loader_roundtrip(mav0_tree):
    root, _, seq = mav0_tree
    loaded = euroc.load_sequence(os.path.join(root, "SYN_01_easy", "mav0"))
    assert loaded.num_frames == len(seq.images)
    assert loaded.gt_positions is not None
    np.testing.assert_allclose(loaded.gt_positions, seq.poses[:, :3],
                               atol=1e-6)
    img = euroc.load_image(loaded.image_paths[0][0])
    np.testing.assert_array_equal(img, seq.images[0][0])


def test_dataset_table_end_to_end(mav0_tree, tmp_path):
    """The full --dataset-root command on the fixture tree: both arms run,
    the table is written, and the ATE matches a healthy tracked run."""
    from tests.test_e2e_vo import small_config

    root, calib_path, _ = mav0_tree
    cfg_path = str(tmp_path / "cfg.json")
    small_config().to_json(cfg_path)
    out_path = str(tmp_path / "EUROC_TABLE.md")

    rc = ate_table.main_dataset(
        _Args(dataset_root=root, cam_calib=calib_path, voc_path="",
              config=cfg_path, max_frames=0, out=out_path))
    assert rc == 0
    with open(out_path) as f:
        table = f.read()
    assert "SYN_01_easy" in table
    row = [ln for ln in table.splitlines() if "SYN_01_easy" in ln][0]
    cells = [c.strip() for c in row.split("|")[1:-1]]
    slam_ate, vo_ate = float(cells[1]), float(cells[2])
    # synthetic GT is exact; a tracked run lands well under 0.2 m
    assert slam_ate == slam_ate and slam_ate < 0.2, table
    assert vo_ate == vo_ate and vo_ate < 0.2, table


class _Args:
    def __init__(self, **kw):
        self.__dict__.update(kw)
