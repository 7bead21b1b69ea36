import numpy as np
import pytest

from vslam_tpu.viz import overlays


def test_overlays_render():
    img = np.full((60, 80), 100, np.uint8)
    corners = np.array([[10.0, 10], [40, 30], [70, 50]])
    out = overlays.draw_keypoints(img, corners)
    assert out.shape == (60, 80, 3)
    assert (out != np.stack([img] * 3, -1)).any()

    mj = np.array([0, 2, -1])
    out2 = overlays.draw_matches(img, img, corners, corners, mj,
                                 inlier=np.array([True, False, False]))
    assert out2.shape == (60, 160, 3)

    out3 = overlays.draw_reprojections(
        img, corners, corners + 3.0, valid=np.array([True, True, False]))
    assert out3.shape == (60, 80, 3)


def test_plot_map(tmp_path):
    pytest.importorskip("matplotlib")
    from vslam_tpu.io import map_io
    from vslam_tpu.viz import plot_map

    p = str(tmp_path / "m.json")
    cams = [((i, 0), np.array([i * 0.1, 0, 0, 0, 0, 0, 1.0]))
            for i in range(5)]
    lms = [(i, np.random.randn(3)) for i in range(20)]
    est = np.random.randn(5, 3)
    gt = est + 0.01
    map_io.save_map(p, cams, lms, est, gt, 0.01)
    outs = plot_map.plot(p, str(tmp_path / "view"))
    import os

    assert all(os.path.exists(o) for o in outs)


def test_html_viewer(tmp_path):
    from vslam_tpu.viz import html_viewer

    rng = np.random.RandomState(0)
    traj = np.cumsum(rng.randn(50, 3) * 0.1, 0)
    lm = rng.randn(40000, 3) * 3  # over the downsample cap
    p = html_viewer.write_html(
        str(tmp_path / "v.html"), traj, landmarks=lm, gt=traj + 0.05,
        keyframes=traj[::5], inliers=rng.randint(40, 140, 50),
        is_keyframe=(np.arange(50) % 5 == 0),
        loop_edges=[(traj[2], traj[40])], title="test map")
    s = open(p).read()
    assert "__DATA__" not in s           # data was embedded
    assert "test map" in s
    # embedded JSON parses and respects the landmark downsample cap
    import json

    start = s.index("const D = ") + len("const D = ")
    end = s.index(";\n", start)
    data = json.loads(s[start:end])
    assert len(data["traj"]) == 50
    assert len(data["lm"]) <= 30000
    assert len(data["loops"]) == 1


def test_html_viewer_accepts_pose7(tmp_path):
    from vslam_tpu.viz import html_viewer

    traj7 = np.zeros((10, 7))
    traj7[:, 0] = np.arange(10)
    traj7[:, 6] = 1.0
    p = html_viewer.write_html(str(tmp_path / "v7.html"), traj7)
    assert "__DATA__" not in open(p).read()
