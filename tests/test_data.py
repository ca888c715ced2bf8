"""Data pipeline units: IO round-trips, schedules, balanced sampling,
jitter determinism, stage cameras."""
import numpy as np
import pytest

from mvsformerplusplus_tpu.data.io import (
    build_camera_stack,
    read_cam_file,
    read_pair_file,
    read_pfm,
    save_cam_file,
    save_pair_file,
    save_pfm,
)
from mvsformerplusplus_tpu.data.loader import BalancedSchedule, collate
from mvsformerplusplus_tpu.data.mvs_dataset import ShapeBucketSchedule, stage_cameras
from mvsformerplusplus_tpu.data.transforms import (
    apply_color_jitter,
    sample_jitter_params,
    stage_pyramid,
)


def test_pfm_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    depth = rng.rand(37, 53).astype(np.float32) * 900
    save_pfm(tmp_path / "d.pfm", depth)
    back, scale = read_pfm(tmp_path / "d.pfm")
    np.testing.assert_array_equal(back, depth)


def test_pfm_reads_reference_format(tmp_path):
    """Big-endian PFM written by other tools must read too."""
    depth = np.arange(12, dtype=">f4").reshape(3, 4)
    with open(tmp_path / "be.pfm", "wb") as f:
        f.write(b"Pf\n4 3\n1.0\n")
        np.flipud(depth).astype(">f4").tofile(f)
    back, _ = read_pfm(tmp_path / "be.pfm")
    np.testing.assert_array_equal(back, depth.astype(np.float32))


def test_cam_file_roundtrip(tmp_path):
    intr = np.array([[1000, 0, 320], [0, 1000, 240], [0, 0, 1]], np.float64)
    ext = np.eye(4); ext[0, 3] = 1.5
    save_cam_file(tmp_path / "c.txt", intr, ext, 425.0, 2.65, 192, 933.8)
    K, E, dmin, dint, extra = read_cam_file(tmp_path / "c.txt")
    np.testing.assert_allclose(K, intr, rtol=1e-6)
    np.testing.assert_allclose(E, ext, rtol=1e-6)
    assert dmin == 425.0 and abs(dint - 2.65) < 1e-6
    assert extra["depth_num"] == 192 and abs(extra["depth_max"] - 933.8) < 1e-4


def test_eval_dataset_depth_range_resolution(tmp_path):
    """EvalDataset._read_cam must mirror general_eval.py:88-110: plain cams
    scale the interval; depth_num cams rescale the range to the EVAL ndepths;
    eth3d cams read field 2 as depth_MAX; interval_scale applies last."""
    from mvsformerplusplus_tpu.data.eval_dataset import EvalDataset

    intr = np.array([[1000, 0, 320], [0, 1000, 240], [0, 0, 1]], np.float64)
    ext = np.eye(4)

    def make_scan(name, *range_fields):
        d = tmp_path / name / "cams"
        d.mkdir(parents=True)
        save_cam_file(d / "00000000_cam.txt", intr, ext, *range_fields)
        (tmp_path / name / "pair.txt").write_text("1\n0\n1 1 10.0\n")

    make_scan("plain", 425.0, 2.5)
    make_scan("counted", 425.0, 2.5, 256, 425.0 + 256 * 2.5)
    make_scan("eth", 0.5, 72.5)  # eth3d: field 2 is depth_max
    # 3-field cams (min interval num, no explicit max): the reference
    # rescales these too (general_eval.py:99 checks >= 3 fields)
    make_scan("counted3", 425.0, 2.5)
    cam3 = tmp_path / "counted3" / "cams" / "00000000_cam.txt"
    cam3.write_text(cam3.read_text().replace("425.0 2.5", "425.0 2.5 256"))

    def read(scan, name, ndepths=192, iscale=1.06):
        ds = EvalDataset(str(tmp_path), [scan], ndepths=ndepths,
                         interval_scale=iscale, dataset_name=name)
        return ds._read_cam(scan, 0)

    _, _, dmin, dint = read("plain", "dtu")
    assert dmin == 425.0 and abs(dint - 2.5 * 1.06) < 1e-6
    # depth_num cams: (dmin + 256*2.5 - dmin) / 192 * 1.06
    _, _, dmin, dint = read("counted", "dtu")
    assert abs(dint - 256 * 2.5 / 192 * 1.06) < 1e-6
    _, _, dmin, dint = read("counted3", "dtu")
    assert abs(dint - 256 * 2.5 / 192 * 1.06) < 1e-6
    # eth3d: (depth_max - dmin) / ndepths * iscale
    _, _, dmin, dint = read("eth", "eth3d")
    assert dmin == 0.5 and abs(dint - (72.5 - 0.5) / 192 * 1.06) < 1e-6


def test_pair_roundtrip(tmp_path):
    pairs = [(0, [(1, 120.5), (2, 80.25)]), (1, [(0, 120.5)])]
    save_pair_file(tmp_path / "pair.txt", pairs)
    back = read_pair_file(tmp_path / "pair.txt")
    assert back == [(0, [1, 2]), (1, [0])]


def test_shape_bucket_schedule_deterministic():
    s1 = ShapeBucketSchedule(100, [(512, 640), (576, 704)], batch_size=4, seed=7)
    s2 = ShapeBucketSchedule(100, [(512, 640), (576, 704)], batch_size=4, seed=7)
    b1, b2 = s1.epoch(3), s2.epoch(3)
    assert len(b1) == 25
    for (i1, hw1), (i2, hw2) in zip(b1, b2):
        np.testing.assert_array_equal(i1, i2)
        assert hw1 == hw2
    # different epoch -> different permutation
    b3 = s1.epoch(4)
    assert any(not np.array_equal(a[0], b[0]) for a, b in zip(b1, b3))


def test_balanced_schedule():
    sched = BalancedSchedule([10, 100, 30], seed=0)
    idx = sched.epoch(0)
    assert len(idx) == 30  # 3 * min(len)
    assert (idx[(idx >= 0) & (idx < 10)]).size == 10
    assert ((idx >= 10) & (idx < 110)).sum() == 10
    assert ((idx >= 110) & (idx < 140)).sum() == 10
    # deterministic per epoch
    np.testing.assert_array_equal(idx, BalancedSchedule([10, 100, 30], seed=0).epoch(0))


def test_jitter_shared_across_views():
    rng = np.random.RandomState(0)
    params = sample_jitter_params(rng)
    img1 = np.random.RandomState(1).rand(16, 16, 3).astype(np.float32)
    img2 = img1.copy()
    np.testing.assert_array_equal(
        apply_color_jitter(img1, params), apply_color_jitter(img2, params))


def test_stage_cameras_scaling():
    intr = np.array([[800.0, 0, 320], [0, 800.0, 240], [0, 0, 1]], np.float32)
    ext = np.eye(4, dtype=np.float32)
    cams = stage_cameras(intr, ext)
    assert cams["stage1"][1, 0, 0] == 100.0  # 1/8
    assert cams["stage4"][1, 0, 0] == 800.0
    np.testing.assert_array_equal(cams["stage2"][0], ext)  # extrinsics unscaled


def test_collate():
    s = {"a": np.zeros((3, 4)), "b": {"x": np.ones(2)}, "name": "s1"}
    out = collate([s, s])
    assert out["a"].shape == (2, 3, 4)
    assert out["b"]["x"].shape == (2, 2)
    assert out["name"] == ["s1", "s1"]


def test_stage_pyramid_shapes():
    arr = np.random.rand(64, 96).astype(np.float32)
    p = stage_pyramid(arr)
    assert p["stage1"].shape == (8, 12)
    assert p["stage2"].shape == (16, 24)
    assert p["stage3"].shape == (32, 48)
    assert p["stage4"].shape == (64, 96)


def test_trainloader_order_fn_balanced():
    """TrainLoader + BalancedSchedule yields balanced batches across children."""
    from mvsformerplusplus_tpu.data.loader import BalancedSchedule, TrainLoader

    class FakeDS:
        def __len__(self):
            return 40

        def get_sample(self, idx, crop_hw, epoch=0):
            return {"imgs": np.full((2, 4, 4, 3), idx, np.float32)}

    sched = BalancedSchedule([10, 30], seed=0)
    loader = TrainLoader(FakeDS(), batch_size=4, scales=[(4, 4)],
                         order_fn=sched.epoch, num_workers=1)
    assert loader.steps_per_epoch() == 5  # 2 * min(10,30) / 4
    seen = []
    for batch, hw in loader.epoch(0):
        assert batch["imgs"].shape[0] == 4
        seen.extend(batch["imgs"][:, 0, 0, 0, 0].astype(int).tolist())
    assert len(seen) == 20
    from_a = sum(1 for i in seen if i < 10)
    assert from_a == 10  # exactly min(len) from each child
