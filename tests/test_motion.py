"""Motion substrate tests: rotations vs scipy, BVH parse/write round trip,
parser vs the vendored PyMO parser, pipeline, and FK vs a scipy
transcription of PyMO's algorithm."""
import sys

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from qpgesture_tpu.motion.bvh import parse_bvh, write_bvh
from qpgesture_tpu.motion.fk import fk_tables, forward_kinematics
from qpgesture_tpu.motion.pipeline import (MotionPipeline, downsample,
                                           mirror_x, root_center)
from qpgesture_tpu.motion.rotations import (euler_to_matrix,
                                            matrices_to_poses,
                                            matrix_to_euler_zxy,
                                            poses_to_matrices)


def make_bvh_text(rng, n_frames=24, fps=120):
    """Small BEAT-like skeleton: Hips -> Spine..Head + arms + one leg (the
    leg gets dropped by joint selection)."""
    hierarchy = """HIERARCHY
ROOT Hips
{
\tOFFSET 0.0 0.0 0.0
\tCHANNELS 6 Xposition Yposition Zposition Zrotation Xrotation Yrotation
\tJOINT Spine
\t{
\t\tOFFSET 0.0 7.0 0.0
\t\tCHANNELS 3 Zrotation Xrotation Yrotation
\t\tJOINT Spine1
\t\t{
\t\t\tOFFSET 0.0 8.0 0.1
\t\t\tCHANNELS 3 Zrotation Xrotation Yrotation
\t\t\tJOINT RightShoulder
\t\t\t{
\t\t\t\tOFFSET -2.0 6.0 0.0
\t\t\t\tCHANNELS 3 Zrotation Xrotation Yrotation
\t\t\t\tJOINT RightArm
\t\t\t\t{
\t\t\t\t\tOFFSET -11.0 0.0 0.0
\t\t\t\t\tCHANNELS 3 Zrotation Xrotation Yrotation
\t\t\t\t\tEnd Site
\t\t\t\t\t{
\t\t\t\t\t\tOFFSET -9.0 0.0 0.0
\t\t\t\t\t}
\t\t\t\t}
\t\t\t}
\t\t\tJOINT LeftShoulder
\t\t\t{
\t\t\t\tOFFSET 2.0 6.0 0.0
\t\t\t\tCHANNELS 3 Zrotation Xrotation Yrotation
\t\t\t\tJOINT LeftArm
\t\t\t\t{
\t\t\t\t\tOFFSET 11.0 0.0 0.0
\t\t\t\t\tCHANNELS 3 Zrotation Xrotation Yrotation
\t\t\t\t\tEnd Site
\t\t\t\t\t{
\t\t\t\t\t\tOFFSET 9.0 0.0 0.0
\t\t\t\t\t}
\t\t\t\t}
\t\t\t}
\t\t}
\t}
\tJOINT RightUpLeg
\t{
\t\tOFFSET -3.0 -4.0 0.0
\t\tCHANNELS 3 Zrotation Xrotation Yrotation
\t\tEnd Site
\t\t{
\t\t\tOFFSET 0.0 -30.0 0.0
\t\t}
\t}
}
MOTION
"""
    n_ch = 6 + 3 * 7
    vals = np.round(rng.randn(n_frames, n_ch) * 20, 4)
    lines = [" ".join("%.4f" % v for v in row) for row in vals]
    text = (hierarchy + f"Frames: {n_frames}\n"
            + f"Frame Time: {1.0 / fps:.6f}\n" + "\n".join(lines) + "\n")
    return text, vals


def test_euler_matrix_vs_scipy(rng):
    e = rng.uniform(-170, 170, size=(50, 3))
    got = euler_to_matrix(e, "ZXY", degrees=True, intrinsic=True)
    ref = R.from_euler("ZXY", e, degrees=True).as_matrix()
    np.testing.assert_allclose(got, ref, atol=1e-6)
    got_ex = euler_to_matrix(e, "ZXY", degrees=True, intrinsic=False)
    ref_ex = R.from_euler("zxy", e, degrees=True).as_matrix()
    np.testing.assert_allclose(got_ex, ref_ex, atol=1e-6)


def test_matrix_euler_roundtrip(rng):
    e = rng.uniform(-80, 80, size=(40, 3))  # away from gimbal lock
    m = euler_to_matrix(e, "ZXY", degrees=True, intrinsic=True)
    back = matrix_to_euler_zxy(m)
    np.testing.assert_allclose(back, e, atol=1e-4)
    ref = R.from_matrix(m).as_euler("ZXY", degrees=True)
    np.testing.assert_allclose(back, ref, atol=1e-4)


def test_poses_matrices_roundtrip(rng):
    e = rng.uniform(-80, 80, size=(10, 15 * 3))
    m = poses_to_matrices(e)
    assert m.shape == (10, 135)
    np.testing.assert_allclose(matrices_to_poses(m), e, atol=1e-4)


def test_bvh_parse(rng):
    text, vals = make_bvh_text(rng)
    data = parse_bvh(text)
    assert data.root_name == "Hips"
    assert data.skeleton["Spine"]["parent"] == "Hips"
    assert data.skeleton["RightArm"]["children"] == ["RightArm_Nub"]
    assert data.skeleton["Spine"]["order"] == "ZXY"
    np.testing.assert_allclose(data.values, vals, atol=1e-8)
    assert abs(data.framerate - 1 / 120) < 1e-6  # header has 6 decimals


def test_bvh_parse_matches_pymo(rng):
    sys.path.insert(0, "/root/reference/process")
    try:
        from pymo.parsers import BVHParser
    except Exception:
        pytest.skip("pymo parser not importable")
    import tempfile
    text, _ = make_bvh_text(rng)
    with tempfile.NamedTemporaryFile("w", suffix=".bvh",
                                     delete=False) as f:
        f.write(text)
        path = f.name
    ref = BVHParser().parse(path)
    got = parse_bvh(path)
    assert got.root_name == ref.root_name
    assert set(got.skeleton) == set(ref.skeleton)
    for j in got.skeleton:
        assert got.skeleton[j]["parent"] == ref.skeleton[j]["parent"]
        assert got.skeleton[j]["channels"] == ref.skeleton[j]["channels"]
        np.testing.assert_allclose(got.skeleton[j]["offsets"] or [0, 0, 0],
                                   ref.skeleton[j]["offsets"] or [0, 0, 0])
    ref_cols = ["%s_%s" % c for c in ref.channel_names]
    assert got.channel_names == ref_cols
    np.testing.assert_allclose(got.values, ref.values.values, atol=1e-9)


def test_bvh_write_roundtrip(rng):
    text, _ = make_bvh_text(rng)
    data = parse_bvh(text)
    out = write_bvh(data)
    back = parse_bvh(out)
    assert back.channel_names == data.channel_names
    np.testing.assert_allclose(back.values, data.values, atol=1e-5)
    assert set(back.skeleton) == set(data.skeleton)


def test_downsample_and_root_center(rng):
    text, vals = make_bvh_text(rng, n_frames=24, fps=120)
    data = parse_bvh(text)
    ds = downsample(data, 60)  # rate 2, slice [0:-1:2]
    np.testing.assert_allclose(ds.values, vals[0:-1:2])
    rc = root_center(ds)
    assert np.all(rc.values[:, :6] == 0.0)


def test_mirror_involution(rng):
    text, _ = make_bvh_text(rng)
    data = root_center(parse_bvh(text))
    m2 = mirror_x(mirror_x(data))
    np.testing.assert_allclose(m2.values, data.values, atol=1e-9)
    # Right rotation columns of the mirror = signed Left columns
    m = mirror_x(data)
    names = data.channel_names
    for ax, s in zip("XYZ", (1, -1, -1)):
        got = m.values[:, names.index(f"RightArm_{ax}rotation")]
        ref = s * data.values[:, names.index(f"LeftArm_{ax}rotation")]
        np.testing.assert_allclose(got, ref)


def test_pipeline_roundtrip(rng):
    text, _ = make_bvh_text(rng)
    data = parse_bvh(text)
    pipe = MotionPipeline(
        target_joints=["Spine", "Spine1", "RightShoulder", "RightArm",
                       "LeftShoulder", "LeftArm"], fps=60).fit(data)
    euler = pipe.transform(data)
    # root channels dropped; 6 joints * 3 remain... plus root rotations? No:
    # ConstantsRemover drops the root's 6 channels
    assert euler.shape[1] == 6 * 3
    rec = pipe.inverse(euler)
    assert rec.values.shape[1] == len(data.channel_names)
    # leg joint restored at its constant (first-frame) value
    ds = downsample(data, 60)
    col = rec.channel_names.index("RightUpLeg_Zrotation")
    np.testing.assert_allclose(rec.values[:, col], ds.values[0, col])
    # JSON snapshot round trip
    pipe2 = MotionPipeline.from_json(pipe.to_json())
    np.testing.assert_allclose(pipe2.transform(data), euler)
    rec2 = pipe2.inverse(euler)
    np.testing.assert_allclose(rec2.values, rec.values)


def _pymo_fk_reference(data):
    """Direct scipy transcription of PyMO's _to_pos recurrence
    (preprocessing.py:288-368) used as the FK oracle."""
    joints, parent_idx, offsets, rot_cols, pos_cols, orders = fk_tables(data)
    T = data.values.shape[0]
    tree_rot = {}
    tree_pos = {}
    for ji, j in enumerate(joints):
        has_rot = rot_cols[ji, 0] >= 0
        if has_rot:
            eul = np.stack([data.values[:, rot_cols[ji, c]]
                            for c in range(3)], axis=1)
            rotmats = R.from_euler(orders[ji].lower(), eul,
                                   degrees=True).inv()
        else:
            rotmats = R.from_euler("xyz", np.zeros((T, 3)), degrees=True)
        pos_vals = np.zeros((T, 3))
        if pos_cols[ji, 0] >= 0:
            pos_vals = np.stack([data.values[:, pos_cols[ji, c]]
                                 for c in range(3)], axis=1)
        p = parent_idx[ji]
        if p < 0:
            tree_rot[ji] = rotmats
            tree_pos[ji] = pos_vals
        else:
            tree_rot[ji] = rotmats * tree_rot[p]
            k = pos_vals + np.asarray(offsets[ji])
            q = tree_rot[p].inv().apply(k)
            tree_pos[ji] = tree_pos[p] + q
    return np.stack([tree_pos[ji] for ji in range(len(joints))], axis=1)


def test_fk_matches_pymo_semantics(rng):
    text, _ = make_bvh_text(rng, n_frames=8)
    data = parse_bvh(text)
    ref = _pymo_fk_reference(data)
    got = forward_kinematics(data)
    np.testing.assert_allclose(got, ref, atol=1e-3)
    got_jax = forward_kinematics(data, use_jax=True)
    np.testing.assert_allclose(got_jax, ref, atol=1e-3)


def test_motion_features(rng):
    from qpgesture_tpu.motion.features import (joint_velocity, plant_frames,
                                               reverse_time)
    pos = np.zeros((20, 2, 3))
    pos[:, 1, 1] = np.concatenate([np.zeros(10), np.linspace(0, 5, 10)])
    vel = joint_velocity(pos)
    assert vel.shape == (20, 2)
    planted = plant_frames(pos, joint=1, height_threshold=0.1,
                           velocity_threshold=1.0)
    assert planted[:9].all() and not planted[-5:].any()
    x = rng.randn(5, 3)
    np.testing.assert_array_equal(reverse_time(x), x[::-1])


def test_slicer_matches_reference(rng):
    """slice_windows == the reference's Slicer.transform on raw arrays."""
    import sys
    sys.path.insert(0, "/root/reference/process")
    from qpgesture_tpu.motion.pipeline import slice_windows
    tracks = [rng.randn(n, 6) for n in (100, 37, 240, 11)]
    for window, overlap in ((30, 0.5), (24, 0.25), (50, 0.0)):
        got = slice_windows(tracks, window, overlap)
        # reference semantics, re-derived (Slicer works on MocapData tracks;
        # its array arithmetic is exactly this loop, preprocessing.py:674-692)
        want = []
        for vals in tracks:
            of = int(overlap * window)
            n_seq = (vals.shape[0] - of) // (window - of)
            for i in range(max(n_seq, 0)):
                s = (window - of) * i
                want.append(vals[s:s + window])
        np.testing.assert_array_equal(got, np.array(want))


def test_list_standard_scaler_roundtrip(rng):
    from qpgesture_tpu.motion.pipeline import ListStandardScaler
    tracks = [rng.randn(n, 5) * 3 + 1 for n in (50, 80, 20)]
    sc = ListStandardScaler().fit(tracks)
    flat = np.concatenate(tracks, axis=0)
    np.testing.assert_allclose(sc.data_mean_, flat.mean(axis=0))
    np.testing.assert_allclose(sc.data_std_, flat.std(axis=0))
    same_len = [rng.randn(40, 5) for _ in range(3)]
    normed = sc.transform(same_len)
    back = sc.inverse_transform(normed)
    np.testing.assert_allclose(back, np.array(same_len), atol=1e-12)


def test_peak_indexes_matches_peakutils_or_properties(rng):
    """peak_indexes == peakutils.indexes when the package exists; always:
    correct peaks on a sinusoid with plateaus and min_dist suppression."""
    from qpgesture_tpu.motion.features import peak_indexes
    t = np.linspace(0, 6 * np.pi, 600)
    y = np.sin(t) + 0.01 * rng.randn(600)
    # thres is RANGE-normalized (0.8 -> absolute ~0.6 here)
    got = peak_indexes(y, thres=0.8, min_dist=80)
    # three sine peaks, ~200 frames apart
    assert len(got) == 3
    assert all(y[i] > 0.8 for i in got)
    assert np.all(np.diff(got) > 80)

    # plateau handling: a flat-topped peak still yields one index
    z = np.zeros(100)
    z[40:46] = 1.0
    got_z = peak_indexes(z, thres=0.5, min_dist=10)
    assert len(got_z) == 1 and 39 <= got_z[0] <= 46

    try:
        import peakutils
    except ImportError:
        return
    for seed in range(5):
        r = np.random.RandomState(seed)
        y = np.cumsum(r.randn(500))
        for thres, md in ((0.3, 20), (0.1, 60)):
            want = peakutils.indexes(y, thres=thres, min_dist=md)
            gotp = peak_indexes(y, thres=thres, min_dist=md)
            np.testing.assert_array_equal(gotp, want)


def test_foot_contact_signal_steps(rng):
    from qpgesture_tpu.motion.features import foot_contact_signal
    t = np.linspace(0, 4 * np.pi, 480)
    height = 1.5 + np.sin(t)  # strictly positive (the reference divides
    #                           thresholds by max/min of the raw signal)
    sig = foot_contact_signal(height, start=1, min_dist=60)
    # alternating plant/lift: starts at 1, drops at valleys, rises at peaks
    assert sig[0] == 1
    assert set(np.unique(sig)) <= {0, 1}
    flips = np.count_nonzero(np.diff(sig))
    assert 2 <= flips <= 5
