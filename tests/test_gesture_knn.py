"""Raw-pose GestureKNN: device engine vs NumPy oracle."""
import numpy as np
import pytest

from qpgesture_tpu.match.gesture_knn import (GestureKNNData,
                                             GestureKNNEngine,
                                             desired_k_distribution,
                                             search_motion_np)


def _db(rng, K=5, L=64, A=12, P=8, J=15):
    feat = rng.randn(K, L, A + P).astype(np.float32)
    motion = rng.randn(K, L, J).astype(np.float32)
    mask = np.ones((K, L))
    return GestureKNNData(feat=feat, motion=motion, control_mask=mask,
                          n_aud=A)


@pytest.mark.parametrize("desired_k", [0, 2])
def test_engine_matches_oracle(desired_k):
    rng = np.random.RandomState(3)
    db = _db(rng)
    feat_test = rng.randn(db.n_aud, 64).astype(np.float32)
    engine = GestureKNNEngine(db)
    got = engine.search_motion(feat_test, init_seq=1, init_frm=10,
                               desired_k=desired_k)
    want = search_motion_np(db, feat_test, init_seq=1, init_frm=10,
                            desired_k=desired_k)
    assert got.shape == want.shape == (15, 64)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_oracle_handles_ragged_clip_length():
    """n_frames % step != 0: the final block overhangs the output buffers;
    the oracle must clamp (not crash) and still match the engine on the
    real frames."""
    rng = np.random.RandomState(11)
    db = _db(rng)
    feat_test = rng.randn(db.n_aud, 59).astype(np.float32)  # 59 % 8 != 0
    want = search_motion_np(db, feat_test, init_seq=0, init_frm=5)
    engine = GestureKNNEngine(db)
    got = engine.search_motion(feat_test, init_seq=0, init_frm=5)
    assert got.shape == want.shape == (15, 59)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_exact_pose_match_skipped():
    """Each step's query pose is copied from the database, so an exact
    self-match frame exists; the d != 0 guard must skip it in BOTH paths
    (the jitted engine computes the distance in difference form so the
    exact match is exactly zero)."""
    rng = np.random.RandomState(7)
    db = _db(rng, K=3, L=48)
    feat_test = rng.randn(db.n_aud, 48).astype(np.float32)
    want = search_motion_np(db, feat_test, init_seq=2, init_frm=3)
    got = GestureKNNEngine(db).search_motion(feat_test, init_seq=2,
                                             init_frm=3)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_batch_matches_sequential():
    """search_motion_batch == per-sequence search_motion, including
    per-sequence desired_k."""
    rng = np.random.RandomState(21)
    db = _db(rng)
    C = 3
    feat_tests = rng.randn(C, db.n_aud, 64).astype(np.float32)
    init_seqs = np.array([0, 2, 4])
    init_frms = np.array([3, 17, 40])
    ks = np.array([0, 2, 1], np.int32)
    engine = GestureKNNEngine(db)
    got = engine.search_motion_batch(feat_tests, init_seqs, init_frms, ks)
    for c in range(C):
        want = engine.search_motion(feat_tests[c], int(init_seqs[c]),
                                    int(init_frms[c]), int(ks[c]))
        np.testing.assert_allclose(got[c], want, atol=1e-6)


def test_init_frame_respects_mask():
    rng = np.random.RandomState(0)
    db = _db(rng)
    db.control_mask[:, ::2] = 0
    engine = GestureKNNEngine(db)
    s, f = engine.init_frame(np.random.RandomState(1))
    assert db.control_mask[s, f] == 1


def test_desired_k_distribution():
    ks = desired_k_distribution(10000, np.random.RandomState(0))
    assert abs((ks == 0).mean() - 0.5) < 0.03
    assert ks.max() <= 14
