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
