"""Cross-validation of the raw-pose GestureKNN path against the actual
reference implementation (GestureKNN.search_motion + load_train_db)."""
import importlib
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_DIR = "/root/reference/codebook/Speech2GestureMatching"
K, T = 5, 64  # sequences, frames per sequence (the reference's 64-frame DB)


def _import_reference(tmp_path):
    os.environ.setdefault("MPLBACKEND", "Agg")
    sys.argv = ["GestureKNN.py", "--desired_k", "0"]
    if REF_DIR not in sys.path:
        sys.path.insert(0, REF_DIR)
    for mod in ("constant", "utils", "control", "data_processing",
                "visualization", "GestureKNN"):
        if mod in sys.modules:
            del sys.modules[mod]
    return importlib.import_module("GestureKNN")


def test_raw_knn_cross(tmp_path, rng):
    gk = _import_reference(tmp_path)
    from data_processing import load_train_db

    mfcc = rng.randn(K, T, 14).astype(np.float64)
    body = rng.randn(K, T, 135).astype(np.float64)
    train_path = str(tmp_path / "train.npz")
    np.savez_compressed(train_path, mfcc=mfcc, body=body)

    train_feats, _, train_motion = load_train_db(train_path)
    feat_mean, feat_std, _, _ = gk.calc_data_stats(
        train_feats.transpose((0, 2, 1)), train_motion.transpose((0, 2, 1)))

    test_mfcc = rng.randn(1, T, 14).astype(np.float64)
    # reference test staging (load_test_db semantics, audio features only)
    from qpgesture_tpu.match.gesture_knn import (GestureKNNEngine,
                                                 normalize_gesture_knn,
                                                 search_motion_np,
                                                 stage_gesture_knn)
    db = stage_gesture_knn(mfcc, body)
    # staged features must equal the reference's load_train_db output
    np.testing.assert_allclose(db.feat,
                               train_feats.transpose(0, 2, 1), atol=1e-5)
    ndb, test_feat = normalize_gesture_knn(db, test_mfcc)

    # reference: normalize + transpose + search (GestureKNN.py:299-341)
    from utils import normalize_data
    norm_train = normalize_data(train_feats, feat_mean, feat_std)
    norm_train = norm_train.transpose((0, 2, 1))
    aud_mean = feat_mean[:, :db.n_aud]
    aud_std = feat_std[:, :db.n_aud]
    # test features through the reference loader layout
    from data_processing import load_test_db
    test_path = str(tmp_path / "test.npz")
    np.savez_compressed(test_path, mfcc=test_mfcc)
    ref_test_feat, _, _ = load_test_db(test_path)
    norm_test = normalize_data(ref_test_feat, aud_mean, aud_std)
    np.testing.assert_allclose(test_feat, norm_test, atol=1e-5)

    ref_knn = gk.GestureKNN(feat_train=norm_train,
                            motn_train=train_motion.transpose((0, 2, 1)),
                            control_mask=np.ones((K, T)),
                            n_aud_feat=db.n_aud,
                            n_body_feat=db.feat.shape[2] - db.n_aud,
                            n_joints=135, step_sz=8)
    # search_motion draws its own init internally (GestureKNN.py:111);
    # reproduce the draw from the same seed for our side
    np.random.seed(99)
    rs = np.random.RandomState(99)
    init_seq, init_frm = int(rs.randint(0, K)), int(rs.randint(0, T))
    ref_motion = ref_knn.search_motion(norm_test[0].copy(), desired_k=0)

    # oracle in reference-ties mode must match the reference bit-for-bit
    want = ref_motion
    got_np = search_motion_np(ndb, test_feat[0], init_seq, init_frm,
                              desired_k=0, tie_kind="reference")
    np.testing.assert_allclose(got_np, want, atol=1e-4)
    # the deterministic stable-tie engine must agree with the stable oracle
    engine = GestureKNNEngine(ndb)
    got_dev = engine.search_motion(test_feat[0], init_seq, init_frm,
                                   desired_k=0)
    got_stable = search_motion_np(ndb, test_feat[0], init_seq, init_frm,
                                  desired_k=0, tie_kind="stable")
    np.testing.assert_allclose(got_dev, got_stable, atol=1e-4)
