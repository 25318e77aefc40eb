"""ResyncNet inference application (VERDICT r4 #3): converted-weight
forward parity vs the ACTUAL reference torch module
(/root/reference/codebook/Speech2GestureMatching/model.py:50-93), batched
predict_resynced_gesture parity vs the reference's per-sequence host loop
(ResyncGestureKNN.py:43-87), and the resync-apply / generate --resync CLI
surfaces."""
import importlib.util
import os
import sys

import numpy as np
import pytest

import jax

torch = pytest.importorskip("torch")

REF_DIR = "/root/reference/codebook/Speech2GestureMatching"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DIR), reason="reference tree not present")


def _load_reference_model():
    """model.py imports `constant` from its own directory."""
    sys.path.insert(0, REF_DIR)
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_s2g_model", os.path.join(REF_DIR, "model.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        sys.path.remove(REF_DIR)
    return mod


def _randomize_bn_stats(module, rng):
    """Fresh BN running stats are (0, 1) — randomize them so eval-mode
    parity actually exercises the converted statistics."""
    for m in module.modules():
        if isinstance(m, torch.nn.BatchNorm1d):
            m.running_mean.copy_(torch.from_numpy(
                rng.randn(m.num_features).astype(np.float32) * 0.1))
            m.running_var.copy_(torch.from_numpy(
                (rng.rand(m.num_features).astype(np.float32) + 0.5)))


@pytest.fixture(scope="module")
def ref_resync():
    ref = _load_reference_model()
    rng = np.random.RandomState(3)
    tmodel = ref.ResyncNet()
    with torch.no_grad():
        _randomize_bn_stats(tmodel, rng)
    tmodel.eval()
    return ref, tmodel


def test_convert_resync_forward_parity(ref_resync, rng):
    """Converted weights: flax ResyncNet(NTC) == torch ResyncNet(NCT) in
    eval mode, including the UNet skip-concat order ([upsampled, skip],
    model.py:80-88) and BatchNorm running statistics."""
    from qpgesture_tpu.models.resync import ResyncNet
    from qpgesture_tpu.models.torch_convert import convert_resync

    ref, tmodel = ref_resync
    n_in = 13 + 135  # NUM_MFCC_FEAT + NUM_JOINTS (their constant.py)
    variables = convert_resync(tmodel.state_dict())
    gen = ResyncNet(out_features=135)

    x = rng.randn(2, 48, n_in).astype(np.float32)  # (N, T, C), T % 8 == 0
    with torch.no_grad():
        want = tmodel(torch.from_numpy(
            x.transpose(0, 2, 1))).numpy().transpose(0, 2, 1)
    got = np.asarray(gen.apply(variables, x, train=False))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_predict_resynced_gesture_reference_parity(ref_resync, rng):
    """The batched device application == the reference's sequence-at-a-time
    host loop (predict_resynced_gesture, ResyncGestureKNN.py:43-87):
    normalize MFCC with train-audio stats / motion with train-motion
    stats, eval-mode G, denormalize. Stats replicate calc_data_stats
    (data_processing.py:172-182)."""
    from qpgesture_tpu.models.resync import (ResyncNet,
                                             predict_resynced_gesture,
                                             resync_stats)
    from qpgesture_tpu.models.torch_convert import convert_resync

    ref, tmodel = ref_resync
    variables = convert_resync(tmodel.state_dict())
    gen = ResyncNet(out_features=135)

    N, T = 3, 48
    train_mfcc = rng.randn(5, T, 13).astype(np.float32)
    train_motion = (rng.randn(5, T, 135) * 2 + 0.3).astype(np.float32)
    mfcc_test = rng.randn(N, T, 13).astype(np.float32)
    knn_pred_njt = rng.randn(N, 135, T).astype(np.float32)  # ref layout

    m_mean, m_std, g_mean, g_std = resync_stats(train_mfcc, train_motion)
    # reference stats: calc_data_stats(mfcc.T(0,2,1), motion.T(0,2,1))
    # with (1, C, 1) expand-dims, then .squeeze() inside the predictor
    assert np.allclose(m_mean, train_mfcc.mean(axis=(0, 1)))
    assert np.allclose(g_std, train_motion.std(axis=(0, 1)))

    # ---- the reference loop, verbatim semantics (torch, NCT) ----------
    mfcc_norm = (mfcc_test.transpose(0, 2, 1) - m_mean[None, :, None]) / (
        m_std[None, :, None] + 1e-8)
    want = []
    with torch.no_grad():
        for i in range(N):
            curr = knn_pred_njt[i:i + 1].squeeze().transpose()  # (T, J)
            curr = (curr - g_mean) / (g_std + 1e-8)
            curr = np.expand_dims(curr, 0).transpose(0, 2, 1)   # (1, J, T)
            inp = np.concatenate((mfcc_norm[i:i + 1], curr), axis=1)
            out = tmodel(torch.tensor(inp, dtype=torch.float)
                         ).numpy().squeeze()
            pred = out.transpose() * g_std + g_mean              # (T, J)
            want.append(pred.transpose(1, 0))                    # (J, T)
    want = np.stack(want)

    got = predict_resynced_gesture(
        gen, variables, mfcc_test, knn_pred_njt.transpose(0, 2, 1),
        m_mean, m_std, g_mean, g_std)
    np.testing.assert_allclose(got.transpose(0, 2, 1), want,
                               atol=5e-4, rtol=5e-4)


def test_resync_apply_cli_with_orbax_checkpoint(tmp_path, rng):
    """resync-apply round-trip on an orbax train-resync checkpoint: the
    trained generator demonstrably changes the KNN motion and the output
    keeps the reference npz schema/layout."""
    from qpgesture_tpu.cli import main as cli_main
    from qpgesture_tpu.core.config import ResyncConfig
    from qpgesture_tpu.train.checkpoints import save_checkpoint
    from qpgesture_tpu.train.train_resync import ResyncTrainer

    N, T, J, M = 2, 16, 9, 5
    trainer = ResyncTrainer(ResyncConfig(), n_mfcc=M, n_joints=J,
                            num_frames=T)
    state = trainer.init_state(jax.random.PRNGKey(0), num_frames=T)
    ckpt = str(tmp_path / "resync_ckpt")
    save_checkpoint(ckpt, state, name="latest")

    train_path = str(tmp_path / "train.npz")
    np.savez(train_path,
             mfcc=rng.randn(4, T, M + 1).astype(np.float32),
             body=rng.randn(4, T, J).astype(np.float32))
    test_path = str(tmp_path / "test.npz")
    np.savez(test_path, mfcc=rng.randn(N, T, M + 1).astype(np.float32))
    knn_path = str(tmp_path / "knn_pred.npz")
    knn = rng.randn(N, J, T).astype(np.float32)
    np.savez(knn_path, knn_pred=knn)

    out_path = str(tmp_path / "knn_pred_stage2.npz")
    cli_main(["resync-apply", "--knn", knn_path, "--test-data", test_path,
              "--train-database", train_path, "--checkpoint", ckpt,
              "--out", out_path, "--n-mfcc", str(M)])
    out = np.load(out_path)["knn_pred"]
    assert out.shape == knn.shape
    assert np.isfinite(out).all()
    assert not np.allclose(out, knn)  # the generator did something

    # --frames limits the resynced prefix like the reference's frames arg
    out1_path = str(tmp_path / "stage2_f1.npz")
    cli_main(["resync-apply", "--knn", knn_path, "--test-data", test_path,
              "--train-database", train_path, "--checkpoint", ckpt,
              "--out", out1_path, "--n-mfcc", str(M), "--frames", "1"])
    out1 = np.load(out1_path)["knn_pred"]
    assert out1.shape == (1, J, T)
    np.testing.assert_allclose(out1[0], out[0], atol=1e-5)
