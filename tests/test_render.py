"""Decode/render + metrics + prosody tests."""
import os
import sys

import numpy as np
import pytest

import jax

from qpgesture_tpu.core.config import VQVAEConfig
from qpgesture_tpu.models.vqvae import VQVAE
from qpgesture_tpu.motion.bvh import parse_bvh
from qpgesture_tpu.motion.pipeline import MotionPipeline
from qpgesture_tpu.render.decode import (decode_codes, poses_to_bvh,
                                         render_result, smooth_poses)
from qpgesture_tpu.render.metrics import (fgd, frechet_distance, hellinger,
                                          hellinger_velocity)
from qpgesture_tpu.pipelines.audio_host import (cal_volume, get_energy,
                                                get_pitch, interp_to_fps,
                                                mel_bank_slaney)

sys.path.insert(0, "tests")
from test_motion import make_bvh_text  # noqa: E402

SMALL = VQVAEConfig(width=16, depth=1, emb_width=16, l_bins=16,
                    input_dim=6 * 9, sample_length=4)


def _pipeline_and_model(rng):
    text, _ = make_bvh_text(rng, n_frames=80, fps=120)
    data = parse_bvh(text)
    pipe = MotionPipeline(
        target_joints=["Spine", "Spine1", "RightShoulder", "RightArm",
                       "LeftShoulder", "LeftArm"], fps=60).fit(data)
    model = VQVAE(SMALL)
    params, cb = model.init(jax.random.PRNGKey(0), sample_len=32)
    import jax.numpy as jnp
    cb = model.init_codebook_from_batch(
        params, jnp.asarray(rng.randn(2, 32, SMALL.input_dim)
                            .astype(np.float32)), jax.random.PRNGKey(1))
    return pipe, model, params, cb


def test_render_result_writes_bvh(tmp_path, rng):
    pipe, model, params, cb = _pipeline_and_model(rng)
    codes = rng.randint(0, SMALL.l_bins, size=(2, 4)).astype(np.int32)
    bvh_path, npy_path = render_result(
        codes, model, params, cb, pipe, str(tmp_path), "t",
        data_mean=np.zeros(SMALL.input_dim),
        data_std=np.ones(SMALL.input_dim))
    back = parse_bvh(bvh_path)
    assert back.values.shape[0] == 2 * 4 * 8  # windows * codes * hop
    pos = np.load(npy_path)
    assert pos.shape == (2 * 4 * 8, 7 * 3)  # root + 6 joints


def test_decode_roundtrip_euler(rng):
    """poses -> BVH -> parse -> euler matches the pipeline's inverse."""
    pipe, model, params, cb = _pipeline_and_model(rng)
    codes = rng.randint(0, SMALL.l_bins, size=(1, 4)).astype(np.int32)
    poses = decode_codes(model, params, cb, codes)
    bvh = poses_to_bvh(poses, pipe)
    from qpgesture_tpu.motion.rotations import matrices_to_poses
    euler = matrices_to_poses(poses)
    idx = [bvh.channel_names.index(c) for c in pipe.selected_columns]
    np.testing.assert_allclose(bvh.values[:, idx], euler, atol=1e-6)


def test_smoothing_shapes(rng):
    poses = rng.randn(100, 18).astype(np.float32)
    out = smooth_poses(poses, savgol=True, gaussian=True)
    assert out.shape == poses.shape


def test_hellinger_basics(rng):
    p = np.array([[0.5, 0.5, 0.0]])
    assert hellinger(p, p) == pytest.approx(0.0, abs=1e-9)
    q = np.array([[0.0, 0.0, 1.0]])
    assert hellinger(p, q) == pytest.approx(1.0, abs=1e-9)
    a = rng.randn(500, 6)
    b = a + 0.001 * rng.randn(500, 6)
    assert hellinger_velocity(a, a.copy()) < 1e-9
    assert hellinger_velocity(a, b) < hellinger_velocity(a, a * 3.0)


def test_frechet_distance(rng):
    a = rng.randn(400, 8)
    assert frechet_distance(a, a.copy()) == pytest.approx(0.0, abs=1e-6)
    b = rng.randn(400, 8) + 2.0
    assert frechet_distance(a, b) > 8.0 * 3  # ~ |mu|^2 = 8*4
    wins_a = rng.randn(50, 10, 4)
    wins_b = rng.randn(50, 10, 4) * 2
    assert fgd(wins_a, wins_b) > fgd(wins_a, wins_a)


def test_frechet_gram_path_matches_dense(rng):
    """High-dim (D > N) path: the N x N cross-Gram nuclear-norm formula
    must agree with the dense D x D covariance computation."""
    a = rng.randn(12, 40)
    b = rng.randn(9, 40) * 1.3 + 0.5
    mu_a, mu_b = a.mean(0), b.mean(0)
    ca = np.cov(a, rowvar=False)
    cb = np.cov(b, rowvar=False)
    from qpgesture_tpu.render.metrics import _sqrtm_psd
    sa = _sqrtm_psd(ca)
    dense = (((mu_a - mu_b) ** 2).sum() + np.trace(ca) + np.trace(cb)
             - 2.0 * np.trace(_sqrtm_psd(sa @ cb @ sa)))
    assert frechet_distance(a, b) == pytest.approx(float(dense), rel=1e-6)
    # raw-space FGD on campaign-scale windows finishes instantly now
    wins = rng.randn(32, 240, 135).astype(np.float32)
    wins2 = wins + 0.1 * rng.randn(*wins.shape).astype(np.float32)
    assert fgd(wins, wins2) >= 0.0
    assert fgd(wins, wins.copy()) == pytest.approx(0.0, abs=1e-5)


def test_prosody_features(rng):
    sr = 16000
    t = np.arange(sr)
    wav = 0.4 * np.sin(2 * np.pi * 220.0 * t / sr)
    energy = get_energy(wav)
    assert energy.shape[0] == 1 + sr // 256
    # a pure tone's pitch should be found near 220 Hz
    f0 = get_pitch(wav, log=False, norm=False)
    voiced = f0[f0 > 0]
    assert len(voiced) > 10
    np.testing.assert_allclose(np.median(voiced), 220.0, rtol=0.05)
    # volume of silence ~ 0, of the tone > 0
    wav16 = (wav * 32767).astype(np.int16)
    vol = cal_volume(wav16)
    assert vol.mean() > 1.0
    # digital silence must not become 0/0 = NaN
    assert np.isfinite(cal_volume(np.zeros(4096, np.int16))).all()
    # interpolation to motion fps
    out = interp_to_fps(energy, 60)
    assert out.shape == (60,)


def test_mel_bank_matches_librosa_if_available():
    librosa = pytest.importorskip("librosa")
    if not hasattr(librosa, "filters"):
        pytest.skip("librosa is a test stub (see test_audio_ops)")
    got = mel_bank_slaney(16000, 1024, 80, 80, 7600)
    want = librosa.filters.mel(sr=16000, n_fft=1024, n_mels=80, fmin=80,
                               fmax=7600)
    np.testing.assert_allclose(got, want, atol=1e-8)


def test_fgd_extractor_train_save_load(tmp_path, rng):
    """Feature-space FGD end to end: train the extractor on GT windows,
    save/load the checkpoint byte-exactly, and verify the metric's
    discrimination property — FGD(GT, GT-like) << FGD(GT, corrupted)."""
    from qpgesture_tpu.render.fgd_extractor import (FGDExtractorConfig,
                                                    fgd_encoder_fn,
                                                    load_fgd_extractor,
                                                    save_fgd_extractor,
                                                    train_fgd_extractor)

    T, C = 48, 18
    # structured GT: smooth sinusoids with per-window phase/freq variation
    def make(n, noise=0.0, seed=0):
        r = np.random.RandomState(seed)
        t = np.arange(T)[None, :, None] / T
        freq = r.uniform(1, 3, size=(n, 1, C))
        phase = r.uniform(0, 2 * np.pi, size=(n, 1, C))
        w = np.sin(2 * np.pi * freq * t + phase).astype(np.float32)
        return w + noise * r.randn(n, T, C).astype(np.float32)

    gt = make(96, seed=1)
    cfg = FGDExtractorConfig(channels=C, window=T, width=16, latent=8)
    model, params, mean, std = train_fgd_extractor(
        gt, cfg, epochs=8, batch_size=32, log=lambda s: None)

    ckpt = str(tmp_path / "fgd.msgpack")
    save_fgd_extractor(ckpt, cfg, params, mean, std)
    model2, params2, mean2, std2 = load_fgd_extractor(ckpt)
    enc = fgd_encoder_fn(model, params, mean, std)
    enc2 = fgd_encoder_fn(model2, params2, mean2, std2)
    probe = make(8, seed=5)
    np.testing.assert_array_equal(enc(probe), enc2(probe))
    assert enc(probe).shape == (8, 8)

    like = make(64, noise=0.02, seed=2)
    corrupt = make(64, noise=1.5, seed=3)
    d_like = fgd(like, gt, encoder=enc)
    d_corrupt = fgd(corrupt, gt, encoder=enc)
    assert d_like < d_corrupt / 5, (d_like, d_corrupt)


def test_train_fgd_and_evaluate_cli(tmp_path, rng):
    from qpgesture_tpu.cli import main as cli_main
    import json as _json

    T, C = 32, 9
    gt = rng.randn(40 * T, C).astype(np.float32).cumsum(0) * 0.01
    np.save(str(tmp_path / "gt.npy"), gt)
    gen = gt + rng.randn(*gt.shape).astype(np.float32) * 0.005
    np.save(str(tmp_path / "gen.npy"), gen)

    ckpt = str(tmp_path / "fgd.msgpack")
    cli_main(["train-fgd", "--data", str(tmp_path / "gt.npy"),
              "--out", ckpt, "--window", str(T), "--latent", "8",
              "--epochs", "2", "--batch-size", "16"])
    assert os.path.exists(ckpt)

    import io
    import contextlib
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        cli_main(["evaluate", "--generated", str(tmp_path / "gen.npy"),
                  "--reference", str(tmp_path / "gt.npy"),
                  "--window", str(T), "--fgd-extractor", ckpt])
    out = _json.loads(buf.getvalue().strip().splitlines()[-1])
    assert "fgd_feature" in out and out["fgd_feature"] >= 0
    assert "fgd_raw" in out
