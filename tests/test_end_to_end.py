"""End-to-end integration: raw (BVH, wav, words) -> database construction ->
codebook + signatures -> phase extraction -> matching -> decode -> BVH.

This is the test pyramid's top: the full quick-start product path
(SURVEY §3.1 + §3.2) on synthetic data with tiny models.
"""
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qpgesture_tpu.core.config import MATCH_PRESETS, MatchConfig, VQVAEConfig
from qpgesture_tpu.core.schemas import CodebookSignature
from qpgesture_tpu.match.database import (stage_database, stage_test_audio,
                                          stage_test_context)
from qpgesture_tpu.match.engine import CodeKNNEngine
from qpgesture_tpu.match.oracle import CodeKNNOracle
from qpgesture_tpu.models.pae import PAE, PhaseExtractor
from qpgesture_tpu.models.vq_wav2vec import VQWav2Vec, VQWav2VecConfig
from qpgesture_tpu.models.vqvae import VQVAE, codebook_signature
from qpgesture_tpu.core.config import PAEConfig
from qpgesture_tpu.motion.bvh import parse_bvh
from qpgesture_tpu.motion.pipeline import MotionPipeline
from qpgesture_tpu.pipelines.database_builder import (context_slots,
                                                      encode_windows,
                                                      extract_wavvq,
                                                      hashed_embed_fn,
                                                      process_recording,
                                                      split_of,
                                                      window_recordings,
                                                      window_test_audio)
from qpgesture_tpu.render.decode import render_result

sys.path.insert(0, "tests")
from test_motion import make_bvh_text  # noqa: E402

JOINTS = ["Spine", "Spine1", "RightShoulder", "RightArm",
          "LeftShoulder", "LeftArm"]
POSE_DIM = 6 * 9


def test_split_rule():
    assert split_of("1_wayne_0_103_110.bvh") == "test"
    assert split_of("1_wayne_0_111_118.bvh") == "validation"
    assert split_of("1_wayne_0_81_86.bvh") is None
    assert split_of("1_wayne_0_1_8.bvh") == "train"


def test_context_slots():
    words = [(0.5, 1.0, "hello"), (2.0, 2.5, "world"), (7.0, 7.5, "next")]
    slots = context_slots(words, 0.0, 4.0)
    # hello midpoint 0.75 -> slot int((0.5+1.0)*60/2/8)=5; +-3 window
    assert any("hello" in s for s in slots[2:9])
    assert all("next" not in s for s in slots)  # outside the window


@pytest.mark.slow
def test_full_pipeline(tmp_path, rng):
    fps, sr, n_frames = 60, 16000, 240
    # --- raw data: ~3 recordings x 20 s @120fps BVH + 16 kHz audio --------
    recs = []
    pipeline = None
    for name in ("spk_0_1_8", "spk_0_103_110", "spk_0_111_118"):
        text, _ = make_bvh_text(rng, n_frames=int(20.4 * 120), fps=120)
        bvh = parse_bvh(text)
        if pipeline is None:
            pipeline = MotionPipeline(target_joints=JOINTS, fps=fps).fit(bvh)
        wav = (0.2 * np.sin(2 * np.pi * 180 *
                            np.arange(int(20.4 * sr)) / sr)
               + 0.02 * rng.randn(int(20.4 * sr))).astype(np.float32)
        words = [(t, t + 0.3, f"w{int(t)}") for t in
                 np.arange(0.2, 19.0, 0.7)]
        recs.append(process_recording(name, bvh, wav, pipeline, words))

    assert recs[0].rotation.shape[1] == POSE_DIM
    assert abs(len(recs[0].energy) - recs[0].rotation.shape[0]) == 0

    # --- PAE phases per recording ----------------------------------------
    pae_cfg = PAEConfig(frames=16, joints=6, channels_per_joint=9,
                        phase_channels=8)
    pae = PAE(pae_cfg)
    pae_vars = pae.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, pae_cfg.input_channels * 16)),
                        train=True)
    extractor = PhaseExtractor(pae, pae_vars)
    mean = np.zeros(POSE_DIM)
    std = np.ones(POSE_DIM)
    for rec in recs:
        rec.phase = extractor.pose_to_phase(rec.rotation, mean, std)
        assert rec.phase.shape == (rec.rotation.shape[0], 4, 8)

    # --- windows by split --------------------------------------------------
    embed = hashed_embed_fn()
    splits = {s: [] for s in ("train", "validation", "test")}
    for rec in recs:
        splits[split_of(rec.name)].append(rec)
    train_bundle = window_recordings(splits["train"], n_frames,
                                     embed_fn=embed)
    test_bundle = window_recordings(splits["test"], n_frames, embed_fn=embed)
    assert train_bundle.body.shape[1:] == (240, POSE_DIM)
    W_train = train_bundle.body.shape[0]
    assert W_train >= 4

    # --- tiny VQ-VAE codes + signature ------------------------------------
    vq_cfg = VQVAEConfig(width=16, depth=1, emb_width=16, l_bins=24,
                         input_dim=POSE_DIM, sample_length=30)
    vq = VQVAE(vq_cfg)
    params, cb = vq.init(jax.random.PRNGKey(1), sample_len=240)
    cb = vq.init_codebook_from_batch(
        params, jnp.asarray(train_bundle.body[:2]), jax.random.PRNGKey(2))
    codes = encode_windows(vq, params, cb, train_bundle.body, mean, std)
    assert codes.shape == (W_train, 30)
    code_arr, poses_arr, sig_arr = codebook_signature(vq, params, cb,
                                                      mean, std)
    signature = CodebookSignature(code=code_arr, poses=poses_arr,
                                  signature=sig_arr)

    # --- wavvq codes -------------------------------------------------------
    w2v = VQWav2Vec(VQWav2VecConfig())
    w2v_vars = w2v.init(jax.random.PRNGKey(3),
                        jnp.zeros((1, 64000), jnp.float32))
    train_wavvq = extract_wavvq(w2v, w2v_vars, train_bundle.wav)
    assert train_wavvq.shape == (W_train, 398, 2)

    # --- test clip through make_test_data path ----------------------------
    test_wav = np.concatenate([r.wav for r in splits["test"]])[:sr * 12]
    test_windows = window_test_audio(test_wav)
    test_wavvq = extract_wavvq(w2v, w2v_vars, test_windows)
    W_test = test_windows.shape[0]
    assert test_wavvq.shape == (W_test, 398, 2)

    # --- stage + match (wavvq preset), engine vs oracle --------------------
    cfg = MatchConfig(**{**MATCH_PRESETS["wavvq"].__dict__,
                         "codebook_size": 24})
    db = stage_database(cfg, train_bundle, codes, signature,
                        wavvq=train_wavvq)
    test_audio = stage_test_audio(cfg, db, wavvq=test_wavvq)
    test_ctx = stage_test_context(db, test_bundle.context[:W_test])

    engine = CodeKNNEngine(cfg, db)
    res = engine.predict(test_audio, test_ctx,
                         rng=np.random.RandomState(cfg.seed))
    assert res.codes.shape == (W_test, 30)
    oracle = CodeKNNOracle(db)
    res_o = oracle.predict(test_audio, test_ctx,
                           rng=np.random.RandomState(cfg.seed))
    np.testing.assert_array_equal(res.codes, res_o.codes)

    # --- decode to BVH ------------------------------------------------------
    bvh_path, npy_path = render_result(res.codes, vq, params, cb, pipeline,
                                       str(tmp_path), "e2e",
                                       data_mean=mean, data_std=std)
    out = parse_bvh(bvh_path)
    assert out.values.shape[0] == W_test * 240
    pos = np.load(npy_path)
    assert pos.shape == (W_test * 240, (len(JOINTS) + 1) * 3)
    assert np.isfinite(pos).all()
