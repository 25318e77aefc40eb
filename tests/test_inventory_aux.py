"""Remaining inventory components: expmap, transcripts, fake motion,
simpleVQVAE."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qpgesture_tpu.core.config import VQVAEConfig
from qpgesture_tpu.match.gesture_knn import (GestureKNNData,
                                             fake_training_pairs,
                                             search_fake_motion_np)
from qpgesture_tpu.models.simple_vqvae import SimpleVQVAE
from qpgesture_tpu.models import bottleneck as bn
from qpgesture_tpu.motion.rotations import (euler_to_expmap, expmap_to_euler,
                                            unroll_expmap)
from qpgesture_tpu.pipelines.transcripts import (normalize_word,
                                                 read_gentle_json,
                                                 read_tab_transcript,
                                                 write_tab_transcript)


def test_expmap_roundtrip(rng):
    e = rng.uniform(-80, 80, size=(20, 3))
    v = euler_to_expmap(e)
    back = expmap_to_euler(v)
    np.testing.assert_allclose(back, e, atol=1e-6)


def test_unroll_expmap():
    # a trajectory that crosses the pi boundary
    angles = np.linspace(3.0, 3.4, 10)
    rotvecs = np.stack([np.array([a, 0, 0]) for a in angles])
    # represent the second half with flipped axis (discontinuous)
    flipped = rotvecs.copy()
    for t in range(5, 10):
        a = np.linalg.norm(flipped[t])
        flipped[t] = -flipped[t] / a * (2 * np.pi - a)
    unrolled = unroll_expmap(flipped)
    diffs = np.linalg.norm(np.diff(unrolled, axis=0), axis=1)
    assert diffs.max() < 0.5  # continuous again


def test_transcripts(tmp_path):
    import json
    gj = {"words": [
        {"case": "success", "start": 0.1, "end": 0.4, "alignedWord": "hi"},
        {"case": "not-found-in-audio", "word": "uh"},
        {"case": "success", "start": 0.5, "end": 0.9, "word": "there"},
    ]}
    jp = str(tmp_path / "g.json")
    with open(jp, "w") as f:
        json.dump(gj, f)
    words = read_gentle_json(jp)
    assert words == [(0.1, 0.4, "hi"), (0.5, 0.9, "there")]
    tp = str(tmp_path / "t.txt")
    write_tab_transcript(tp, words)
    assert read_tab_transcript(tp) == words
    assert normalize_word("He'llo!?") == "he'llo"


def test_fake_motion(rng):
    db = GestureKNNData(
        feat=rng.randn(4, 64, 20).astype(np.float32),
        motion=rng.randn(4, 64, 15).astype(np.float32),
        control_mask=np.ones((4, 64)), n_aud=12)
    feat_test = rng.randn(12, 64).astype(np.float32)
    pred = search_fake_motion_np(db, feat_test)
    assert pred.shape == (15, 64)
    assert np.abs(pred).sum() > 0
    batch = fake_training_pairs(db, rng.randn(3, 12, 64).astype(np.float32),
                                np.random.RandomState(0))
    assert batch.shape == (3, 15, 64)


def test_simple_vqvae(rng):
    cfg = VQVAEConfig(emb_width=16, l_bins=16, input_dim=9, width=16)
    model = SimpleVQVAE(cfg)
    params, cb = model.init(jax.random.PRNGKey(0), sample_len=40)
    x = jnp.asarray(rng.randn(2, 40, 9).astype(np.float32))
    h = model.encoder.apply({"params": params["encoder"]}, x)
    cb = bn.init_codebook(h.reshape(-1, h.shape[-1]), cfg.l_bins,
                          jax.random.PRNGKey(1))
    codes = model.encode(params, cb, x)
    assert codes.shape == (2, 5)  # x8 downsample
    y = model.decode(params, cb, codes)
    assert y.shape == (2, 40, 9)
    x_out, loss, metrics, _ = model.forward(params, cb, x, train=True,
                                            rng=jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))
