"""Runnable end-to-end demo on synthetic data (no BEAT download needed).

Walks the full product path with tiny models:
  raw BVH + wav  ->  database construction  ->  VQ-VAE codes + signatures
  ->  PAE phases  ->  CodeKNN matching  ->  decode  ->  BVH out.

    python examples/demo_synthetic.py --out /tmp/qpg_demo

With real BEAT artifacts, the same calls run at full size (see README
quick start for the CLI equivalents).
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from qpgesture_tpu.core.config import (MATCH_PRESETS, MatchConfig, PAEConfig,
                                       VQVAEConfig)  # noqa: E402
from qpgesture_tpu.core.schemas import CodebookSignature  # noqa: E402
from qpgesture_tpu.match.database import (stage_database, stage_test_audio,
                                          stage_test_context)  # noqa: E402
from qpgesture_tpu.match.engine import CodeKNNEngine  # noqa: E402
from qpgesture_tpu.models.pae import PAE, PhaseExtractor  # noqa: E402
from qpgesture_tpu.models.vq_wav2vec import (VQWav2Vec,
                                             VQWav2VecConfig)  # noqa: E402
from qpgesture_tpu.models.vqvae import VQVAE, codebook_signature  # noqa: E402
from qpgesture_tpu.motion.bvh import parse_bvh  # noqa: E402
from qpgesture_tpu.motion.pipeline import MotionPipeline  # noqa: E402
from qpgesture_tpu.pipelines.database_builder import (
    encode_windows, extract_wavvq, hashed_embed_fn, process_recording,
    window_recordings, window_test_audio)  # noqa: E402
from qpgesture_tpu.render.decode import render_result  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))
from test_build_db_cli import make_beat_like_bvh  # noqa: E402

JOINTS_DIM = 135


def main(out_dir: str):
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.RandomState(0)
    sr, fps = 16000, 60

    print("== step 1-2: recordings -> rotations/MFCC/prosody/windows")
    pipeline = None
    recordings = []
    for name in ("demo_0_1_8", "demo_0_9_16"):
        bvh = parse_bvh(make_beat_like_bvh(rng, int(14 * 120)))
        if pipeline is None:
            pipeline = MotionPipeline(fps=fps).fit(bvh)
        wav = (0.3 * np.sin(2 * np.pi * 170 * np.arange(int(14 * sr)) / sr)
               + 0.02 * rng.randn(int(14 * sr))).astype(np.float32)
        words = [(t, t + 0.25, f"word{int(t*2)}")
                 for t in np.arange(0.3, 13.0, 0.6)]
        recordings.append(process_recording(name, bvh, wav, pipeline, words))
    mean = np.zeros(JOINTS_DIM)
    std = np.ones(JOINTS_DIM)

    print("== PAE phases")
    pae = PAE(PAEConfig(frames=16, joints=15, channels_per_joint=9))
    pae_vars = pae.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, JOINTS_DIM * 16)), train=True)
    extractor = PhaseExtractor(pae, pae_vars)
    for rec in recordings:
        rec.phase = extractor.pose_to_phase(rec.rotation, mean, std)

    print("== windows + context")
    bundle = window_recordings(recordings, 240, embed_fn=hashed_embed_fn())
    print(f"   {bundle.body.shape[0]} windows of {bundle.body.shape[1]}f")

    print("== step 3: VQ-VAE codes + signatures")
    vq = VQVAE(VQVAEConfig(width=32, depth=1, emb_width=32, l_bins=64,
                           input_dim=JOINTS_DIM, sample_length=30))
    params, cb = vq.init(jax.random.PRNGKey(1))
    cb = vq.init_codebook_from_batch(params, jnp.asarray(bundle.body[:2]),
                                     jax.random.PRNGKey(2))
    codes = encode_windows(vq, params, cb, bundle.body, mean, std)
    code_arr, poses_arr, sig = codebook_signature(vq, params, cb, mean, std)
    signature = CodebookSignature(code=code_arr, poses=poses_arr,
                                  signature=sig)

    print("== step 4: vq-wav2vec codes")
    w2v = VQWav2Vec(VQWav2VecConfig())
    w2v_vars = w2v.init(jax.random.PRNGKey(3), jnp.zeros((1, 64000)))
    wavvq = extract_wavvq(w2v, w2v_vars, bundle.wav)

    print("== test clip -> match -> decode")
    test_wav = (0.3 * np.sin(2 * np.pi * 200 *
                             np.arange(int(9 * sr)) / sr)).astype(np.float32)
    windows = window_test_audio(test_wav)
    test_wavvq = extract_wavvq(w2v, w2v_vars, windows)
    test_ctx = rng.randn(windows.shape[0], 30, 384).astype(np.float32)

    cfg = MatchConfig(**{**MATCH_PRESETS["wavvq"].__dict__,
                         "codebook_size": 64})
    db = stage_database(cfg, bundle, codes, signature, wavvq=wavvq)
    engine = CodeKNNEngine(cfg, db)
    result = engine.predict(stage_test_audio(cfg, db, wavvq=test_wavvq),
                            stage_test_context(db, test_ctx))
    print(f"   selected codes: {result.codes.shape}")

    bvh_path, npy_path = render_result(result.codes, vq, params, cb,
                                       pipeline, out_dir, "demo",
                                       data_mean=mean, data_std=std)
    print(f"== wrote {bvh_path}\n== wrote {npy_path}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/qpg_demo")
    main(p.parse_args().out)
