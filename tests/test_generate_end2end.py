"""End2end GRU serving surface (VERDICT r4 #4): the "w/o motion matching"
ablation's inference path (/root/reference/codebook/inference.py:26-98) —
wav -> GeneratorGRU.sample -> VQVAE decode -> BVH — as
`generate --model end2end`, with code-selection parity vs the ACTUAL
reference torch Generator_gru on converted weights."""
import importlib.util
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from qpgesture_tpu.cli import _end2end_windows, main as cli_main
from qpgesture_tpu.core.config import End2EndConfig, VQVAEConfig
from qpgesture_tpu.models.gru_baseline import GeneratorGRU
from qpgesture_tpu.models.torch_convert import convert_generator_gru
from qpgesture_tpu.models.vqvae import VQVAE, save_vqvae_native
from qpgesture_tpu.motion.bvh import parse_bvh
from qpgesture_tpu.motion.pipeline import MotionPipeline

sys.path.insert(0, "tests")
from test_build_db_cli import make_beat_like_bvh  # noqa: E402

REF_GEN = "/root/reference/codebook/generate/generate.py"


def test_end2end_windows():
    """Subdivision parity with inference.py:33-43,67-75: non-overlapping
    4 s chunks, CEIL count with a zero-padded tail (the matching path's
    window_test_audio floors instead), and the MAX_FRAMES clamp."""
    sr = 16000
    wav = np.arange(sr * 9, dtype=np.float32)  # 9 s
    wins = _end2end_windows(wav)
    # ceil((144000 - 64000) / 64000) + 1 = 3 (vs 2 for the floor split)
    assert wins.shape == (3, 64000)
    np.testing.assert_array_equal(wins[0], wav[:64000])
    np.testing.assert_array_equal(wins[1], wav[64000:128000])
    np.testing.assert_array_equal(wins[2, :16000], wav[128000:])
    assert (wins[2, 16000:] == 0).all()  # inference.py:74-75 zero pad

    # shorter than one unit -> a single padded window (inference.py:35-36)
    short = _end2end_windows(wav[:1000])
    assert short.shape == (1, 64000)
    assert (short[0, 1000:] == 0).all()

    # MAX_FRAMES clamp (inference.py:40-41): 3600 frames -> 15 windows
    long_wav = np.zeros(sr * 4 * 20, dtype=np.float32)
    assert _end2end_windows(long_wav).shape[0] == 20
    assert _end2end_windows(long_wav, max_frames=3600).shape[0] == 15


@pytest.mark.skipif(not os.path.exists(REF_GEN),
                    reason="reference tree not present")
def test_end2end_code_parity_vs_torch(rng):
    """Converted reference weights: our batched jit sample() selects the
    SAME code string as the torch Generator_gru.sample loop
    (generate.py:323-335) driven the way inference.py:67-80 drives it."""
    spec = importlib.util.spec_from_file_location("ref_generate", REF_GEN)
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    tmodel = ref.Generator_gru()
    with torch.no_grad():
        # fresh BN stats are (0, 1); randomize so eval-mode parity
        # exercises the converted running averages
        for m in tmodel.modules():
            if isinstance(m, torch.nn.BatchNorm1d):
                m.running_mean.copy_(torch.from_numpy(
                    rng.randn(m.num_features).astype(np.float32) * 0.1))
                m.running_var.copy_(torch.from_numpy(
                    rng.rand(m.num_features).astype(np.float32) + 0.5))
    tmodel.eval()

    wav = (0.2 * rng.randn(16000 * 9)).astype(np.float32)  # 3 windows
    wins = _end2end_windows(wav)

    # reference loop: per-window sample, codes vstacked (inference.py:67-82)
    ref_codes = []
    with torch.no_grad():
        for w in wins:
            out_zs = tmodel.sample(torch.from_numpy(w).unsqueeze(0))
            ref_codes.append(out_zs[0].squeeze(0).numpy())
    ref_codes = np.vstack(ref_codes)

    variables = convert_generator_gru(tmodel.state_dict())
    model = GeneratorGRU(hidden=200, output=512)
    ours = np.asarray(jax.jit(
        lambda v, w: model.sample(v, w))(variables, jnp.asarray(wins)))
    assert ours.shape == ref_codes.shape == (3, 30)
    agree = (ours == ref_codes).mean()
    # argmax over 512 logits computed through two different BLAS stacks:
    # demand exact agreement — any mismatch means a conversion bug, not
    # float noise (logit gaps dwarf f32 error on random weights)
    assert agree == 1.0, f"code agreement {agree}"


def test_generate_end2end_cli(tmp_path, rng):
    """Full serving path on a train-end2end orbax checkpoint: wav ->
    sampled codes -> VQVAE decode -> BVH + code npy (inference.py:82-98)."""
    from qpgesture_tpu.train.checkpoints import save_checkpoint
    from qpgesture_tpu.train.train_end2end import End2EndTrainer

    # small GRU + matching 64-code VQVAE
    cfg = End2EndConfig(hidden_size=16, output_size=64)
    trainer = End2EndTrainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    e2e_ckpt = str(tmp_path / "e2e_ckpt")
    save_checkpoint(e2e_ckpt, state, name="latest")

    vq_cfg = VQVAEConfig(width=16, depth=1, emb_width=16, l_bins=64,
                         input_dim=135, sample_length=30)
    vq = VQVAE(vq_cfg)
    params, cb = vq.init(jax.random.PRNGKey(0))
    cb = vq.init_codebook_from_batch(
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
                "end2end": {"hidden_size": 16, "output_size": 64},
                "data_mean": [0.0] * 135, "data_std": [1.0] * 135}
    cfg_path = str(tmp_path / "cfg.yml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg_yaml, f)

    # 9 s -> 3 end2end windows (the ceil split keeps the padded tail)
    wav_path = str(tmp_path / "in.npz")
    np.savez(wav_path, wav=(0.2 * rng.randn(16000 * 9)).astype(np.float32))

    out_dir = str(tmp_path / "gen")
    cli_main(["generate", "--wav", wav_path,
              "--model", "end2end",
              "--end2end-checkpoint", e2e_ckpt,
              "--vqvae-checkpoint", ckpt_path,
              "--pipeline", pipe_path,
              "--config", cfg_path,
              "--out", out_dir, "--prefix", "e2e"])

    out = parse_bvh(os.path.join(out_dir, "e2e_generated.bvh"))
    assert out.values.shape[0] == 3 * 240
    assert np.isfinite(out.values).all()
    codes = np.load(os.path.join(out_dir, "code_e2e.npy"))
    assert codes.shape == (3, 30)
    assert codes.min() >= 0 and codes.max() < 64

    # missing checkpoint -> clear error, not a stack trace
    with pytest.raises(SystemExit, match="end2end-checkpoint"):
        cli_main(["generate", "--wav", wav_path, "--model", "end2end",
                  "--vqvae-checkpoint", ckpt_path,
                  "--pipeline", pipe_path, "--out", out_dir])
