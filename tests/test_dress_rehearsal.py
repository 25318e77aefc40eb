"""Reference-artifact dress rehearsal: the exact on-disk formats a real
QPGesture user would bring, end to end through the CLI.

Builds a `codebook_checkpoint_best.bin` with the reference's full dict shape
— {'args': easydict.EasyDict, 'epoch': int, 'model_dict': state_dict with
the nn.DataParallel 'module.' prefix} (train.py:73-76,114-116) — plus a full
reference-format speaker database npz set (object-dtype phase arrays
included), then runs the real user journey:

    convert checkpoint -> signature CLI -> match CLI -> decode CLI -> BVH

asserting the selected indices equal the actual reference implementation
executed on the same artifacts (shipped wavlm mode, GestureKNN.py:842-843).
"""
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
pytest.importorskip("Levenshtein")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from qpgesture_tpu.cli import main as cli_main  # noqa: E402
from qpgesture_tpu.core.config import VQVAEConfig  # noqa: E402

from test_build_db_cli import make_beat_like_bvh  # noqa: E402
from test_reference_cross import (_build_files, _import_reference,  # noqa: E402
                                  _run_reference)
from test_vqvae import _torch_vqvae  # noqa: E402

CFG = VQVAEConfig(width=16, depth=1, emb_width=16, l_bins=512,
                  input_dim=135, sample_length=30)


def _fake_easydict_module():
    """Stand-in for the easydict package (absent here), used only to WRITE
    a checkpoint whose pickle references easydict.EasyDict like the real
    artifact does."""
    import types

    class EasyDict(dict):
        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError:
                raise AttributeError(k)

        def __setattr__(self, k, v):
            self[k] = v

    # pickle stores classes by (module, qualname): make the stub byte-
    # compatible with the real package's easydict.EasyDict
    EasyDict.__module__ = "easydict"
    EasyDict.__qualname__ = "EasyDict"
    mod = types.ModuleType("easydict")
    mod.EasyDict = EasyDict
    return mod


def _write_reference_checkpoint(path, rng):
    """torch.save the reference's exact on-disk dict shape."""
    torch.manual_seed(4242)
    tmodel = _torch_vqvae(CFG)
    sd = {"module." + k: v for k, v in tmodel.state_dict().items()}
    mod = _fake_easydict_module()
    sys.modules["easydict"] = mod
    try:
        args = mod.EasyDict({
            "config": "./configs/codebook.yml", "gpu": "0",
            "no_cuda": ["0"], "VQVAE": mod.EasyDict({
                "levels": 1, "downs_t": [3], "strides_t": [2],
                "emb_width": CFG.emb_width, "l_bins": CFG.l_bins,
                "width": CFG.width, "depth": CFG.depth,
                "dilation_growth_rate": 3}),
        })
        torch.save({"args": args, "epoch": 7, "model_dict": sd}, path)
    finally:
        # the shim must not leak into the load path: the loader has to
        # survive a machine with no easydict installed
        sys.modules.pop("easydict", None)
    return tmodel


def test_dress_rehearsal(tmp_path):
    rng = np.random.RandomState(20230415)

    # --- the user's artifacts, in reference formats --------------------
    ckpt = str(tmp_path / "codebook_checkpoint_best.bin")
    _write_reference_checkpoint(ckpt, rng)
    assert "easydict" not in sys.modules

    import yaml
    cfg_yaml = {"VQVAE": {"width": CFG.width, "depth": CFG.depth,
                          "emb_width": CFG.emb_width, "l_bins": CFG.l_bins,
                          "input_dim": 135, "sample_length": 30,
                          "downs_t": [3], "strides_t": [2],
                          "dilation_growth_rate": 3},
                "data_mean": [0.0] * 135, "data_std": [1.0] * 135}
    cfg_path = str(tmp_path / "codebook.yml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg_yaml, f)

    # speaker database npz set (object-dtype phase arrays and all)
    paths, arrays = _build_files(tmp_path, rng)

    # --- user journey step 1: signature table from the .bin ------------
    sig_path = str(tmp_path / "generated_code.npz")
    cli_main(["signature", "--checkpoint", ckpt, "--config", cfg_path,
              "--out", sig_path])
    sig = np.load(sig_path)
    assert sig["signature"].shape == (512, 135)
    assert sig["poses"].shape == (512, 240, 135)

    # the reference must consume the SAME signature table
    paths["signature"] = sig_path

    # --- user journey step 2: match (shipped wavlm preset) -------------
    result_path = str(tmp_path / "result.npz")
    cli_main(["match",
              "--train-database", paths["train_db"],
              "--train-codebook", paths["code"],
              "--codebook-signature", sig_path,
              "--test-data", paths["test_db"],
              "--train-wavlm", paths["train_wavlm"],
              "--test-wavlm", paths["test_wavlm"],
              "--preset", "shipped", "--out", result_path])
    ours = np.load(result_path)["knn_pred"]
    assert ours.shape == (2, 30)

    # --- parity: the actual reference on the same artifacts ------------
    gk = _import_reference(paths)
    ref = _run_reference(gk, paths, use_wavvq=False)
    np.testing.assert_array_equal(ours, ref)

    # --- user journey step 3: decode the result to BVH -----------------
    from qpgesture_tpu.motion.bvh import parse_bvh
    from qpgesture_tpu.motion.pipeline import MotionPipeline
    bvh = parse_bvh(make_beat_like_bvh(rng, 600))
    pipe = MotionPipeline(fps=60).fit(bvh)
    pipe_path = str(tmp_path / "pipeline.json")
    with open(pipe_path, "w") as f:
        f.write(pipe.to_json())
    out_dir = str(tmp_path / "out")
    cli_main(["decode", "--result", result_path, "--checkpoint", ckpt,
              "--pipeline", pipe_path, "--config", cfg_path,
              "--out", out_dir, "--prefix", "rehearsal"])
    bvh_path = os.path.join(out_dir, "rehearsal_generated.bvh")
    assert os.path.exists(bvh_path)
    parsed = parse_bvh(open(bvh_path).read())
    assert parsed.values.shape[0] == 2 * 240  # 2 windows x 240 frames


def test_checkpoint_loader_survives_missing_easydict(tmp_path):
    """Loading a real {'args': EasyDict, ...} checkpoint must work on a
    machine without the easydict package (the loader injects a shim)."""
    from qpgesture_tpu.models.torch_convert import load_vqvae_checkpoint
    ckpt = str(tmp_path / "ck.bin")
    rng = np.random.RandomState(0)
    _write_reference_checkpoint(ckpt, rng)
    with pytest.raises(ImportError):
        import easydict  # noqa: F401
    params, cb = load_vqvae_checkpoint(ckpt, CFG)
    assert cb.k.shape == (512, 16)
    assert "easydict" not in sys.modules
