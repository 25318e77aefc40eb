"""verify-release acceptance gate, rehearsed on a synthetic artifact tree
in the reference's exact published layout (README quick start +
GestureKNN.sh paths). When real BEAT artifacts are available, the same
command is the release gate."""
import json
import os
import shutil
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
pytest.importorskip("Levenshtein")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from qpgesture_tpu.cli import main as cli_main  # noqa: E402

from test_dress_rehearsal import CFG, _write_reference_checkpoint  # noqa: E402
from test_reference_cross import (_SAFE_SEED, _build_files,  # noqa: E402
                                  _import_reference, _run_reference)


@pytest.fixture(scope="module")
def release_tree(tmp_path_factory):
    """The published tree: data/BEAT/speaker_10_state_0/*,
    BEAT_output_60fps_rotation/code.npz, Example1 wavvq, pretrained_model/."""
    rng = np.random.RandomState(777)
    tmp = tmp_path_factory.mktemp("release")
    build_dir = tmp / "build"
    build_dir.mkdir()
    paths, arrays = _build_files(build_dir, rng)

    root = tmp / "root"
    spk = root / "data" / "BEAT" / "speaker_10_state_0"
    spk.mkdir(parents=True)
    shutil.copy(paths["train_db"],
                spk / "speaker_10_state_0_train_240_txt_2.npz")
    shutil.copy(paths["test_db"],
                spk / "speaker_10_state_0_test_240_txt_2.npz")
    shutil.copy(paths["code"],
                spk / "speaker_10_state_0_train_240_code.npz")
    shutil.copy(paths["train_wavlm"],
                spk / "speaker_10_state_0_train_240_WavLM.npz")
    shutil.copy(paths["test_wavlm"],
                spk / "speaker_10_state_0_test_240_WavLM.npz")
    shutil.copy(paths["train_wavvq"],
                spk / "speaker_10_state_0_train_240_WavVQ.npz")
    sig_dir = root / "data" / "BEAT" / "BEAT_output_60fps_rotation"
    sig_dir.mkdir(parents=True)
    shutil.copy(paths["signature"], sig_dir / "code.npz")
    ex = root / "data" / "Example1" / "ZeroEGGS_cut"
    ex.mkdir(parents=True)
    shutil.copy(paths["test_wavvq"], ex / "wavvq_240.npz")
    pm = root / "pretrained_model"
    pm.mkdir()
    _write_reference_checkpoint(str(pm / "codebook_checkpoint_best.bin"),
                                rng)
    import yaml
    cfg_yaml = {"VQVAE": {"width": CFG.width, "depth": CFG.depth,
                          "emb_width": CFG.emb_width, "l_bins": CFG.l_bins,
                          "input_dim": 135, "sample_length": 30,
                          "downs_t": [3], "strides_t": [2],
                          "dilation_growth_rate": 3}}
    cfg_path = str(tmp / "codebook.yml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg_yaml, f)
    return dict(root=str(root), paths=paths, arrays=arrays,
                config=cfg_path, tmp=tmp)


def test_verify_release_green(release_tree, capsys):
    """The gate passes end to end on the rehearsal tree and emits a full
    scorecard (the <5 s budget is relaxed on the CPU test mesh)."""
    out = str(release_tree["tmp"] / "gate_result.npz")
    cli_main(["verify-release", release_tree["root"],
              "--config", release_tree["config"],
              "--seed", str(_SAFE_SEED),
              "--budget-s", "600", "--out", out])
    card = json.loads(capsys.readouterr().out)
    assert card["ok"]
    for name in ("artifacts_present", "formats_load", "checkpoint_loads",
                 "wall_under_budget", "subsample_reference_parity",
                 "decode_shapes"):
        assert card["checks"][name]["ok"], name
    assert os.path.exists(out)


def test_verify_release_expected_parity(release_tree, capsys):
    """--expected: the gate's reference-ties output must be byte-identical
    to a result produced by the ACTUAL reference implementation on the
    same artifacts."""
    paths = release_tree["paths"]
    gk = _import_reference(paths)
    ref = _run_reference(gk, paths, use_wavvq=True)
    exp_path = str(release_tree["tmp"] / "reference_result.npz")
    np.savez(exp_path, knn_pred=ref)

    capsys.readouterr()  # drain the reference run's own prints
    cli_main(["verify-release", release_tree["root"],
              "--config", release_tree["config"],
              "--seed", str(_SAFE_SEED),
              "--budget-s", "600", "--expected", exp_path])
    card = json.loads(capsys.readouterr().out)
    assert card["ok"]
    assert card["checks"]["expected_result_parity"]["ok"]


def test_verify_release_missing_artifacts(tmp_path, capsys):
    """An empty tree fails the artifacts gate with a non-zero exit."""
    with pytest.raises(SystemExit):
        cli_main(["verify-release", str(tmp_path)])
    card = json.loads(capsys.readouterr().out)
    assert not card["ok"]
    assert not card["checks"]["artifacts_present"]["ok"]
