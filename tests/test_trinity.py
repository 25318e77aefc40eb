"""Trinity/GENEA2020 builder (pipelines/trinity.py) vs the reference's
trinity_data_to_lmdb.py semantics: transcript parsing + normalize_string
(cross-checked against the reference's own utils), rotation/position clip
shapes, store round-trip, windowing schema, and the CLI path."""
import json
import os
import sys

import numpy as np
import pytest

from qpgesture_tpu.core import constants as C
from qpgesture_tpu.motion.bvh import parse_bvh
from qpgesture_tpu.pipelines.transcripts import normalize_string
from qpgesture_tpu.pipelines.trinity import (build_trinity_dataset,
                                             load_trinity_store,
                                             read_trinity_subtitle,
                                             trinity_position_clip,
                                             trinity_rotation_clip)

from test_motion import make_bvh_text


@pytest.mark.parametrize("s", [
    "Hello, World!", "shouldn't we go?", "  WEIRD   spacing\tstuff  ",
    "num6ers & sym*bols", "a.b,c!d?e", ""])
def test_normalize_string_matches_reference(s):
    # load by file path under a unique module name: a plain
    # `from utils.data_utils import ...` collides with the
    # Speech2GestureMatching `utils` module other cross-tests cache in
    # sys.modules
    import importlib.util
    path = "/root/reference/process/utils/data_utils.py"
    try:
        spec = importlib.util.spec_from_file_location(
            "_ref_process_data_utils", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        ref_norm = mod.normalize_string
    except Exception:
        pytest.skip("reference data_utils not importable")
    assert normalize_string(s) == ref_norm(s)


def _write_subtitle(path, words):
    """GENEA transcript JSON: Google-Speech layout the reference's
    SubtitleWrapper consumes (trinity_data_to_lmdb.py:137-151)."""
    data = [{"alternatives": [{"words": [
        {"start_time": f"{s}s", "end_time": f"{e}s", "word": w}
        for (s, e, w) in words]}]}]
    with open(path, "w") as f:
        json.dump(data, f)


def test_read_trinity_subtitle(tmp_path):
    p = str(tmp_path / "t.json")
    _write_subtitle(p, [(0.1, 0.5, "Hello,"), (0.6, 1.0, "shouldn't"),
                        (1.1, 1.2, "&&&")])  # third normalizes to empty
    got = read_trinity_subtitle(p)
    assert got == [(0.1, 0.5, "hello ,"), (0.6, 1.0, "shouldnt")]


def _fixture_split(base, rng, n_clips=2, n_frames=480):
    os.makedirs(os.path.join(base, "Motion"), exist_ok=True)
    os.makedirs(os.path.join(base, "Audio"), exist_ok=True)
    os.makedirs(os.path.join(base, "Transcripts"), exist_ok=True)
    from scipy.io import wavfile
    for i in range(n_clips):
        name = f"Recording_{i:03d}"
        with open(os.path.join(base, "Motion", name + ".bvh"), "w") as f:
            f.write(make_bvh_text(rng, n_frames=n_frames, fps=120)[0])
        wav = (rng.randn(16000 * (n_frames // 120)) * 3000).astype(np.int16)
        wavfile.write(os.path.join(base, "Audio", name + ".wav"), 16000, wav)
        _write_subtitle(os.path.join(base, "Transcripts", name + ".json"),
                        [(0.2, 0.5, "hello"), (0.8, 1.1, "world")])


def test_trinity_rotation_and_position_clips(rng):
    bvh = parse_bvh(make_bvh_text(rng, n_frames=48, fps=120)[0])
    poses, poses_mirror = trinity_rotation_clip(bvh)
    # 120 -> 60 fps halves frames; fixture has root + 6 selectable joints
    # of the 15 targets -> J joints x 9 rotmat dims
    assert poses.shape == poses_mirror.shape
    assert poses.shape[0] == 24 and poses.shape[1] % 9 == 0
    assert not np.allclose(poses, poses_mirror)
    # rows are valid rotation matrices: det(R) == 1
    R0 = poses[0].reshape(-1, 3, 3)
    np.testing.assert_allclose(np.linalg.det(R0), 1.0, atol=1e-5)

    pos = trinity_position_clip(bvh)
    assert pos.shape[0] == 24
    # 3 re-padded root zeros at the front (trinity_data_to_lmdb.py:51)
    np.testing.assert_array_equal(pos[:, :3], 0.0)
    # constant channels were removed: every remaining column varies
    assert (np.ptp(pos[:, 3:], axis=0) > 0).all()


def test_trinity_dataset_build_and_windowing(tmp_path, rng):
    """build-db --dataset trinity end to end on a synthetic fixture: the
    stores round-trip, mean/std match the accumulated pose tracks, and the
    clips window into the SAME schema the BEAT training store feeds
    (train/data.py window_clip -> (N, n_poses, C) + (N, samples))."""
    trn = str(tmp_path / "Training_data")
    val = str(tmp_path / "Test_data")
    _fixture_split(trn, rng)
    _fixture_split(val, rng, n_clips=1)

    out = build_trinity_dataset(trn, val, mode="rotation",
                                out_dir=str(tmp_path / "store"))
    clips_trn = load_trinity_store(out["train"])
    clips_val = load_trinity_store(out["test"])
    # rotation mode: original + mirrored per recording
    assert len(clips_trn) == 4 and len(clips_val) == 2
    assert clips_trn[0]["words"] == [(0.2, 0.5, "hello"),
                                     (0.8, 1.1, "world")]
    np.testing.assert_array_equal(clips_trn[0]["audio"],
                                  clips_trn[1]["audio"])  # mirror shares wav

    # stats accumulate originals only, train + val
    stats = np.load(out["stats"])
    originals = np.vstack([clips_trn[0]["poses"], clips_trn[2]["poses"],
                           clips_val[0]["poses"]])
    np.testing.assert_allclose(stats["mean"], originals.mean(axis=0),
                               atol=1e-6)
    np.testing.assert_allclose(stats["std"], originals.std(axis=0),
                               atol=1e-6)

    # windows: same schema as the BEAT store path
    from qpgesture_tpu.train.data import window_clip
    n_poses = 120
    pw, aw = window_clip(clips_trn[0]["poses"], clips_trn[0]["audio"],
                         n_poses=n_poses, stride=n_poses, fps=60)
    assert pw.ndim == 3 and pw.shape[1] == n_poses
    assert aw.shape == (pw.shape[0], int(n_poses / 60 * 16000))


def test_trinity_cli(tmp_path, rng, capsys):
    from qpgesture_tpu.cli import main as cli_main
    trn = str(tmp_path / "trn")
    val = str(tmp_path / "val")
    _fixture_split(trn, rng, n_clips=1)
    _fixture_split(val, rng, n_clips=1)
    cli_main(["build-db", "--dataset", "trinity",
              "--trn-path", trn, "--val-path", val,
              "--mode", "position",
              "--bvh-dir", "unused", "--wav-dir", "unused",
              "--out", str(tmp_path / "out")])
    out = capsys.readouterr().out
    assert "data mean/std" in out
    assert os.path.exists(str(tmp_path / "out" / "lmdb_train"))
    clips = load_trinity_store(str(tmp_path / "out" / "lmdb_train"))
    assert len(clips) == 1  # position mode: no mirror
    np.testing.assert_array_equal(clips[0]["poses"][:, :3], 0.0)
