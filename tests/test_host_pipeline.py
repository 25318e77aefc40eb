"""Host pipeline edges: audio prep (resample/normalize with graceful
degradation), gentle orchestration, step-1 orig-BEAT assembly, the
train-resync CLI, and raw-44.1 kHz build-db ingestion."""
import json
import os
import stat
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from qpgesture_tpu.cli import main as cli_main  # noqa: E402
from qpgesture_tpu.pipelines.audio_prep import (ensure_16k_wav,  # noqa: E402
                                                normalize_wav, read_wav,
                                                resample_wav, write_wav)
from qpgesture_tpu.pipelines.beat_assembly import (  # noqa: E402
    assemble_beat_dataset, find_paired_recordings, repair_bvh_frames_header)
from qpgesture_tpu.pipelines.transcripts import (GentleUnavailable,  # noqa: E402
                                                 run_gentle)

from test_build_db_cli import make_beat_like_bvh  # noqa: E402


# ----------------------------------------------------------------------
# audio prep
# ----------------------------------------------------------------------

def _write_sine(path, sr, secs=0.5, hz=440.0, amp=0.25):
    t = np.arange(int(sr * secs)) / sr
    write_wav(path, amp * np.sin(2 * np.pi * hz * t), sr)


def test_resample_python_fallback(tmp_path):
    src = str(tmp_path / "a441.wav")
    _write_sine(src, 44100)
    out = str(tmp_path / "a16.wav")
    backend = resample_wav(src, out, 16000, prefer="python")
    assert backend == "python"
    wav, sr = read_wav(out)
    assert sr == 16000
    assert abs(len(wav) - 8000) <= 2
    # the 440 Hz tone survives: dominant FFT bin within 2 bins of 440
    spec = np.abs(np.fft.rfft(wav))
    peak_hz = np.argmax(spec) * 16000 / len(wav)
    assert abs(peak_hz - 440) < 5


def test_normalize_python_fallback(tmp_path):
    src = str(tmp_path / "quiet.wav")
    _write_sine(src, 44100, amp=0.01)
    out = str(tmp_path / "norm.wav")
    backend = normalize_wav(src, out, prefer="python")
    assert backend == "python"
    wav, sr = read_wav(out)
    assert sr == 16000
    rms_db = 20 * np.log10(np.sqrt(np.mean(wav ** 2)))
    assert abs(rms_db - (-23.0)) < 1.0


def test_ensure_16k_passthrough_and_convert(tmp_path):
    ok = str(tmp_path / "ok.wav")
    _write_sine(ok, 16000)
    assert ensure_16k_wav(ok, str(tmp_path / "w")) == ok
    bad = str(tmp_path / "bad.wav")
    _write_sine(bad, 22050)
    got = ensure_16k_wav(bad, str(tmp_path / "w"))
    assert got != bad
    _, sr = read_wav(got)
    assert sr == 16000


# ----------------------------------------------------------------------
# gentle orchestration
# ----------------------------------------------------------------------

def test_run_gentle_unavailable(tmp_path, monkeypatch):
    monkeypatch.delenv("GENTLE_URL", raising=False)
    monkeypatch.delenv("GENTLE_CMD", raising=False)
    with pytest.raises(GentleUnavailable):
        run_gentle(str(tmp_path / "a.wav"), "hello world")


def test_run_gentle_cmd(tmp_path):
    """A fake gentle CLI (prints gentle JSON) drives the full orchestration
    path, including the reference's neighbor interpolation for interior
    failed words (process_beat_txt.py:70-72)."""
    wav = str(tmp_path / "a.wav")
    _write_sine(wav, 16000)
    payload = {"words": [
        {"case": "success", "word": "hello", "alignedWord": "hello",
         "start": 0.1, "end": 0.4},
        {"case": "not-found-in-audio", "word": "brave"},
        {"case": "success", "word": "world", "alignedWord": "world",
         "start": 0.9, "end": 1.3},
    ]}
    script = tmp_path / "fake_gentle.py"
    script.write_text("#!/usr/bin/env python3\nimport json\n"
                      f"print(json.dumps({payload!r}))\n")
    script.chmod(script.stat().st_mode | stat.S_IEXEC)
    words = run_gentle(wav, "hello brave world",
                       gentle_cmd=f"{sys.executable} {script}")
    assert words == [(0.1, 0.4, "hello"), (0.4, 0.9, "brave"),
                     (0.9, 1.3, "world")]


# ----------------------------------------------------------------------
# step-1 orig-BEAT assembly
# ----------------------------------------------------------------------

def _orig_beat_tree(tmp_path, rng):
    root = tmp_path / "orig_BEAT"
    for speaker, names in (("1", ["1_a_0_1_8"]),
                           ("10", ["10_b_0_1_8", "10_b_0_103_110"])):
        d = root / speaker
        d.mkdir(parents=True)
        for n in names:
            (d / f"{n}.bvh").write_text(make_beat_like_bvh(rng, 120))
            _write_sine(str(d / f"{n}.wav"), 16000)
    # unpaired wav must be dropped
    _write_sine(str(root / "10" / "10_lonely_0_1_8.wav"), 16000)
    return str(root)


def test_assemble_beat(tmp_path, rng):
    root = _orig_beat_tree(tmp_path, rng)
    out = str(tmp_path / "dataset")
    summary = assemble_beat_dataset(root, out)
    assert summary["n_pairs"] == 3
    assert sorted(os.listdir(summary["motion_dir"])) == \
        ["10_b_0_103_110.bvh", "10_b_0_1_8.bvh", "1_a_0_1_8.bvh"]
    assert "10_lonely_0_1_8.wav" not in os.listdir(summary["audio_dir"])
    # speaker filter
    out2 = str(tmp_path / "dataset10")
    s2 = assemble_beat_dataset(root, out2, speakers=["10"])
    assert s2["n_pairs"] == 2


def test_repair_bvh_frames_header(tmp_path, rng):
    from qpgesture_tpu.motion.bvh import parse_bvh
    good = make_beat_like_bvh(rng, 50)
    path = tmp_path / "broken.bvh"
    # corrupt the header like orig-BEAT does (off-by-N frame counts)
    path.write_text(good.replace("Frames: 50", "Frames: 444"))
    assert repair_bvh_frames_header(str(path))
    fixed = path.read_text()
    assert "Frames: 50" in fixed
    assert parse_bvh(fixed).values.shape[0] == 50
    # a correct file is left untouched
    ok = tmp_path / "ok.bvh"
    ok.write_text(good)
    assert not repair_bvh_frames_header(str(ok))
    assert ok.read_text() == good
    # non-integer Frames counts (some BEAT files) must repair, not crash
    frac = tmp_path / "frac.bvh"
    frac.write_text(good.replace("Frames: 50", "Frames: 444.0"))
    assert repair_bvh_frames_header(str(frac))
    assert "Frames: 50" in frac.read_text()


def test_assemble_beat_cli(tmp_path, rng):
    root = _orig_beat_tree(tmp_path, rng)
    out = str(tmp_path / "ds_cli")
    cli_main(["assemble-beat", "--orig-root", root, "--out", out,
              "--resample"])
    assert len(os.listdir(os.path.join(out, "Audio_16k"))) == 3


# ----------------------------------------------------------------------
# train-resync CLI
# ----------------------------------------------------------------------

def test_train_resync_cli(tmp_path, rng):
    data = str(tmp_path / "resync.npz")
    np.savez(data, knn=rng.randn(6, 32, 14).astype(np.float32),
             real=rng.randn(6, 32, 14).astype(np.float32))
    out = str(tmp_path / "resync_ckpt")
    cli_main(["train-resync", "--data", data, "--n-joints", "9",
              "--iters", "3", "--batch-size", "4", "--out", out])
    assert os.path.isdir(out)


# ----------------------------------------------------------------------
# build-db ingests raw 44.1 kHz audio
# ----------------------------------------------------------------------

def test_build_db_raw_441khz(tmp_path, rng):
    bvh_dir = tmp_path / "bvh"
    wav_dir = tmp_path / "wav"
    bvh_dir.mkdir()
    wav_dir.mkdir()
    for name in ("1_demo_0_1_8", "1_demo_0_103_110"):
        (bvh_dir / f"{name}.bvh").write_text(make_beat_like_bvh(rng, 600))
        _write_sine(str(wav_dir / f"{name}.wav"), 44100, secs=11.0)
    out = str(tmp_path / "db")
    cli_main(["build-db", "--bvh-dir", str(bvh_dir), "--wav-dir",
              str(wav_dir), "--out", out, "--prefix", "spk",
              "--hashed-context"])
    bundle = np.load(os.path.join(out, "spk_train_240_txt_2.npz"),
                     allow_pickle=True)
    assert bundle["wav"].shape[1] == 64000  # 16 kHz x 4 s windows


# ----------------------------------------------------------------------
# Trinity/GENEA variant (trinity_data_to_lmdb.py:28-80): same 15 target
# joints, 60 fps native BVH, extra finger joints dropped by selection,
# rotation + mirror and position modes
# ----------------------------------------------------------------------

def make_trinity_like_bvh(rng, n_frames, fps=60):
    """GENEA2020/Trinity-style skeleton: the 15 target joints plus finger
    chains and legs that JointSelector must drop, 60 fps capture."""
    def joint(name, children, offset=(0.0, 5.0, 0.0)):
        kids = "".join(children)
        return (f"JOINT {name}\n{{\nOFFSET {offset[0]} {offset[1]} "
                f"{offset[2]}\nCHANNELS 3 Zrotation Xrotation Yrotation\n"
                f"{kids}}}\n")

    end = "End Site\n{\nOFFSET 0.0 2.0 0.0\n}\n"
    head = joint("Head", [end])
    neck1 = joint("Neck1", [head])
    neck = joint("Neck", [neck1])
    rthumb = joint("RightHandThumb1", [end], (-1.0, 0.0, 0.0))
    rindex = joint("RightHandIndex1", [end], (-1.0, 0.5, 0.0))
    rhand = joint("RightHand", [rthumb, rindex])
    rfore = joint("RightForeArm", [rhand])
    rarm = joint("RightArm", [rfore], (-3.0, 0.0, 0.0))
    rsh = joint("RightShoulder", [rarm], (-2.0, 4.0, 0.0))
    lthumb = joint("LeftHandThumb1", [end], (1.0, 0.0, 0.0))
    lindex = joint("LeftHandIndex1", [end], (1.0, 0.5, 0.0))
    lhand = joint("LeftHand", [lthumb, lindex])
    lfore = joint("LeftForeArm", [lhand])
    larm = joint("LeftArm", [lfore], (3.0, 0.0, 0.0))
    lsh = joint("LeftShoulder", [larm], (2.0, 4.0, 0.0))
    spine3 = joint("Spine3", [neck, rsh, lsh])
    spine2 = joint("Spine2", [spine3])
    spine1 = joint("Spine1", [spine2])
    spine = joint("Spine", [spine1])
    rleg = joint("RightUpLeg", [end], (-3.0, -4.0, 0.0))
    lleg = joint("LeftUpLeg", [end], (3.0, -4.0, 0.0))
    hierarchy = ("HIERARCHY\nROOT Hips\n{\nOFFSET 0 0 0\n"
                 "CHANNELS 6 Xposition Yposition Zposition Zrotation "
                 "Xrotation Yrotation\n" + spine + rleg + lleg + "}\n"
                 "MOTION\n")
    n_joints = 1 + 19 + 2  # root + upper chain incl. fingers + legs
    n_ch = 6 + 3 * (n_joints - 1)
    vals = np.round(rng.randn(n_frames, n_ch) * 15, 4)
    lines = "\n".join(" ".join("%.4f" % v for v in row) for row in vals)
    return (hierarchy + f"Frames: {n_frames}\n"
            f"Frame Time: {1.0 / fps:.6f}\n" + lines + "\n")


def test_trinity_variant_pipeline(tmp_path, rng):
    """The Trinity/GENEA pipeline variant: rotation mode with mirror (the
    (original, mirrored) pair of trinity_data_to_lmdb.process_bvh) and the
    position mode's root-padded (T, 45) layout."""
    from qpgesture_tpu.motion.bvh import parse_bvh
    from qpgesture_tpu.motion.fk import positions_for_render
    from qpgesture_tpu.motion.pipeline import MotionPipeline

    bvh = parse_bvh(make_trinity_like_bvh(rng, 120))
    pipe = MotionPipeline(fps=60).fit(bvh)

    # rotation mode: (T, 45) euler -> (T, 135) rotmats for both the
    # original and the mirrored clip (the (out_matrix[0], out_matrix[1])
    # pair of trinity_data_to_lmdb.process_bvh). The reference's
    # DownSampler slices [0:-1:rate], dropping the final frame: 120 -> 119.
    from qpgesture_tpu.motion.rotations import poses_to_matrices
    euler = pipe.transform(bvh)
    euler_m = pipe.transform(bvh, mirror=True)
    assert euler.shape == (119, 45) and euler_m.shape == (119, 45)
    rot = poses_to_matrices(euler)
    rot_m = poses_to_matrices(euler_m)
    assert rot.shape == (119, 135) and rot_m.shape == (119, 135)
    assert np.isfinite(rot).all() and np.isfinite(rot_m).all()
    assert not np.allclose(rot, rot_m)

    # round trip through inverse (constant channels and skeleton restored)
    back = pipe.inverse(euler)
    assert back.values.shape[0] == 119

    # position mode: FK over root + 15 targets; the reference's variant
    # zero-pads the removed root translation back and asserts 15*3 columns
    # (trinity_data_to_lmdb.py:51-53)
    pos = positions_for_render(
        bvh, joints_subset=[bvh.root_name] + list(pipe.target_joints))
    assert pos.shape == (120, 16 * 3)
    flat = pos[:, 3:]
    assert flat.shape[1] == 15 * 3
    assert np.isfinite(flat).all()


def test_trinity_variant_build_db(tmp_path, rng):
    """build-db ingests Trinity-style 60 fps BVH recordings end to end."""
    bvh_dir = tmp_path / "bvh"
    wav_dir = tmp_path / "wav"
    bvh_dir.mkdir()
    wav_dir.mkdir()
    for name in ("1_rec_0_1_8", "1_rec_0_103_110"):
        (bvh_dir / f"{name}.bvh").write_text(make_trinity_like_bvh(rng, 300))
        _write_sine(str(wav_dir / f"{name}.wav"), 16000, secs=5.5)
    out = str(tmp_path / "db")
    cli_main(["build-db", "--bvh-dir", str(bvh_dir), "--wav-dir",
              str(wav_dir), "--out", out, "--prefix", "trin",
              "--fps", "60", "--hashed-context"])
    bundle = np.load(os.path.join(out, "trin_train_240_txt_2.npz"),
                     allow_pickle=True)
    assert bundle["body"].shape[1:] == (240, 135)


def test_tab_transcript_rejects_raw_text_with_tabs(tmp_path):
    """A raw (unaligned) transcript whose prose happens to contain tabs
    must parse as 'not a tab transcript' (-> []), not crash with
    ValueError (review finding: build-db --gentle relied on [] to trigger
    alignment)."""
    from qpgesture_tpu.pipelines.transcripts import read_tab_transcript
    p = tmp_path / "raw.txt"
    p.write_text("so\tI said\tokay then\nand more plain text\n")
    assert read_tab_transcript(str(p)) == []
    # a real tab transcript still parses
    p2 = tmp_path / "aligned.txt"
    p2.write_text("0.5\t0.9\thello\n1.0\t1.4\tworld\n")
    assert read_tab_transcript(str(p2)) == [(0.5, 0.9, "hello"),
                                            (1.0, 1.4, "world")]


def test_read_wav_24bit_and_float(tmp_path):
    """24-bit PCM and IEEE-float wavs read through the pure-python path
    (review finding: the no-ffmpeg ingestion fallback rejected them)."""
    import struct
    import wave as wavemod

    from qpgesture_tpu.pipelines.audio_prep import load_wav_16k, read_wav

    sr = 16000
    t = np.arange(sr // 4) / sr
    sig = 0.25 * np.sin(2 * np.pi * 440 * t)

    # 24-bit PCM via the stdlib wave module
    p24 = str(tmp_path / "a24.wav")
    pcm = np.clip(sig * 8388608.0, -8388608, 8388607).astype(np.int32)
    raw = b"".join(struct.pack("<i", v)[:3] for v in pcm)
    with wavemod.open(p24, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(3)
        f.setframerate(sr)
        f.writeframes(raw)
    wav, got_sr = read_wav(p24)
    assert got_sr == sr
    np.testing.assert_allclose(wav, sig, atol=2e-6)

    # IEEE-float wav via scipy
    from scipy.io import wavfile
    pf = str(tmp_path / "af32.wav")
    wavfile.write(pf, 44100, np.interp(
        np.linspace(0, 1, 11025), np.linspace(0, 1, len(sig)),
        sig).astype(np.float32))
    out = load_wav_16k(pf)
    assert out.dtype == np.float32 and len(out) > 0
