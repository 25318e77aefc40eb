"""Host-side audio preparation: resample / loudness-normalize / PCM convert.

The reference shells out to ffmpeg-normalize for 16 kHz loudness
normalization (codebook/Speech2GestureMatching/normalize_audio.py:5-13) and
to sox for 16-bit signed conversion (process/make_beat_dataset.py:167).
These wrappers keep that behavior when the binaries exist and degrade
gracefully to pure-Python equivalents (scipy polyphase resampling, RMS
loudness normalization) so `build-db` can ingest a raw 44.1 kHz wav on a
box with no ffmpeg/sox installed.

All host-side and I/O-bound by design (SURVEY §2.9): none of this belongs
on the TPU.
"""
from __future__ import annotations

import os
import shutil
import subprocess
import wave
from typing import Optional, Tuple

import numpy as np


def have_binary(name: str) -> bool:
    return shutil.which(name) is not None


# ----------------------------------------------------------------------
# wav I/O (mono PCM16 via the stdlib wave module)
# ----------------------------------------------------------------------

def _read_wav_scipy(path: str) -> Tuple[np.ndarray, int]:
    """Fallback reader for formats the stdlib wave module rejects
    (IEEE-float wavs, WAVE_FORMAT_EXTENSIBLE)."""
    from scipy.io import wavfile
    sr, x = wavfile.read(path)
    x = np.asarray(x)
    if x.dtype == np.int16:
        x = x.astype(np.float32) / 32768.0
    elif x.dtype == np.int32:
        x = x.astype(np.float32) / 2147483648.0
    elif x.dtype == np.uint8:
        x = (x.astype(np.float32) - 128.0) / 128.0
    else:
        x = x.astype(np.float32)
    if x.ndim > 1:
        x = x.mean(axis=1)
    return x, int(sr)


def read_wav(path: str) -> Tuple[np.ndarray, int]:
    """Read a wav into float32 [-1, 1] mono. Returns (wav, sr). Handles
    8/16/24/32-bit PCM via the stdlib and IEEE-float via scipy."""
    try:
        with wave.open(path, "rb") as f:
            sr = f.getframerate()
            n_ch = f.getnchannels()
            width = f.getsampwidth()
            raw = f.readframes(f.getnframes())
    except wave.Error:
        return _read_wav_scipy(path)
    if width == 2:
        x = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
    elif width == 4:
        x = np.frombuffer(raw, np.int32).astype(np.float32) / 2147483648.0
    elif width == 3:
        b = np.frombuffer(raw, np.uint8).reshape(-1, 3).astype(np.uint32)
        u = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
        signed = u.astype(np.int32) - ((u >> 23) & 1).astype(np.int32) * (1 << 24)
        x = signed.astype(np.float32) / 8388608.0
    elif width == 1:
        x = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported sample width {width} in {path}")
    if n_ch > 1:
        x = x.reshape(-1, n_ch).mean(axis=1)
    return x, sr


def write_wav(path: str, wav: np.ndarray, sr: int) -> None:
    """Write float32 [-1, 1] mono as PCM16 (the reference's sox
    '-b 16 -e signed-integer' target format, make_beat_dataset.py:167)."""
    pcm = np.clip(np.asarray(wav, np.float64) * 32768.0,
                  -32768, 32767).astype(np.int16)
    d = os.path.dirname(path)
    if d:
        os.makedirs(d, exist_ok=True)
    with wave.open(path, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes(pcm.tobytes())


# ----------------------------------------------------------------------
# resampling
# ----------------------------------------------------------------------

def _resample_python(wav: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    from math import gcd
    g = gcd(sr_in, sr_out)
    up, down = sr_out // g, sr_in // g
    try:
        from scipy.signal import resample_poly
        return resample_poly(wav, up, down).astype(np.float32)
    except ImportError:  # last resort: linear interpolation
        n_out = int(round(len(wav) * sr_out / sr_in))
        t = np.linspace(0.0, len(wav) - 1, n_out)
        return np.interp(t, np.arange(len(wav)), wav).astype(np.float32)


def resample_wav(in_path: str, out_path: str, sr: int = 16000,
                 prefer: Optional[str] = None) -> str:
    """Resample to `sr` mono PCM16. Tries ffmpeg, then sox, then the
    pure-Python polyphase path. Returns which backend ran."""
    backends = [prefer] if prefer else ["ffmpeg", "sox", "python"]
    d = os.path.dirname(out_path)
    if d:
        os.makedirs(d, exist_ok=True)
    for b in backends:
        if b == "ffmpeg" and have_binary("ffmpeg"):
            subprocess.run(["ffmpeg", "-y", "-v", "error", "-i", in_path,
                            "-ar", str(sr), "-ac", "1", "-sample_fmt", "s16",
                            out_path], check=True)
            return "ffmpeg"
        if b == "sox" and have_binary("sox"):
            subprocess.run(["sox", in_path, "-r", str(sr), "-c", "1",
                            "-b", "16", "-e", "signed-integer", out_path],
                           check=True)
            return "sox"
        if b == "python":
            wav, sr_in = read_wav(in_path)
            out = wav if sr_in == sr else _resample_python(wav, sr_in, sr)
            write_wav(out_path, out, sr)
            return "python"
    raise RuntimeError(f"no resample backend available (tried {backends})")


# ----------------------------------------------------------------------
# loudness normalization (ffmpeg-normalize equivalent)
# ----------------------------------------------------------------------

def normalize_wav(in_path: str, out_path: str, sr: int = 16000,
                  target_rms_db: float = -23.0,
                  prefer: Optional[str] = None) -> str:
    """Loudness-normalize to 16 kHz mono PCM16.

    With ffmpeg-normalize installed this is exactly the reference command
    (`ffmpeg-normalize in -o out -ar 16000`, normalize_audio.py:12 — EBU
    R128 two-pass). With plain ffmpeg, a one-pass loudnorm filter. Without
    either, a documented RMS fallback to `target_rms_db` dBFS (-23 matches
    the R128 integrated-loudness target closely for speech)."""
    backends = [prefer] if prefer else ["ffmpeg-normalize", "ffmpeg",
                                        "python"]
    d = os.path.dirname(out_path)
    if d:
        os.makedirs(d, exist_ok=True)
    for b in backends:
        if b == "ffmpeg-normalize" and have_binary("ffmpeg-normalize"):
            subprocess.run(["ffmpeg-normalize", in_path, "-o", out_path,
                            "-ar", str(sr), "-f"], check=True)
            return "ffmpeg-normalize"
        if b == "ffmpeg" and have_binary("ffmpeg"):
            subprocess.run(["ffmpeg", "-y", "-v", "error", "-i", in_path,
                            "-af", "loudnorm=I=-23:TP=-2:LRA=7",
                            "-ar", str(sr), "-ac", "1", "-sample_fmt", "s16",
                            out_path], check=True)
            return "ffmpeg"
        if b == "python":
            wav, sr_in = read_wav(in_path)
            if sr_in != sr:
                wav = _resample_python(wav, sr_in, sr)
            rms = float(np.sqrt(np.mean(np.square(wav)) + 1e-12))
            gain = 10.0 ** (target_rms_db / 20.0) / max(rms, 1e-8)
            out = np.clip(wav * gain, -1.0, 1.0)
            write_wav(out_path, out, sr)
            return "python"
    raise RuntimeError(f"no normalize backend available (tried {backends})")


def ensure_16k_wav(path: str, workdir: str) -> str:
    """Return a path to a 16 kHz mono PCM16 version of `path`, converting
    into workdir when needed — lets `build-db` ingest raw 44.1 kHz input
    end to end (the reference requires a manual normalize_audio.py pass)."""
    try:
        with wave.open(path, "rb") as f:
            ok = (f.getframerate() == 16000 and f.getnchannels() == 1
                  and f.getsampwidth() == 2)
    except wave.Error:
        ok = False  # e.g. IEEE-float wav: convert below
    if ok:
        return path
    os.makedirs(workdir, exist_ok=True)
    out = os.path.join(
        workdir, os.path.splitext(os.path.basename(path))[0] + "_16k.wav")
    resample_wav(path, out, 16000)
    return out


def load_wav_16k(path: str) -> np.ndarray:
    """Read any supported wav as 16 kHz float32 mono, converting through a
    self-cleaning temp dir when needed (the one-stop ingestion helper for
    the CLI surfaces)."""
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        p = ensure_16k_wav(path, td)
        wav, sr = read_wav(p)
    assert sr == 16000
    return wav.astype(np.float32)
