"""On-chip engine/oracle parity sweep.

The CPU-mesh test suite cannot catch TPU-only numeric divergence (the MXU's
default bf16 multiplies — the reason engine distances force
Precision.HIGHEST). This script runs the same preset sweep as
tests/test_match_parity.py::test_engine_matches_oracle but on whatever
backend JAX picks (the real chip under axon), comparing the device engine's
selected codebook indices against the NumPy oracle bit-for-bit.

Usage:  python examples/chip_parity_sweep.py [n_fixtures_per_preset]
            [--cosine-precision=highest|high|default]
            [--feat-dtype=float32|bfloat16|float16]

--cosine-precision overrides the audio-distance MXU precision for every
cosine preset (MatchConfig.cosine_precision): the parity evidence for the
opt-in 3-pass 'high' fast path is this sweep staying clean with it.
--feat-dtype stages the audio feature DB at the given HBM residency dtype
(MatchConfig.feat_dtype, the whole-corpus single-chip mode); the sweep
quantifies its index divergence vs the f32 oracle per preset.
"""
import os
import sys
import zlib

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))

import jax  # noqa: E402

from fixtures import make_fixture  # noqa: E402
from qpgesture_tpu.core.config import MATCH_PRESETS, MatchConfig  # noqa: E402
from qpgesture_tpu.match.database import (stage_database,  # noqa: E402
                                          stage_test_audio,
                                          stage_test_context)
from qpgesture_tpu.match.engine import CodeKNNEngine  # noqa: E402
from qpgesture_tpu.match.oracle import CodeKNNOracle  # noqa: E402

PRESETS = ["wavvq", "shipped", "no_phase", "no_text", "no_audio", "mfcc",
           "wavvq_aud_only", "wavlm_raw", "mfcc_raw"]


def run_gesture_knn(n_fixtures: int = 3) -> int:
    """Raw-pose GestureKNN engine vs NumPy oracle on the live backend —
    its pose/audio distances also go through MXU contractions."""
    from qpgesture_tpu.match.gesture_knn import (GestureKNNData,
                                                 GestureKNNEngine,
                                                 search_motion_np)
    mismatches = 0
    for i in range(n_fixtures):
        rng = np.random.RandomState(31 + i)
        K, L, A, P, J = 5, 64, 12, 8, 15
        db = GestureKNNData(
            feat=rng.randn(K, L, A + P).astype(np.float32),
            motion=rng.randn(K, L, J).astype(np.float32),
            control_mask=np.ones((K, L)), n_aud=A)
        feat_test = rng.randn(A, 64).astype(np.float32)
        got = GestureKNNEngine(db).search_motion(feat_test, init_seq=1,
                                                 init_frm=10)
        want = search_motion_np(db, feat_test, init_seq=1, init_frm=10)
        same = np.allclose(got, want, atol=1e-5)
        print(f"gesture_knn      fixture {i}: {'OK' if same else 'MISMATCH'}",
              flush=True)
        mismatches += 0 if same else 1
    return mismatches


def run_long_clip() -> int:
    """3600-frame (60 s) single-window matching on the live backend — the
    reference's long-clip mfcc variant (113 steps x 4 codes, 450 kept)."""
    from test_match_parity import _make_long_fixture
    rng = np.random.RandomState(3600)
    fx = _make_long_fixture(rng)
    cfg = MatchConfig(**{**MATCH_PRESETS["mfcc"].__dict__,
                         "codebook_size": 48,
                         "num_frames": 3600, "num_frames_code": 450})
    db = stage_database(cfg, fx["bundle"], fx["codes"], fx["signature"])
    ta = stage_test_audio(cfg, db, test_bundle=fx["test_bundle"])
    res_o = CodeKNNOracle(db).predict(
        ta, None, rng=np.random.RandomState(cfg.seed))
    res_e = CodeKNNEngine(cfg, db).predict(
        ta, None, rng=np.random.RandomState(cfg.seed))
    same = np.array_equal(res_o.codes, res_e.codes)
    print(f"long_clip_3600   : {'OK' if same else 'MISMATCH'}", flush=True)
    return 0 if same else 1


def run(n_fixtures: int = 3, cosine_precision: str = "highest",
        feat_dtype: str = "float32") -> int:
    print(f"backend: {jax.default_backend()} "
          f"({len(jax.devices())} device(s)), "
          f"cosine_precision={cosine_precision}, feat_dtype={feat_dtype}")
    mismatches = 0
    for preset in PRESETS:
        for i in range(n_fixtures):
            seed = 2024 + zlib.crc32(preset.encode()) % 1000 + 7919 * i
            rng = np.random.RandomState(seed)
            fx = make_fixture(rng, n_seq=4, n_test=2, codebook=64)
            cfg = MatchConfig(**{**MATCH_PRESETS[preset].__dict__,
                                 "codebook_size": 64,
                                 "cosine_precision": cosine_precision,
                                 "feat_dtype": feat_dtype})
            db = stage_database(cfg, fx["bundle"], fx["codes"],
                                fx["signature"], wavlm=fx["wavlm"],
                                wavvq=fx["wavvq"])
            ta = stage_test_audio(cfg, db, test_bundle=fx["test_bundle"],
                                  wavlm=fx["test_wavlm"],
                                  wavvq=fx["test_wavvq"]) \
                if cfg.use_aud else None
            tc = stage_test_context(db, fx["test_context"]) \
                if cfg.use_txt else None
            res_o = CodeKNNOracle(db).predict(
                ta, tc, rng=np.random.RandomState(cfg.seed))
            res_e = CodeKNNEngine(cfg, db).predict(
                ta, tc, rng=np.random.RandomState(cfg.seed))
            same = np.array_equal(res_o.codes, res_e.codes)
            n_diff = int((res_o.codes != res_e.codes).sum())
            print(f"{preset:16s} fixture {i}: "
                  f"{'OK' if same else f'MISMATCH ({n_diff} codes)'}",
                  flush=True)
            mismatches += 0 if same else 1
    mismatches += run_gesture_knn(n_fixtures)
    mismatches += run_long_clip()
    print("PARITY CLEAN" if mismatches == 0 else
          f"{mismatches} runs mismatched")
    return mismatches


if __name__ == "__main__":
    prec = "highest"
    fdt = "float32"
    args = []
    for a in sys.argv[1:]:
        if a.startswith("--cosine-precision="):
            prec = a.split("=", 1)[1]
        elif a.startswith("--feat-dtype="):
            fdt = a.split("=", 1)[1]
        else:
            args.append(a)
    n = int(args[0]) if args else 3
    sys.exit(1 if run(n, cosine_precision=prec, feat_dtype=fdt) else 0)
