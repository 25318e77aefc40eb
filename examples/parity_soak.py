"""Randomized engine/oracle parity soak.

Sweeps every mode preset over many random fixtures, asserting the device
engine selects bit-identical codebook indices to the NumPy oracle. This is
the long-form insurance behind tests/test_match_parity.py (which pins one
fixture per preset): run it after any change to the scoring path.

    # hermetic CPU run (any machine)
    JAX_PLATFORMS=cpu python examples/parity_soak.py 25
    # live backend (real chip): also covers MXU numerics
    python examples/parity_soak.py 5
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


def run(n_per_preset: int) -> int:
    print(f"backend: {jax.default_backend()}", flush=True)
    bad = runs = 0
    for preset in PRESETS:
        for i in range(n_per_preset):
            seed = 90000 + zlib.crc32(preset.encode()) % 5000 + 131 * i
            rng = np.random.RandomState(seed)
            fx = make_fixture(rng, n_seq=4, n_test=2, codebook=64)
            cfg = MatchConfig(**{**MATCH_PRESETS[preset].__dict__,
                                 "codebook_size": 64})
            db = stage_database(cfg, fx["bundle"], fx["codes"],
                                fx["signature"], wavlm=fx["wavlm"],
                                wavvq=fx["wavvq"])
            ta = stage_test_audio(cfg, db, test_bundle=fx["test_bundle"],
                                  wavlm=fx["test_wavlm"],
                                  wavvq=fx["test_wavvq"]) \
                if cfg.use_aud else None
            tc = stage_test_context(db, fx["test_context"]) \
                if cfg.use_txt else None
            ro = CodeKNNOracle(db).predict(
                ta, tc, rng=np.random.RandomState(cfg.seed))
            re_ = CodeKNNEngine(cfg, db).predict(
                ta, tc, rng=np.random.RandomState(cfg.seed))
            runs += 1
            if not np.array_equal(ro.codes, re_.codes):
                bad += 1
                print(f"MISMATCH {preset} seed={seed}", flush=True)
        print(f"{preset} done", flush=True)
    print(f"soak complete: {runs} runs, {bad} mismatches", flush=True)
    return bad


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 25
    sys.exit(1 if run(n) else 0)
