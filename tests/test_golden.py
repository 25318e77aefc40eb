"""Frozen golden outputs: the engine's selected code indices for seeded
fixtures, pinned at the round where cross-validation against the actual
reference implementation passed. Catches silent semantic drift that a
co-evolving oracle would miss."""
import os

import numpy as np
import pytest

from qpgesture_tpu.core.config import MATCH_PRESETS, MatchConfig
from qpgesture_tpu.match.database import (stage_database, stage_test_audio,
                                          stage_test_context)
from qpgesture_tpu.match.engine import CodeKNNEngine

from fixtures import make_fixture

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


@pytest.mark.parametrize("preset", ["wavvq", "shipped"])
def test_golden_codes(preset):
    rng = np.random.RandomState(31337)
    fx = make_fixture(rng, n_seq=5, n_test=2, codebook=128)
    cfg = MatchConfig(**{**MATCH_PRESETS[preset].__dict__,
                         "codebook_size": 128})
    db = stage_database(cfg, fx["bundle"], fx["codes"], fx["signature"],
                        wavlm=fx["wavlm"], wavvq=fx["wavvq"])
    ta = stage_test_audio(cfg, db, wavlm=fx["test_wavlm"],
                          wavvq=fx["test_wavvq"])
    tc = stage_test_context(db, fx["test_context"])
    engine = CodeKNNEngine(cfg, db)
    res = engine.predict(ta, tc, init_code=11,
                         init_phase=np.zeros((8, 16), np.float32))
    want = np.load(os.path.join(GOLDEN_DIR, f"{preset}_codes.npy"))
    np.testing.assert_array_equal(res.codes, want)


def test_golden_mfcc_codes():
    """mfcc ('feat') preset golden, pinned at the round where 240-frame AND
    3600-frame feat modes were cross-validated bit-exact against the actual
    reference (tests/test_reference_cross.py::test_reference_cross_feat_*).
    Fresh-init-per-window (chain_windows=False) semantics included."""
    rng = np.random.RandomState(31337)
    fx = make_fixture(rng, n_seq=5, n_test=2, codebook=128)
    cfg = MatchConfig(**{**MATCH_PRESETS["mfcc"].__dict__,
                         "codebook_size": 128})
    db = stage_database(cfg, fx["bundle"], fx["codes"], fx["signature"])
    ta = stage_test_audio(cfg, db, test_bundle=fx["test_bundle"])
    engine = CodeKNNEngine(cfg, db)
    res = engine.predict(ta, None, rng=np.random.RandomState(cfg.seed))
    path = os.path.join(GOLDEN_DIR, "mfcc_codes.npy")
    want = np.load(path)
    np.testing.assert_array_equal(res.codes, want)


def test_golden_long_clip_codes():
    """3600-frame long-clip golden (cross-validated against the reference
    with the long-mode constant.py patch)."""
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_match_parity import _make_long_fixture
    rng = np.random.RandomState(3600)
    fx = _make_long_fixture(rng)
    cfg = MatchConfig(**{**MATCH_PRESETS["mfcc"].__dict__,
                         "codebook_size": 48,
                         "num_frames": 3600, "num_frames_code": 450})
    db = stage_database(cfg, fx["bundle"], fx["codes"], fx["signature"])
    ta = stage_test_audio(cfg, db, test_bundle=fx["test_bundle"])
    engine = CodeKNNEngine(cfg, db)
    res = engine.predict(ta, None, rng=np.random.RandomState(cfg.seed))
    want = np.load(os.path.join(GOLDEN_DIR, "long3600_codes.npy"))
    np.testing.assert_array_equal(res.codes, want)
