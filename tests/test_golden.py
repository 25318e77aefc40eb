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
