"""Quantify the stable-vs-introsort tie-order divergence on the wavvq path.

The reference ranks candidates with NumPy's default unstable introsort
(argsort().argsort(), GestureKNN.py:540,553); this framework's default
device engine uses stable (index-ordered) ties. Integer Levenshtein
distances tie heavily, so the two CAN select different codebook indices —
`engine.predict_reference_ties` exists for byte-identical output, but how
often does the default path actually diverge?

This sweep runs N randomized fixtures through both fusions (identical
device-computed phase-1 candidate tables; only the tie policy differs) and
reports: the fraction of clips with any differing index, the fraction of
indices differing overall, and the per-clip max. Run on CPU or chip:

    python examples/tie_divergence_sweep.py [n_fixtures]
"""
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))

import numpy as np  # noqa: E402

from qpgesture_tpu.core.config import MATCH_PRESETS, MatchConfig  # noqa: E402
from qpgesture_tpu.match.database import (stage_database,  # noqa: E402
                                          stage_test_audio,
                                          stage_test_context)
from qpgesture_tpu.match.engine import CodeKNNEngine  # noqa: E402

from fixtures import make_fixture  # noqa: E402


def main(n_fixtures: int = 40) -> dict:
    clip_div = []
    idx_div = []
    for i in range(n_fixtures):
        rng = np.random.RandomState(10_000 + i)
        fx = make_fixture(rng, n_seq=6, n_test=3, codebook=128)
        cfg = MatchConfig(**{**MATCH_PRESETS["wavvq"].__dict__,
                             "codebook_size": 128})
        db = stage_database(cfg, fx["bundle"], fx["codes"], fx["signature"],
                            wavvq=fx["wavvq"])
        ta = stage_test_audio(cfg, db, wavvq=fx["test_wavvq"])
        tc = stage_test_context(db, fx["test_context"])
        engine = CodeKNNEngine(cfg, db)
        stable = engine.predict(ta, tc,
                                rng=np.random.RandomState(cfg.seed)).codes
        ref = engine.predict_reference_ties(
            ta, tc, rng=np.random.RandomState(cfg.seed)).codes
        diff = (stable != ref)
        clip_div.append(bool(diff.any()))
        idx_div.append(float(diff.mean()))
    out = {
        "n_fixtures": n_fixtures,
        "clips_with_any_divergence": float(np.mean(clip_div)),
        "mean_index_divergence": float(np.mean(idx_div)),
        "max_index_divergence": float(np.max(idx_div)),
    }
    print(out)
    return out


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 40)
