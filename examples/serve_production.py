"""Production serving patterns on synthetic data at real tensor shapes.

Demonstrates the three serving modes of the matching engine:
  1. single clip  — engine.predict (one device program per clip shape);
  2. bucketed     — engine.predict_bucketed (arbitrary clip lengths share
                    compiled programs via window-count padding);
  3. batched      — engine.predict_batch (many independent clips fused
                    into ONE dispatch, seed chains reset per clip);
  4. multi-stream — serve.StreamingPool (C concurrent live sessions
                    advanced one window per tick, per-stream seeds
                    persistent in HBM).

Run: python examples/serve_production.py  (any backend; first compile on a
real chip takes ~20-40 s, cached afterwards).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from qpgesture_tpu.core import constants as C  # noqa: E402
from qpgesture_tpu.core.config import MATCH_PRESETS  # noqa: E402
from qpgesture_tpu.core.schemas import (CodebookSignature,  # noqa: E402
                                        DatabaseBundle)
from qpgesture_tpu.match.database import (stage_database,  # noqa: E402
                                          stage_test_audio,
                                          stage_test_context)
from qpgesture_tpu.match.engine import CodeKNNEngine  # noqa: E402


def main():
    rng = np.random.RandomState(0)
    J = 256  # database windows (use ~1024 for speaker-10 scale)
    cfg = MATCH_PRESETS["wavvq"]

    print("== staging database")
    bundle = DatabaseBundle(
        context=rng.randn(J, 30, C.CONTEXT_DIM).astype(np.float32),
        phase=rng.rand(J, C.NUM_FRAMES, 4, 8).astype(np.float32))
    codes = rng.randint(0, C.CODEBOOK_SIZE, size=(J, 30)).astype(np.int32)
    signature = CodebookSignature(
        code=np.tile(np.arange(C.CODEBOOK_SIZE)[:, None], (1, 30)),
        poses=np.zeros((C.CODEBOOK_SIZE, 1, 1), np.float32),
        signature=rng.randn(C.CODEBOOK_SIZE, C.POSE_DIM).astype(np.float32))
    wavvq = rng.randint(0, C.WAVVQ_VOCAB,
                        size=(J, C.WAVVQ_FRAMES, 2)).astype(np.int32)
    db = stage_database(cfg, bundle, codes, signature, wavvq=wavvq)
    engine = CodeKNNEngine(cfg, db)

    def make_clip(n_windows):
        tw = rng.randint(0, C.WAVVQ_VOCAB,
                         size=(n_windows, C.WAVVQ_FRAMES, 2)).astype(np.int32)
        tc = rng.randn(n_windows, 30, C.CONTEXT_DIM).astype(np.float32)
        return (stage_test_audio(cfg, db, wavvq=tw),
                stage_test_context(db, tc))

    print("== 1. single clip (6 windows = 24 s)")
    ta, tc = make_clip(6)
    t0 = time.perf_counter()
    res = engine.predict(ta, tc)
    print(f"   codes {res.codes.shape} in "
          f"{time.perf_counter() - t0:.2f}s (incl. compile)")

    print("== 2. bucketed: 3- and 4-window clips share one program")
    for w in (3, 4):
        ta, tc = make_clip(w)
        t0 = time.perf_counter()
        res = engine.predict_bucketed(ta, tc)
        print(f"   {w} windows -> {res.codes.shape} in "
              f"{time.perf_counter() - t0:.2f}s")

    print("== 3. batched: 4 clips x 2 windows in one dispatch")
    clips = [make_clip(2) for _ in range(4)]
    clip_audio = np.stack([a for a, _ in clips])
    clip_ctx = np.stack([c for _, c in clips])
    t0 = time.perf_counter()
    results = engine.predict_batch(clip_audio, clip_ctx)
    dt = time.perf_counter() - t0
    print(f"   {len(results)} clips in {dt:.2f}s "
          f"({sum(r.codes.shape[0] * 4 for r in results) / dt:.0f} "
          f"gest-s/s incl. compile)")

    print("== 4. multi-stream: 8 live sessions, one program per tick")
    from qpgesture_tpu.serve import StreamingPool
    pool = StreamingPool(engine, n_streams=8)
    for tick in range(3):
        ta = np.stack([make_clip(1)[0][0] for _ in range(8)])
        tc = np.stack([make_clip(1)[1][0] for _ in range(8)])
        t0 = time.perf_counter()
        out = pool.tick(ta, tc)
        print(f"   tick {tick}: {out.shape} codes for 8 streams in "
              f"{time.perf_counter() - t0:.3f}s"
              + (" (incl. compile)" if tick == 0 else ""))


if __name__ == "__main__":
    main()
