"""Streaming-serving soak: steady-state latency of window-at-a-time
matching with persistent device seed state (serve.StreamingSession),
plus the multi-stream pool (serve.StreamingPool).

Simulates a live-audio client: one 4 s window arrives at a time; each
push uploads only that window's staged features and downloads 30 codes.
Reports steady-state p50/p95 per push for the wavvq and shipped (wavlm)
modes against a speaker-10-scale database, then the same workload with
16 concurrent streams multiplexed through one program per tick — the
pool's per-stream cost is the multiplexing win (one dispatch serves all
streams), and every stream is asserted bit-equal to its solo session.

    python examples/streaming_soak.py [n_windows]
"""
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

import numpy as np  # noqa: E402


def soak(mode: str, n_windows: int) -> dict:
    from qpgesture_tpu.core import constants as C
    from qpgesture_tpu.core.config import MATCH_PRESETS
    from qpgesture_tpu.core.schemas import CodebookSignature, DatabaseBundle
    from qpgesture_tpu.match.database import (stage_database,
                                              stage_test_audio,
                                              stage_test_context)
    from qpgesture_tpu.match.engine import CodeKNNEngine
    from qpgesture_tpu.serve import StreamingSession

    rng = np.random.RandomState(0)
    J, W = 1024, max(4, n_windows)
    bundle = DatabaseBundle(
        context=rng.randn(J, 30, C.CONTEXT_DIM).astype(np.float32),
        phase=rng.rand(J, C.NUM_FRAMES, 4, 8).astype(np.float32))
    codes = rng.randint(0, C.CODEBOOK_SIZE, size=(J, 30)).astype(np.int32)
    signature = CodebookSignature(
        code=np.tile(np.arange(C.CODEBOOK_SIZE)[:, None], (1, 30)),
        poses=np.zeros((C.CODEBOOK_SIZE, 1, 1), np.float32),
        signature=rng.randn(C.CODEBOOK_SIZE, C.POSE_DIM).astype(np.float32))
    if mode == "wavvq":
        cfg = MATCH_PRESETS["wavvq"]
        wavvq = rng.randint(0, C.WAVVQ_VOCAB,
                            size=(J, C.WAVVQ_FRAMES, 2)).astype(np.int32)
        test_wavvq = rng.randint(0, C.WAVVQ_VOCAB,
                                 size=(W, C.WAVVQ_FRAMES, 2)).astype(np.int32)
        db = stage_database(cfg, bundle, codes, signature, wavvq=wavvq)
        ta = stage_test_audio(cfg, db, wavvq=test_wavvq)
    else:
        cfg = MATCH_PRESETS["shipped"]
        wavlm = rng.randn(J, C.WAVLM_FRAMES, 1024).astype(np.float32)
        test_wavlm = rng.randn(W, C.WAVLM_FRAMES, 1024).astype(np.float32)
        db = stage_database(cfg, bundle, codes, signature, wavlm=wavlm)
        ta = stage_test_audio(cfg, db, wavlm=test_wavlm)
    tc = stage_test_context(db, rng.randn(W, 30, C.CONTEXT_DIM)
                            .astype(np.float32))

    engine = CodeKNNEngine(cfg, db)
    # whole-clip result for the bit-parity check
    want = engine.predict(ta, tc, rng=np.random.RandomState(cfg.seed)).codes

    sess = StreamingSession(engine, rng=np.random.RandomState(cfg.seed))
    times = []
    got = []
    for w in range(W):
        t0 = time.perf_counter()
        got.append(sess.push_window(ta[w], tc[w]))
        times.append(time.perf_counter() - t0)
    assert (np.stack(got) == want).all(), "streaming diverged from predict"
    steady = times[2:]  # drop compile + first-dispatch warmup
    return {
        "mode": mode, "windows": W,
        "p50_ms": round(float(np.percentile(steady, 50)) * 1e3, 2),
        "p95_ms": round(float(np.percentile(steady, 95)) * 1e3, 2),
        "first_push_ms": round(times[0] * 1e3, 1),
        "bit_equal_to_whole_clip": True,
    }


def soak_pool(mode: str, n_windows: int, n_streams: int = 16) -> dict:
    """16 live streams, one tick per window: per-tick latency and the
    per-stream bit-parity against solo sessions (first 4 windows)."""
    from qpgesture_tpu.core import constants as C
    from qpgesture_tpu.core.config import MATCH_PRESETS
    from qpgesture_tpu.core.schemas import CodebookSignature, DatabaseBundle
    from qpgesture_tpu.match.database import (stage_database,
                                              stage_test_audio,
                                              stage_test_context)
    from qpgesture_tpu.match.engine import CodeKNNEngine
    from qpgesture_tpu.serve import StreamingPool, StreamingSession

    rng = np.random.RandomState(1)
    J, W, S_STREAMS = 1024, max(4, n_windows), n_streams
    bundle = DatabaseBundle(
        context=rng.randn(J, 30, C.CONTEXT_DIM).astype(np.float32),
        phase=rng.rand(J, C.NUM_FRAMES, 4, 8).astype(np.float32))
    codes = rng.randint(0, C.CODEBOOK_SIZE, size=(J, 30)).astype(np.int32)
    signature = CodebookSignature(
        code=np.tile(np.arange(C.CODEBOOK_SIZE)[:, None], (1, 30)),
        poses=np.zeros((C.CODEBOOK_SIZE, 1, 1), np.float32),
        signature=rng.randn(C.CODEBOOK_SIZE, C.POSE_DIM).astype(np.float32))
    if mode == "wavvq":
        cfg = MATCH_PRESETS["wavvq"]
        wavvq = rng.randint(0, C.WAVVQ_VOCAB,
                            size=(J, C.WAVVQ_FRAMES, 2)).astype(np.int32)
        db = stage_database(cfg, bundle, codes, signature, wavvq=wavvq)

        def window(i, w):
            r = np.random.RandomState(1000 + 97 * i + w)
            tw = r.randint(0, C.WAVVQ_VOCAB,
                           size=(1, C.WAVVQ_FRAMES, 2)).astype(np.int32)
            return stage_test_audio(cfg, db, wavvq=tw)[0]
    else:
        cfg = MATCH_PRESETS["shipped"]
        wavlm = rng.randn(J, C.WAVLM_FRAMES, 1024).astype(np.float32)
        db = stage_database(cfg, bundle, codes, signature, wavlm=wavlm)

        def window(i, w):
            r = np.random.RandomState(1000 + 97 * i + w)
            tw = r.randn(1, C.WAVLM_FRAMES, 1024).astype(np.float32)
            return stage_test_audio(cfg, db, wavlm=tw)[0]

    def ctx_window(i, w):
        r = np.random.RandomState(5000 + 97 * i + w)
        return stage_test_context(
            db, r.randn(1, 30, C.CONTEXT_DIM).astype(np.float32))[0]

    engine = CodeKNNEngine(cfg, db)
    pool = StreamingPool(engine, S_STREAMS,
                         rngs=[np.random.RandomState(cfg.seed + i)
                               for i in range(S_STREAMS)])
    times = []
    pool_codes = []
    for w in range(W):
        ta = np.stack([window(i, w) for i in range(S_STREAMS)])
        tc = np.stack([ctx_window(i, w) for i in range(S_STREAMS)])
        t0 = time.perf_counter()
        pool_codes.append(pool.tick(ta, tc))
        times.append(time.perf_counter() - t0)

    # parity: first 4 windows of every stream vs solo sessions
    w_check = min(4, W)
    for i in range(S_STREAMS):
        sess = StreamingSession(engine,
                                rng=np.random.RandomState(cfg.seed + i))
        for w in range(w_check):
            got = sess.push_window(window(i, w), ctx_window(i, w))
            assert (got == pool_codes[w][i]).all(), \
                f"stream {i} window {w} diverged from solo session"

    steady = times[2:]
    p50 = float(np.percentile(steady, 50))
    return {
        "mode": mode, "streams": S_STREAMS, "windows": W,
        "tick_p50_ms": round(p50 * 1e3, 2),
        "tick_p95_ms": round(float(np.percentile(steady, 95)) * 1e3, 2),
        "per_stream_ms": round(p50 * 1e3 / S_STREAMS, 3),
        "gest_s_per_s": round(S_STREAMS * 4.0 / p50, 1),
        "first_tick_ms": round(times[0] * 1e3, 1),
        "streams_bit_equal_to_solo": True,
    }


def main(n_windows: int = 60):
    import json

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(_ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    out = [soak("wavvq", n_windows), soak("wavlm", n_windows),
           soak_pool("wavvq", min(n_windows, 20)),
           soak_pool("wavlm", min(n_windows, 20))]
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 60)
