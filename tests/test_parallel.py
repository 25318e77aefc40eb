"""Sharded matching tests on the 8-device CPU mesh: the database-sharded
candidate reduction and the full sharded engine must match the single-device
engine bit-for-bit."""
import numpy as np

import jax.numpy as jnp

from qpgesture_tpu.core.config import MATCH_PRESETS, MatchConfig
from qpgesture_tpu.match.database import (stage_database, stage_test_audio,
                                          stage_test_context)
from qpgesture_tpu.match.engine import build_device_tables
from qpgesture_tpu.parallel.mesh import make_mesh
from qpgesture_tpu.parallel.sharded_match import (build_sharded_tables,
                                                  sharded_min_reduce_demo)

from fixtures import make_fixture


def test_sharded_min_reduce_demo():
    sharded_min_reduce_demo(make_mesh(8))


def test_sharded_tables_match_single_device():
    rng = np.random.RandomState(5)
    fx = make_fixture(rng, n_seq=6, n_test=2, codebook=64)
    for preset in ("wavvq", "shipped"):
        cfg = MatchConfig(**{**MATCH_PRESETS[preset].__dict__,
                             "codebook_size": 64})
        db = stage_database(cfg, fx["bundle"], fx["codes"], fx["signature"],
                            wavlm=fx["wavlm"], wavvq=fx["wavvq"])
        test_audio = stage_test_audio(cfg, db, wavlm=fx["test_wavlm"],
                                      wavvq=fx["test_wavvq"])
        test_context = stage_test_context(db, fx["test_context"])
        single = build_device_tables(cfg, db, test_audio, test_context)
        mesh = make_mesh(8)
        sharded = build_sharded_tables(cfg, db, mesh, test_audio,
                                       test_context)
        for name in ("aud_rank", "aud_block", "aud_seq", "aud_start",
                     "txt_rank", "txt_block", "txt_seq", "txt_start"):
            a = getattr(single, name)
            b = getattr(sharded, name)
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=f"{preset}:{name}")


def test_graft_entry_contract():
    """The driver contract: entry() compiles and dryrun_multichip(8) runs."""
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    import jax
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(float(out[1]))
    ge.dryrun_multichip(8)


def test_predict_sharded_matches_single_device():
    """Full sharded inference (J-sharded candidate scoring + replicated
    fusion scan) selects bit-identical codes to the single-device engine,
    in both shipped modes."""
    from qpgesture_tpu.core.config import MATCH_PRESETS, MatchConfig
    from qpgesture_tpu.match.database import (stage_database,
                                              stage_test_audio,
                                              stage_test_context)
    from qpgesture_tpu.match.engine import CodeKNNEngine
    from qpgesture_tpu.parallel.mesh import make_mesh

    import sys
    import os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from fixtures import make_fixture

    mesh = make_mesh(8)
    for preset in ("wavvq", "shipped"):
        rng = np.random.RandomState(606)
        fx = make_fixture(rng, n_seq=6, n_test=2, codebook=48)
        cfg = MatchConfig(**{**MATCH_PRESETS[preset].__dict__,
                             "codebook_size": 48})
        db = stage_database(cfg, fx["bundle"], fx["codes"], fx["signature"],
                            wavlm=fx["wavlm"], wavvq=fx["wavvq"])
        ta = stage_test_audio(cfg, db, wavlm=fx["test_wavlm"],
                              wavvq=fx["test_wavvq"])
        tc = stage_test_context(db, fx["test_context"])
        engine = CodeKNNEngine(cfg, db)
        want = engine.predict(ta, tc, rng=np.random.RandomState(cfg.seed))
        got = engine.predict_sharded(mesh, ta, tc,
                                     rng=np.random.RandomState(cfg.seed))
        np.testing.assert_array_equal(got.codes, want.codes)
        if want.phases is not None:
            np.testing.assert_allclose(got.phases, want.phases, atol=1e-5)


def test_predict_sharded_wavvq_sum_mode():
    """predict_sharded must handle the wavvq 'sum' layout ((Q, G, L)
    grouped strings) like the single-device engine."""
    from qpgesture_tpu.match.engine import CodeKNNEngine

    import dataclasses
    rng = np.random.RandomState(909)
    fx = make_fixture(rng, n_seq=4, n_test=1, codebook=48)
    cfg = dataclasses.replace(MATCH_PRESETS["wavvq"], codebook_size=48,
                              wavvq_mode="sum")
    db = stage_database(cfg, fx["bundle"], fx["codes"], fx["signature"],
                        wavvq=fx["wavvq"])
    ta = stage_test_audio(cfg, db, wavvq=fx["test_wavvq"])
    tc = stage_test_context(db, fx["test_context"])
    engine = CodeKNNEngine(cfg, db)
    want = engine.predict(ta, tc, rng=np.random.RandomState(cfg.seed))
    got = engine.predict_sharded(make_mesh(8), ta, tc,
                                 rng=np.random.RandomState(cfg.seed))
    np.testing.assert_array_equal(got.codes, want.codes)


def test_predict_sharded_nonchaining_multiwindow():
    """Non-chaining mfcc preset with W>1: the sharded path builds the same
    per-window re-seed resets (and rand interleave) as predict()."""
    from qpgesture_tpu.core.config import MATCH_PRESETS, MatchConfig
    from qpgesture_tpu.match.database import (stage_database,
                                              stage_test_audio,
                                              stage_test_context)
    from qpgesture_tpu.match.engine import CodeKNNEngine
    from qpgesture_tpu.parallel.mesh import make_mesh

    import sys
    import os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from fixtures import make_fixture

    mesh = make_mesh(8)
    interleave = MatchConfig(audio_mode="feat", use_aud=True, use_txt=True,
                             use_phase=False, chain_windows=False)
    for cfg in (MATCH_PRESETS["mfcc"], MATCH_PRESETS["mfcc_raw"],
                interleave):
        rng = np.random.RandomState(717)
        fx = make_fixture(rng, n_seq=6, n_test=3, codebook=48)
        cfg = MatchConfig(**{**cfg.__dict__, "codebook_size": 48})
        assert not cfg.chain_windows
        db = stage_database(cfg, fx["bundle"], fx["codes"], fx["signature"],
                            wavlm=fx["wavlm"], wavvq=fx["wavvq"])
        ta = stage_test_audio(cfg, db, test_bundle=fx["test_bundle"],
                              wavlm=fx["test_wavlm"], wavvq=fx["test_wavvq"])
        tc = stage_test_context(db, fx["test_context"]) \
            if cfg.use_txt else None
        engine = CodeKNNEngine(cfg, db)
        want = engine.predict(ta, tc, rng=np.random.RandomState(cfg.seed))
        got = engine.predict_sharded(mesh, ta, tc,
                                     rng=np.random.RandomState(cfg.seed))
        np.testing.assert_array_equal(got.codes, want.codes)


def test_predict_batch_sharded_matches_single():
    """Batched serving over the DB-sharded mesh == single-device batch."""
    from qpgesture_tpu.match.engine import CodeKNNEngine
    mesh8 = make_mesh(8)
    rng = np.random.RandomState(909)
    fx = make_fixture(rng, n_seq=8, n_test=2, codebook=32)
    cfg = MatchConfig(**{**MATCH_PRESETS["wavvq"].__dict__,
                         "codebook_size": 32})
    db = stage_database(cfg, fx["bundle"], fx["codes"], fx["signature"],
                        wavvq=fx["wavvq"])
    ta = stage_test_audio(cfg, db, wavvq=fx["test_wavvq"])
    tc = stage_test_context(db, fx["test_context"])
    engine = CodeKNNEngine(cfg, db)
    C = 3
    clip_audio = np.stack([ta] * C)
    clip_ctx = np.stack([tc] * C)
    want = engine.predict_batch(clip_audio, clip_ctx,
                                rng=np.random.RandomState(cfg.seed))
    got = engine.predict_batch_sharded(mesh8, clip_audio, clip_ctx,
                                       rng=np.random.RandomState(cfg.seed))
    for w, g in zip(want, got):
        np.testing.assert_array_equal(w.codes, g.codes)


def test_sharded_feat_dtype_matches_single_device():
    """Low-precision residency through the sharded path: sharded tables
    with cfg.feat_dtype == the single-device engine's tables at the same
    dtype (both sides round features to the dtype; host vs jnp
    normalization may differ in the last f32 ulp, so compare ranks with a
    tiny tolerance band via exact-match fraction)."""
    import dataclasses
    rng = np.random.RandomState(91)
    fx = make_fixture(rng, n_seq=6, n_test=2, codebook=64)
    cfg = MatchConfig(**{**MATCH_PRESETS["shipped"].__dict__,
                         "codebook_size": 64, "feat_dtype": "float16"})
    db = stage_database(cfg, fx["bundle"], fx["codes"], fx["signature"],
                        wavlm=fx["wavlm"], wavvq=fx["wavvq"])
    test_audio = stage_test_audio(cfg, db, wavlm=fx["test_wavlm"],
                                  wavvq=fx["test_wavvq"])
    test_context = stage_test_context(db, fx["test_context"])
    single = build_device_tables(cfg, db, test_audio, test_context)
    sharded = build_sharded_tables(cfg, db, make_mesh(8), test_audio,
                                   test_context)
    for name in ("aud_rank", "aud_block", "aud_seq", "aud_start"):
        a = np.asarray(getattr(single, name))
        b = np.asarray(getattr(sharded, name))
        agree = (a == b).mean()
        assert agree > 0.99, f"{name} agreement {agree:.4f}"
    for name in ("txt_rank", "txt_block", "txt_seq", "txt_start"):
        np.testing.assert_array_equal(
            np.asarray(getattr(single, name)),
            np.asarray(getattr(sharded, name)), err_msg=name)
