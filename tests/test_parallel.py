"""Sharded matching tests on the 8-device CPU mesh: the database-sharded
candidate reduction and the full sharded engine must match the single-device
engine bit-for-bit."""
import numpy as np

import jax.numpy as jnp

from qpgesture_tpu.core.config import MATCH_PRESETS, MatchConfig
from qpgesture_tpu.match.database import (stage_database, stage_test_audio,
                                          stage_test_context)
from qpgesture_tpu.match.engine import (CodeKNNEngine,
                                        build_device_tables)
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
    with cfg.feat_dtype are BIT-IDENTICAL to the single-device engine's
    tables at the same dtype — both stage through the shared host
    stage_cosine_features (same normalized bits), per-element distances
    are invariant to splitting the row axis, and the pmin combine
    preserves scan-order ties."""
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
    for name in ("aud_rank", "aud_block", "aud_seq", "aud_start",
                 "txt_rank", "txt_block", "txt_seq", "txt_start"):
        np.testing.assert_array_equal(
            np.asarray(getattr(single, name)),
            np.asarray(getattr(sharded, name)), err_msg=name)


def test_streaming_pool_tick_sharded_matches_tick():
    """StreamingPool.tick_sharded == tick (bit-identical codes AND carried
    seed state) across interleaved ticks on the 8-device mesh."""
    from qpgesture_tpu.serve import StreamingPool

    rng = np.random.RandomState(17)
    fx = make_fixture(rng, n_seq=6, n_test=4, codebook=64)
    mesh = make_mesh(8)
    for preset in ("wavvq", "shipped"):
        cfg = MatchConfig(**{**MATCH_PRESETS[preset].__dict__,
                             "codebook_size": 64})
        db = stage_database(cfg, fx["bundle"], fx["codes"], fx["signature"],
                            wavlm=fx["wavlm"], wavvq=fx["wavvq"])
        engine = CodeKNNEngine(cfg, db)
        ta_all = stage_test_audio(cfg, db, wavlm=fx["test_wavlm"],
                                  wavvq=fx["test_wavvq"])
        tc_all = stage_test_context(db, fx["test_context"])
        C = 2
        pool_a = StreamingPool(engine, C)
        pool_b = StreamingPool(engine, C)

        def win(arr, w):
            return np.stack([arr[w], arr[(w + 1) % arr.shape[0]]])

        for w in range(2):
            ta = win(ta_all, w) if cfg.use_aud else None
            tc = win(tc_all, w) if cfg.use_txt else None
            got = pool_b.tick_sharded(mesh, ta, tc)
            want = pool_a.tick(ta, tc)
            np.testing.assert_array_equal(got, want,
                                          err_msg=f"{preset} tick {w}")
        sa, sb = pool_a.state(), pool_b.state()
        np.testing.assert_array_equal(np.asarray(sa[0]), np.asarray(sb[0]))
        np.testing.assert_array_equal(np.asarray(sa[1]), np.asarray(sb[1]))


def test_rawwav_serve_sharded_matches_serve():
    """RawWavServer.serve_sharded == serve (fused or split) on the mesh."""
    import dataclasses
    import jax
    from qpgesture_tpu.core.config import VQVAEConfig
    from qpgesture_tpu.models.vq_wav2vec import VQWav2Vec, VQWav2VecConfig
    from qpgesture_tpu.models.vqvae import VQVAE
    from qpgesture_tpu.serve import RawWavServer

    rng = np.random.RandomState(23)
    fx = make_fixture(rng, n_seq=5, n_test=2, codebook=32)
    cfg = dataclasses.replace(MATCH_PRESETS["wavvq"], codebook_size=32)
    db = stage_database(cfg, fx["bundle"], fx["codes"], fx["signature"],
                        wavlm=fx["wavlm"], wavvq=fx["wavvq"])
    engine = CodeKNNEngine(cfg, db)
    vq_cfg = VQVAEConfig(width=16, depth=1, emb_width=16, l_bins=32,
                         input_dim=135, sample_length=30)
    model = VQVAE(vq_cfg)
    params, cb = model.init(jax.random.PRNGKey(0))
    cb = model.init_codebook_from_batch(
        params, np.asarray(rng.randn(2, 240, 135), np.float32),
        jax.random.PRNGKey(1))
    enc_cfg = VQWav2VecConfig(conv_layers=(
        (16, 10, 5), (16, 8, 4), (16, 4, 2), (16, 4, 2), (16, 4, 2)))
    enc = VQWav2Vec(enc_cfg)
    wav = rng.randn(2, 64000).astype(np.float32) * 0.1
    enc_params = enc.init(jax.random.PRNGKey(2), wav[:1])["params"]

    server = RawWavServer(engine, model, params, cb,
                          lambda p, w: enc.apply({"params": p}, w),
                          enc_params)
    want_codes, want_poses = server.serve(
        wav, fx["test_context"], init_code=3,
        rng=np.random.RandomState(cfg.seed))
    got_codes, got_poses = server.serve_sharded(
        make_mesh(8), wav, fx["test_context"], init_code=3,
        rng=np.random.RandomState(cfg.seed))
    np.testing.assert_array_equal(got_codes, want_codes)
    np.testing.assert_allclose(got_poses, want_poses, atol=1e-5)
