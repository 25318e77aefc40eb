"""Engine <-> oracle parity: the device matching program must select exactly
the same codebook indices as the NumPy semantic spec, in every supported
mode combination (the BASELINE.json 'identical selected codebook indices'
criterion, checked against the spec since no real BEAT data ships)."""
import numpy as np
import pytest

from qpgesture_tpu.core.config import MATCH_PRESETS, MatchConfig
from qpgesture_tpu.match.database import (stage_database, stage_test_audio,
                                          stage_test_context)
from qpgesture_tpu.match.engine import CodeKNNEngine, build_device_tables
from qpgesture_tpu.match.oracle import (CodeKNNOracle, audio_candidates,
                                        text_candidates)

from fixtures import make_fixture


def _stage(cfg, fx):
    db = stage_database(cfg, fx["bundle"], fx["codes"], fx["signature"],
                        wavlm=fx["wavlm"], wavvq=fx["wavvq"])
    test_audio = None
    if cfg.use_aud:
        test_audio = stage_test_audio(cfg, db, test_bundle=fx["test_bundle"],
                                      wavlm=fx["test_wavlm"],
                                      wavvq=fx["test_wavvq"])
    test_context = None
    if cfg.use_txt:
        test_context = stage_test_context(db, fx["test_context"])
    return db, test_audio, test_context


@pytest.mark.parametrize("preset", ["wavvq", "shipped", "no_phase",
                                    "no_text", "no_audio", "mfcc",
                                    "wavvq_aud_only", "wavlm_raw",
                                    "mfcc_raw"])
def test_engine_matches_oracle(preset):
    import zlib
    # deterministic per-preset seed (hash() is randomized per process)
    rng = np.random.RandomState(2024 + zlib.crc32(preset.encode()) % 1000)
    fx = make_fixture(rng, n_seq=4, n_test=2, codebook=64)
    cfg = MATCH_PRESETS[preset]
    cfg = MatchConfig(**{**cfg.__dict__, "codebook_size": 64})
    db, test_audio, test_context = _stage(cfg, fx)

    oracle = CodeKNNOracle(db)
    res_o = oracle.predict(test_audio, test_context,
                           rng=np.random.RandomState(cfg.seed))
    engine = CodeKNNEngine(cfg, db)
    res_e = engine.predict(test_audio, test_context,
                           rng=np.random.RandomState(cfg.seed))

    np.testing.assert_array_equal(res_o.codes, res_e.codes)
    if res_o.phases is not None:
        np.testing.assert_allclose(res_o.phases, res_e.phases, atol=1e-5)
    if res_o.votes is not None:
        np.testing.assert_array_equal(res_o.votes, res_e.votes)


def test_freq_weight_zero_means_no_freq():
    """freq_weight=0 must zero out the frequency term (not silently score it
    at weight 1 via the integer-scale fallback), and a use_freq=False config
    must not trip the 1/K assert regardless of freq_weight."""
    import dataclasses
    rng = np.random.RandomState(515)
    fx = make_fixture(rng, n_seq=4, n_test=2, codebook=48)
    base = MATCH_PRESETS["no_phase"]
    w0 = dataclasses.replace(base, codebook_size=48, use_freq=True,
                             freq_weight=0.0)
    nofreq = dataclasses.replace(base, codebook_size=48, use_freq=False)
    db, ta, tc = _stage(w0, fx)
    res_w0 = CodeKNNEngine(w0, db).predict(
        ta, tc, rng=np.random.RandomState(w0.seed))
    res_o = CodeKNNOracle(db).predict(
        ta, tc, rng=np.random.RandomState(w0.seed))
    np.testing.assert_array_equal(res_w0.codes, res_o.codes)

    db_nf, ta_nf, tc_nf = _stage(nofreq, fx)
    res_nf = CodeKNNEngine(nofreq, db_nf).predict(
        ta_nf, tc_nf, rng=np.random.RandomState(nofreq.seed))
    np.testing.assert_array_equal(res_w0.codes, res_nf.codes)

    # use_freq=False with a non-reciprocal weight: must not assert
    odd = dataclasses.replace(base, codebook_size=48, use_freq=False,
                              freq_weight=0.3)
    db_odd, ta_o, tc_o = _stage(odd, fx)
    CodeKNNEngine(odd, db_odd).predict(
        ta_o, tc_o, rng=np.random.RandomState(odd.seed))


def test_candidate_tables_match():
    """Per-step audio/text candidate tables (dist per code, continuation
    block, source position) agree between oracle and device reduction."""
    rng = np.random.RandomState(7)
    fx = make_fixture(rng, n_seq=3, n_test=1, codebook=32)
    cfg = MatchConfig(**{**MATCH_PRESETS["wavvq"].__dict__,
                         "codebook_size": 32})
    db, test_audio, test_context = _stage(cfg, fx)

    tables = build_device_tables(cfg, db, test_audio, test_context)
    W, S = test_audio.shape[:2]
    for s in range(S):
        ct = audio_candidates(db, test_audio[0, s])
        q = s  # window 0
        blk = np.asarray(tables.aud_block[q])
        np.testing.assert_array_equal(ct.block, blk)
        # starts: oracle stores frame; engine stores phase start
        starts = (ct.frame / 398 * 240).astype(np.int32)
        matched = ct.dist < cfg.unmatched_dist
        np.testing.assert_array_equal(starts[matched],
                                      np.asarray(tables.aud_start[q])[matched])
        np.testing.assert_array_equal(ct.seq[matched],
                                      np.asarray(tables.aud_seq[q])[matched])
        tt = text_candidates(db, test_context[0, s])
        np.testing.assert_array_equal(tt.block,
                                      np.asarray(tables.txt_block[q]))


def test_seed_chaining_across_windows():
    """Window i>0 must seed from window i-1's 30th code (which is the 2nd
    code of the final step's block, not the last appended code)."""
    rng = np.random.RandomState(11)
    fx = make_fixture(rng, n_seq=4, n_test=3, codebook=48)
    cfg = MatchConfig(**{**MATCH_PRESETS["wavvq_aud_only"].__dict__,
                         "codebook_size": 48})
    db, test_audio, _ = _stage(cfg, fx)
    oracle = CodeKNNOracle(db)
    full = oracle.predict(test_audio, None,
                          rng=np.random.RandomState(cfg.seed))
    # re-run window 1 alone with the explicit seed: must reproduce
    res1 = oracle.predict(test_audio[1:2], None,
                          init_code=int(full.codes[0, -1]),
                          rng=np.random.RandomState(0))
    np.testing.assert_array_equal(res1.codes[0], full.codes[1])


def test_predict_batch_matches_sequential():
    """Batched multi-clip serving must equal per-clip predicts with the same
    seeds (seed chains reset at clip boundaries)."""
    rng = np.random.RandomState(42)
    fx = make_fixture(rng, n_seq=4, n_test=4, codebook=48)
    cfg = MatchConfig(**{**MATCH_PRESETS["wavvq"].__dict__,
                         "codebook_size": 48})
    db, test_audio, test_context = _stage(cfg, fx)
    engine = CodeKNNEngine(cfg, db)

    # 2 clips x 2 windows each
    clip_audio = test_audio.reshape(2, 2, *test_audio.shape[1:])
    clip_ctx = test_context.reshape(2, 2, *test_context.shape[1:])
    init_codes = np.array([5, 11], np.int32)
    init_phases = rng.rand(2, 8, 16).astype(np.float32)
    batch = engine.predict_batch(clip_audio, clip_ctx,
                                 init_codes=init_codes,
                                 init_phases=init_phases)
    for c in range(2):
        single = engine.predict(clip_audio[c], clip_ctx[c],
                                init_code=int(init_codes[c]),
                                init_phase=init_phases[c])
        np.testing.assert_array_equal(batch[c].codes, single.codes)
        np.testing.assert_allclose(batch[c].phases, single.phases,
                                   atol=1e-6)


def test_wavvq_sum_mode_parity():
    """Levenshtein 'sum' mode (per-group distances summed,
    wavvq_distances mode='sum'): engine == oracle."""
    rng = np.random.RandomState(9)
    fx = make_fixture(rng, n_seq=4, n_test=1, codebook=48)
    cfg = MatchConfig(**{**MATCH_PRESETS["wavvq"].__dict__,
                         "codebook_size": 48, "wavvq_mode": "sum"})
    db, test_audio, test_context = _stage(cfg, fx)
    assert db.aud_strings.ndim == 4 and test_audio.ndim == 4
    oracle = CodeKNNOracle(db)
    res_o = oracle.predict(test_audio, test_context,
                           rng=np.random.RandomState(cfg.seed))
    engine = CodeKNNEngine(cfg, db)
    res_e = engine.predict(test_audio, test_context,
                           rng=np.random.RandomState(cfg.seed))
    np.testing.assert_array_equal(res_o.codes, res_e.codes)


def test_serving_pipeline_matches_predict_plus_decode():
    """serve() (single fused program incl. decode) equals predict + decode."""
    import jax
    import jax.numpy as jnp
    from qpgesture_tpu.core.config import VQVAEConfig
    from qpgesture_tpu.models.vqvae import VQVAE
    from qpgesture_tpu.serve import ServingPipeline

    rng = np.random.RandomState(13)
    fx = make_fixture(rng, n_seq=4, n_test=2, codebook=32)
    cfg = MatchConfig(**{**MATCH_PRESETS["wavvq"].__dict__,
                         "codebook_size": 32})
    db, test_audio, test_context = _stage(cfg, fx)
    engine = CodeKNNEngine(cfg, db)

    vq_cfg = VQVAEConfig(width=16, depth=1, emb_width=16, l_bins=32,
                         input_dim=135, sample_length=30)
    model = VQVAE(vq_cfg)
    params, cb = model.init(jax.random.PRNGKey(0))
    cb = model.init_codebook_from_batch(
        params, jnp.asarray(rng.randn(2, 240, 135).astype(np.float32)),
        jax.random.PRNGKey(1))
    mean = rng.randn(135).astype(np.float32)
    std = np.abs(rng.randn(135)).astype(np.float32) + 0.5
    pipe = ServingPipeline(engine, model, params, cb, mean, std)
    codes, poses = pipe.serve(test_audio, test_context, init_code=3)

    res = engine.predict(test_audio, test_context, init_code=3,
                         init_phase=np.zeros((8, 16), np.float32))
    np.testing.assert_array_equal(codes, res.codes)
    want = np.asarray(jax.jit(lambda z: model.decode(params, cb, z))(
        jnp.asarray(res.codes.reshape(1, -1))))[0]
    want = want * np.clip(std, 0.01, None) + mean
    np.testing.assert_allclose(poses, want, atol=1e-4)
    assert poses.shape == (2 * 240, 135)


@pytest.mark.parametrize("preset", ["no_phase", "mfcc"])
def test_serving_pipeline_rng_configs(preset):
    """serve() must match predict() for configs needing rng machinery: the
    no-phase aud+txt random vote (rand bits) and non-chaining mfcc
    per-window re-seeds — a clip-start reset alone silently diverges."""
    import jax
    import jax.numpy as jnp
    from qpgesture_tpu.core.config import VQVAEConfig
    from qpgesture_tpu.models.vqvae import VQVAE
    from qpgesture_tpu.serve import ServingPipeline

    rng = np.random.RandomState(29)
    fx = make_fixture(rng, n_seq=4, n_test=3, codebook=32)
    cfg = MatchConfig(**{**MATCH_PRESETS[preset].__dict__,
                         "codebook_size": 32})
    db, test_audio, test_context = _stage(cfg, fx)
    engine = CodeKNNEngine(cfg, db)

    vq_cfg = VQVAEConfig(width=16, depth=1, emb_width=16, l_bins=32,
                         input_dim=135, sample_length=30)
    model = VQVAE(vq_cfg)
    params, cb = model.init(jax.random.PRNGKey(0))
    cb = model.init_codebook_from_batch(
        params, jnp.asarray(rng.randn(2, 240, 135).astype(np.float32)),
        jax.random.PRNGKey(1))
    pipe = ServingPipeline(engine, model, params, cb)
    codes, _ = pipe.serve(test_audio, test_context, init_code=3,
                          rng=np.random.RandomState(cfg.seed))
    res = engine.predict(test_audio, test_context, init_code=3,
                         init_phase=np.zeros((8, 16), np.float32),
                         rng=np.random.RandomState(cfg.seed))
    np.testing.assert_array_equal(codes, res.codes)


def test_desired_k_nonzero():
    """desired_k > 0 selects the k-th best fusion candidate (non-phase
    paths, GestureKNN.py:588)."""
    rng = np.random.RandomState(21)
    fx = make_fixture(rng, n_seq=4, n_test=1, codebook=48)
    cfg = MatchConfig(**{**MATCH_PRESETS["wavvq_aud_only"].__dict__,
                         "codebook_size": 48, "desired_k": 2})
    db, test_audio, _ = _stage(cfg, fx)
    oracle = CodeKNNOracle(db)
    res_o = oracle.predict(test_audio, None,
                           rng=np.random.RandomState(cfg.seed))
    engine = CodeKNNEngine(cfg, db)
    res_e = engine.predict(test_audio, None,
                           rng=np.random.RandomState(cfg.seed))
    np.testing.assert_array_equal(res_o.codes, res_e.codes)
    # and k=0 differs (different candidates selected)
    cfg0 = MatchConfig(**{**cfg.__dict__, "desired_k": 0})
    engine0 = CodeKNNEngine(cfg0, db)
    res0 = engine0.predict(test_audio, None,
                           rng=np.random.RandomState(cfg.seed))
    assert (res0.codes != res_e.codes).any()


def _make_long_fixture(rng, n_seq=3, n_test=2, codebook=48,
                       num_frames=3600, num_frames_code=450):
    """3600-frame (60 s) single-window fixture: the reference's long-clip
    mfcc variant (GestureKNN.py:853-854, lmdb_to_noduplication.py:61 — BVH
    windows of 3600 frames with num_frames_code=450 codes, searched in one
    search_code_knn call of 113 steps)."""
    from qpgesture_tpu.core.schemas import CodebookSignature, DatabaseBundle
    bundle = DatabaseBundle(
        mfcc=rng.randn(n_seq, num_frames, 14).astype(np.float32))
    codes = rng.randint(0, codebook,
                        size=(n_seq, num_frames_code)).astype(np.int32)
    signature = CodebookSignature(
        code=np.tile(np.arange(codebook)[:, None], (1, num_frames_code)),
        poses=rng.randn(codebook, 8, 135).astype(np.float32),
        signature=rng.randn(codebook, 135).astype(np.float32))
    test_bundle = DatabaseBundle(
        mfcc=rng.randn(n_test, num_frames, 14).astype(np.float32))
    return dict(bundle=bundle, codes=codes, signature=signature,
                test_bundle=test_bundle)


def test_long_clip_3600_parity():
    """End-to-end 3600-frame matching: staged -> engine == oracle at
    clip_len=3600 in mfcc ('feat') mode — 113 steps x 4 codes per window,
    450 kept, cross-window seed at block offset 1 of the final step."""
    rng = np.random.RandomState(3600)
    fx = _make_long_fixture(rng)
    cfg = MatchConfig(**{**MATCH_PRESETS["mfcc"].__dict__,
                         "codebook_size": 48,
                         "num_frames": 3600, "num_frames_code": 450})
    db = stage_database(cfg, fx["bundle"], fx["codes"], fx["signature"])
    assert db.geom.n_db_frm == 3600 and db.geom.step_sz == 8.0
    test_audio = stage_test_audio(cfg, db, test_bundle=fx["test_bundle"])
    W, S = test_audio.shape[:2]
    assert (W, S) == (2, 113)  # ceil(3600 / 32) steps per window

    oracle = CodeKNNOracle(db)
    res_o = oracle.predict(test_audio, None,
                           rng=np.random.RandomState(cfg.seed))
    engine = CodeKNNEngine(cfg, db)
    res_e = engine.predict(test_audio, None,
                           rng=np.random.RandomState(cfg.seed))
    assert res_o.codes.shape == (2, 450)
    np.testing.assert_array_equal(res_o.codes, res_e.codes)


def test_unsupported_seed_geometry_fails_loudly():
    """Geometries where the cross-window seed code does not land in the
    final scan step must raise, not silently diverge from the oracle
    (previously the engine hard-coded block[1] of the final step and would
    silently emit wrong seeds for e.g. clip_len=480 on a standard DB)."""
    rng = np.random.RandomState(77)
    fx = _make_long_fixture(rng, num_frames=480, num_frames_code=30)
    cfg = MatchConfig(**{**MATCH_PRESETS["mfcc"].__dict__,
                         "codebook_size": 48})
    # standard 240-frame DB, but a 480-frame test clip: 15 steps x 4 codes
    # appended, 30 kept -> seed code falls in step 7, not step 14
    import dataclasses
    db_bundle = dataclasses.replace(fx["bundle"],
                                    mfcc=fx["bundle"].mfcc[:, :240])
    db = stage_database(cfg, db_bundle, fx["codes"][:, :30],
                        fx["signature"])
    test_audio = stage_test_audio(cfg, db, test_bundle=fx["test_bundle"],
                                  clip_len=480)
    engine = CodeKNNEngine(cfg, db)
    with pytest.raises(AssertionError, match="seed"):
        engine.predict(test_audio, None,
                       rng=np.random.RandomState(cfg.seed))


def test_bucketed_serving_no_recompile():
    """Two clips of different window counts in the same bucket must (a)
    produce codes identical to the unbucketed path and (b) share ONE
    compiled program (zero recompiles for the second clip)."""
    from qpgesture_tpu.match import engine as engine_mod

    rng = np.random.RandomState(5150)
    fx = make_fixture(rng, n_seq=4, n_test=4, codebook=48)
    cfg = MatchConfig(**{**MATCH_PRESETS["shipped"].__dict__,
                         "codebook_size": 48})
    db, test_audio, test_context = _stage(cfg, fx)
    engine = CodeKNNEngine(cfg, db)

    # clips of 3 and 4 windows -> both land in the 4-window bucket
    clip_a = (test_audio[:3], test_context[:3])
    clip_b = (test_audio[:4], test_context[:4])

    want_a = engine.predict(*clip_a, rng=np.random.RandomState(cfg.seed))
    want_b = engine.predict(*clip_b, rng=np.random.RandomState(cfg.seed))

    got_a = engine.predict_bucketed(*clip_a,
                                    rng=np.random.RandomState(cfg.seed))
    size_after_first = engine_mod._predict_impl._cache_size()
    got_b = engine.predict_bucketed(*clip_b,
                                    rng=np.random.RandomState(cfg.seed))
    size_after_second = engine_mod._predict_impl._cache_size()

    assert size_after_second == size_after_first, \
        "second clip in the same bucket triggered a recompile"
    np.testing.assert_array_equal(got_a.codes, want_a.codes)
    np.testing.assert_array_equal(got_b.codes, want_b.codes)
    np.testing.assert_allclose(got_a.phases, want_a.phases, atol=1e-6)

    # a 5-window clip overflows into the next bucket (one new compile, and
    # still exact)
    want_c = engine.predict(test_audio[:5] if len(test_audio) >= 5 else
                            test_audio, test_context[:5],
                            rng=np.random.RandomState(cfg.seed))
    got_c = engine.predict_bucketed(test_audio[:5], test_context[:5],
                                    rng=np.random.RandomState(cfg.seed))
    np.testing.assert_array_equal(got_c.codes, want_c.codes)


def test_bucketed_serving_nonchaining_preset():
    """Bucketing must also be exact for non-chaining presets (mfcc): the
    padded windows draw their fresh inits AFTER the real windows' draws,
    so real outputs see the same rng stream as the unbucketed path."""
    rng = np.random.RandomState(404)
    fx = _make_long_fixture(rng, num_frames=240, num_frames_code=30,
                            n_seq=4, n_test=3)
    cfg = MatchConfig(**{**MATCH_PRESETS["mfcc"].__dict__,
                         "codebook_size": 48})
    db = stage_database(cfg, fx["bundle"], fx["codes"], fx["signature"])
    test_audio = stage_test_audio(cfg, db, test_bundle=fx["test_bundle"])
    engine = CodeKNNEngine(cfg, db)
    want = engine.predict(test_audio, None,
                          rng=np.random.RandomState(cfg.seed))
    got = engine.predict_bucketed(test_audio, None,
                                  rng=np.random.RandomState(cfg.seed))
    np.testing.assert_array_equal(got.codes, want.codes)


def test_nonchaining_with_text_rand_interleave():
    """chain_windows=False combined with the no-phase aud+txt random vote:
    the engine must consume rng in the oracle's interleaved order
    ([rand w0, init w1, rand w1, ...]), not in one rand block (a draw-order
    bug found by review — no preset combines these flags)."""
    rng = np.random.RandomState(808)
    fx = make_fixture(rng, n_seq=4, n_test=3, codebook=48)
    cfg = MatchConfig(audio_mode="feat", use_aud=True, use_txt=True,
                      use_phase=False, chain_windows=False,
                      codebook_size=48)
    db, test_audio, test_context = _stage(cfg, fx)
    oracle = CodeKNNOracle(db)
    res_o = oracle.predict(test_audio, test_context,
                           rng=np.random.RandomState(cfg.seed))
    engine = CodeKNNEngine(cfg, db)
    res_e = engine.predict(test_audio, test_context,
                           rng=np.random.RandomState(cfg.seed))
    np.testing.assert_array_equal(res_o.codes, res_e.codes)


@pytest.mark.parametrize("preset", ["wavvq", "shipped", "no_phase",
                                    "no_audio", "wavvq_aud_only"])
def test_reference_ties_mode_matches_reference_oracle(preset):
    """predict_reference_ties: device phase-1 tables + host reference-tie
    fusion must equal the oracle running fully on host with
    tie_kind='reference' (which in turn is verified bit-equal to the actual
    reference binary in test_reference_cross.py)."""
    import zlib
    rng = np.random.RandomState(4048 + zlib.crc32(preset.encode()) % 1000)
    fx = make_fixture(rng, n_seq=4, n_test=2, codebook=64)
    cfg = MATCH_PRESETS[preset]
    cfg = MatchConfig(**{**cfg.__dict__, "codebook_size": 64})
    db, test_audio, test_context = _stage(cfg, fx)

    oracle = CodeKNNOracle(db, tie_kind="reference")
    res_o = oracle.predict(test_audio, test_context,
                           rng=np.random.RandomState(cfg.seed))
    engine = CodeKNNEngine(cfg, db)
    res_e = engine.predict_reference_ties(
        test_audio, test_context, rng=np.random.RandomState(cfg.seed))
    np.testing.assert_array_equal(res_o.codes, res_e.codes)
    if res_o.phases is not None:
        np.testing.assert_allclose(res_o.phases, res_e.phases, atol=1e-5)


@pytest.mark.parametrize("preset", ["wavvq", "shipped", "no_audio"])
def test_streaming_session_matches_predict(preset):
    """Window-at-a-time streaming (persistent device seed state) must be
    bit-identical to whole-clip predict over the same windows."""
    import zlib

    from qpgesture_tpu.serve import StreamingSession
    rng = np.random.RandomState(7100 + zlib.crc32(preset.encode()) % 1000)
    fx = make_fixture(rng, n_seq=4, n_test=4, codebook=64)
    cfg = MATCH_PRESETS[preset]
    cfg = MatchConfig(**{**cfg.__dict__, "codebook_size": 64})
    db, test_audio, test_context = _stage(cfg, fx)
    engine = CodeKNNEngine(cfg, db)
    want = engine.predict(test_audio, test_context,
                          rng=np.random.RandomState(cfg.seed))

    sess = StreamingSession(engine, rng=np.random.RandomState(cfg.seed))
    W = (test_audio if test_audio is not None else test_context).shape[0]
    got = []
    for w in range(W):
        got.append(sess.push_window(
            test_audio[w] if cfg.use_aud else None,
            test_context[w] if cfg.use_txt else None))
    np.testing.assert_array_equal(np.stack(got), want.codes)


@pytest.mark.parametrize("preset", ["wavvq", "shipped", "no_phase",
                                    "no_audio"])
def test_streaming_pool_matches_solo_sessions(preset):
    """C concurrent streams through ONE program per tick (StreamingPool)
    must be bit-identical, stream by stream, to C independent
    StreamingSessions pushing the same windows with the same seeds/rngs.
    no_phase exercises the per-stream rand-bit draws."""
    import zlib

    from qpgesture_tpu.serve import StreamingPool, StreamingSession
    rng = np.random.RandomState(7600 + zlib.crc32(preset.encode()) % 1000)
    fx = make_fixture(rng, n_seq=4, n_test=4, codebook=64)
    cfg = MATCH_PRESETS[preset]
    cfg = MatchConfig(**{**cfg.__dict__, "codebook_size": 64})
    db, test_audio, test_context = _stage(cfg, fx)
    engine = CodeKNNEngine(cfg, db)
    C = 3
    W = (test_audio if test_audio is not None else test_context).shape[0]

    # each stream serves a different window sequence (rolled per stream)
    def stream_windows(x, i):
        return None if x is None else np.roll(x, -i, axis=0)

    solo = []
    for i in range(C):
        sess = StreamingSession(engine,
                                rng=np.random.RandomState(cfg.seed + i))
        rows = [sess.push_window(
            stream_windows(test_audio, i)[w] if cfg.use_aud else None,
            stream_windows(test_context, i)[w] if cfg.use_txt else None)
            for w in range(W)]
        solo.append(np.stack(rows))
    want = np.stack(solo)  # (C, W, 30)

    pool = StreamingPool(engine, C,
                         rngs=[np.random.RandomState(cfg.seed + i)
                               for i in range(C)])
    got = []
    for w in range(W):
        ta = None if test_audio is None else np.stack(
            [stream_windows(test_audio, i)[w] for i in range(C)])
        tc = None if test_context is None else np.stack(
            [stream_windows(test_context, i)[w] for i in range(C)])
        got.append(pool.tick(ta if cfg.use_aud else None,
                             tc if cfg.use_txt else None))
    np.testing.assert_array_equal(np.stack(got, axis=1), want)


def test_streaming_rejects_nonchaining():
    import zlib

    from qpgesture_tpu.serve import StreamingSession
    rng = np.random.RandomState(7777)
    fx = make_fixture(rng, n_seq=3, n_test=2, codebook=32)
    cfg = MATCH_PRESETS["mfcc"]
    cfg = MatchConfig(**{**cfg.__dict__, "codebook_size": 32})
    db, test_audio, test_context = _stage(cfg, fx)
    engine = CodeKNNEngine(cfg, db)
    with pytest.raises(AssertionError):
        StreamingSession(engine)


@pytest.mark.parametrize("precision", ["high", "default"])
def test_cosine_precision_variants_match_oracle(precision):
    """The opt-in cosine_precision fast paths (MatchConfig.cosine_precision)
    must plumb through the engine and, on this backend, still select the
    oracle's indices. On the CPU mesh all precisions compute the same f32
    dot, so this pins the plumbing (config hashability, jit staticness);
    the on-chip numeric evidence is examples/chip_parity_sweep.py
    --cosine-precision=<p>."""
    import dataclasses
    import zlib
    rng = np.random.RandomState(77 + zlib.crc32(precision.encode()) % 100)
    fx = make_fixture(rng, n_seq=4, n_test=2, codebook=64)
    cfg = dataclasses.replace(MATCH_PRESETS["shipped"], codebook_size=64,
                              cosine_precision=precision)
    db, test_audio, test_context = _stage(cfg, fx)
    res_o = CodeKNNOracle(db).predict(test_audio, test_context,
                                      rng=np.random.RandomState(cfg.seed))
    res_e = CodeKNNEngine(cfg, db).predict(
        test_audio, test_context, rng=np.random.RandomState(cfg.seed))
    np.testing.assert_array_equal(res_o.codes, res_e.codes)


def test_shipped_fast_preset_is_shipped_plus_high_precision():
    """MATCH_PRESETS['shipped_fast'] is the certified production serving
    point: identical to 'shipped' except cosine_precision='high' (the
    3-pass bf16x3 distance matmul, on-chip sweep 21/21 clean)."""
    import dataclasses
    fast = MATCH_PRESETS["shipped_fast"]
    want = dataclasses.replace(MATCH_PRESETS["shipped"],
                               cosine_precision="high")
    assert fast == want


@pytest.mark.parametrize("preset", ["wavvq", "no_phase"])
def test_streaming_pool_active_mask_and_reset(preset):
    """Streams marked inactive in a tick keep their seed state (and their
    rng position, for the rand-bit mode); reset_stream re-seeds one slot
    in place. Both must leave every stream bit-equal to a solo session
    that saw the same effective window sequence."""
    import zlib

    from qpgesture_tpu.serve import StreamingPool, StreamingSession
    rng = np.random.RandomState(7900 + zlib.crc32(preset.encode()) % 1000)
    fx = make_fixture(rng, n_seq=4, n_test=4, codebook=64)
    cfg = MATCH_PRESETS[preset]
    cfg = MatchConfig(**{**cfg.__dict__, "codebook_size": 64})
    db, test_audio, test_context = _stage(cfg, fx)
    engine = CodeKNNEngine(cfg, db)
    C = 3

    def win(x, w):
        return None if x is None else x[w]

    pool = StreamingPool(engine, C,
                         rngs=[np.random.RandomState(cfg.seed + i)
                               for i in range(C)])
    zero_a = np.zeros_like(test_audio[0]) if test_audio is not None \
        else None
    zero_c = np.zeros_like(test_context[0]) if test_context is not None \
        else None

    def tick_windows(ws, active=None):
        ta = None if test_audio is None else np.stack(
            [win(test_audio, w) if w is not None else zero_a for w in ws])
        tc = None if test_context is None else np.stack(
            [win(test_context, w) if w is not None else zero_c
             for w in ws])
        return pool.tick(ta if cfg.use_aud else None,
                         tc if cfg.use_txt else None, active=active)

    # tick 1: all active on window 0; tick 2: stream 1 idle; tick 3: all
    # active (stream 1 finally consumes window 1)
    out1 = tick_windows([0, 0, 0])
    out2 = tick_windows([1, None, 1], active=np.array([True, False, True]))
    out3 = tick_windows([2, 1, 2])

    # solo replay: streams 0/2 saw windows 0,1,2; stream 1 saw 0,1
    for i, seq in ((0, [0, 1, 2]), (1, [0, 1]), (2, [0, 1, 2])):
        sess = StreamingSession(engine,
                                rng=np.random.RandomState(cfg.seed + i))
        outs = [sess.push_window(
            win(test_audio, w) if cfg.use_aud else None,
            win(test_context, w) if cfg.use_txt else None) for w in seq]
        picks = {0: [out1, out2, out3], 1: [out1, out3],
                 2: [out1, out2, out3]}[i]
        for got, want in zip(picks, outs):
            np.testing.assert_array_equal(got[i], want)

    # reset stream 2 and verify it restarts exactly like a fresh session
    pool.reset_stream(2, init_code=9,
                      init_phase=np.zeros((8, 16), np.float32),
                      rng=np.random.RandomState(424))
    out4 = tick_windows([3, 2, 0])
    fresh = StreamingSession(engine, init_code=9,
                             init_phase=np.zeros((8, 16), np.float32),
                             rng=np.random.RandomState(424))
    want = fresh.push_window(win(test_audio, 0) if cfg.use_aud else None,
                             win(test_context, 0) if cfg.use_txt else None)
    np.testing.assert_array_equal(out4[2], want)


@pytest.mark.parametrize("feat_dtype", ["bfloat16", "float16"])
def test_feat_dtype_residency(feat_dtype):
    """Low-precision feature-DB residency (cfg.feat_dtype): the resident
    audio features are stored in the requested dtype, the program runs end
    to end, and distances stay within the dtype's rounding envelope of the
    f32 engine (index parity is an empirical per-database question — the
    knob exists to run whole-corpus wavlm databases on one 16 GB chip)."""
    import dataclasses
    import jax.numpy as jnp
    from qpgesture_tpu.match.engine import device_match_db

    rng = np.random.RandomState(77)
    fx = make_fixture(rng, n_seq=5, n_test=2, codebook=48)
    cfg32 = MatchConfig(**{**MATCH_PRESETS["shipped"].__dict__,
                           "codebook_size": 48})
    cfg_lp = dataclasses.replace(cfg32, feat_dtype=feat_dtype)
    db, test_audio, test_context = _stage(cfg32, fx)

    devdb = device_match_db(cfg_lp, db)
    assert devdb.aud_feat.dtype == jnp.dtype(feat_dtype)
    assert devdb.txt_feat.dtype == jnp.float32  # text side stays f32
    # staging goes through the HOST normalize+cast helper (bit-identical
    # to what the sharded path stages — and no 2x f32 device peak)
    from qpgesture_tpu.match.engine import stage_cosine_features
    want_feat = stage_cosine_features(
        db.aud_feat.reshape(-1, db.aud_feat.shape[-1]), feat_dtype)
    np.testing.assert_array_equal(
        np.asarray(devdb.aud_feat).view(np.uint16),
        np.asarray(want_feat).view(np.uint16))

    t32 = build_device_tables(cfg32, db, test_audio, test_context)
    tlp = build_device_tables(cfg_lp, db, test_audio, test_context)
    # ranks are a permutation of 0..K-1 either way; the low-precision ranks
    # must be a *mostly identical* permutation on well-separated fixtures
    a32 = np.asarray(t32.aud_rank)
    alp = np.asarray(tlp.aud_rank)
    assert a32.shape == alp.shape
    agree = (a32 == alp).mean()
    assert agree > 0.9, f"{feat_dtype} rank agreement {agree:.3f}"
    # text side is untouched -> bit-equal
    np.testing.assert_array_equal(np.asarray(t32.txt_rank),
                                  np.asarray(tlp.txt_rank))

    # end-to-end predict runs and emits valid codes
    engine = CodeKNNEngine(cfg_lp, db)
    res = engine.predict(test_audio, test_context,
                         rng=np.random.RandomState(cfg_lp.seed))
    assert res.codes.shape == (2, 30)
    assert res.codes.min() >= 0 and res.codes.max() < 48


def test_feat_dtype_wavvq_mode_unaffected():
    """wavvq strings are int32 — feat_dtype must be a no-op there
    (bit-identical codes to the f32-config engine)."""
    import dataclasses
    rng = np.random.RandomState(78)
    fx = make_fixture(rng, n_seq=4, n_test=2, codebook=48)
    cfg = MatchConfig(**{**MATCH_PRESETS["wavvq"].__dict__,
                         "codebook_size": 48})
    db, ta, tc = _stage(cfg, fx)
    want = CodeKNNEngine(cfg, db).predict(
        ta, tc, rng=np.random.RandomState(cfg.seed))
    cfg_lp = dataclasses.replace(cfg, feat_dtype="bfloat16")
    got = CodeKNNEngine(cfg_lp, db).predict(
        ta, tc, rng=np.random.RandomState(cfg.seed))
    np.testing.assert_array_equal(want.codes, got.codes)


@pytest.mark.parametrize("backend,knob,flag", [
    ("legacy-selection", "QPG_SELECTION_TABLES", "_SEL_TABLES"),
    ("no-phase-grids", "QPG_PHASE_GRIDS", "_PHASE_GRIDS"),
])
@pytest.mark.parametrize("preset", ["wavvq", "shipped", "no_phase"])
def test_fuse_backend_ab_parity(preset, backend, knob, flag, tmp_path):
    """The fusion-scan optimizations must be bit-identical to the plain
    in-scan path: selection tables (QPG_SELECTION_TABLES=0 disables) and
    the staged phase head/tail pair grids (QPG_PHASE_GRIDS=0 falls back to
    per-step dynamic slices). The knobs are read at import (a mid-process
    flip could silently reuse a jitted program), so each disabled variant
    runs in a subprocess on the same deterministic fixture and is compared
    against the in-process default."""
    import os
    import subprocess
    import sys
    import zlib

    seed = 2024 + zlib.crc32(preset.encode()) % 1000
    rng = np.random.RandomState(seed)
    fx = make_fixture(rng, n_seq=4, n_test=2, codebook=64)
    cfg = MatchConfig(**{**MATCH_PRESETS[preset].__dict__,
                         "codebook_size": 64})
    db, ta, tc = _stage(cfg, fx)
    want = CodeKNNEngine(cfg, db).predict(
        ta, tc, rng=np.random.RandomState(cfg.seed))

    out = str(tmp_path / "other.npz")
    script = f"""
import numpy as np
import zlib
from qpgesture_tpu.core.config import MATCH_PRESETS, MatchConfig
from qpgesture_tpu.match import engine as E
assert not E.{flag}
import sys; sys.path.insert(0, {os.path.dirname(__file__)!r})
from fixtures import make_fixture
from test_match_parity import _stage
rng = np.random.RandomState({seed})
fx = make_fixture(rng, n_seq=4, n_test=2, codebook=64)
cfg = MatchConfig(**{{**MATCH_PRESETS[{preset!r}].__dict__,
                     "codebook_size": 64}})
db, ta, tc = _stage(cfg, fx)
res = E.CodeKNNEngine(cfg, db).predict(
    ta, tc, rng=np.random.RandomState(cfg.seed))
np.savez({out!r}, codes=res.codes)
"""
    env = {**os.environ, knob: "0",
           "JAX_PLATFORMS": "cpu",
           "PYTHONPATH": os.pathsep.join(
               [os.path.dirname(os.path.dirname(__file__)),
                os.environ.get("PYTHONPATH", "")])}
    env.pop("PALLAS_AXON_POOL_IPS", None)
    subprocess.run([sys.executable, "-c", script], env=env, check=True,
                   timeout=300)
    got = np.load(out)["codes"]
    np.testing.assert_array_equal(want.codes, got)


def test_phase_grid_size_cap(monkeypatch):
    """Above QPG_PHASE_GRIDS_MAX_MB the engine must not stage the head/tail
    pair grids (a whole-corpus database would trade its HBM headroom for
    scan speed) and the scan must fall back to in-scan slicing with
    identical codes."""
    from qpgesture_tpu.match import engine as E

    rng = np.random.RandomState(77)
    fx = make_fixture(rng, n_seq=4, n_test=2, codebook=64)
    cfg = MatchConfig(**{**MATCH_PRESETS["shipped"].__dict__,
                         "codebook_size": 64})
    db, ta, tc = _stage(cfg, fx)
    eng = E.CodeKNNEngine(cfg, db)
    assert eng.dev.aud_ht is not None        # default: staged
    want = eng.predict(ta, tc, rng=np.random.RandomState(cfg.seed))

    monkeypatch.setattr(E, "_PHASE_GRIDS_MAX_MB", 0.0)
    eng_capped = E.CodeKNNEngine(cfg, db)
    assert eng_capped.dev.aud_ht is None     # capped: fallback
    assert eng_capped.dev.txt_ht is None
    got = eng_capped.predict(ta, tc, rng=np.random.RandomState(cfg.seed))
    np.testing.assert_array_equal(want.codes, got.codes)
