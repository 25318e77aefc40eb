"""RawWavServer: the fully-fused wav -> poses ingress must reproduce the
host-staged path exactly — device staging gathers bit-match
stage_test_audio, and serving with the in-program encoder selects the same
codebook indices as encoding separately + CodeKNNEngine.predict."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qpgesture_tpu.core.config import MATCH_PRESETS, MatchConfig, VQVAEConfig
from qpgesture_tpu.match.database import (mode_geometry, stage_database,
                                          stage_test_audio,
                                          stage_test_context)
from qpgesture_tpu.match.device_staging import (stage_context_jnp,
                                                stage_wavlm_jnp,
                                                stage_wavvq_jnp)
from qpgesture_tpu.match.engine import CodeKNNEngine
from qpgesture_tpu.models.vqvae import VQVAE
from qpgesture_tpu.serve import RawWavServer

from fixtures import make_fixture


def _stage(cfg, fx):
    db = stage_database(cfg, fx["bundle"], fx["codes"], fx["signature"],
                        wavlm=fx["wavlm"], wavvq=fx["wavvq"])
    return db


def _tiny_vqvae(rng, codebook):
    vq_cfg = VQVAEConfig(width=16, depth=1, emb_width=16, l_bins=codebook,
                         input_dim=135, sample_length=30)
    model = VQVAE(vq_cfg)
    params, cb = model.init(jax.random.PRNGKey(0))
    cb = model.init_codebook_from_batch(
        params, jnp.asarray(rng.randn(2, 240, 135).astype(np.float32)),
        jax.random.PRNGKey(1))
    return model, params, cb


@pytest.mark.parametrize("mode,wavvq_mode", [
    ("wavlm_feat", "combine"), ("wavlm", "combine"),
    ("wavvq_feat", "combine"), ("wavvq_feat", "sum")])
def test_device_staging_bitmatches_host(mode, wavvq_mode):
    """match/device_staging == stage_test_audio: bit-exact for the integer
    gathers (wavvq), within 1 ulp for the interpolated wavlm modes (XLA
    contracts the lerp into an FMA; see the module docstring)."""
    rng = np.random.RandomState(41)
    cfg = MatchConfig(audio_mode=mode, wavvq_mode=wavvq_mode)
    geom = mode_geometry(cfg.audio_mode, step_sz_codes=cfg.step_sz,
                         num_frames_code=cfg.num_frames_code,
                         num_frames=cfg.num_frames)
    if mode == "wavvq_feat":
        from qpgesture_tpu.core import constants as C
        x = rng.randint(0, C.WAVVQ_VOCAB, size=(2, C.WAVVQ_FRAMES, 2)
                        ).astype(np.int32)
        got = np.asarray(jax.jit(
            lambda v: stage_wavvq_jnp(cfg, geom, v))(jnp.asarray(x)))
    else:
        x = rng.randn(2, 199, 32).astype(np.float32)
        got = np.asarray(jax.jit(
            lambda v: stage_wavlm_jnp(cfg, geom, v))(jnp.asarray(x)))

    class _DB:  # stage_test_audio only reads .geom
        pass
    db = _DB()
    db.geom = geom
    want = np.asarray(stage_test_audio(
        cfg, db, wavlm=None if mode == "wavvq_feat" else x,
        wavvq=x if mode == "wavvq_feat" else None))
    if mode == "wavvq_feat":
        np.testing.assert_array_equal(got, want)
    else:
        # 1-ulp-of-the-operands FMA tolerance on the lerp (absolute term:
        # near-cancelling lerps leave tiny values whose relative error
        # exceeds 1 ulp); zero-padded slots stay exact
        np.testing.assert_allclose(got, want, rtol=3e-7, atol=1e-6)
        np.testing.assert_array_equal(got == 0.0, want == 0.0)


def test_device_context_staging_bitmatches_host():
    rng = np.random.RandomState(43)
    cfg = MATCH_PRESETS["wavvq"]
    fx = make_fixture(rng, n_seq=3, n_test=2, codebook=32)
    cfg = dataclasses.replace(cfg, codebook_size=32)
    db = _stage(cfg, fx)
    got = np.asarray(jax.jit(
        lambda c: stage_context_jnp(db.geom, c))(
            jnp.asarray(fx["test_context"])))
    want = stage_test_context(db, fx["test_context"])
    np.testing.assert_array_equal(got, np.asarray(want))


def test_rawwav_server_wavvq_matches_host_path():
    """wav -> vq-wav2vec -> stage -> match -> decode in ONE program equals
    encoding on host + stage_test_audio + engine.predict."""
    from qpgesture_tpu.models.vq_wav2vec import VQWav2Vec, VQWav2VecConfig

    rng = np.random.RandomState(47)
    fx = make_fixture(rng, n_seq=4, n_test=2, codebook=32)
    cfg = dataclasses.replace(MATCH_PRESETS["wavvq"], codebook_size=32)
    db = _stage(cfg, fx)
    engine = CodeKNNEngine(cfg, db)
    model, params, cb = _tiny_vqvae(rng, 32)

    enc_cfg = VQWav2VecConfig(conv_layers=(
        (16, 10, 5), (16, 8, 4), (16, 4, 2), (16, 4, 2), (16, 4, 2)))
    enc = VQWav2Vec(enc_cfg)
    wav = rng.randn(2, 64000).astype(np.float32) * 0.1
    enc_params = enc.init(jax.random.PRNGKey(2), wav[:1])["params"]

    def encoder_apply(p, w):
        return enc.apply({"params": p}, w)

    codes_np = np.asarray(jax.jit(encoder_apply)(enc_params,
                                                 jnp.asarray(wav)))
    assert codes_np.shape == (2, 398, 2)
    ta = stage_test_audio(cfg, db, wavvq=codes_np)
    tc = stage_test_context(db, fx["test_context"])
    want = engine.predict(ta, tc, init_code=3,
                          init_phase=np.zeros((8, 16), np.float32),
                          rng=np.random.RandomState(cfg.seed))

    server = RawWavServer(engine, model, params, cb, encoder_apply,
                          enc_params)
    got_codes, got_poses = server.serve(
        wav, fx["test_context"], init_code=3,
        rng=np.random.RandomState(cfg.seed))
    np.testing.assert_array_equal(got_codes, want.codes)
    assert got_poses.shape == (2 * 240, 135)


def test_rawwav_server_wavlm_matches_host_path():
    """Same contract for the shipped wavlm_feat mode, incl. int16 ingress
    (int16/32768 == the host pipeline's float conversion)."""
    from qpgesture_tpu.models.wavlm import WavLMJax, WavLMJaxConfig

    rng = np.random.RandomState(53)
    fx = make_fixture(rng, n_seq=4, n_test=2, codebook=32)
    cfg = dataclasses.replace(MATCH_PRESETS["shipped"], codebook_size=32)
    db = _stage(cfg, fx)
    engine = CodeKNNEngine(cfg, db)
    model, params, cb = _tiny_vqvae(rng, 32)

    enc_cfg = WavLMJaxConfig(
        encoder_layers=2, encoder_embed_dim=32, encoder_ffn_embed_dim=64,
        encoder_attention_heads=2,
        conv_feature_layers=((16, 10, 5), (16, 3, 2)),
        conv_pos=8, conv_pos_groups=2, scan_layers=False)
    enc = WavLMJax(enc_cfg)
    wav_i16 = (rng.randn(2, 2000) * 2000).astype(np.int16)
    wav_f32 = wav_i16.astype(np.float32) / 32768.0
    enc_params = enc.init(jax.random.PRNGKey(3), wav_f32[:1])["params"]

    def encoder_apply(p, w):
        return enc.apply({"params": p}, w)

    feats_np = np.asarray(jax.jit(encoder_apply)(enc_params,
                                                 jnp.asarray(wav_f32)))
    assert feats_np.shape[-1] == 32
    ta = stage_test_audio(cfg, db, wavlm=feats_np)
    tc = stage_test_context(db, fx["test_context"])
    want = engine.predict(ta, tc, init_code=5,
                          init_phase=np.zeros((8, 16), np.float32),
                          rng=np.random.RandomState(cfg.seed))

    server = RawWavServer(engine, model, params, cb, encoder_apply,
                          enc_params)
    got_codes, _ = server.serve(wav_i16, fx["test_context"], init_code=5,
                                rng=np.random.RandomState(cfg.seed))
    np.testing.assert_array_equal(got_codes, want.codes)


def test_rawwav_server_rejects_mfcc_modes():
    rng = np.random.RandomState(59)
    fx = make_fixture(rng, n_seq=3, n_test=2, codebook=32)
    cfg = dataclasses.replace(MATCH_PRESETS["mfcc"], codebook_size=32)
    db = stage_database(cfg, fx["bundle"], fx["codes"], fx["signature"])
    engine = CodeKNNEngine(cfg, db)
    model, params, cb = _tiny_vqvae(rng, 32)
    with pytest.raises(ValueError):
        RawWavServer(engine, model, params, cb, lambda p, w: w, {})


def test_rawwav_serve_batch_matches_sequential():
    """serve_batch (C clips, one program) == serve() per clip with the
    same explicit init codes (predict_batch's tested contract)."""
    from qpgesture_tpu.models.vq_wav2vec import VQWav2Vec, VQWav2VecConfig

    rng = np.random.RandomState(61)
    fx = make_fixture(rng, n_seq=4, n_test=2, codebook=32)
    cfg = dataclasses.replace(MATCH_PRESETS["wavvq"], codebook_size=32)
    db = _stage(cfg, fx)
    engine = CodeKNNEngine(cfg, db)
    model, params, cb = _tiny_vqvae(rng, 32)

    enc_cfg = VQWav2VecConfig(conv_layers=(
        (16, 10, 5), (16, 8, 4), (16, 4, 2), (16, 4, 2), (16, 4, 2)))
    enc = VQWav2Vec(enc_cfg)
    C, W = 2, 2
    wav = (rng.randn(C, W, 64000) * 3000).astype(np.int16)
    ctx = rng.randn(C, W, 30, 384).astype(np.float32)
    enc_params = enc.init(jax.random.PRNGKey(2),
                          np.zeros((1, 64000), np.float32))["params"]

    def encoder_apply(p, w):
        return enc.apply({"params": p}, w)

    server = RawWavServer(engine, model, params, cb, encoder_apply,
                          enc_params)
    init_codes = np.array([3, 9], np.int32)
    init_phases = np.zeros((C, 8, 16), np.float32)
    got_codes, got_poses = server.serve_batch(wav, ctx, init_codes,
                                              init_phases)
    assert got_codes.shape == (C, W, 30)
    assert got_poses.shape == (C, W * 240, 135)
    for c in range(C):
        codes_c, _ = server.serve(wav[c], ctx[c], init_code=int(init_codes[c]))
        np.testing.assert_array_equal(got_codes[c], codes_c)


def test_rawwav_serve_batch_wavlm_mode():
    """serve_batch parity in the shipped wavlm_feat mode (int16 ingress)."""
    from qpgesture_tpu.models.wavlm import WavLMJax, WavLMJaxConfig

    rng = np.random.RandomState(67)
    fx = make_fixture(rng, n_seq=4, n_test=2, codebook=32)
    cfg = dataclasses.replace(MATCH_PRESETS["shipped"], codebook_size=32)
    db = _stage(cfg, fx)
    engine = CodeKNNEngine(cfg, db)
    model, params, cb = _tiny_vqvae(rng, 32)

    enc_cfg = WavLMJaxConfig(
        encoder_layers=2, encoder_embed_dim=32, encoder_ffn_embed_dim=64,
        encoder_attention_heads=2,
        conv_feature_layers=((16, 10, 5), (16, 3, 2)),
        conv_pos=8, conv_pos_groups=2, scan_layers=False)
    enc = WavLMJax(enc_cfg)
    C, W = 2, 2
    wav = (rng.randn(C, W, 2000) * 2000).astype(np.int16)
    ctx = rng.randn(C, W, 30, 384).astype(np.float32)
    enc_params = enc.init(jax.random.PRNGKey(5),
                          np.zeros((1, 2000), np.float32))["params"]

    def encoder_apply(p, w):
        return enc.apply({"params": p}, w)

    server = RawWavServer(engine, model, params, cb, encoder_apply,
                          enc_params)
    init_codes = np.array([5, 1], np.int32)
    init_phases = np.zeros((C, 8, 16), np.float32)
    got_codes, got_poses = server.serve_batch(wav, ctx, init_codes,
                                              init_phases)
    assert got_codes.shape == (C, W, 30)
    assert got_poses.shape == (C, W * 240, 135)
    for c in range(C):
        codes_c, _ = server.serve(wav[c], ctx[c],
                                  init_code=int(init_codes[c]))
        np.testing.assert_array_equal(got_codes[c], codes_c)


def test_streaming_rawwav_matches_whole_clip():
    """StreamingRawWavSession.push_wav per window == RawWavServer.serve
    over the same windows with the same init seeds."""
    from qpgesture_tpu.models.vq_wav2vec import VQWav2Vec, VQWav2VecConfig
    from qpgesture_tpu.serve import StreamingRawWavSession

    rng = np.random.RandomState(71)
    fx = make_fixture(rng, n_seq=4, n_test=2, codebook=32)
    cfg = dataclasses.replace(MATCH_PRESETS["wavvq"], codebook_size=32)
    db = _stage(cfg, fx)
    engine = CodeKNNEngine(cfg, db)
    model, params, cb = _tiny_vqvae(rng, 32)

    enc_cfg = VQWav2VecConfig(conv_layers=(
        (16, 10, 5), (16, 8, 4), (16, 4, 2), (16, 4, 2), (16, 4, 2)))
    enc = VQWav2Vec(enc_cfg)
    W = 3
    wav = (rng.randn(W, 64000) * 3000).astype(np.int16)
    ctx = rng.randn(W, 30, 384).astype(np.float32)
    enc_params = enc.init(jax.random.PRNGKey(2),
                          np.zeros((1, 64000), np.float32))["params"]

    def encoder_apply(p, w):
        return enc.apply({"params": p}, w)

    server = RawWavServer(engine, model, params, cb, encoder_apply,
                          enc_params)
    init_phase = np.zeros((8, 16), np.float32)
    want_codes, _ = server.serve(wav, ctx, init_code=7,
                                 init_phase=init_phase,
                                 rng=np.random.RandomState(cfg.seed))

    sess = StreamingRawWavSession(server, init_code=7,
                                  init_phase=init_phase,
                                  rng=np.random.RandomState(cfg.seed))
    for w in range(W):
        got = sess.push_wav(wav[w], ctx[w])
        np.testing.assert_array_equal(got, want_codes[w])


def test_streaming_rawwav_pool_matches_solo_sessions():
    """StreamingRawWavPool (C raw streams, encoder batched, one program
    per tick) must be bit-identical per stream to solo
    StreamingRawWavSessions with the same seeds."""
    from qpgesture_tpu.models.vq_wav2vec import VQWav2Vec, VQWav2VecConfig
    from qpgesture_tpu.serve import (StreamingRawWavPool,
                                     StreamingRawWavSession)

    rng = np.random.RandomState(72)
    fx = make_fixture(rng, n_seq=4, n_test=2, codebook=32)
    cfg = dataclasses.replace(MATCH_PRESETS["wavvq"], codebook_size=32)
    db = _stage(cfg, fx)
    engine = CodeKNNEngine(cfg, db)
    model, params, cb = _tiny_vqvae(rng, 32)

    enc_cfg = VQWav2VecConfig(conv_layers=(
        (16, 10, 5), (16, 8, 4), (16, 4, 2), (16, 4, 2), (16, 4, 2)))
    enc = VQWav2Vec(enc_cfg)
    C, W = 3, 2
    wav = (rng.randn(C, W, 64000) * 3000).astype(np.int16)
    ctx = rng.randn(C, W, 30, 384).astype(np.float32)
    enc_params = enc.init(jax.random.PRNGKey(2),
                          np.zeros((1, 64000), np.float32))["params"]

    def encoder_apply(p, w):
        return enc.apply({"params": p}, w)

    server = RawWavServer(engine, model, params, cb, encoder_apply,
                          enc_params)
    init_codes = np.array([7, 11, 3], np.int32)
    init_phases = rng.rand(C, 8, 16).astype(np.float32)

    solo = []
    for i in range(C):
        sess = StreamingRawWavSession(
            server, init_code=int(init_codes[i]),
            init_phase=init_phases[i],
            rng=np.random.RandomState(cfg.seed + i))
        solo.append(np.stack([sess.push_wav(wav[i, w], ctx[i, w])
                              for w in range(W)]))
    want = np.stack(solo)  # (C, W, 30)

    pool = StreamingRawWavPool(
        server, C, init_codes=init_codes, init_phases=init_phases,
        rngs=[np.random.RandomState(cfg.seed + i) for i in range(C)])
    got = np.stack([pool.tick(wav[:, w], ctx[:, w]) for w in range(W)],
                   axis=1)
    np.testing.assert_array_equal(got, want)

    # an all-inactive tick must leave every stream's seed state unchanged
    codes_before, phases_before = map(np.asarray, pool.state())
    pool.tick(wav[:, 0], ctx[:, 0], active=np.zeros((C,), bool))
    codes_after, phases_after = map(np.asarray, pool.state())
    np.testing.assert_array_equal(codes_after, codes_before)
    np.testing.assert_array_equal(phases_after, phases_before)


def test_rawwav_server_split_mode_matches_fused():
    """fused=False (two programs split at the encoder/match boundary, the
    relay-robust deployment point) must select the same indices and poses
    as the fused single program — bit-exact in wavvq mode, where the
    encoder output is integer codes that XLA fusion cannot perturb."""
    from qpgesture_tpu.models.vq_wav2vec import VQWav2Vec, VQWav2VecConfig

    rng = np.random.RandomState(48)
    fx = make_fixture(rng, n_seq=4, n_test=2, codebook=32)
    cfg = dataclasses.replace(MATCH_PRESETS["wavvq"], codebook_size=32)
    db = _stage(cfg, fx)
    engine = CodeKNNEngine(cfg, db)
    model, params, cb = _tiny_vqvae(rng, 32)

    enc_cfg = VQWav2VecConfig(conv_layers=(
        (16, 10, 5), (16, 8, 4), (16, 4, 2), (16, 4, 2), (16, 4, 2)))
    enc = VQWav2Vec(enc_cfg)
    C_CLIPS, W = 2, 2
    wav = (rng.randn(C_CLIPS, W, 64000) * 3000).astype(np.int16)
    ctx = rng.randn(C_CLIPS, W, 30, 384).astype(np.float32)
    enc_params = enc.init(jax.random.PRNGKey(2),
                          np.zeros((1, 64000), np.float32))["params"]

    def encoder_apply(p, w):
        return enc.apply({"params": p}, w)

    fused = RawWavServer(engine, model, params, cb, encoder_apply,
                         enc_params)
    split = RawWavServer(engine, model, params, cb, encoder_apply,
                         enc_params, fused=False)

    codes_f, poses_f = fused.serve(wav[0], ctx[0], init_code=3,
                                   rng=np.random.RandomState(cfg.seed))
    codes_s, poses_s = split.serve(wav[0], ctx[0], init_code=3,
                                   rng=np.random.RandomState(cfg.seed))
    np.testing.assert_array_equal(codes_s, codes_f)
    np.testing.assert_allclose(poses_s, poses_f, atol=1e-5)

    ic = np.array([3, 5], np.int32)
    bf_codes, _ = fused.serve_batch(wav, ctx, init_codes=ic)
    bs_codes, _ = split.serve_batch(wav, ctx, init_codes=ic)
    np.testing.assert_array_equal(bs_codes, bf_codes)


def test_streaming_rawwav_split_matches_fused():
    """fused=False streaming (encoder program + the staged step/tick
    programs) must match fused streaming bit-for-bit in wavvq mode, for
    both the solo session and the pool."""
    from qpgesture_tpu.models.vq_wav2vec import VQWav2Vec, VQWav2VecConfig
    from qpgesture_tpu.serve import (StreamingRawWavPool,
                                     StreamingRawWavSession)

    rng = np.random.RandomState(73)
    fx = make_fixture(rng, n_seq=4, n_test=2, codebook=32)
    cfg = dataclasses.replace(MATCH_PRESETS["wavvq"], codebook_size=32)
    db = _stage(cfg, fx)
    engine = CodeKNNEngine(cfg, db)
    model, params, cb = _tiny_vqvae(rng, 32)

    enc_cfg = VQWav2VecConfig(conv_layers=(
        (16, 10, 5), (16, 8, 4), (16, 4, 2), (16, 4, 2), (16, 4, 2)))
    enc = VQWav2Vec(enc_cfg)
    C, W = 2, 2
    wav = (rng.randn(C, W, 64000) * 3000).astype(np.int16)
    ctx = rng.randn(C, W, 30, 384).astype(np.float32)
    enc_params = enc.init(jax.random.PRNGKey(2),
                          np.zeros((1, 64000), np.float32))["params"]

    def encoder_apply(p, w):
        return enc.apply({"params": p}, w)

    server = RawWavServer(engine, model, params, cb, encoder_apply,
                          enc_params)
    ipz = np.zeros((8, 16), np.float32)

    sess_f = StreamingRawWavSession(server, init_code=7, init_phase=ipz,
                                    rng=np.random.RandomState(cfg.seed))
    sess_s = StreamingRawWavSession(server, init_code=7, init_phase=ipz,
                                    rng=np.random.RandomState(cfg.seed),
                                    fused=False)
    for w in range(W):
        np.testing.assert_array_equal(sess_s.push_wav(wav[0, w], ctx[0, w]),
                                      sess_f.push_wav(wav[0, w], ctx[0, w]))

    ic = np.array([7, 11], np.int32)
    ips = np.zeros((C, 8, 16), np.float32)
    pool_f = StreamingRawWavPool(
        server, C, init_codes=ic, init_phases=ips,
        rngs=[np.random.RandomState(cfg.seed + i) for i in range(C)])
    pool_s = StreamingRawWavPool(
        server, C, init_codes=ic, init_phases=ips,
        rngs=[np.random.RandomState(cfg.seed + i) for i in range(C)],
        fused=False)
    for w in range(W):
        np.testing.assert_array_equal(pool_s.tick(wav[:, w], ctx[:, w]),
                                      pool_f.tick(wav[:, w], ctx[:, w]))


def test_streaming_rawwav_inherits_server_fused():
    """Sessions/pools built without an explicit `fused` must inherit the
    server's deployment choice: a fused=False RawWavServer (the
    relay-robust configuration) must not silently get fully-fused per-push
    programs from its streaming surfaces (jit is lazy — construction
    compiles nothing, so this is a pure wiring test)."""
    from qpgesture_tpu.models.vq_wav2vec import VQWav2Vec, VQWav2VecConfig
    from qpgesture_tpu.serve import (StreamingRawWavPool,
                                     StreamingRawWavSession)

    rng = np.random.RandomState(49)
    fx = make_fixture(rng, n_seq=3, n_test=1, codebook=32)
    cfg = dataclasses.replace(MATCH_PRESETS["wavvq"], codebook_size=32)
    db = _stage(cfg, fx)
    engine = CodeKNNEngine(cfg, db)
    model, params, cb = _tiny_vqvae(rng, 32)
    enc_cfg = VQWav2VecConfig(conv_layers=(
        (16, 10, 5), (16, 8, 4), (16, 4, 2), (16, 4, 2), (16, 4, 2)))
    enc = VQWav2Vec(enc_cfg)
    enc_params = enc.init(jax.random.PRNGKey(2),
                          np.zeros((1, 64000), np.float32))["params"]

    def encoder_apply(p, w):
        return enc.apply({"params": p}, w)

    for server_fused in (True, False):
        server = RawWavServer(engine, model, params, cb, encoder_apply,
                              enc_params, fused=server_fused)
        sess = StreamingRawWavSession(server, init_code=1)
        pool = StreamingRawWavPool(server, 2)
        assert sess.fused is server_fused
        assert pool.fused is server_fused
        # an explicit override still wins
        assert StreamingRawWavSession(server, init_code=1,
                                      fused=not server_fused
                                      ).fused is not server_fused
        assert StreamingRawWavPool(server, 2, fused=not server_fused
                                   ).fused is not server_fused


WORDS = [(0.2, 0.5, "hello"), (0.6, 1.1, "world"), (2.0, 2.4, "wave"),
         (3.9, 4.2, "the"), (4.5, 5.0, "quick"), (6.5, 7.0, "fox")]


def test_transcript_stager_matches_database_builder_slots():
    """TranscriptContextStager.stage == embed(context_slots(...)) per
    window — the exact context the database builder writes for the same
    words (make_txt_dataset slot bucketing, make_beat_dataset.py:548-565) —
    including through the identical-text dedup path."""
    from qpgesture_tpu.pipelines.database_builder import (context_slots,
                                                          hashed_embed_fn)
    from qpgesture_tpu.serve import TranscriptContextStager

    embed = hashed_embed_fn(dim=16)
    stager = TranscriptContextStager(embed)
    W = 2
    got = stager.stage(WORDS, W)
    assert got.shape == (W, 30, 16)
    for w in range(W):
        want = embed(context_slots(WORDS, w * 4.0, (w + 1) * 4.0))
        np.testing.assert_array_equal(got[w], want)
        np.testing.assert_array_equal(stager.stage_window(WORDS, w), want)


def test_rawwav_serve_with_transcript_stager():
    """A clip served with stager-built context == the same clip served
    with the database-builder context for the same transcript ("raw
    transcript in -> context on device" end to end)."""
    from qpgesture_tpu.models.vq_wav2vec import VQWav2Vec, VQWav2VecConfig
    from qpgesture_tpu.pipelines.database_builder import (context_slots,
                                                          hashed_embed_fn)
    from qpgesture_tpu.serve import TranscriptContextStager

    rng = np.random.RandomState(53)
    fx = make_fixture(rng, n_seq=4, n_test=2, codebook=32)
    cfg = dataclasses.replace(MATCH_PRESETS["wavvq"], codebook_size=32)
    db = _stage(cfg, fx)
    engine = CodeKNNEngine(cfg, db)
    model, params, cb = _tiny_vqvae(rng, 32)
    enc_cfg = VQWav2VecConfig(conv_layers=(
        (16, 10, 5), (16, 8, 4), (16, 4, 2), (16, 4, 2), (16, 4, 2)))
    enc = VQWav2Vec(enc_cfg)
    wav = rng.randn(2, 64000).astype(np.float32) * 0.1
    enc_params = enc.init(jax.random.PRNGKey(2), wav[:1])["params"]

    def encoder_apply(p, w):
        return enc.apply({"params": p}, w)

    embed = hashed_embed_fn()
    ctx_manual = np.stack([embed(context_slots(WORDS, w * 4.0,
                                               (w + 1) * 4.0))
                           for w in range(2)])
    ctx_staged = TranscriptContextStager(embed).stage(WORDS, 2)
    np.testing.assert_array_equal(ctx_staged, ctx_manual)

    server = RawWavServer(engine, model, params, cb, encoder_apply,
                          enc_params)
    want, _ = server.serve(wav, ctx_manual, init_code=3,
                           rng=np.random.RandomState(cfg.seed))
    got, _ = server.serve(wav, ctx_staged, init_code=3,
                          rng=np.random.RandomState(cfg.seed))
    np.testing.assert_array_equal(got, want)


def test_transcript_stager_with_device_minilm(tmp_path):
    """Stager + the JAX MiniLM encoder == stager + the torch mean-pool
    oracle on the same checkpoint: the serve-time context is bit-close to
    what sentence-transformers would produce, computed on device."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from test_minilm import SMALL, _hf_model, _write_checkpoint
    from qpgesture_tpu.models.minilm import load_minilm
    from qpgesture_tpu.serve import TranscriptContextStager

    torch.manual_seed(11)
    tmodel = _hf_model(SMALL)
    ckpt = str(tmp_path / "minilm")
    _write_checkpoint(ckpt, tmodel)
    enc = load_minilm(ckpt)

    import os
    hf_tok = transformers.BertTokenizer(os.path.join(ckpt, "vocab.txt"),
                                        do_lower_case=True)

    def torch_embed(texts):
        with torch.no_grad():
            b = hf_tok(texts, padding=True, truncation=True,
                       max_length=SMALL.max_seq_length, return_tensors="pt")
            h = tmodel(input_ids=b["input_ids"],
                       attention_mask=b["attention_mask"]).last_hidden_state
            m = b["attention_mask"][..., None].float()
            return ((h * m).sum(1) / m.sum(1).clamp(min=1e-9)).numpy()

    got = TranscriptContextStager(enc).stage(WORDS, 2)
    want = TranscriptContextStager(torch_embed).stage(WORDS, 2)
    assert got.shape == want.shape == (2, 30, SMALL.hidden_size)
    np.testing.assert_allclose(got, want, atol=2e-5)
