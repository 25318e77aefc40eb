"""Serving pipeline: staged audio/context in, decoded poses out, one program.

Production path for "generate gestures for this wav": the CodeKNN match and
the VQ-VAE decode compose into a single jitted device program (one upload,
one execution, one download per request) — amortizing host-link latency,
which is the measured floor on tunnel-attached chips (ARCHITECTURE.md).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .match.engine import CodeKNNEngine, _predict_impl
from .models.vqvae import VQVAE


@dataclass
class ServingPipeline:
    """Bind a matching engine and a VQ-VAE; serve clips end to end."""
    engine: CodeKNNEngine
    model: VQVAE
    params: dict
    cb: object
    data_mean: Optional[np.ndarray] = None
    data_std: Optional[np.ndarray] = None

    def __post_init__(self):
        cfg = self.engine.cfg
        model = self.model

        # closure-constants rule (ARCHITECTURE.md): the staged database
        # must be a jit ARGUMENT, never a closure — closed over, it lowers
        # as HLO constants and the compile request carries the whole DB
        # (664 MB in wavlm mode; relay compiles hang outright)
        @partial(jax.jit, static_argnames=("n_steps",))
        def impl(n_steps, dev, devdb, params, cb, ta, tc, ic, ip, rb, rm,
                 rc, rp):
            blocks, phases, votes = _predict_impl(
                cfg, n_steps, dev, devdb,
                ta if cfg.use_aud else None,
                tc if cfg.use_txt else None,
                ic, ip, rb, rm, rc, rp)
            Q = blocks.shape[0]
            W = Q // n_steps
            codes = blocks.reshape(
                W, n_steps * cfg.step_sz)[:, :cfg.num_frames_code]
            # decode the flattened code string in one pass (window-boundary
            # smoothness through the decoder's receptive field,
            # VisualizeCodebook.py:139-146)
            poses = model.decode(
                params, cb, codes.reshape(1, -1).astype(jnp.int32))
            return codes.astype(jnp.int32), poses[0], phases

        self._impl = impl

    def serve(self, test_audio: Optional[np.ndarray],
              test_context: Optional[np.ndarray] = None,
              init_code: int = 0,
              init_phase: Optional[np.ndarray] = None,
              rng: Optional[np.random.RandomState] = None
              ) -> Tuple[np.ndarray, np.ndarray]:
        """One clip -> (codes (W, 30), poses (W*240, 135) denormalized).

        Matching semantics are identical to CodeKNNEngine.predict with the
        same rng: rand bits (no-phase aud+txt vote) and per-window re-seeds
        (non-chaining configs) come from engine._chain_inputs, not just a
        clip-start reset."""
        cfg = self.engine.cfg
        rng = rng or np.random.RandomState(cfg.seed)
        lead = test_audio if test_audio is not None else test_context
        W, S = lead.shape[:2]
        if init_phase is None:
            init_phase = np.zeros((8, 16), np.float32)
        Q = W * S
        rand_np, (rmask, rcode, rphase) = self.engine._chain_inputs(W, S,
                                                                    rng)
        if rmask is None:
            rmask = np.zeros((Q,), bool)
            rcode = np.zeros((Q,), np.int32)
            rphase = np.zeros((Q, 8, 16), np.float32)
        rmask = rmask.copy(); rcode = rcode.copy(); rphase = rphase.copy()
        rmask[0] = True
        rcode[0] = init_code
        rphase[0] = init_phase

        inputs = jax.device_put((test_audio, test_context, rand_np,
                                 rmask, rcode, rphase))
        ta, tc, rb, rm, rc, rp = inputs
        codes_d, poses_d, _ = self._impl(
            S, self.engine.dev, self.engine.devdb, self.params, self.cb,
            ta, tc,
            jnp.asarray(np.int32(init_code)), jnp.asarray(init_phase),
            rb, rm, rc, rp)
        codes, poses = jax.device_get((codes_d, poses_d))
        if self.data_mean is not None:
            std = np.clip(np.asarray(self.data_std), 0.01, None)
            poses = poses * std + np.asarray(self.data_mean)
        return np.asarray(codes), np.asarray(poses)


@dataclass
class RawWavServer:
    """Raw 16 kHz audio in, decoded poses out — the WHOLE ingress on device.

    ServingPipeline takes host-staged queries: the caller must run WavLM /
    vq-wav2vec and the per-step stacking in NumPy first (the reference does
    this in a separate torch pass, make_test_data.py:43-64, so its ~5 min
    quick-start figure EXCLUDES feature extraction). This server fuses the
    JAX encoder ports (models/wavlm.py, models/vq_wav2vec.py) and the
    staging gathers (match/device_staging.py) into the matching+decode
    program: one upload (the wav, int16 accepted), one program, one
    download — the honest wav-to-gesture serving path.

    encoder_apply(encoder_params, wav (W, n_samples) f32) must return WavLM
    features (W, F, 1024) for wavlm modes or vq-wav2vec codes (W, 398, 2)
    int32 for wavvq mode. Context embeddings remain a host input: they come
    from the transcript, not the audio (make_txt_dataset,
    make_beat_dataset.py:432). Selected indices are identical to staging
    on host and calling CodeKNNEngine.predict (tests/test_serve.py).
    """
    engine: CodeKNNEngine
    model: VQVAE
    params: dict
    cb: object
    encoder_apply: object
    encoder_params: dict
    data_mean: Optional[np.ndarray] = None
    data_std: Optional[np.ndarray] = None
    # fused=True runs encoder+staging+match+decode as ONE program (fewest
    # dispatches; the repo's largest XLA compile — minutes for the
    # WavLM-Large variant, and the compile RPC is what relay-attached
    # chips drop). fused=False splits at the encoder/match boundary: two
    # dispatches whose programs are each a fraction of the fused compile,
    # and whose match+decode half is byte-identical HLO to the
    # staged-serving path (warm from its persistent cache). Outputs are
    # identical modulo XLA fusion across the boundary (tested); the
    # intermediate features never leave HBM.
    fused: bool = True

    def __post_init__(self):
        from .match.device_staging import (stage_context_jnp,
                                           stage_wavlm_jnp, stage_wavvq_jnp)
        cfg = self.engine.cfg
        assert cfg.use_aud, "RawWavServer is the audio ingress path"
        if cfg.audio_mode not in ("wavvq_feat", "wavlm_feat", "wavlm"):
            raise ValueError(
                f"RawWavServer handles the wavvq/wavlm ingress; mode "
                f"{cfg.audio_mode!r} stages MFCC features on host "
                f"(use ServingPipeline with stage_test_audio)")
        geom = self.engine.db.geom
        model = self.model
        encoder_apply = self.encoder_apply
        n_steps = len(geom.step_clip_idx)
        self.n_steps = n_steps

        # closure-constants rule: dev/devdb are jit ARGUMENTS throughout
        @jax.jit
        def impl(dev, devdb, params, cb, enc_params, wav, ctx, ic, ip, rb,
                 rm, rc, rp):
            if jnp.issubdtype(wav.dtype, jnp.integer):
                wav = wav.astype(jnp.float32) / 32768.0
            enc = encoder_apply(enc_params, wav)
            if cfg.audio_mode == "wavvq_feat":
                ta = stage_wavvq_jnp(cfg, geom, enc)
            else:
                ta = stage_wavlm_jnp(cfg, geom, enc)
            tc = stage_context_jnp(geom, ctx) if cfg.use_txt else None
            blocks, phases, votes = _predict_impl(
                cfg, n_steps, dev, devdb, ta, tc, ic, ip, rb, rm, rc, rp)
            W = blocks.shape[0] // n_steps
            codes = blocks.reshape(
                W, n_steps * cfg.step_sz)[:, :cfg.num_frames_code]
            poses = model.decode(
                params, cb, codes.reshape(1, -1).astype(jnp.int32))
            return codes.astype(jnp.int32), poses[0], phases

        self._impl = impl

        @partial(jax.jit, static_argnames=("clips",))
        def impl_batch(dev, devdb, params, cb, enc_params, wav, ctx, rb,
                       rm, rc, rp, clips):
            if jnp.issubdtype(wav.dtype, jnp.integer):
                wav = wav.astype(jnp.float32) / 32768.0
            enc = encoder_apply(enc_params, wav)
            if cfg.audio_mode == "wavvq_feat":
                ta = stage_wavvq_jnp(cfg, geom, enc)
            else:
                ta = stage_wavlm_jnp(cfg, geom, enc)
            tc = stage_context_jnp(geom, ctx) if cfg.use_txt else None
            blocks, phases, votes = _predict_impl(
                cfg, n_steps, dev, devdb, ta, tc,
                jnp.int32(0), jnp.zeros((8, 16), jnp.float32),
                rb, rm, rc, rp, clips=clips)
            W = blocks.shape[0] // (clips * n_steps)
            codes = blocks.reshape(
                clips, W, n_steps * cfg.step_sz)[:, :, :cfg.num_frames_code]
            poses = model.decode(
                params, cb,
                codes.reshape(clips, -1).astype(jnp.int32))
            return codes.astype(jnp.int32), poses

        self._impl_batch = impl_batch

        # ---- split-mode programs (fused=False); jit is lazy, so defining
        # these costs nothing when unused. The split mirrors the
        # measured-and-kept program structure of the staged path (the
        # match+decode fusion was REJECTED at full size — its combined
        # compile exceeded 9 min through the relay, ARCHITECTURE.md):
        # encoder+staging / _predict_impl / decode, where the latter two
        # are byte-identical HLO to the staged-serving programs and come
        # warm from their persistent cache. ----
        @jax.jit
        def enc_impl(enc_params, wav, ctx):
            if jnp.issubdtype(wav.dtype, jnp.integer):
                wav = wav.astype(jnp.float32) / 32768.0
            enc = encoder_apply(enc_params, wav)
            if cfg.audio_mode == "wavvq_feat":
                ta = stage_wavvq_jnp(cfg, geom, enc)
            else:
                ta = stage_wavlm_jnp(cfg, geom, enc)
            tc = stage_context_jnp(geom, ctx) if cfg.use_txt else None
            return ta, tc

        self._enc_impl = enc_impl

        @partial(jax.jit, static_argnames=("clips",))
        def extract_codes(blocks, clips):
            codes = blocks.reshape(
                clips, -1, n_steps * cfg.step_sz)[:, :,
                                                  :cfg.num_frames_code]
            return codes.astype(jnp.int32)

        self._extract_codes = extract_codes

        @jax.jit
        def decode_impl(params, cb, z):
            return model.decode(params, cb, z)

        self._decode_impl = decode_impl

    def _serve_split(self, wav_d, ctx_d, ic, ip, rb, rm, rc, rp, clips=1):
        """Split-mode body: 4 dispatches (encoder+staging, cached match,
        tiny code-extract, cached decode); intermediates stay in HBM."""
        cfg = self.engine.cfg
        ta, tc = self._enc_impl(self.encoder_params, wav_d, ctx_d)
        if clips > 1:
            blocks, phases, _ = _predict_impl(
                cfg, self.n_steps, self.engine.dev, self.engine.devdb,
                ta, tc, jnp.int32(0), jnp.zeros((8, 16), jnp.float32),
                rb, rm, rc, rp, clips=clips)
        else:
            blocks, phases, _ = _predict_impl(
                cfg, self.n_steps, self.engine.dev, self.engine.devdb,
                ta, tc, ic, ip, rb, rm, rc, rp)
        codes = self._extract_codes(blocks, clips=clips)
        poses = self._decode_impl(
            self.params, self.cb, codes.reshape(clips, -1))
        return codes, poses, phases

    def serve_batch(self, wav: np.ndarray,
                    test_context: Optional[np.ndarray] = None,
                    init_codes: Optional[np.ndarray] = None,
                    init_phases: Optional[np.ndarray] = None,
                    rng: Optional[np.random.RandomState] = None
                    ) -> Tuple[np.ndarray, np.ndarray]:
        """Batched raw-audio serving: C independent clips in ONE program.

        wav: (C, W, n_samples) int16/f32; test_context: (C, W, 30, 384)
        when cfg.use_txt. The C*W windows batch through the encoder (good
        MXU shapes) and the fusion runs C vmapped lanes with seed resets at
        clip boundaries (engine.predict_batch semantics — per-clip results
        equal serve() with the same explicit init_codes). Returns
        (codes (C, W, 30), poses (C, W*240, 135) denormalized)."""
        cfg = self.engine.cfg
        C, W = wav.shape[:2]
        S = self.n_steps
        (_, _, reset_mask, reset_code, reset_phase,
         rand_bits) = self.engine._batch_inputs(
            C, W, S, None, None, init_codes, init_phases, rng)
        wav_flat = wav.reshape((C * W,) + wav.shape[2:])
        ctx_flat = None
        if cfg.use_txt:
            ctx_flat = test_context.reshape((C * W,)
                                            + test_context.shape[2:])
        inputs = jax.device_put((wav_flat, ctx_flat, rand_bits, reset_mask,
                                 reset_code, reset_phase))
        wv, tc, rb, rm, rc, rp = inputs
        if self.fused:
            codes_d, poses_d = self._impl_batch(
                self.engine.dev, self.engine.devdb, self.params, self.cb,
                self.encoder_params, wv, tc, rb, rm, rc, rp, clips=C)
        else:
            codes_d, poses_d, _ = self._serve_split(
                wv, tc, None, None, rb, rm, rc, rp, clips=C)
        codes, poses = jax.device_get((codes_d, poses_d))
        if self.data_mean is not None:
            std = np.clip(np.asarray(self.data_std), 0.01, None)
            poses = poses * std + np.asarray(self.data_mean)
        return np.asarray(codes), np.asarray(poses)

    def serve_sharded(self, mesh, wav: np.ndarray,
                      test_context: Optional[np.ndarray] = None,
                      init_code: int = 0,
                      init_phase: Optional[np.ndarray] = None,
                      rng: Optional[np.random.RandomState] = None
                      ) -> Tuple[np.ndarray, np.ndarray]:
        """Split-mode raw-wav serving with DB-sharded matching: the
        encoder+staging program runs as in fused=False, the candidate
        scoring shards the J axis over `mesh` (tie-preserving pmin), the
        fusion scan and decode run replicated. Same codes as serve() with
        the same rng — the multi-chip raw-wav surface for databases past
        one chip's HBM (exercised by dryrun_multichip)."""
        from .match.engine import _fuse_scan
        from .parallel.sharded_match import build_sharded_tables
        cfg = self.engine.cfg
        rng = rng or np.random.RandomState(cfg.seed)
        W = wav.shape[0]
        S = self.n_steps
        if init_phase is None:
            init_phase = np.zeros((8, 16), np.float32)
        Q = W * S
        rand_np, (rmask, rcode, rphase) = self.engine._chain_inputs(W, S,
                                                                    rng)
        ta, tc = self._enc_impl(self.encoder_params, jnp.asarray(wav),
                                jnp.asarray(test_context)
                                if test_context is not None else None)
        tables = build_sharded_tables(
            cfg, self.engine.db, mesh,
            np.asarray(ta) if cfg.use_aud else None,
            np.asarray(tc) if cfg.use_txt else None)
        rb = jnp.asarray(rand_np) if rand_np is not None else None
        reset = tuple(jnp.asarray(r) if r is not None else None
                      for r in (rmask, rcode, rphase))
        blocks, phases, _ = _fuse_scan(
            cfg, S, self.engine.dev, tables,
            jnp.asarray(np.int32(init_code)),
            jnp.asarray(init_phase, jnp.float32), rb, *reset)
        codes_d = self._extract_codes(blocks, clips=1)
        poses_d = self._decode_impl(self.params, self.cb,
                                    codes_d.reshape(1, -1))
        codes, poses = jax.device_get((codes_d[0], poses_d[0]))
        if self.data_mean is not None:
            std = np.clip(np.asarray(self.data_std), 0.01, None)
            poses = poses * std + np.asarray(self.data_mean)
        return np.asarray(codes), np.asarray(poses)

    def serve(self, wav: np.ndarray,
              test_context: Optional[np.ndarray] = None,
              init_code: int = 0,
              init_phase: Optional[np.ndarray] = None,
              rng: Optional[np.random.RandomState] = None
              ) -> Tuple[np.ndarray, np.ndarray]:
        """wav (W, n_samples) int16/f32 windows (+ (W, 30, 384) context when
        cfg.use_txt) -> (codes (W, 30), poses (W*240, 135) denormalized)."""
        cfg = self.engine.cfg
        rng = rng or np.random.RandomState(cfg.seed)
        W = wav.shape[0]
        S = self.n_steps
        if init_phase is None:
            init_phase = np.zeros((8, 16), np.float32)
        Q = W * S
        rand_np, (rmask, rcode, rphase) = self.engine._chain_inputs(W, S,
                                                                    rng)
        if rmask is None:
            rmask = np.zeros((Q,), bool)
            rcode = np.zeros((Q,), np.int32)
            rphase = np.zeros((Q, 8, 16), np.float32)
        rmask = rmask.copy(); rcode = rcode.copy(); rphase = rphase.copy()
        rmask[0] = True
        rcode[0] = init_code
        rphase[0] = init_phase

        inputs = jax.device_put((wav, test_context, rand_np,
                                 rmask, rcode, rphase))
        wv, tc, rb, rm, rc, rp = inputs
        ic = jnp.asarray(np.int32(init_code))
        ip = jnp.asarray(init_phase)
        if self.fused:
            codes_d, poses_d, _ = self._impl(
                self.engine.dev, self.engine.devdb, self.params, self.cb,
                self.encoder_params, wv, tc, ic, ip, rb, rm, rc, rp)
        else:
            codes_d, poses_d, _ = self._serve_split(
                wv, tc, ic, ip, rb, rm, rc, rp)
            codes_d, poses_d = codes_d[0], poses_d[0]
        codes, poses = jax.device_get((codes_d, poses_d))
        if self.data_mean is not None:
            std = np.clip(np.asarray(self.data_std), 0.01, None)
            poses = poses * std + np.asarray(self.data_mean)
        return np.asarray(codes), np.asarray(poses)


class TranscriptContextStager:
    """Raw transcript in, per-window context embeddings out — the text
    analog of RawWavServer's audio ingress.

    The reference computes context embeddings offline with
    sentence-transformers (make_txt_dataset, make_beat_dataset.py:432-580:
    word->code-slot bucketing at :548-565, MiniLM at :446-447); at serve
    time it can only consume precomputed context.  This stager runs the
    same pipeline live: host word->slot bucketing (context_slots — the
    identical function the database builder uses) + the device-native
    MiniLM port (models/minilm.py) for the embeddings, so "transcript in,
    context on device" needs no torch at serve time.

    `embed_fn` is any texts->(n, 384) callable; pass a
    `models.minilm.MiniLMEncoder` for the on-device path.  Identical slot
    texts (common: ±3-slot joins repeat across neighbouring slots, and
    silent stretches are all "") are embedded once per clip."""

    def __init__(self, embed_fn, num_codes: int = 30,
                 window_sec: float = 4.0, stride_time: int = 4,
                 step_sz: int = 8):
        self.embed_fn = embed_fn
        self.num_codes = num_codes
        self.window_sec = window_sec
        self.stride_time = stride_time
        self.step_sz = step_sz

    def stage(self, words, n_windows: int) -> np.ndarray:
        """words: [(start_s, end_s, word), ...]; -> (W, num_codes, D) f32
        context, directly usable as `test_context` in ServingPipeline.serve
        / RawWavServer.serve."""
        from .pipelines.database_builder import context_slots
        texts = []
        for w in range(n_windows):
            texts.extend(context_slots(
                words, w * self.window_sec, (w + 1) * self.window_sec,
                stride_time=self.stride_time, num_codes=self.num_codes,
                step_sz=self.step_sz))
        uniq: dict = {}
        for t in texts:
            if t not in uniq:
                uniq[t] = len(uniq)
        emb = np.asarray(self.embed_fn(list(uniq)), np.float32)
        idx = np.asarray([uniq[t] for t in texts], np.int64)
        return emb[idx].reshape(n_windows, self.num_codes, -1)

    def stage_window(self, words, window_index: int) -> np.ndarray:
        """One window for the streaming surfaces: -> (num_codes, D) f32
        raw context (feed through stage_context_jnp / the raw-wav
        sessions' ctx input for that window)."""
        from .pipelines.database_builder import context_slots
        texts = context_slots(
            words, window_index * self.window_sec,
            (window_index + 1) * self.window_sec,
            stride_time=self.stride_time, num_codes=self.num_codes,
            step_sz=self.step_sz)
        uniq: dict = {}
        for t in texts:
            if t not in uniq:
                uniq[t] = len(uniq)
        emb = np.asarray(self.embed_fn(list(uniq)), np.float32)
        idx = np.asarray([uniq[t] for t in texts], np.int64)
        return emb[idx]


class StreamingSession:
    """Incremental (live-audio) matching: one 4 s window per call, with the
    seed state persistent on device between calls.

    The sequential structure of the search (seed code/phase chaining across
    windows, GestureKNN.py:789-802) already permits window-at-a-time
    execution: each push_window uploads only that window's staged features
    (wavvq: 8x11 int32, ~350 B; wavlm_feat: 8x6144 f32, ~200 KB), runs the
    single-window program against the HBM-resident database, and leaves the
    new seed code/phase in HBM for the next call. Bit-identical to
    whole-clip CodeKNNEngine.predict over the same windows (parity test in
    tests/test_match_parity.py).

    Only window-chaining configs stream (non-chaining modes re-seed every
    window from host randomness — there is no state to carry). The
    no-phase aud+txt vote mode draws its per-step rand bits from the
    session rng at each push, matching predict()'s draw order.
    """

    def __init__(self, engine: CodeKNNEngine,
                 init_code: Optional[int] = None,
                 init_phase: Optional[np.ndarray] = None,
                 rng: Optional[np.random.RandomState] = None):
        cfg = engine.cfg
        assert cfg.chain_windows, (
            "streaming requires a window-chaining config; non-chaining "
            "modes (mfcc/raw presets) re-seed every window")
        self.engine = engine
        self.cfg = cfg
        self.rng = rng or np.random.RandomState(cfg.seed)
        if init_code is None:
            from .match.oracle import CodeKNNOracle
            init_code, got_phase = CodeKNNOracle(
                engine.db).init_code_phase(self.rng)
            if init_phase is None:
                init_phase = got_phase
        if init_phase is None:
            init_phase = np.zeros((8, 16), np.float32)
        self._code_d, self._phase_d = jax.device_put(
            (np.int32(init_code), np.asarray(init_phase, np.float32)))
        self._needs_rand = (not cfg.use_phase and cfg.use_aud
                            and cfg.use_txt)

        # closure-constants rule: dev/devdb are jit ARGUMENTS
        @partial(jax.jit, static_argnames=("n_steps",))
        def step(n_steps, dev, devdb, ta, tc, code, phase, rb):
            blocks, phases, votes = _predict_impl(
                cfg, n_steps, dev, devdb,
                ta if cfg.use_aud else None,
                tc if cfg.use_txt else None,
                code, phase, rb)
            codes = blocks.reshape(
                1, n_steps * cfg.step_sz)[:, :cfg.num_frames_code]
            # next window's seeds: the last kept code and the final step's
            # phase tail — exactly what predict() chains host-side
            new_code = codes[0, -1].astype(jnp.int32)
            new_phase = phases[-1]
            return codes.astype(jnp.int32), new_phase, new_code, votes

        self._step = step

    def push_window(self, test_audio_w: Optional[np.ndarray],
                    test_context_w: Optional[np.ndarray] = None
                    ) -> np.ndarray:
        """One staged window in -> (30,) int32 codes out.

        test_audio_w: (S, ...) one window of stage_test_audio output;
        test_context_w: (S, 384) one window of stage_test_context output.
        The fetched codes are the only download; seeds stay on device."""
        cfg = self.cfg
        lead = test_audio_w if test_audio_w is not None else test_context_w
        S = lead.shape[0]
        rb = None
        if self._needs_rand:
            rb = (self.rng.rand(S) > 0.5).astype(np.int32)
        ta = test_audio_w[None] if cfg.use_aud else None
        tc = test_context_w[None] if cfg.use_txt else None
        ta, tc, rb = jax.device_put((ta, tc, rb))
        codes, self._phase_d, self._code_d, _ = self._step(
            S, self.engine.dev, self.engine.devdb, ta, tc,
            self._code_d, self._phase_d, rb)
        return np.asarray(codes)[0]

    def state(self):
        """(seed_code, seed_phase) currently resident on device."""
        return self._code_d, self._phase_d


def _pool_seeds(engine, n_streams, init_codes, init_phases, rngs, cfg):
    """Per-stream initial seeds, drawn exactly as StreamingSession draws
    them (oracle init_code_phase from each stream's own rng when not
    given), so pool streams are interchangeable with solo sessions."""
    from .match.oracle import CodeKNNOracle
    oracle = CodeKNNOracle(engine.db)
    codes0 = np.zeros((n_streams,), np.int32)
    phases0 = np.zeros((n_streams, 8, 16), np.float32)
    for i in range(n_streams):
        ic = None if init_codes is None else init_codes[i]
        ip = None if init_phases is None else init_phases[i]
        if ic is None:
            ic, got = oracle.init_code_phase(rngs[i])
            if ip is None:
                ip = got
        if ip is None:
            ip = np.zeros((8, 16), np.float32)
        codes0[i] = ic
        phases0[i] = ip
    return codes0, phases0


def _pool_reset_inputs(n_steps, codes, phases):
    """Seed the step-0 reset of each vmapped lane from the carried
    per-stream state (device arrays — nothing round-trips to host)."""
    C = codes.shape[0]
    Q = C * n_steps
    rm = jnp.zeros((Q,), bool).at[::n_steps].set(True)
    rc = jnp.zeros((Q,), jnp.int32).at[::n_steps].set(codes)
    rp = jnp.zeros((Q, 8, 16), jnp.float32).at[::n_steps].set(phases)
    return rm, rc, rp


class StreamingPool:
    """C concurrent live streams in ONE device program per tick.

    Production serving multiplexes many live sessions onto one chip; a
    Python loop over StreamingSession objects pays one dispatch (and one
    link RTT) per stream per window. The pool carries ALL per-stream seed
    state — codes (C,), phases (C, 8, 16) — in HBM and advances every
    stream one window per tick() through the vmapped per-clip fusion
    (engine._fuse_scan_clips with W=1): each lane's step-0 reset is fed
    from the carried state, so stream i's codes are bit-identical to an
    independent StreamingSession with the same init seeds and rng
    (tests/test_serve.py). Chaining configs only, like StreamingSession;
    the no-phase aud+txt vote mode draws each stream's per-step rand bits
    from that stream's own rng, matching the solo session's draw order.
    """

    def __init__(self, engine: CodeKNNEngine, n_streams: int,
                 init_codes: Optional[np.ndarray] = None,
                 init_phases: Optional[np.ndarray] = None,
                 rngs: Optional[list] = None):
        cfg = engine.cfg
        assert cfg.chain_windows, (
            "streaming requires a window-chaining config; non-chaining "
            "modes (mfcc/raw presets) re-seed every window")
        self.engine = engine
        self.cfg = cfg
        self.n_streams = n_streams
        self.rngs = rngs or [np.random.RandomState(cfg.seed + i)
                             for i in range(n_streams)]
        assert len(self.rngs) == n_streams
        codes0, phases0 = _pool_seeds(engine, n_streams, init_codes,
                                      init_phases, self.rngs, cfg)
        self._codes_d, self._phases_d = jax.device_put((codes0, phases0))
        self._needs_rand = (not cfg.use_phase and cfg.use_aud
                            and cfg.use_txt)

        # closure-constants rule: dev/devdb are jit ARGUMENTS
        @partial(jax.jit, static_argnames=("n_steps",))
        def tick(n_steps, dev, devdb, ta, tc, codes, phases, rb, active):
            C = codes.shape[0]
            rm, rc, rp = _pool_reset_inputs(n_steps, codes, phases)
            blocks, step_phases, _ = _predict_impl(
                cfg, n_steps, dev, devdb,
                ta if cfg.use_aud else None,
                tc if cfg.use_txt else None,
                jnp.int32(0), jnp.zeros((8, 16), jnp.float32),
                rb, rm, rc, rp, clips=C)
            out = blocks.reshape(
                C, n_steps * cfg.step_sz)[:, :cfg.num_frames_code]
            new_codes = out[:, -1].astype(jnp.int32)
            new_phases = step_phases.reshape(
                (C, n_steps) + step_phases.shape[1:])[:, -1]
            # idle streams (active=False) keep their seed state; their
            # lane still computes (shapes are static) but the result is
            # discarded by the caller
            new_codes = jnp.where(active, new_codes, codes)
            new_phases = jnp.where(active[:, None, None], new_phases,
                                   phases)
            return out.astype(jnp.int32), new_phases, new_codes

        self._tick = tick

        @jax.jit
        def reset(codes, phases, idx, code, phase):
            return codes.at[idx].set(code), phases.at[idx].set(phase)

        self._reset = reset

    def tick(self, test_audio: Optional[np.ndarray],
             test_context: Optional[np.ndarray] = None,
             active: Optional[np.ndarray] = None) -> np.ndarray:
        """One staged window PER STREAM in -> (C, 30) int32 codes out.

        test_audio: (C, S, ...) stage_test_audio output, one window per
        stream; test_context: (C, S, 384). Seeds stay on device.
        active: optional (C,) bool — streams marked False keep their seed
        state unchanged (their row of the returned codes is meaningless);
        pass it when only some streams have a new window this tick.
        Inactive streams' rngs are NOT advanced (pass zero-filled rows
        for their window slots)."""
        cfg = self.cfg
        lead = test_audio if test_audio is not None else test_context
        S = lead.shape[1]
        if active is None:
            active = np.ones((self.n_streams,), bool)
        active = np.asarray(active, bool)
        rb = None
        if self._needs_rand:
            rb = np.stack([
                (self.rngs[i].rand(S) > 0.5).astype(np.int32) if active[i]
                else np.zeros((S,), np.int32)
                for i in range(self.n_streams)]).reshape(-1)
        ta = test_audio if cfg.use_aud else None
        tc = test_context if cfg.use_txt else None
        ta, tc, rb, act = jax.device_put((ta, tc, rb, active))
        codes, self._phases_d, self._codes_d = self._tick(
            S, self.engine.dev, self.engine.devdb, ta, tc,
            self._codes_d, self._phases_d, rb, act)
        return np.asarray(codes)

    def tick_sharded(self, mesh, test_audio: Optional[np.ndarray],
                     test_context: Optional[np.ndarray] = None,
                     active: Optional[np.ndarray] = None) -> np.ndarray:
        """tick() with DB-sharded candidate scoring: the O(DB) distance
        work shards the J axis over `mesh` (build_sharded_tables' tie-
        preserving pmin) and the per-clip fusion runs replicated — the
        multi-chip streaming surface for databases past one chip's HBM.
        Bit-identical to tick() with the same inputs (dryrun_multichip
        checks this on the virtual mesh); the carried seed state is shared
        with tick(), so the two can interleave."""
        from .parallel.sharded_match import build_sharded_tables
        from .match.engine import _fuse_scan_clips
        cfg = self.cfg
        lead = test_audio if test_audio is not None else test_context
        C, S = lead.shape[:2]
        if active is None:
            active = np.ones((self.n_streams,), bool)
        active = np.asarray(active, bool)
        rb = None
        if self._needs_rand:
            rb = jnp.asarray(np.stack([
                (self.rngs[i].rand(S) > 0.5).astype(np.int32) if active[i]
                else np.zeros((S,), np.int32)
                for i in range(self.n_streams)]).reshape(-1))
        tables = build_sharded_tables(
            cfg, self.engine.db, mesh,
            np.asarray(test_audio) if cfg.use_aud else None,
            np.asarray(test_context) if cfg.use_txt else None)
        rm, rc, rp = _pool_reset_inputs(S, self._codes_d, self._phases_d)
        blocks, step_phases, _ = _fuse_scan_clips(
            cfg, S, C, self.engine.dev, tables, rb, rm, rc, rp)
        out = blocks.reshape(C, S * cfg.step_sz)[:, :cfg.num_frames_code]
        new_codes = out[:, -1].astype(jnp.int32)
        new_phases = step_phases.reshape(
            (C, S) + step_phases.shape[1:])[:, -1]
        act = jnp.asarray(active)
        self._codes_d = jnp.where(act, new_codes, self._codes_d)
        self._phases_d = jnp.where(act[:, None, None], new_phases,
                                   self._phases_d)
        return np.asarray(out.astype(jnp.int32))

    def reset_stream(self, idx: int, init_code: Optional[int] = None,
                     init_phase: Optional[np.ndarray] = None,
                     rng: Optional[np.random.RandomState] = None):
        """Re-seed stream idx in place (a client left and a new one joined
        its slot). Draws oracle init seeds from `rng` (or the stream's
        existing rng) when not given, exactly like construction."""
        if rng is not None:
            self.rngs[idx] = rng
        if init_code is None:
            from .match.oracle import CodeKNNOracle
            init_code, got = CodeKNNOracle(
                self.engine.db).init_code_phase(self.rngs[idx])
            if init_phase is None:
                init_phase = got
        if init_phase is None:
            init_phase = np.zeros((8, 16), np.float32)
        self._codes_d, self._phases_d = self._reset(
            self._codes_d, self._phases_d, jnp.int32(idx),
            jnp.int32(init_code),
            jnp.asarray(init_phase, jnp.float32))

    def state(self):
        """(seed_codes (C,), seed_phases (C, 8, 16)) on device."""
        return self._codes_d, self._phases_d


class StreamingRawWavPool:
    """C concurrent live RAW-AUDIO streams, encoder fused, one program per
    tick: wav (C, n_samples) in, codes (C, 30) out. The C windows batch
    through the WavLM / vq-wav2vec encoder (the per-stream solo session
    runs the encoder at batch 1 — the pool's batching is where the MXU
    utilization comes from), then the staging gathers and the vmapped
    per-stream fusion run as in StreamingPool. Stream i is bit-identical
    to a solo StreamingRawWavSession with the same seeds and rng."""

    def __init__(self, server: RawWavServer, n_streams: int,
                 init_codes: Optional[np.ndarray] = None,
                 init_phases: Optional[np.ndarray] = None,
                 rngs: Optional[list] = None,
                 fused: Optional[bool] = None):
        from .match.device_staging import (stage_context_jnp,
                                           stage_wavlm_jnp, stage_wavvq_jnp)
        engine = server.engine
        cfg = engine.cfg
        assert cfg.chain_windows, (
            "streaming requires a window-chaining config; non-chaining "
            "modes (mfcc/raw presets) re-seed every window")
        self.server = server
        self.engine = engine  # for the borrowed reset_stream
        self.cfg = cfg
        # None = inherit the server's deployment choice: a fused=False
        # server (the relay-robust configuration) must not silently get
        # fully-fused per-tick programs from its pools
        self.fused = server.fused if fused is None else fused
        self.n_streams = n_streams
        self.rngs = rngs or [np.random.RandomState(cfg.seed + i)
                             for i in range(n_streams)]
        assert len(self.rngs) == n_streams
        codes0, phases0 = _pool_seeds(engine, n_streams, init_codes,
                                      init_phases, self.rngs, cfg)
        self._codes_d, self._phases_d = jax.device_put((codes0, phases0))
        self._needs_rand = (not cfg.use_phase and cfg.use_aud
                            and cfg.use_txt)
        geom = engine.db.geom
        encoder_apply = server.encoder_apply
        n_steps = len(geom.step_clip_idx)
        self.n_steps = n_steps

        @jax.jit
        def tick(dev, devdb, enc_params, wav, ctx, codes, phases, rb,
                 active):
            C = codes.shape[0]
            if jnp.issubdtype(wav.dtype, jnp.integer):
                wav = wav.astype(jnp.float32) / 32768.0
            enc = encoder_apply(enc_params, wav)
            if cfg.audio_mode == "wavvq_feat":
                ta = stage_wavvq_jnp(cfg, geom, enc)
            else:
                ta = stage_wavlm_jnp(cfg, geom, enc)
            tc = stage_context_jnp(geom, ctx) if cfg.use_txt else None
            rm, rc, rp = _pool_reset_inputs(n_steps, codes, phases)
            blocks, step_phases, _ = _predict_impl(
                cfg, n_steps, dev, devdb, ta, tc,
                jnp.int32(0), jnp.zeros((8, 16), jnp.float32),
                rb, rm, rc, rp, clips=C)
            out = blocks.reshape(
                C, n_steps * cfg.step_sz)[:, :cfg.num_frames_code]
            new_codes = out[:, -1].astype(jnp.int32)
            new_phases = step_phases.reshape(
                (C, n_steps) + step_phases.shape[1:])[:, -1]
            new_codes = jnp.where(active, new_codes, codes)
            new_phases = jnp.where(active[:, None, None], new_phases,
                                   phases)
            return out.astype(jnp.int32), new_phases, new_codes

        self._tick = tick

        # split-mode (fused=False): encoder+staging program, then the
        # SAME tick program the staged StreamingPool runs (shared warm
        # cache; see RawWavServer fused=False for why)
        @jax.jit
        def enc_stage(enc_params, wav, ctx):
            if jnp.issubdtype(wav.dtype, jnp.integer):
                wav = wav.astype(jnp.float32) / 32768.0
            enc = encoder_apply(enc_params, wav)
            if cfg.audio_mode == "wavvq_feat":
                ta = stage_wavvq_jnp(cfg, geom, enc)
            else:
                ta = stage_wavlm_jnp(cfg, geom, enc)
            tc = stage_context_jnp(geom, ctx) if cfg.use_txt else None
            return ta, tc

        self._enc_stage = enc_stage

        @jax.jit
        def staged_tick(dev, devdb, ta, tc, codes, phases, rb, active):
            C = codes.shape[0]
            rm, rc, rp = _pool_reset_inputs(n_steps, codes, phases)
            blocks, step_phases, _ = _predict_impl(
                cfg, n_steps, dev, devdb, ta, tc,
                jnp.int32(0), jnp.zeros((8, 16), jnp.float32),
                rb, rm, rc, rp, clips=C)
            out = blocks.reshape(
                C, n_steps * cfg.step_sz)[:, :cfg.num_frames_code]
            new_codes = out[:, -1].astype(jnp.int32)
            new_phases = step_phases.reshape(
                (C, n_steps) + step_phases.shape[1:])[:, -1]
            new_codes = jnp.where(active, new_codes, codes)
            new_phases = jnp.where(active[:, None, None], new_phases,
                                   phases)
            return out.astype(jnp.int32), new_phases, new_codes

        self._staged_tick = staged_tick

        @jax.jit
        def reset(codes, phases, idx, code, phase):
            return codes.at[idx].set(code), phases.at[idx].set(phase)

        self._reset = reset

    def tick(self, wav: np.ndarray,
             context: Optional[np.ndarray] = None,
             active: Optional[np.ndarray] = None) -> np.ndarray:
        """One raw wav window PER STREAM: wav (C, n_samples) int16/f32
        (+ (C, 30, 384) context when cfg.use_txt) -> (C, 30) codes.
        active: optional (C,) bool, as in StreamingPool.tick."""
        cfg = self.cfg
        if active is None:
            active = np.ones((self.n_streams,), bool)
        active = np.asarray(active, bool)
        rb = None
        if self._needs_rand:
            rb = np.stack([
                (self.rngs[i].rand(self.n_steps) > 0.5).astype(np.int32)
                if active[i] else np.zeros((self.n_steps,), np.int32)
                for i in range(self.n_streams)]).reshape(-1)
        ctx = context if cfg.use_txt else None
        wav, ctx, rb, act = jax.device_put((wav, ctx, rb, active))
        dev, devdb = self.engine.dev, self.engine.devdb
        if self.fused:
            codes, self._phases_d, self._codes_d = self._tick(
                dev, devdb, self.server.encoder_params, wav, ctx,
                self._codes_d, self._phases_d, rb, act)
        else:
            ta, tc = self._enc_stage(self.server.encoder_params, wav, ctx)
            codes, self._phases_d, self._codes_d = self._staged_tick(
                dev, devdb, ta, tc, self._codes_d, self._phases_d, rb,
                act)
        return np.asarray(codes)

    reset_stream = StreamingPool.reset_stream

    def state(self):
        """(seed_codes (C,), seed_phases (C, 8, 16)) on device."""
        return self._codes_d, self._phases_d


class StreamingRawWavSession:
    """Live-audio streaming with the encoder fused in: one raw 4 s wav
    window per call, codes out, seed state persistent on device.

    StreamingSession takes host-staged features; this session fuses the
    JAX encoder (WavLM / vq-wav2vec) and the per-window staging gathers
    into the per-push program, so a microphone loop only ships the raw
    int16 window (~125 KB at 16 kHz) each push. Window w's codes are
    bit-identical to RawWavServer.serve over the same windows with the
    same init seeds (tests/test_serve.py) — the sequential seed chain
    (GestureKNN.py:789-802) is carried in HBM exactly as StreamingSession
    does. Chaining configs only, like StreamingSession.
    """

    def __init__(self, server: RawWavServer,
                 init_code: Optional[int] = None,
                 init_phase: Optional[np.ndarray] = None,
                 rng: Optional[np.random.RandomState] = None,
                 fused: Optional[bool] = None):
        from .match.device_staging import (stage_context_jnp,
                                           stage_wavlm_jnp, stage_wavvq_jnp)
        engine = server.engine
        cfg = engine.cfg
        assert cfg.chain_windows, (
            "streaming requires a window-chaining config; non-chaining "
            "modes (mfcc/raw presets) re-seed every window")
        self.server = server
        self.cfg = cfg
        # None = inherit server.fused (see StreamingRawWavPool)
        self.fused = server.fused if fused is None else fused
        self.rng = rng or np.random.RandomState(cfg.seed)
        if init_code is None:
            from .match.oracle import CodeKNNOracle
            init_code, got_phase = CodeKNNOracle(
                engine.db).init_code_phase(self.rng)
            if init_phase is None:
                init_phase = got_phase
        if init_phase is None:
            init_phase = np.zeros((8, 16), np.float32)
        self._code_d, self._phase_d = jax.device_put(
            (np.int32(init_code), np.asarray(init_phase, np.float32)))
        self._needs_rand = (not cfg.use_phase and cfg.use_aud
                            and cfg.use_txt)
        geom = engine.db.geom
        encoder_apply = server.encoder_apply
        n_steps = len(geom.step_clip_idx)
        self.n_steps = n_steps

        @jax.jit
        def step(dev, devdb, enc_params, wav, ctx, code, phase, rb):
            if jnp.issubdtype(wav.dtype, jnp.integer):
                wav = wav.astype(jnp.float32) / 32768.0
            enc = encoder_apply(enc_params, wav)
            if cfg.audio_mode == "wavvq_feat":
                ta = stage_wavvq_jnp(cfg, geom, enc)
            else:
                ta = stage_wavlm_jnp(cfg, geom, enc)
            tc = stage_context_jnp(geom, ctx) if cfg.use_txt else None
            blocks, phases, votes = _predict_impl(
                cfg, n_steps, dev, devdb, ta, tc, code, phase, rb)
            codes = blocks.reshape(
                1, n_steps * cfg.step_sz)[:, :cfg.num_frames_code]
            new_code = codes[0, -1].astype(jnp.int32)
            new_phase = phases[-1]
            return codes.astype(jnp.int32), new_phase, new_code

        self._step = step

        # split-mode (fused=False) programs: encoder+staging, then the
        # SAME per-window step program the staged StreamingSession runs
        # (shared warm cache; see RawWavServer fused=False for why)
        @jax.jit
        def enc_stage(enc_params, wav, ctx):
            if jnp.issubdtype(wav.dtype, jnp.integer):
                wav = wav.astype(jnp.float32) / 32768.0
            enc = encoder_apply(enc_params, wav)
            if cfg.audio_mode == "wavvq_feat":
                ta = stage_wavvq_jnp(cfg, geom, enc)
            else:
                ta = stage_wavlm_jnp(cfg, geom, enc)
            tc = stage_context_jnp(geom, ctx) if cfg.use_txt else None
            return ta, tc

        self._enc_stage = enc_stage

        @jax.jit
        def staged_step(dev, devdb, ta, tc, code, phase, rb):
            blocks, phases, votes = _predict_impl(
                cfg, n_steps, dev, devdb, ta, tc, code, phase, rb)
            codes = blocks.reshape(
                1, n_steps * cfg.step_sz)[:, :cfg.num_frames_code]
            new_code = codes[0, -1].astype(jnp.int32)
            new_phase = phases[-1]
            return codes.astype(jnp.int32), new_phase, new_code

        self._staged_step = staged_step

    def push_wav(self, wav_w: np.ndarray,
                 context_w: Optional[np.ndarray] = None) -> np.ndarray:
        """One raw wav window (n_samples,) int16/f32 (+ (30, 384) context
        when cfg.use_txt) -> (30,) int32 codes. Seeds stay on device."""
        cfg = self.cfg
        rb = None
        if self._needs_rand:
            rb = (self.rng.rand(self.n_steps) > 0.5).astype(np.int32)
        ctx = context_w[None] if cfg.use_txt else None
        wav, ctx, rb = jax.device_put((wav_w[None], ctx, rb))
        dev = self.server.engine.dev
        devdb = self.server.engine.devdb
        if self.fused:
            codes, self._phase_d, self._code_d = self._step(
                dev, devdb, self.server.encoder_params, wav, ctx,
                self._code_d, self._phase_d, rb)
        else:
            ta, tc = self._enc_stage(self.server.encoder_params, wav, ctx)
            codes, self._phase_d, self._code_d = self._staged_step(
                dev, devdb, ta, tc, self._code_d, self._phase_d, rb)
        return np.asarray(codes)[0]

    def state(self):
        """(seed_code, seed_phase) currently resident on device."""
        return self._code_d, self._phase_d
