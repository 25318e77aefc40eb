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
        dev, devdb = self.engine.dev, self.engine.devdb

        @partial(jax.jit, static_argnames=("n_steps",))
        def impl(n_steps, params, cb, ta, tc, ic, ip, rb, rm, rc, rp):
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
            S, self.params, self.cb, ta, tc,
            jnp.asarray(np.int32(init_code)), jnp.asarray(init_phase),
            rb, rm, rc, rp)
        codes, poses = jax.device_get((codes_d, poses_d))
        if self.data_mean is not None:
            std = np.clip(np.asarray(self.data_std), 0.01, None)
            poses = poses * std + np.asarray(self.data_mean)
        return np.asarray(codes), np.asarray(poses)


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
        dev, devdb = engine.dev, engine.devdb

        @partial(jax.jit, static_argnames=("n_steps",))
        def step(n_steps, ta, tc, code, phase, rb):
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
            S, ta, tc, self._code_d, self._phase_d, rb)
        return np.asarray(codes)[0]

    def state(self):
        """(seed_code, seed_phase) currently resident on device."""
        return self._code_d, self._phase_d
