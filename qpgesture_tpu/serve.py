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
