"""Periodic Autoencoder (DeepPhase-style) for the phase manifold.

Same model as the reference (codebook/PAE.py:50-162): two wide convs embed
240-frame joint-velocity windows into 8 latent channels; per channel an FFT
extracts (frequency, amplitude, offset) and a Linear(240->2)+atan2 head
extracts phase; the latent is reconstructed as a*sin(2pi*(f*t+p))+b and
deconvolved back.

TPU-native changes: the per-frame phase database construction
(pose2phase, PAE.py:477-508 — a stride-1 Python loop of batch-1 forward
passes) becomes one vmapped windowed pass over the whole recording.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..core.config import PAEConfig
from .encdec import Conv1dTorch


class PAE(nn.Module):
    cfg: PAEConfig

    def setup(self):
        cfg = self.cfg
        inter = cfg.input_channels // cfg.channels_per_joint  # 15
        t = cfg.frames
        self.conv1 = Conv1dTorch(inter, t, 1, int(t / 2), name="conv1")
        self.bn1 = nn.BatchNorm(momentum=0.9, epsilon=1e-5, axis=-1,
                                name="bn_conv1")
        self.conv2 = Conv1dTorch(cfg.phase_channels, t, 1,
                                 int((t - 1) / 2), name="conv2")
        self.bn2 = nn.BatchNorm(momentum=0.9, epsilon=1e-5, axis=-1,
                                name="bn_conv2")
        self.fcs = [nn.Dense(2, name=f"fc{i}")
                    for i in range(cfg.phase_channels)]
        self.bns = [nn.BatchNorm(momentum=0.9, epsilon=1e-5, axis=-1,
                                 name=f"bn{i}")
                    for i in range(cfg.phase_channels)]
        self.deconv1 = Conv1dTorch(inter, t, 1, int((t - 1) / 2),
                                   name="deconv1")
        self.bn_d1 = nn.BatchNorm(momentum=0.9, epsilon=1e-5, axis=-1,
                                  name="bn_deconv1")
        self.deconv2 = Conv1dTorch(cfg.input_channels, t, 1, int(t / 2),
                                   name="deconv2")

    @property
    def time_scale(self) -> float:
        return self.cfg.keys / self.cfg.frames

    def _freqs(self):
        """rfftfreq(T)[1:] * (T * time_scale) / window (PAE.py:65-66)."""
        cfg = self.cfg
        f = np.fft.rfftfreq(cfg.frames)[1:]
        return jnp.asarray(
            f * (cfg.frames * self.time_scale) / cfg.window, jnp.float32)

    def _args(self):
        cfg = self.cfg
        return jnp.asarray(np.linspace(-cfg.window / 2, cfg.window / 2,
                                       cfg.frames, dtype=np.float32))

    def fft_params(self, y: jnp.ndarray):
        """Per-channel frequency/amplitude/offset from the latent spectrum
        (PAE.FFT, PAE.py:99-115). y: (N, T, C)."""
        cfg = self.cfg
        rfft = jnp.fft.rfft(y, axis=1)            # (N, T//2+1, C)
        mag = jnp.abs(rfft)
        power = mag[:, 1:, :] ** 2                # drop DC
        freqs = self._freqs()[None, :, None]
        freq = (jnp.sum(freqs * power, axis=1) / jnp.sum(power, axis=1)
                / self.time_scale)                # (N, C)
        amp = 2.0 * jnp.sqrt(jnp.sum(power, axis=1)) / cfg.frames
        offset = jnp.real(rfft[:, 0, :]) / cfg.frames
        return freq, amp, offset

    def __call__(self, x: jnp.ndarray, train: bool = False):
        """x: (N, T*C) flattened velocity windows in the reference's
        channel-major layout (reshape to (N, C, T), PAE.py:120). Returns
        (y, latent, signal, params=(p, f, a, b) each (N, C, 1))."""
        cfg = self.cfg
        N = x.shape[0]
        y = x.reshape(N, cfg.input_channels, cfg.frames)
        y = y.transpose(0, 2, 1)                  # -> NTC
        y = jnp.tanh(self.bn1(self.conv1(y), use_running_average=not train))
        y = jnp.tanh(self.bn2(self.conv2(y), use_running_average=not train))
        latent = y                                 # (N, T(+1), C=8)

        f, a, b = self.fft_params(y)

        ps = []
        for i in range(cfg.phase_channels):
            v = self.fcs[i](y[:, :, i])            # (N, 2)
            v = self.bns[i](v, use_running_average=not train)
            p_i = jnp.arctan2(v[:, 1], v[:, 0]) / (2.0 * jnp.pi)
            ps.append(p_i)
        p = jnp.stack(ps, axis=1)                  # (N, C)

        params = (p[..., None], f[..., None], a[..., None], b[..., None])

        args = self._args()[None, None, :]         # (1, 1, T)
        signal = (a[..., None] * jnp.sin(
            2.0 * jnp.pi * (f[..., None] * args + p[..., None]))
            + b[..., None])                        # (N, C, T)

        y = signal.transpose(0, 2, 1)               # NTC
        y = jnp.tanh(self.bn_d1(self.deconv1(y),
                                use_running_average=not train))
        y = self.deconv2(y)                         # (N, T, C_in)
        y = y.transpose(0, 2, 1).reshape(N, cfg.input_channels * cfg.frames)
        return y, latent, signal, params


def velocity_input(pose_window: jnp.ndarray) -> jnp.ndarray:
    """(N, T, C) pose window -> flattened frame-difference velocities with a
    leading zero frame, channel-major (PAE.py:367-370)."""
    N, T, Ch = pose_window.shape
    vel = pose_window[:, 1:] - pose_window[:, :-1]
    vel = jnp.concatenate([jnp.zeros((N, 1, Ch), pose_window.dtype), vel],
                          axis=1)
    return vel.transpose(0, 2, 1).reshape(N, -1)


@dataclass
class PhaseExtractor:
    """Batched pose2phase (PAE.py:477-508): per-frame phase parameters from
    a centered sliding velocity window."""
    model: PAE
    variables: dict

    def __post_init__(self):
        cfg = self.model.cfg
        t = cfg.frames

        def forward(variables, vel_dev, starts):
            # Stride-1 windows are gathered ON DEVICE from the HBM-resident
            # velocity array: window i covers vel[starts[i] : starts[i]+T-1]
            # plus a leading zero row (the reference feeds T-1 velocity rows
            # to fill its T-frame window, pose2phase PAE.py:491-507).
            # Building the overlapping windows on host would upload ~T/1
            # windows x T frames — ~240x the recording — per extraction
            # (measured 140 s for a 33k-frame recording through a
            # tunnel-attached host; the device gather makes it one upload).
            win = vel_dev[starts[:, None] + jnp.arange(t - 1)[None, :]]
            B = win.shape[0]
            zero = jnp.zeros((B, 1, win.shape[2]), jnp.float32)
            x = jnp.concatenate([zero, win], axis=1)
            x = x.transpose(0, 2, 1).reshape(B, -1)
            _, _, _, params = self.model.apply(variables, x, train=False)
            return jnp.concatenate([q.squeeze(-1)[:, None, :]
                                    for q in params], axis=1)  # (B, 4, C)

        jitted = jax.jit(forward)
        self._forward = lambda vel_dev, starts: jitted(self.variables,
                                                       vel_dev, starts)
        self._t = t

    def pose_to_phase(self, pose: np.ndarray, data_mean: np.ndarray,
                      data_std: np.ndarray, batch: int = 1024) -> np.ndarray:
        """pose: (T, 135) raw rotations. Returns (T, 4, 8) dense phase.

        Mirrors pose2phase: normalize, frame-diff velocity, pad 120/119,
        then a stride-1 window per output frame — batched, with the
        velocity array uploaded once and windows gathered on device.
        """
        std = np.clip(data_std, 0.01, None)
        pose = (pose - data_mean) / std
        vel = pose[1:] - pose[:-1]
        vel = np.pad(vel, ((120, 119), (0, 0)))
        n = pose.shape[0]
        vel_dev = jax.device_put(vel.astype(np.float32))
        out = np.zeros((n, 4, self.model.cfg.phase_channels), np.float32)
        for s in range(0, n, batch):
            e = min(s + batch, n)
            starts = np.arange(s, s + batch, dtype=np.int32)
            # fixed batch width -> one compiled shape; tail windows beyond
            # n gather clipped rows and are discarded below
            starts = np.minimum(starts, n - 1)
            out[s:e] = np.asarray(self._forward(
                vel_dev, jnp.asarray(starts)))[:e - s]
        return out
