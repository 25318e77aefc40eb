"""PAE tests: torch equivalence via checkpoint conversion, shapes, and the
batched phase extractor."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qpgesture_tpu.core.config import PAEConfig
from qpgesture_tpu.models.pae import PAE, PhaseExtractor, velocity_input
from qpgesture_tpu.models.torch_convert import convert_pae

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

CFG = PAEConfig(frames=48, joints=3, channels_per_joint=3, phase_channels=4,
                keys=13, window=4.0)


def _torch_pae(cfg):
    """Reference-topology torch PAE (PAE.py:50-162), built fresh."""
    class Model(tnn.Module):
        def __init__(self):
            super().__init__()
            t = cfg.frames
            inter = cfg.input_channels // cfg.channels_per_joint
            self.conv1 = tnn.Conv1d(cfg.input_channels, inter, t, 1,
                                    int(t / 2))
            self.bn_conv1 = tnn.BatchNorm1d(inter)
            self.conv2 = tnn.Conv1d(inter, cfg.phase_channels, t, 1,
                                    int((t - 1) / 2))
            self.bn_conv2 = tnn.BatchNorm1d(cfg.phase_channels)
            self.fc = tnn.ModuleList(
                [tnn.Linear(t, 2) for _ in range(cfg.phase_channels)])
            self.bn = tnn.ModuleList(
                [tnn.BatchNorm1d(2) for _ in range(cfg.phase_channels)])
            self.deconv1 = tnn.Conv1d(cfg.phase_channels, inter, t, 1,
                                      int((t - 1) / 2))
            self.bn_deconv1 = tnn.BatchNorm1d(inter)
            self.deconv2 = tnn.Conv1d(inter, cfg.input_channels, t, 1,
                                      int(t / 2))
            self.args = torch.linspace(-cfg.window / 2, cfg.window / 2, t)
            ts = cfg.keys / t
            self.freqs = (torch.fft.rfftfreq(t)[1:] * (t * ts) / cfg.window)
            self.time_scale = ts

        def forward(self, x):
            t = cfg.frames
            y = x.reshape(x.shape[0], cfg.input_channels, t)
            y = torch.tanh(self.bn_conv1(self.conv1(y)))
            y = torch.tanh(self.bn_conv2(self.conv2(y)))
            latent = y
            rfft = torch.fft.rfft(y, dim=2)
            power = rfft.abs()[:, :, 1:] ** 2
            f = (torch.sum(self.freqs * power, dim=2)
                 / torch.sum(power, dim=2)) / self.time_scale
            a = 2 * torch.sqrt(torch.sum(power, dim=2)) / t
            b = rfft.real[:, :, 0] / t
            p = torch.empty((y.shape[0], cfg.phase_channels))
            for i in range(cfg.phase_channels):
                v = self.bn[i](self.fc[i](y[:, i, :]))
                p[:, i] = torch.atan2(v[:, 1], v[:, 0]) / (2 * np.pi)
            p, f, a, b = [q.unsqueeze(2) for q in (p, f, a, b)]
            y = a * torch.sin(2 * np.pi * (f * self.args + p)) + b
            signal = y
            y = torch.tanh(self.bn_deconv1(self.deconv1(y)))
            y = self.deconv2(y)
            return (y.reshape(y.shape[0], -1), latent, signal, [p, f, a, b])

    return Model()


def test_pae_matches_torch(rng):
    torch.manual_seed(1)
    tmodel = _torch_pae(CFG).eval()
    variables = convert_pae(tmodel.state_dict(), CFG.phase_channels)
    model = PAE(CFG)

    x = rng.randn(3, CFG.input_channels * CFG.frames).astype(np.float32)
    y, latent, signal, params = model.apply(variables, jnp.asarray(x),
                                            train=False)
    with torch.no_grad():
        ry, rlat, rsig, rparams = tmodel(torch.from_numpy(x))
    # f32 accumulation noise through kernel-T convs + FFT chains: ~1e-4
    np.testing.assert_allclose(np.asarray(y), ry.numpy(), atol=1e-3)
    for got, ref in zip(params, rparams):
        np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=1e-3)


def test_pae_train_shapes(rng):
    model = PAE(CFG)
    x = jnp.asarray(rng.randn(2, CFG.input_channels * CFG.frames)
                    .astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=True)
    (y, latent, signal, params), updates = model.apply(
        variables, x, train=True, mutable=["batch_stats"])
    assert y.shape == x.shape
    assert latent.shape == (2, CFG.frames, CFG.phase_channels)
    assert signal.shape == (2, CFG.phase_channels, CFG.frames)
    for q in params:
        assert q.shape == (2, CFG.phase_channels, 1)


def test_velocity_input_layout(rng):
    x = rng.randn(2, 10, 6).astype(np.float32)
    v = np.asarray(velocity_input(jnp.asarray(x)))
    ref = np.concatenate([np.zeros((2, 1, 6)), x[:, 1:] - x[:, :-1]],
                         axis=1).transpose(0, 2, 1).reshape(2, -1)
    np.testing.assert_allclose(v, ref, atol=1e-6)


def test_phase_extractor_batched_equals_loop(rng):
    cfg = PAEConfig(frames=16, joints=2, channels_per_joint=3,
                    phase_channels=2)
    model = PAE(cfg)
    x0 = jnp.zeros((1, cfg.input_channels * cfg.frames))
    variables = model.init(jax.random.PRNGKey(0), x0, train=True)
    ex = PhaseExtractor(model, variables)
    # patch window padding arithmetic for the small frame count
    pose = rng.randn(40, cfg.input_channels).astype(np.float32)
    mean = pose.mean(0)
    std = pose.std(0)

    t = cfg.frames
    posen = (pose - mean) / np.clip(std, 0.01, None)
    vel = posen[1:] - posen[:-1]
    vel = np.pad(vel, ((120, 119), (0, 0)))
    # reference loop (pose2phase, PAE.py:491-507)
    outs = []
    for i in range(pose.shape[0]):
        win = vel[i:i + t - 1]
        z = np.concatenate([np.zeros((1, win.shape[1])), win], 0)
        xb = z.T.reshape(1, -1).astype(np.float32)
        _, _, _, params = model.apply(variables, jnp.asarray(xb),
                                      train=False)
        outs.append(np.concatenate(
            [np.asarray(q.squeeze(-1))[:, None, :] for q in params], axis=1))
    ref = np.concatenate(outs, axis=0)

    # batched extractor must agree — but it pads 120/119 around T-1 windows
    got = ex.pose_to_phase(pose, mean, std)
    np.testing.assert_allclose(got, ref, atol=1e-4)
