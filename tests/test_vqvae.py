"""VQ-VAE tests: layer/torch equivalence, checkpoint conversion, quantizer
semantics, loss assembly, signature generation."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qpgesture_tpu.core.config import VQVAEConfig
from qpgesture_tpu.models import bottleneck as bn
from qpgesture_tpu.models.encdec import Conv1dTorch, ConvTranspose1dTorch
from qpgesture_tpu.models.torch_convert import (conv1d, conv_transpose1d,
                                                convert_vqvae)
from qpgesture_tpu.models.vqvae import VQVAE, codebook_signature

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

SMALL = VQVAEConfig(width=16, depth=2, emb_width=24, l_bins=32,
                    input_dim=9, sample_length=8)


def test_conv1d_matches_torch(rng):
    x = rng.randn(2, 20, 5).astype(np.float32)
    tconv = tnn.Conv1d(5, 7, 3, stride=1, padding=2, dilation=2)
    sd = {"c.weight": tconv.weight, "c.bias": tconv.bias}
    params = conv1d(sd, "c")
    mod = Conv1dTorch(7, 3, 1, 2, 2)
    y = mod.apply({"params": params}, jnp.asarray(x))
    ref = tconv(torch.from_numpy(x).transpose(1, 2)).transpose(1, 2)
    np.testing.assert_allclose(np.asarray(y), ref.detach().numpy(),
                               atol=1e-5)


def test_conv_transpose1d_matches_torch(rng):
    x = rng.randn(2, 10, 5).astype(np.float32)
    tconv = tnn.ConvTranspose1d(5, 7, 4, stride=2, padding=1)
    sd = {"c.weight": tconv.weight, "c.bias": tconv.bias}
    params = conv_transpose1d(sd, "c")
    mod = ConvTranspose1dTorch(7, 4, 2, 1)
    y = mod.apply({"params": params}, jnp.asarray(x))
    ref = tconv(torch.from_numpy(x).transpose(1, 2)).transpose(1, 2)
    assert y.shape == (2, 20, 7)
    np.testing.assert_allclose(np.asarray(y), ref.detach().numpy(),
                               atol=1e-5)


def _torch_vqvae(cfg):
    """Reference-topology torch model (built fresh from the documented
    layout) used to validate checkpoint conversion."""
    class ResBlock(tnn.Module):
        def __init__(self, n, dil):
            super().__init__()
            self.model = tnn.Sequential(
                tnn.ReLU(), tnn.Conv1d(n, n, 3, 1, dil, dil),
                tnn.ReLU(), tnn.Conv1d(n, n, 1, 1, 0))

        def forward(self, x):
            return x + self.model(x)

    class Resnet(tnn.Module):
        def __init__(self, n, depth, growth, reverse):
            super().__init__()
            blocks = [ResBlock(n, growth ** d) for d in range(depth)]
            if reverse:
                blocks = blocks[::-1]
            self.model = tnn.Sequential(*blocks)

        def forward(self, x):
            return self.model(x)

    class EncBlock(tnn.Module):
        def __init__(self):
            super().__init__()
            s = cfg.strides_t[0]
            blocks = []
            for i in range(cfg.downs_t[0]):
                blocks.append(tnn.Sequential(
                    tnn.Conv1d(cfg.input_dim if i == 0 else cfg.width,
                               cfg.width, s * 2, s, s // 2),
                    Resnet(cfg.width, cfg.depth, cfg.dilation_growth_rate,
                           False)))
            blocks.append(tnn.Conv1d(cfg.width, cfg.emb_width, 3, 1, 1))
            self.model = tnn.Sequential(*blocks)

        def forward(self, x):
            return self.model(x)

    class DecBlock(tnn.Module):
        def __init__(self):
            super().__init__()
            s = cfg.strides_t[0]
            blocks = [tnn.Conv1d(cfg.emb_width, cfg.width, 3, 1, 1)]
            for i in range(cfg.downs_t[0]):
                out = cfg.emb_width if i == cfg.downs_t[0] - 1 else cfg.width
                blocks.append(tnn.Sequential(
                    Resnet(cfg.width, cfg.depth, cfg.dilation_growth_rate,
                           cfg.vqvae_reverse_decoder_dilation),
                    tnn.ConvTranspose1d(cfg.width, out, s * 2, s, s // 2)))
            self.model = tnn.Sequential(*blocks)

        def forward(self, x):
            return self.model(x)

    class Level(tnn.Module):
        def __init__(self, block):
            super().__init__()
            self.level_blocks = tnn.ModuleList([block])

        def forward(self, x):
            return self.level_blocks[0](x)

    class Dec(tnn.Module):
        def __init__(self):
            super().__init__()
            self.level_blocks = tnn.ModuleList([DecBlock()])
            self.out = tnn.Conv1d(cfg.emb_width, cfg.input_dim, 3, 1, 1)

        def forward(self, x):
            return self.out(self.level_blocks[0](x))

    class Bneck(tnn.Module):
        def __init__(self):
            super().__init__()
            blk = tnn.Module()
            blk.register_buffer(
                "k", torch.randn(cfg.l_bins, cfg.emb_width))
            self.level_blocks = tnn.ModuleList([blk])

    class Model(tnn.Module):
        def __init__(self):
            super().__init__()
            self.encoders = tnn.ModuleList([Level(EncBlock())])
            self.decoders = tnn.ModuleList([Dec()])
            self.bottleneck = Bneck()

    return Model()


def test_vqvae_checkpoint_conversion(rng):
    torch.manual_seed(0)
    tmodel = _torch_vqvae(SMALL)
    params, cb = convert_vqvae(tmodel.state_dict(), SMALL)
    model = VQVAE(SMALL)

    x = rng.randn(2, 40, SMALL.input_dim).astype(np.float32)
    # encoder equivalence
    h = model.encoder.apply({"params": params["encoder"]}, jnp.asarray(x))
    ref_h = tmodel.encoders[0](torch.from_numpy(x).transpose(1, 2))
    np.testing.assert_allclose(np.asarray(h[-1]),
                               ref_h.detach().numpy().transpose(0, 2, 1),
                               atol=2e-4)
    # decode equivalence on random codes
    codes = rng.randint(0, SMALL.l_bins, size=(2, 5)).astype(np.int32)
    y = model.decode(params, cb, jnp.asarray(codes))
    k = tmodel.bottleneck.level_blocks[0].k
    x_d = k[torch.from_numpy(codes).long()]  # (2, 5, D)
    ref_y = tmodel.decoders[0](x_d.transpose(1, 2))
    np.testing.assert_allclose(np.asarray(y),
                               ref_y.detach().numpy().transpose(0, 2, 1),
                               atol=2e-4)


def test_quantise_matches_numpy_argmin(rng):
    # well-separated clusters so the nearest code is unambiguous at f32
    # (the expanded ||x||^2 - 2xW^T + ||W||^2 form the reference also uses
    # loses ~1e-3 to cancellation on random data)
    k = (rng.randn(32, 24) * 10).astype(np.float32)
    assign = rng.randint(0, 32, size=100)
    x = (k[assign] + rng.randn(100, 24) * 0.05).astype(np.float32)
    cb = bn.CodebookState(k=jnp.asarray(k), k_sum=jnp.asarray(k),
                          k_elem=jnp.ones(32))
    codes, fit = bn.quantise(cb, jnp.asarray(x))
    d = ((x[:, None, :] - k[None, :, :]) ** 2).sum(-1)
    np.testing.assert_array_equal(np.asarray(codes), d.argmin(-1))
    np.testing.assert_array_equal(np.asarray(codes), assign)


def test_ema_update_reference_step(rng):
    """One EMA step matches the reference recurrence (bottleneck.py:63-94)."""
    K, D, M = 16, 8, 200
    k = rng.randn(K, D).astype(np.float32)
    x = rng.randn(M, D).astype(np.float32)
    state = bn.CodebookState(k=jnp.asarray(k), k_sum=jnp.asarray(k),
                             k_elem=jnp.full((K,), 5.0))
    codes, _ = bn.quantise(state, jnp.asarray(x))
    new, metrics = bn.update_codebook(state, jnp.asarray(x), codes, 0.99,
                                      jax.random.PRNGKey(0))
    codes_np = np.asarray(codes)
    onehot = np.eye(K, dtype=np.float32)[codes_np]          # (M, K)
    k_sum = 0.99 * k + 0.01 * (onehot.T @ x)
    k_elem = 0.99 * 5.0 + 0.01 * onehot.sum(0)
    np.testing.assert_allclose(np.asarray(new.k_sum), k_sum, atol=1e-4)
    np.testing.assert_allclose(np.asarray(new.k_elem), k_elem, atol=1e-4)
    # all codes above threshold here -> pure EMA centers
    usage = (k_elem >= 1.0)
    expect_k = np.where(usage[:, None], k_sum / k_elem[:, None], 0)
    got_k = np.asarray(new.k)
    np.testing.assert_allclose(got_k[usage], expect_k[usage], atol=1e-4)
    assert float(metrics["usage"]) == usage.sum()


def test_forward_shapes_and_loss(rng):
    model = VQVAE(SMALL)
    params, cb = model.init(jax.random.PRNGKey(0), sample_len=40)
    x = jnp.asarray(rng.randn(4, 40, SMALL.input_dim).astype(np.float32))
    cb = model.init_codebook_from_batch(params, x, jax.random.PRNGKey(1))
    x_out, loss, metrics, new_cb = model.forward(
        params, cb, x, train=True, rng=jax.random.PRNGKey(2))
    assert x_out.shape == x.shape
    assert np.isfinite(float(loss))
    for key in ("fit", "pn", "entropy", "usage", "used_curr", "dk",
                "recons_loss", "commit_loss", "velocity_loss",
                "acceleration_loss"):
        assert key in metrics
    # encode/decode round trip shapes (hop = 8)
    codes = model.encode(params, new_cb, x)
    assert codes.shape == (4, 5)
    y = model.decode(params, new_cb, codes)
    assert y.shape == (4, 40, SMALL.input_dim)


def test_codebook_signature(rng):
    model = VQVAE(SMALL)
    params, cb = model.init(jax.random.PRNGKey(0), sample_len=40)
    x = jnp.asarray(rng.randn(4, 40, SMALL.input_dim).astype(np.float32))
    cb = model.init_codebook_from_batch(params, x, jax.random.PRNGKey(1))
    code, poses, sig = codebook_signature(model, params, cb)
    assert code.shape == (SMALL.l_bins, SMALL.sample_length)
    assert poses.shape == (SMALL.l_bins, SMALL.sample_length * 8,
                           SMALL.input_dim)
    np.testing.assert_allclose(sig, poses.mean(axis=1), rtol=1e-5)
