"""Trained feature extractor for feature-space FGD.

The paper reports "FGD on feature space: 19.921" (BASELINE.md; poster
§4.2) — the Yoon et al. (2020) protocol: embed motion windows with a
convolutional autoencoder trained on ground-truth motion, then compute
the Frechet distance between embedding Gaussians.  The reference repo
ships no metric code at all (SURVEY §5); this module provides the
extractor so both FGD spaces are computable end to end:

  * encoder: 4 strided Conv1d blocks (time /16) + LeakyReLU -> mean-pool
    -> Dense(latent);
  * decoder: Dense -> 4 ConvTranspose1d blocks back to (T, C);
  * MSE-trained on z-normalized ground-truth windows (train_fgd_extractor
    / the `train-fgd` CLI), embedding = encoder output (N, latent).

Checkpoints serialize via flax.serialization (msgpack) with the config
and normalization stats embedded, so `evaluate --fgd-extractor ckpt`
needs nothing else.
"""
from __future__ import annotations

import json
from dataclasses import asdict, dataclass
from typing import Callable, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from flax import serialization


@dataclass(frozen=True)
class FGDExtractorConfig:
    channels: int = 135      # pose dim
    window: int = 240        # frames per window
    width: int = 64
    latent: int = 32
    conv_layers: int = 4     # each halves time: 240 -> 15


class FGDAutoencoder(nn.Module):
    cfg: FGDExtractorConfig

    @nn.compact
    def encode(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B, T, C) -> (B, latent)."""
        cfg = self.cfg
        h = x
        for i in range(cfg.conv_layers):
            h = nn.Conv(cfg.width, (5,), strides=(2,), padding="SAME",
                        name=f"enc{i}")(h)
            h = nn.leaky_relu(h, negative_slope=0.2)
        h = h.mean(axis=1)
        return nn.Dense(cfg.latent, name="to_latent")(h)

    @nn.compact
    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        # ceil division mirrors the encoder's stride-2 SAME convs, so the
        # upsampled length always covers cfg.window before the trim
        t0 = -(-cfg.window // (2 ** cfg.conv_layers))
        h = nn.Dense(t0 * cfg.width, name="from_latent")(z)
        h = h.reshape(z.shape[0], t0, cfg.width)
        for i in range(cfg.conv_layers):
            h = nn.ConvTranspose(cfg.width, (5,), strides=(2,),
                                 padding="SAME", name=f"dec{i}")(h)
            h = nn.leaky_relu(h, negative_slope=0.2)
        h = h[:, :cfg.window]
        return nn.Conv(cfg.channels, (1,), name="to_pose")(h)

    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        z = self.encode(x)
        return self.decode(z), z


def train_fgd_extractor(windows: np.ndarray,
                        cfg: Optional[FGDExtractorConfig] = None,
                        epochs: int = 20, batch_size: int = 64,
                        lr: float = 1e-3, seed: int = 0,
                        data_mean: Optional[np.ndarray] = None,
                        data_std: Optional[np.ndarray] = None,
                        log: Callable[[str], None] = print):
    """MSE-train the autoencoder on ground-truth windows (N, T, C).
    Returns (model, params, mean, std). Windows are z-normalized with the
    given (or computed) stats — the SAME stats are embedded in the
    checkpoint and applied at embedding time."""
    import optax

    windows = np.asarray(windows, np.float32)
    cfg = cfg or FGDExtractorConfig(channels=windows.shape[-1],
                                    window=windows.shape[1])
    if data_mean is None:
        flat = windows.reshape(-1, windows.shape[-1])
        data_mean = flat.mean(axis=0)
        data_std = flat.std(axis=0)
    data_std = np.clip(np.asarray(data_std, np.float32), 0.01, None)
    data_mean = np.asarray(data_mean, np.float32)
    normed = (windows - data_mean) / data_std

    model = FGDAutoencoder(cfg)
    rng = jax.random.PRNGKey(seed)
    params = model.init(rng, jnp.zeros((1, cfg.window, cfg.channels),
                                       jnp.float32))["params"]
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, batch):
        def loss_fn(p):
            recon, _ = model.apply({"params": p}, batch)
            return jnp.mean((recon - batch) ** 2)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    n = normed.shape[0]
    order_rng = np.random.RandomState(seed)
    for epoch in range(1, epochs + 1):
        order = order_rng.permutation(n)
        losses = []
        # `or [0]`: fewer windows than one batch -> a single whole-set step
        for i in range(0, n - batch_size + 1, batch_size) or [0]:
            batch = jnp.asarray(normed[order[i:i + batch_size]])
            params, opt_state, loss = step(params, opt_state, batch)
            losses.append(float(loss))
        if epoch == 1 or epoch % 5 == 0 or epoch == epochs:
            log(f"fgd-extractor epoch {epoch}/{epochs}: "
                f"mse {np.mean(losses):.6f}")
    return model, params, data_mean, data_std


def save_fgd_extractor(path: str, cfg: FGDExtractorConfig, params,
                       data_mean: np.ndarray, data_std: np.ndarray) -> None:
    header = json.dumps(asdict(cfg)).encode()
    payload = serialization.to_bytes(
        {"params": params,
         "mean": np.asarray(data_mean, np.float32),
         "std": np.asarray(data_std, np.float32)})
    with open(path, "wb") as f:
        f.write(len(header).to_bytes(4, "little"))
        f.write(header)
        f.write(payload)


def load_fgd_extractor(path: str):
    """-> (model, params, mean, std)."""
    with open(path, "rb") as f:
        hlen = int.from_bytes(f.read(4), "little")
        cfg = FGDExtractorConfig(**json.loads(f.read(hlen)))
        payload = f.read()
    model = FGDAutoencoder(cfg)
    template = {
        "params": model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, cfg.window, cfg.channels), jnp.float32))["params"],
        "mean": np.zeros((cfg.channels,), np.float32),
        "std": np.ones((cfg.channels,), np.float32)}
    state = serialization.from_bytes(template, payload)
    return model, state["params"], np.asarray(state["mean"]), \
        np.asarray(state["std"])


def fgd_encoder_fn(model: FGDAutoencoder, params, mean: np.ndarray,
                   std: np.ndarray) -> Callable[[np.ndarray], np.ndarray]:
    """-> callable for render.metrics.fgd(encoder=...): (N, T, C) windows
    -> (N, latent) embeddings, normalized with the training stats."""
    enc = jax.jit(lambda p, x: model.apply({"params": p}, x,
                                           method=FGDAutoencoder.encode))
    std = np.clip(np.asarray(std, np.float32), 0.01, None)
    mean = np.asarray(mean, np.float32)

    def encoder(windows: np.ndarray) -> np.ndarray:
        w = (np.asarray(windows, np.float32) - mean) / std
        return np.asarray(enc(params, jnp.asarray(w)), np.float64)

    return encoder
