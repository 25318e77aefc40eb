"""ResyncNet: 1-D UNet generator + WGAN-GP discriminator.

Same models as the reference (Speech2GestureMatching/model.py:50-117,
UNet down 128/256/256/512 with avg-pool halving and nearest-upsample skips;
InstanceNorm discriminator ending in a Linear over the flattened half^3
resolution), used to "resync" KNN output motion to the audio.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..core import constants as C
from .encdec import Conv1dTorch


class DoubleConv(nn.Module):
    features: int
    norm: str = "batch"  # 'batch' | 'instance'
    # cross-replica BN statistics (SyncBN): set to the mesh axis name in
    # data-parallel training so per-shard batch stats psum into full-batch
    # stats and the DP step equals the single-device step
    bn_axis_name: str = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(2):
            x = Conv1dTorch(self.features, 3, 1, 1, name=f"conv{i}")(x)
            if self.norm == "batch":
                x = nn.BatchNorm(momentum=0.9, epsilon=1e-5, axis=-1,
                                 use_running_average=not train,
                                 axis_name=self.bn_axis_name,
                                 name=f"norm{i}")(x)
            else:
                # InstanceNorm1d(affine=True): normalize each (sample,
                # channel) over time
                mean = jnp.mean(x, axis=1, keepdims=True)
                var = jnp.var(x, axis=1, keepdims=True)
                x = (x - mean) / jnp.sqrt(var + 1e-5)
                scale = self.param(f"in{i}_scale", nn.initializers.ones,
                                   (self.features,))
                bias = self.param(f"in{i}_bias", nn.initializers.zeros,
                                  (self.features,))
                x = x * scale + bias
            x = nn.leaky_relu(x, negative_slope=0.2)
        return x


def avg_pool1d(x: jnp.ndarray) -> jnp.ndarray:
    """AvgPool1d(2) on NTC."""
    T = x.shape[1] - (x.shape[1] % 2)
    return x[:, :T].reshape(x.shape[0], T // 2, 2, x.shape[2]).mean(axis=2)


def upsample_nearest(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.repeat(x, 2, axis=1)


class ResyncNet(nn.Module):
    """(B, T, mfcc+joints) -> (B, T, joints) residual-synced motion."""
    out_features: int = C.NUM_JOINTS
    bn_axis_name: str = None  # see DoubleConv.bn_axis_name

    @nn.compact
    def __call__(self, x, train: bool = False):
        def dc(feats, name):
            return DoubleConv(feats, bn_axis_name=self.bn_axis_name,
                              name=name)
        c1 = dc(128, "down1")(x, train)
        x = avg_pool1d(c1)
        c2 = dc(256, "down2")(x, train)
        x = avg_pool1d(c2)
        c3 = dc(256, "down3")(x, train)
        x = avg_pool1d(c3)
        x = dc(512, "down4")(x, train)
        x = upsample_nearest(x)
        x = dc(256, "up3")(jnp.concatenate([x, c3], -1), train)
        x = upsample_nearest(x)
        x = dc(256, "up2")(jnp.concatenate([x, c2], -1), train)
        x = upsample_nearest(x)
        x = dc(256, "up1")(jnp.concatenate([x, c1], -1), train)
        return Conv1dTorch(self.out_features, 1, 1, 0, name="last")(x)


class Discriminator(nn.Module):
    """InstanceNorm double-conv stack, avg-pool x3, Linear critic
    (model.py:96-117)."""
    num_frames: int = C.NUM_FRAMES

    @nn.compact
    def __call__(self, x):
        x = DoubleConv(512, norm="instance", name="d1")(x)
        x = avg_pool1d(x)
        x = DoubleConv(256, norm="instance", name="d2")(x)
        x = avg_pool1d(x)
        x = DoubleConv(128, norm="instance", name="d3")(x)
        x = avg_pool1d(x)
        x = x.reshape(x.shape[0], -1)
        return nn.Dense(1, use_bias=False, name="critic")(x)


def resync_stats(mfcc: np.ndarray, motion: np.ndarray):
    """Per-channel mean/std over (seq, time) — calc_data_stats semantics
    (data_processing.py:172-182, fed NTC-transposed arrays by
    ResyncGestureKNN.main:134-137). mfcc: (N, T, n_mfcc) raw train-db
    features; motion: (N, T, J). Returns (mfcc_mean, mfcc_std,
    motion_mean, motion_std), each (C,) float32."""
    out = []
    for feat in (mfcc, motion):
        feat = np.asarray(feat, np.float32)
        out += [feat.mean(axis=(0, 1)), feat.std(axis=(0, 1))]
    return tuple(out)


def predict_resynced_gesture(gen: ResyncNet, variables, mfcc: np.ndarray,
                             knn_motion: np.ndarray,
                             mfcc_mean, mfcc_std,
                             motion_mean, motion_std) -> np.ndarray:
    """Apply a trained ResyncNet to KNN output motion — the reference's
    predict_resynced_gesture (ResyncGestureKNN.py:43-87): normalize the
    test MFCCs with the train-db audio stats and the KNN motion with the
    train-db motion stats, run the generator in eval mode (BatchNorm
    running averages), and denormalize back to motion space. The
    reference loops sequence-at-a-time on host; here the whole batch is
    ONE jitted device program.

    mfcc: (N, T, n_mfcc) RAW test features; knn_motion: (N, T, J) RAW
    KNN-searched motion. Returns (N, T, J) resynced motion (float32).
    """
    mfcc = np.asarray(mfcc, np.float32)
    knn_motion = np.asarray(knn_motion, np.float32)
    eps = np.float32(1e-8)  # utils.normalize_data (utils.py:8-9)
    mfcc_n = (mfcc - np.asarray(mfcc_mean, np.float32)) / (
        np.asarray(mfcc_std, np.float32) + eps)
    mmean = np.asarray(motion_mean, np.float32)
    mstd = np.asarray(motion_std, np.float32)
    motion_n = (knn_motion - mmean) / (mstd + eps)
    x = jnp.asarray(np.concatenate([mfcc_n, motion_n], axis=-1))
    return np.asarray(_resync_fwd(gen, variables, x, jnp.asarray(mstd),
                                  jnp.asarray(mmean)))


@partial(jax.jit, static_argnames="gen")
def _resync_fwd(gen: ResyncNet, variables, x, mstd, mmean):
    """Module-level jit (stats as arguments, not closure constants) so
    repeated calls — resync-apply over many files, generate --resync per
    clip — hit one compiled program instead of re-tracing per call."""
    out = gen.apply(variables, x, train=False)
    # inv_normalize_data (utils.py:12-13): no eps on the way back
    return out * mstd + mmean


def gradient_penalty(disc_apply, variables, real: jnp.ndarray,
                     fake: jnp.ndarray, rng: jax.Array = None,
                     eps: jnp.ndarray = None) -> jnp.ndarray:
    """WGAN-GP interpolation penalty (train_resync_gestureknn.py:38-105).
    eps may be pre-drawn (the data-parallel path draws the full batch's
    interpolation points before sharding so DP == single-device exactly);
    otherwise it is drawn from rng, as before."""
    if eps is None:
        eps = jax.random.uniform(rng, (real.shape[0], 1, 1))
    interp = eps * real + (1 - eps) * fake

    def critic_sum(z):
        return jnp.sum(disc_apply(variables, z))

    grads = jax.grad(critic_sum)(interp)
    norms = jnp.sqrt(jnp.sum(grads ** 2, axis=(1, 2)) + 1e-12)
    return jnp.mean((norms - 1.0) ** 2)
