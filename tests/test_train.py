"""Trainer tests on the virtual 8-device mesh: loss decreases, data-parallel
equals single-device, EMA codebook stays synchronized, checkpoints restore."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qpgesture_tpu.core.config import TrainConfig, VQVAEConfig
from qpgesture_tpu.parallel.mesh import make_mesh
from qpgesture_tpu.train.data import WindowedDataset, window_clip
from qpgesture_tpu.train.train_vqvae import VQVAETrainer

SMALL = VQVAEConfig(width=16, depth=1, emb_width=16, l_bins=16,
                    input_dim=9, sample_length=4)
TCFG = TrainConfig(batch_size=16, lr=1e-3, milestones=(1000,))


def _data(rng, n=64, t=32):
    base = rng.randn(1, t, 9).astype(np.float32)
    return (base + 0.1 * rng.randn(n, t, 9).astype(np.float32))


def test_train_loss_decreases(rng):
    trainer = VQVAETrainer(SMALL, TCFG, mesh=make_mesh(8))
    state = trainer.init_state(jax.random.PRNGKey(0), sample_len=32)
    x = _data(rng)
    state = trainer.init_codebook(state, x[:16], jax.random.PRNGKey(1))
    losses = []
    for i in range(30):
        batch = x[(i * 16) % 48:(i * 16) % 48 + 16]
        state, loss, metrics = trainer.train_step(
            state, batch, jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.9
    assert np.isfinite(losses).all()


def test_dp_matches_single_device(rng):
    """The same batch through an 8-way mesh and a 1-way mesh must produce the
    same parameters (grad pmean + codebook psum are exact)."""
    x = _data(rng, n=16)
    states = {}
    for n_dev in (1, 8):
        trainer = VQVAETrainer(SMALL, TCFG, mesh=make_mesh(n_dev))
        state = trainer.init_state(jax.random.PRNGKey(0), sample_len=32)
        state = trainer.init_codebook(state, x, jax.random.PRNGKey(1))
        for i in range(3):
            state, loss, _ = trainer.train_step(state, x,
                                                jax.random.PRNGKey(i))
        states[n_dev] = state
    # Adam amplifies f32 grad-reduction-order noise to ~1e-5/step; the
    # codebook EMA path (psum + shared restart rng) is near-exact.
    p1 = jax.tree_util.tree_leaves(states[1].params)
    p8 = jax.tree_util.tree_leaves(states[8].params)
    for a, b in zip(p1, p8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)
    np.testing.assert_allclose(np.asarray(states[1].codebook.k),
                               np.asarray(states[8].codebook.k), atol=1e-4)
    np.testing.assert_allclose(np.asarray(states[1].codebook.k_elem),
                               np.asarray(states[8].codebook.k_elem),
                               atol=1e-4)


def test_eval_step(rng):
    trainer = VQVAETrainer(SMALL, TCFG, mesh=make_mesh(8))
    state = trainer.init_state(jax.random.PRNGKey(0), sample_len=32)
    x = _data(rng, n=16)
    state = trainer.init_codebook(state, x, jax.random.PRNGKey(1))
    loss, err = trainer.eval_step(state, x)
    assert np.isfinite(float(loss)) and np.isfinite(float(err))


def test_checkpoint_roundtrip(tmp_path, rng):
    from qpgesture_tpu.train.checkpoints import (restore_checkpoint,
                                                 save_checkpoint)
    trainer = VQVAETrainer(SMALL, TCFG, mesh=make_mesh(8))
    state = trainer.init_state(jax.random.PRNGKey(0), sample_len=32)
    x = _data(rng, n=16)
    state = trainer.init_codebook(state, x, jax.random.PRNGKey(1))
    state, _, _ = trainer.train_step(state, x, jax.random.PRNGKey(2))
    save_checkpoint(str(tmp_path), state, name="t")
    template = trainer.init_state(jax.random.PRNGKey(3), sample_len=32)
    restored = restore_checkpoint(str(tmp_path), template, name="t")
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(state.codebook.k),
                                  np.asarray(restored.codebook.k))


def test_window_clip_reference_arithmetic(rng):
    poses = rng.randn(500, 9).astype(np.float32)
    audio = rng.randn(int(500 / 60 * 16000)).astype(np.float32)
    wins, awins = window_clip(poses, audio, n_poses=240, stride=32)
    import math
    minlen = min(500, int(len(audio) * 60 / 16000))
    expect = math.floor((minlen - 240) / 32) + 1
    assert wins.shape == (expect, 240, 9)
    assert awins.shape[0] == expect
    assert awins.shape[1] == int(240 / 60 * 16000)
    np.testing.assert_array_equal(wins[1], poses[32:272])


def test_windowed_dataset_batches(rng):
    clips = [{"poses": rng.randn(300, 9).astype(np.float32), "audio": None}
             for _ in range(3)]
    ds = WindowedDataset.from_clips(clips, n_poses=40, stride=20,
                                    data_mean=np.zeros(9),
                                    data_std=np.ones(9))
    batches = list(ds.batches(8, seed=0))
    assert all(b.shape == (8, 40, 9) for b in batches)
    # deterministic under the same seed
    batches2 = list(ds.batches(8, seed=0))
    np.testing.assert_array_equal(batches[0], batches2[0])


def test_device_prefetch(rng):
    from qpgesture_tpu.train.data import device_prefetch
    batches = [rng.randn(4, 8).astype(np.float32) for _ in range(5)]
    out = list(device_prefetch(iter(batches), size=2))
    assert len(out) == 5
    for a, b in zip(out, batches):
        np.testing.assert_array_equal(np.asarray(a), b)


def test_gradient_checkpointing_same_results(rng):
    """checkpoint_res=True (nn.remat on the residual blocks, matching the
    reference's opt-in resnet.py:63-75 checkpointing) must give the same
    loss and gradients as the unchecked model — it trades memory for
    recompute, nothing else."""
    cfg_plain = SMALL
    cfg_remat = VQVAEConfig(**{**SMALL.__dict__, "checkpoint_res": True})
    x = _data(rng, n=8)

    from qpgesture_tpu.models.vqvae import VQVAE
    m_plain, m_remat = VQVAE(cfg_plain), VQVAE(cfg_remat)
    params, cb = m_plain.init(jax.random.PRNGKey(0), sample_len=32)
    # identical param tree: remat wrapping must not change the layout
    params2, _ = m_remat.init(jax.random.PRNGKey(0), sample_len=32)
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(params2)

    def loss_of(model):
        def f(p):
            _, loss, _, _ = model.forward(p, cb, jnp.asarray(x), train=True,
                                          rng=jax.random.PRNGKey(2))
            return loss
        return f

    l1, g1 = jax.value_and_grad(loss_of(m_plain))(params)
    l2, g2 = jax.value_and_grad(loss_of(m_remat))(params)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_device_clip_store_matches_host_loader(rng):
    """DeviceClipStore (raw clips HBM-resident, windows gathered on device)
    yields the host WindowedDataset pipeline's batches (same windows, same
    shuffle order; the normalize division may differ by one f32 ulp under
    XLA fusion)."""
    from qpgesture_tpu.train.data import DeviceClipStore, WindowedDataset

    clips = [{"poses": rng.randn(300, 9).astype(np.float32)},
             {"poses": rng.randn(410, 9).astype(np.float32)}]
    mean = rng.randn(9).astype(np.float32)
    std = (np.abs(rng.randn(9)) + 0.3).astype(np.float32)
    host = WindowedDataset.from_clips(clips, n_poses=40, stride=16,
                                      data_mean=mean, data_std=std)
    dev = DeviceClipStore(clips, n_poses=40, stride=16,
                          data_mean=mean, data_std=std)
    assert len(host) == len(dev)
    n_batches = 0
    for hb, db in zip(host.batches(8, seed=5),
                      dev.batches(8, seed=5)):
        np.testing.assert_allclose(hb, np.asarray(db), atol=1e-6)
        n_batches += 1
    assert n_batches == len(host) // 8
    # without normalization the gather is bit-exact
    host_raw = WindowedDataset.from_clips(clips, n_poses=40, stride=16)
    dev_raw = DeviceClipStore(clips, n_poses=40, stride=16)
    for hb, db in zip(host_raw.batches(8, seed=5),
                      dev_raw.batches(8, seed=5)):
        np.testing.assert_array_equal(hb, np.asarray(db))


def test_trainer_accepts_device_clip_store(rng):
    """The VQ-VAE trainer consumes DeviceClipStore batches directly."""
    from qpgesture_tpu.train.data import DeviceClipStore

    trainer = VQVAETrainer(SMALL, TCFG, mesh=make_mesh(8))
    state = trainer.init_state(jax.random.PRNGKey(0), sample_len=32)
    clips = [{"poses": rng.randn(200, SMALL.input_dim).astype(np.float32)}]
    store = DeviceClipStore(clips, n_poses=32, stride=8)
    batches = list(store.batches(16, seed=0))
    assert batches
    state = trainer.init_codebook(state, np.asarray(batches[0]),
                                  jax.random.PRNGKey(1))
    state, loss, _ = trainer.train_step(state, batches[0],
                                        jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))


def test_multiepoch_convergence_with_scalar_history(tmp_path, rng):
    """Multi-epoch synthetic convergence with the persistent scalar sink:
    recon loss and codebook fit must trend down, codebook usage must not
    collapse, and every scalar is recoverable from the JSONL history (the
    TensorBoard-gap closure, reference train.py:90-100)."""
    from qpgesture_tpu.utils.metrics_log import ScalarHistory

    trainer = VQVAETrainer(SMALL, TCFG, mesh=make_mesh(8))
    state = trainer.init_state(jax.random.PRNGKey(0), sample_len=32)
    x = _data(rng, n=96)
    val = _data(rng, n=16)
    state = trainer.init_codebook(state, x[:16], jax.random.PRNGKey(1))

    hist_path = str(tmp_path / "scalars.jsonl")
    batches = [x[i:i + 16] for i in range(0, 96, 16)]
    state, best = trainer.fit(state, batches, val_batches=[val],
                              epochs=20, rng=jax.random.PRNGKey(3),
                              log_every=1, history_path=hist_path)

    series = ScalarHistory.read(hist_path)
    assert {"loss", "val_err", "fit", "usage", "entropy"} <= set(series)
    losses = [v for _, _, v in series["loss"]]
    fits = [v for _, _, v in series["fit"]]
    usages = [v for _, _, v in series["usage"]]
    val_errs = [v for _, _, v in series["val_err"]]
    # convergence trends: recon improving steadily; quantization error
    # (fit) peaks while the encoder moves away from the data-dependent
    # codebook init, then the EMA codebook catches up and fit collapses;
    # codebook usage must not collapse
    assert losses[-1] < losses[0] * 0.5
    assert np.mean(fits[-6:]) < 0.5 * max(fits)
    assert usages[-1] >= SMALL.l_bins * 0.5
    # validation improves over the run (per-epoch values are noisy on this
    # tiny synthetic set, so compare the best seen, which 'best' tracks)
    assert min(val_errs) < val_errs[0]
    assert best[0] <= min(val_errs)
    # 20 epochs x 6 steps of train rows + 20 epoch-start val rows + the
    # final validation (so the last epoch's weights can win 'best')
    assert len(losses) == 120 and len(val_errs) == 21
