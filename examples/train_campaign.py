"""Production-shape VQ-VAE training campaign on the real chip.

The reference's envelope is 500 epochs of batch-256 240x135 windows on one
RTX 2080 Ti (codebook.yml:35-49, train.py:53-148). This campaign runs the
same shape for multi-thousand steps end to end through the L3 harness:

  * DeviceClipStore input (raw clips resident in HBM, windows gathered on
    device — one upload for the whole run);
  * full-size VQVAE + EMA codebook, codebook-health trends (fit/entropy/
    usage/dk) streamed to scalars.jsonl;
  * per-epoch validation with best-checkpoint selection, rolling 'latest'
    orbax checkpoint;
  * a mid-campaign kill + resume (run with --stop-after N, then again with
    --resume) proving full-state recovery;
  * periodic Hellinger / FGD self-eval of reconstructions on held-out
    windows (the paper's metrics, render/metrics.py);
  * wall-clock windows/s per epoch.

    python examples/train_campaign.py --out /tmp/qpg_campaign \
        --epochs 40 [--stop-after 12] [--resume]

Writes <out>/campaign_report.json + <out>/scalars.jsonl.
"""
import argparse
import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

import numpy as np  # noqa: E402


def make_corpus(rng, n_clips, frames, dim=135, components=6):
    """Gesture-like synthetic clips: per-joint smooth sinusoidal mixtures
    around a base pose + noise — structured enough that the VQ-VAE recon
    error falls measurably over training."""
    clips = []
    for _ in range(n_clips):
        t = np.arange(frames)[:, None]
        base = rng.randn(1, dim) * 0.5
        sig = np.zeros((frames, dim), np.float64)
        for _k in range(components):
            freq = rng.uniform(0.2, 3.0) / 60.0            # cycles/frame
            phase = rng.uniform(0, 2 * np.pi, size=(1, dim))
            amp = rng.randn(1, dim) * (0.8 / components) * 3
            sig += amp * np.sin(2 * np.pi * freq * t + phase)
        poses = (base + sig + 0.02 * rng.randn(frames, dim)).astype(
            np.float32)
        clips.append({"poses": poses})
    return clips


def post_eval(args):
    """Reconstruction self-eval trend over the run's periodic checkpoints,
    on the CPU backend (no relay involvement)."""
    import jax

    from qpgesture_tpu.core.config import TrainConfig, VQVAEConfig
    from qpgesture_tpu.render.metrics import fgd, hellinger_velocity
    from qpgesture_tpu.train.checkpoints import restore_checkpoint
    from qpgesture_tpu.train.data import dataset_stats
    from qpgesture_tpu.train.train_vqvae import VQVAETrainer

    rng = np.random.RandomState(20260817)
    clips = make_corpus(rng, args.clips, args.clip_frames)
    mean, std = dataset_stats(clips)
    held = make_corpus(np.random.RandomState(7), 16, 4096)
    stdc = np.clip(std, 0.01, None)
    val_wins = []
    for c in held:
        p = (c["poses"] - mean) / stdc
        for s in range(0, len(p) - 240, 240):
            val_wins.append(p[s:s + 240])
    val_wins = np.stack(val_wins).astype(np.float32)[:64]

    # feature-space FGD (the paper's FGD-feat protocol): train the
    # embedding net on the ground-truth validation windows once, score
    # every checkpoint's reconstructions in its feature space
    from qpgesture_tpu.render.fgd_extractor import (fgd_encoder_fn,
                                                    train_fgd_extractor)
    fe_model, fe_params, fe_mean, fe_std = train_fgd_extractor(
        val_wins, epochs=10, batch_size=32, log=lambda s: None)
    feat_enc = fgd_encoder_fn(fe_model, fe_params, fe_mean, fe_std)

    trainer = VQVAETrainer(VQVAEConfig(), TrainConfig())
    template = trainer.init_state(jax.random.PRNGKey(0))
    fwd = jax.jit(lambda p, c, x: trainer.model.forward(
        p, c, x, train=False)[0])
    rows = []
    names = sorted(d for d in os.listdir(args.out)
                   if d.isdigit() or d == "best")
    for name in names:
        state = restore_checkpoint(args.out, template, name=name)
        recon = np.asarray(fwd(state.params, state.codebook, val_wins))
        rows.append({
            "checkpoint": name, "step": int(state.step),
            "hellinger": round(float(hellinger_velocity(
                recon.reshape(-1, 135), val_wins.reshape(-1, 135))), 4),
            "fgd": round(float(fgd(recon, val_wins)), 3),
            "fgd_feature": round(float(fgd(recon, val_wins,
                                           encoder=feat_enc)), 4)})
        print(json.dumps(rows[-1]), flush=True)
    path = os.path.join(args.out, "self_eval.json")
    with open(path, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"wrote {path}")
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--stop-after", type=int, default=0,
                    help="exit after this epoch (simulated failure)")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--clips", type=int, default=120)
    ap.add_argument("--clip-frames", type=int, default=7200)
    ap.add_argument("--eval-every", type=int, default=5)
    ap.add_argument("--post-eval", action="store_true",
                    help="CPU pass: Hellinger/FGD trend over the periodic "
                         "checkpoints saved by a finished run")
    ap.add_argument("--conv-precision", default="highest",
                    choices=["highest", "high", "default"],
                    help="VQVAEConfig.conv_precision: 'default' runs the "
                         "1-pass bf16 MXU fast path (~5x step throughput, "
                         "bench.py train bf16_variant) — this flag "
                         "validates it over a full campaign, not just a "
                         "step microbenchmark")
    args = ap.parse_args()
    if args.post_eval:
        return post_eval(args)

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(_ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from qpgesture_tpu.core.config import TrainConfig, VQVAEConfig
    from qpgesture_tpu.render.metrics import fgd, hellinger_velocity
    from qpgesture_tpu.train.checkpoints import (restore_checkpoint,
                                                 save_checkpoint)
    from qpgesture_tpu.train.data import DeviceClipStore, dataset_stats
    from qpgesture_tpu.train.train_vqvae import VQVAETrainer
    from qpgesture_tpu.utils.metrics_log import ScalarHistory

    os.makedirs(args.out, exist_ok=True)

    def phase_log(msg):
        print(f"[campaign] {msg}", file=sys.stderr, flush=True)

    rng = np.random.RandomState(20260817)
    phase_log("generating corpus...")
    clips = make_corpus(rng, args.clips, args.clip_frames)
    mean, std = dataset_stats(clips)
    train_cfg = TrainConfig(epochs=args.epochs)
    phase_log("uploading clip store...")
    store = DeviceClipStore(clips, train_cfg.n_poses, stride=32,
                            data_mean=mean, data_std=std)
    steps_per_epoch = len(store) // train_cfg.batch_size

    # held-out windows (normalized like the store)
    held = make_corpus(np.random.RandomState(7), 16, 4096)
    stdc = np.clip(std, 0.01, None)
    val_wins = []
    for c in held:
        p = (c["poses"] - mean) / stdc
        for s in range(0, len(p) - 240, 240):
            val_wins.append(p[s:s + 240])
    val_wins = np.stack(val_wins).astype(np.float32)[:512]
    val_batches = [val_wins[i:i + 256] for i in range(0, len(val_wins), 256)
                   if len(val_wins[i:i + 256])]

    phase_log(f"{len(store)} windows, {steps_per_epoch} steps/epoch; "
              "building trainer...")
    trainer = VQVAETrainer(VQVAEConfig(conv_precision=args.conv_precision),
                           train_cfg, steps_per_epoch=steps_per_epoch)
    state = trainer.init_state(jax.random.PRNGKey(0))
    phase_log("init codebook...")
    first = next(iter(store.batches(train_cfg.batch_size, seed=0)))
    state = trainer.init_codebook(state, first[:16], jax.random.PRNGKey(1))
    phase_log("compiling first train step...")

    start_epoch = 1
    best = (float("inf"), 0)
    if args.resume and os.path.isdir(os.path.join(args.out, "latest")):
        state = restore_checkpoint(args.out, state, name="latest")
        start_epoch = int(state.step) // max(1, steps_per_epoch) + 1
        prior = ScalarHistory.last(os.path.join(args.out, "scalars.jsonl"),
                                   "best_val_err")
        if prior is not None:
            best = (float(prior), start_epoch - 1)
        print(f"RESUMED at epoch {start_epoch} (step {int(state.step)}, "
              f"best {best[0]:.5f})", flush=True)

    hist = ScalarHistory(os.path.join(args.out, "scalars.jsonl"))
    key = jax.random.PRNGKey(100 + start_epoch)
    report = {"conv_precision": args.conv_precision,
              "steps_per_epoch": steps_per_epoch,
              "windows_total": len(store), "epochs_run": [],
              "batch": [train_cfg.batch_size, train_cfg.n_poses, 135]}
    epoch_rates = []

    def validate(epoch):
        nonlocal best
        errs = [np.asarray(trainer.eval_step(state, b)[1])
                for b in val_batches]
        val_err = float(np.mean(errs))
        if val_err < best[0]:
            best = (val_err, epoch)
            save_checkpoint(args.out, state, name="best")
        hist.log(epoch=epoch, val_err=val_err, best_val_err=best[0])
        return val_err

    for epoch in range(start_epoch, args.epochs + 1):
        t0 = time.perf_counter()
        n_steps = 0
        loss_v = None
        for bi, batch in enumerate(
                store.batches(train_cfg.batch_size, seed=epoch)):
            key, sub = jax.random.split(key)
            state, loss, metrics = trainer.train_step(state, batch, sub)
            n_steps += 1
            if bi % 20 == 0:
                loss_v = float(loss)
                if not np.isfinite(loss_v):
                    raise FloatingPointError(f"NaN at epoch {epoch}/{bi}")
                hist.log(epoch=epoch, step=bi, loss=loss_v,
                         **{k: float(np.asarray(v))
                            for k, v in metrics.items()})
        jax.block_until_ready(loss)
        dt = time.perf_counter() - t0
        rate = n_steps * train_cfg.batch_size / dt
        epoch_rates.append(rate)
        val_err = validate(epoch)
        save_checkpoint(args.out, state, name="latest")
        row = {"epoch": epoch, "loss": loss_v, "val_err": round(val_err, 5),
               "windows_per_s": round(rate, 1),
               "epoch_s": round(dt, 1)}

        if args.eval_every and epoch % args.eval_every == 0:
            # periodic checkpoint: the Hellinger/FGD self-eval trend is
            # computed from these AFTER the run by --post-eval on the CPU
            # backend (the chip loop reuses only already-compiled programs;
            # fresh compiles through the relay can wedge for many minutes)
            save_checkpoint(args.out, state, name=f"{epoch:03d}")
        report["epochs_run"].append(row)
        print(json.dumps(row), flush=True)

        if args.stop_after and epoch >= args.stop_after:
            print(f"SIMULATED KILL after epoch {epoch} "
                  f"(step {int(state.step)})", flush=True)
            hist.close()
            with open(os.path.join(args.out, "campaign_report.json"),
                      "w") as f:
                json.dump(report, f, indent=1)
            sys.exit(42)

    report["best_val"] = {"val_err": best[0], "epoch": best[1]}
    report["total_steps"] = int(state.step)
    report["windows_per_s_median"] = round(float(np.median(epoch_rates)), 1)
    hist.close()
    # merge the pre-kill report if resuming
    prev_path = os.path.join(args.out, "campaign_report.json")
    if args.resume and os.path.exists(prev_path):
        with open(prev_path) as f:
            prev = json.load(f)
        report["epochs_run"] = prev.get("epochs_run", []) + \
            report["epochs_run"]
    with open(prev_path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({"best_val": report["best_val"],
                      "total_steps": report["total_steps"],
                      "windows_per_s_median":
                          report["windows_per_s_median"]}), flush=True)


if __name__ == "__main__":
    main()
