"""Command-line interface.

Subcommands mirror the reference's entry points (SURVEY §3):
  match       GestureKNN.sh / GestureKNN.py main_codebook  -> result.npz
  decode      VisualizeCodebook.py --stage inference       -> BVH (+ npy)
  signature   VisualizeCodebook.py --stage train           -> code.npz
  test-audio  make_test_data.py                            -> wavvq_240.npz
  phase       PAE.py --stage inference                     -> Phase npz
  train-vqvae train.py --config codebook.yml
  bench       the headline benchmark
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

from .core import constants as C


def _load_vqvae(checkpoint: str, cfg):
    """Load either a reference torch .bin or an orbax checkpoint dir."""
    from .models.vqvae import VQVAE, load_vqvae_native
    model = VQVAE(cfg)
    if checkpoint.endswith(".msgpack"):
        params, cb = load_vqvae_native(checkpoint, model)
        return model, params, cb
    if checkpoint.endswith(".bin") or checkpoint.endswith(".pt"):
        from .models.torch_convert import load_vqvae_checkpoint
        params, cb = load_vqvae_checkpoint(checkpoint, cfg)
        import jax.numpy as jnp
        from .models.bottleneck import CodebookState
        params = {k: v for k, v in params.items()}
        cb = CodebookState(k=jnp.asarray(cb.k), k_sum=jnp.asarray(cb.k_sum),
                           k_elem=jnp.asarray(cb.k_elem))
        return model, params, cb
    import jax
    from .train.checkpoints import restore_checkpoint
    from .train.train_vqvae import VQVAETrainer
    from .core.config import TrainConfig
    trainer = VQVAETrainer(cfg, TrainConfig())
    template = trainer.init_state(jax.random.PRNGKey(0))
    state = restore_checkpoint(checkpoint, template, name="best")
    return model, state.params, state.codebook


def _load_match_db(args):
    """The match CLI's database staging, shared with `warmup`: load the
    bundle/codes/signature(/wavlm/wavvq) files and stage the device
    database. Returns (cfg, db)."""
    from .core.config import MATCH_PRESETS, MatchConfig
    from .core.schemas import (CodebookSignature, DatabaseBundle, load_codes,
                               load_wavlm, load_wavvq)
    from .match.database import stage_database

    preset = MATCH_PRESETS[args.preset]
    bundle = DatabaseBundle.load(args.train_database)
    codes = load_codes(args.train_codebook)
    signature = CodebookSignature.load(args.codebook_signature)
    cfg = MatchConfig(**{**preset.__dict__,
                         "desired_k": getattr(args, "desired_k", 0),
                         "feat_dtype": getattr(args, "feat_dtype",
                                               None) or preset.feat_dtype,
                         "codebook_size": signature.signature.shape[0]})
    wavlm = load_wavlm(args.train_wavlm) if args.train_wavlm else None
    wavvq = load_wavvq(args.train_wavvq) if args.train_wavvq else None
    db = stage_database(cfg, bundle, codes, signature, wavlm=wavlm,
                        wavvq=wavvq)
    return cfg, db


def cmd_match(args):
    from .core.schemas import DatabaseBundle, load_wavlm, load_wavvq, \
        save_result
    from .match.database import stage_test_audio, stage_test_context
    from .match.engine import CodeKNNEngine

    cfg, db = _load_match_db(args)

    test_bundle = DatabaseBundle.load(args.test_data) if args.test_data \
        else None
    test_wavlm = load_wavlm(args.test_wavlm) if args.test_wavlm else None
    test_wavvq = load_wavvq(args.test_wavvq) if args.test_wavvq else None
    test_audio = stage_test_audio(cfg, db, test_bundle=test_bundle,
                                  wavlm=test_wavlm, wavvq=test_wavvq) \
        if cfg.use_aud else None
    test_context = None
    if cfg.use_txt:
        if test_bundle is None or test_bundle.context is None:
            raise SystemExit(
                f"preset {args.preset!r} uses text guidance (use_txt=True) "
                "and needs --test-data pointing at a bundle with a "
                "'context' array; pass one or pick a preset without text "
                "(e.g. no_text, mfcc, wavvq_aud_only)")
        test_context = stage_test_context(db, test_bundle.context)
    if args.max_frames:
        if test_audio is not None:
            test_audio = test_audio[:args.max_frames]
        if test_context is not None:
            test_context = test_context[:args.max_frames]

    engine = CodeKNNEngine(cfg, db)
    if getattr(args, "ties", "stable") == "reference":
        # byte-parity with the original binary: device phase-1 + host
        # reference-arithmetic fusion (integer Levenshtein distances tie
        # heavily in wavvq mode — examples/tie_divergence_sweep.py measures
        # how often tie order changes the selected indices)
        result = engine.predict_reference_ties(test_audio, test_context)
    else:
        sharded_mode = getattr(args, "sharded", "auto")
        use_sharded = sharded_mode == "always"
        if sharded_mode == "auto":
            from .match.engine import should_shard
            use_sharded = should_shard(cfg, db)
        if use_sharded:
            import jax
            from .parallel.mesh import make_mesh
            mesh = make_mesh(len(jax.devices()))
            print(f"database exceeds single-chip budget -> sharding J axis "
                  f"over {mesh.devices.size} devices")
            result = engine.predict_sharded(mesh, test_audio, test_context)
        else:
            result = engine.predict(test_audio, test_context)
    save_result(args.out, result.codes)
    print(f"wrote {args.out}: knn_pred {result.codes.shape}")


def cmd_warmup(args):
    """Pre-compile serving programs into the persistent compile cache.

    Cold XLA compiles cost minutes on relay-attached chips and each window
    -count bucket is a separate shape-specialized program (ARCHITECTURE.md
    'Measured performance'). Run once at deploy time against the REAL
    database files — the compiled executables are specialized to the
    database scale, so warming a different-size synthetic database does
    not help production — and every later process (match CLI, serving,
    bench) hits the cache.

    Coverage by flag: buckets warm engine.predict (the match CLI and
    split-mode serving); --decode the standalone decode; --serving the
    fused ServingPipeline program; --streams the StreamingPool tick AND
    the solo StreamingSession push; --rawpose-batch the K-vmapped
    raw-pose search. The RawWavServer/StreamingRawWav fused-ingress
    programs additionally close over the encoder graph and must be warmed
    through a RawWavServer built with the production encoder checkpoint
    (examples/rawwav_latency.py --warm-only does exactly that); their
    fused=False split halves reuse the programs warmed here."""
    import time

    import numpy as np

    from .match.engine import CodeKNNEngine

    cfg, db = _load_match_db(args)
    engine = CodeKNNEngine(cfg, db)
    rng = np.random.RandomState(0)
    S = len(db.geom.step_clip_idx)
    buckets = [int(b) for b in args.buckets.split(",")]

    decode = None
    pipeline = None
    if args.decode:
        import jax
        import jax.numpy as jnp

        from .core.config import VQVAEConfig, load_config
        vq_cfg = load_config(args.config).vqvae if args.config \
            else VQVAEConfig()
        if args.checkpoint:
            model, params, cb = _load_vqvae(args.checkpoint, vq_cfg)
        else:
            # executables are specialized to shapes, not weights: random
            # params of the right config warm the same cache entry
            from .models.vqvae import VQVAE
            model = VQVAE(vq_cfg)
            params, cb = model.init(jax.random.PRNGKey(0), sample_len=240)
        decode_jit = jax.jit(lambda z: model.decode(params, cb, z))

        def decode(codes):
            return decode_jit(jnp.asarray(codes.reshape(1, -1), jnp.int32))

        if args.serving:
            # ServingPipeline's fused match+decode jit is a DIFFERENT HLO
            # module from engine.predict + standalone decode — warming the
            # parts leaves the fused program cold (ADVICE r3)
            from .serve import ServingPipeline
            pipeline = ServingPipeline(engine, model, params, cb)

    for W in buckets:
        ta = tc = None
        if cfg.use_aud:
            if cfg.audio_mode == "wavvq_feat":
                shape = (W, S) + db.aud_strings.shape[2:]
                ta = rng.randint(0, 320, size=shape).astype(np.int32)
            else:
                ta = rng.randn(W, S, db.aud_feat.shape[-1]
                               ).astype(np.float32)
        if cfg.use_txt:
            tc = rng.randn(W, S, db.txt_feat.shape[-1]).astype(np.float32)
        t0 = time.perf_counter()
        res = engine.predict(ta, tc)
        if decode is not None:
            np.asarray(decode(res.codes))
        if pipeline is not None:
            pipeline.serve(ta, tc)
        dt = time.perf_counter() - t0
        print(f"bucket W={W:4d}: first call {dt:7.1f} s "
              f"(compile + run; later calls serve from the cache)")
    if args.streams:
        if not cfg.chain_windows:
            print(f"streams: preset {args.preset} is non-chaining; "
                  f"streaming pool not applicable, skipped")
        else:
            from .serve import StreamingPool, StreamingSession

            def _stream_inputs(C):
                sa = sc = None
                if cfg.use_aud:
                    if cfg.audio_mode == "wavvq_feat":
                        shape = (C, S) + db.aud_strings.shape[2:]
                        sa = rng.randint(0, 320,
                                         size=shape).astype(np.int32)
                    else:
                        sa = rng.randn(C, S, db.aud_feat.shape[-1]
                                       ).astype(np.float32)
                if cfg.use_txt:
                    sc = rng.randn(C, S, db.txt_feat.shape[-1]
                                   ).astype(np.float32)
                return sa, sc

            C = args.streams
            pool = StreamingPool(engine, C)
            ta, tc = _stream_inputs(C)
            t0 = time.perf_counter()
            pool.tick(ta, tc)
            print(f"streams C={args.streams}: first tick "
                  f"{time.perf_counter() - t0:7.1f} s")
            # a solo StreamingSession push is yet another HLO module
            # (no stream axis) — warm it too (ADVICE r3)
            session = StreamingSession(engine)
            sa, sc = _stream_inputs(1)
            t0 = time.perf_counter()
            session.push_window(sa[0] if sa is not None else None,
                                sc[0] if sc is not None else None)
            print(f"solo stream: first push "
                  f"{time.perf_counter() - t0:7.1f} s")
    if args.rawpose_batch:
        # batched raw-pose GestureKNN: the K-vmapped search is the repo's
        # longest relay compile (~7 min, ARCHITECTURE.md) and was absent
        # from the warmup inventory until r4 (VERDICT r3 weak #5)
        from .match.gesture_knn import (GestureKNNEngine,
                                        normalize_gesture_knn,
                                        stage_gesture_knn)
        C = args.rawpose_batch
        from .core.schemas import DatabaseBundle
        bundle = DatabaseBundle.load(args.train_database)
        gdb = stage_gesture_knn(bundle.mfcc, bundle.body)
        gdb_n, test_feat = normalize_gesture_knn(
            gdb, rng.randn(C, gdb.feat.shape[1], 14).astype(np.float32))
        gengine = GestureKNNEngine(gdb_n)
        init = np.zeros((C,), np.int64)
        t0 = time.perf_counter()
        gengine.search_motion_batch(test_feat, init, init)
        print(f"raw-pose batch C={C}: first call "
              f"{time.perf_counter() - t0:7.1f} s")
    print(f"warm: {len(buckets)} bucket(s), preset {args.preset}"
          f"{', decode' if decode is not None else ''}"
          f"{', fused serving' if pipeline is not None else ''}"
          + (f", {args.streams}-stream pool + solo session"
             if args.streams and cfg.chain_windows else "")
          + (f", raw-pose batch {args.rawpose_batch}"
             if args.rawpose_batch else ""))


def cmd_decode(args):
    from .core.config import VQVAEConfig, load_config
    from .core.schemas import load_result
    from .motion.pipeline import MotionPipeline
    from .render.decode import render_result

    cfg = load_config(args.config).vqvae if args.config else VQVAEConfig()
    model, params, cb = _load_vqvae(args.checkpoint, cfg)
    with open(args.pipeline) as f:
        pipeline = MotionPipeline.from_json(f.read())
    codes = load_result(args.result)
    mean = std = None
    if args.config:
        conf = load_config(args.config)
        mean = np.asarray(conf.data_mean) if conf.data_mean else None
        std = np.asarray(conf.data_std) if conf.data_std else None
    bvh_path, npy_path = render_result(
        codes, model, params, cb, pipeline, args.out, args.prefix,
        data_mean=mean, data_std=std, smoothing=args.smooth)
    print(f"wrote {bvh_path}" + (f" and {npy_path}" if npy_path else ""))


def cmd_signature(args):
    from .core.config import VQVAEConfig, load_config
    from .core.schemas import CodebookSignature
    from .models.vqvae import codebook_signature

    conf = load_config(args.config) if args.config else None
    cfg = conf.vqvae if conf else VQVAEConfig()
    model, params, cb = _load_vqvae(args.checkpoint, cfg)
    mean = np.asarray(conf.data_mean) if conf and conf.data_mean else None
    std = np.asarray(conf.data_std) if conf and conf.data_std else None
    code, poses, sig = codebook_signature(model, params, cb, mean, std)
    CodebookSignature(code=code, poses=poses, signature=sig).save(args.out)
    print(f"wrote {args.out}: signature {sig.shape}")


def cmd_test_audio(args):
    from .core.schemas import save_wavvq
    from .pipelines.database_builder import window_test_audio

    if args.wav.endswith(".npz"):
        wav = np.load(args.wav)["wav"].astype(np.float32)
    else:
        from .pipelines.audio_prep import load_wav_16k
        wav = load_wav_16k(args.wav)
    windows = window_test_audio(wav)
    if "wavvq" in args.out:
        wav_out = args.out.replace("wavvq", "wav")
    else:  # never silently reuse args.out for both arrays
        root, ext = os.path.splitext(args.out)
        wav_out = f"{root}_wav{ext or '.npz'}"
    np.savez_compressed(wav_out, wav=windows)
    if args.wavvq_checkpoint:
        from .models.vq_wav2vec import load_vq_wav2vec_checkpoint
        from .pipelines.database_builder import extract_wavvq
        model, variables = load_vq_wav2vec_checkpoint(args.wavvq_checkpoint)
        codes = extract_wavvq(model, variables, windows)
        save_wavvq(args.out, codes)
        print(f"wrote {args.out}: wavvq {codes.shape}")
    else:
        print(f"wrote wav windows {windows.shape}; pass --wavvq-checkpoint "
              "to extract codes")


def cmd_evaluate(args):
    """Score generated motion against ground truth: Hellinger distance over
    velocity histograms and FGD (raw space; feature space when a VQ-VAE
    checkpoint is given — its encoder latents are the feature extractor).
    Inputs are npz files with 'poses'/'body'/'knn_pred'-decoded arrays or
    plain .npy of shape (T, C) or (N, T, C)."""
    import json

    from .render.metrics import fgd, hellinger_velocity

    def load_motion(path):
        if path.endswith(".npy"):
            return np.load(path)
        data = np.load(path, allow_pickle=True)
        for key in ("poses", "body", "motion"):
            if key in data.files:
                return data[key]
        raise ValueError(f"{path}: no poses/body/motion array")

    gen = load_motion(args.generated)
    ref = load_motion(args.reference)
    flat_gen = gen.reshape(-1, gen.shape[-1])
    flat_ref = ref.reshape(-1, ref.shape[-1])
    out = {"hellinger": round(hellinger_velocity(flat_gen, flat_ref), 6)}

    win = args.window
    def windows(x):
        n = (x.shape[0] // win) * win
        return x[:n].reshape(-1, win, x.shape[-1])
    wg, wr = windows(flat_gen), windows(flat_ref)
    out["fgd_raw"] = round(fgd(wg, wr), 4)

    if args.vqvae_checkpoint:
        import jax
        import jax.numpy as jnp
        from .core.config import VQVAEConfig, load_config
        conf = load_config(args.config) if args.config else None
        cfg = conf.vqvae if conf else VQVAEConfig()
        model, params, cb = _load_vqvae(args.vqvae_checkpoint, cfg)
        enc = jax.jit(lambda p, c, x: model.encode(p, c, x))
        # the encoder was trained on z-normalized windows (encode_windows,
        # database_builder.py) — raw rotation-matrix values are far off its
        # input distribution and would yield garbage latents
        mean = np.asarray(conf.data_mean, np.float32) \
            if conf and conf.data_mean is not None else None
        std = np.clip(np.asarray(conf.data_std, np.float32), 0.01, None) \
            if conf and conf.data_std is not None else None
        if mean is None:
            print("warning: no data_mean/data_std in --config; "
                  "fgd_feature encodes un-normalized windows",
                  file=sys.stderr)

        def encoder(wins):
            w = wins.astype(np.float32)
            if mean is not None:
                w = (w - mean) / std
            zs = np.asarray(enc(params, cb, jnp.asarray(w)))
            return zs.reshape(zs.shape[0], -1).astype(np.float64)

        out["fgd_vqvae_latent" if args.fgd_extractor else "fgd_feature"] \
            = round(fgd(wg, wr, encoder=encoder), 4)

    if args.fgd_extractor:
        # the paper's protocol (FGD-feat, BASELINE.md 19.921): a dedicated
        # motion autoencoder trained on ground truth (train-fgd CLI)
        from .render.fgd_extractor import fgd_encoder_fn, load_fgd_extractor
        model, params, mean, std = load_fgd_extractor(args.fgd_extractor)
        enc = fgd_encoder_fn(model, params, mean, std)
        if wg.shape[1] != model.cfg.window:
            raise SystemExit(
                f"--window {wg.shape[1]} != extractor window "
                f"{model.cfg.window}; pass --window {model.cfg.window}")
        out["fgd_feature"] = round(fgd(wg, wr, encoder=enc), 4)
    print(json.dumps(out))


def cmd_train_fgd(args):
    """Train the feature-space FGD extractor on ground-truth motion (the
    Yoon et al. embedding-net protocol; the reference repo has no metric
    code at all — SURVEY §5)."""
    from .render.fgd_extractor import (FGDExtractorConfig,
                                       save_fgd_extractor,
                                       train_fgd_extractor)

    def load_windows(path):
        if os.path.isdir(path):
            from .train.data import WindowedDataset
            return WindowedDataset.load(path).poses
        data = np.load(path, allow_pickle=True)
        if isinstance(data, np.ndarray):
            return data
        for key in ("body", "poses", "motion"):
            if key in data.files:
                return data[key]
        raise SystemExit(f"{path}: no body/poses/motion array")

    wins = load_windows(args.data)
    if wins.ndim == 2:
        n = (wins.shape[0] // args.window) * args.window
        wins = wins[:n].reshape(-1, args.window, wins.shape[-1])
    cfg = FGDExtractorConfig(channels=wins.shape[-1], window=wins.shape[1],
                             latent=args.latent)
    model, params, mean, std = train_fgd_extractor(
        wins, cfg, epochs=args.epochs, batch_size=args.batch_size,
        seed=args.seed)
    save_fgd_extractor(args.out, cfg, params, mean, std)
    print(f"wrote {args.out}: latent={cfg.latent} window={cfg.window} "
          f"({wins.shape[0]} training windows)")


def cmd_bench(args):
    import bench
    bench.main()


def cmd_train_vqvae(args):
    import jax
    from .core.config import load_config
    from .train.data import WindowedDataset
    from .train.train_vqvae import VQVAETrainer

    conf = load_config(args.config)
    ds = WindowedDataset.load(args.data)
    if conf.data_mean is not None:
        ds.data_mean = np.asarray(conf.data_mean)
        ds.data_std = np.asarray(conf.data_std)
    trainer = VQVAETrainer(conf.vqvae, conf.train)
    state = trainer.init_state(jax.random.PRNGKey(0),
                               sample_len=conf.train.n_poses)
    first = next(iter(ds.batches(conf.train.batch_size, seed=0)))
    state = trainer.init_codebook(state, first, jax.random.PRNGKey(1))
    batches = list(ds.batches(conf.train.batch_size, seed=0))
    start_epoch = 1
    initial_best = None
    if args.resume:
        # failure recovery: resume from the rolling 'latest' checkpoint
        # (full state: params + opt + EMA codebook + step counter); the
        # reference saves an epoch counter but never restores it
        # (train.py:114-117)
        import os
        from .train.checkpoints import restore_checkpoint
        from .utils.metrics_log import ScalarHistory
        if os.path.isdir(os.path.join(args.out, "latest")):
            state = restore_checkpoint(args.out, state, name="latest")
            start_epoch = int(state.step) // max(1, len(batches)) + 1
            # recover the prior best val so the 'best' checkpoint cannot
            # be clobbered by a worse post-resume epoch
            hist_path = os.path.join(args.out, "scalars.jsonl")
            if os.path.exists(hist_path):
                prior = ScalarHistory.last(hist_path, "best_val_err")
                if prior is not None:
                    initial_best = (float(prior), 0)
            print(f"resumed from {args.out}/latest at epoch {start_epoch}")
    state, best = trainer.fit(state, batches, epochs=args.epochs,
                              checkpoint_dir=args.out,
                              start_epoch=start_epoch,
                              initial_best=initial_best)
    print(f"best val: {best}")


def _end2end_windows(wav: np.ndarray, max_frames: int = 0) -> np.ndarray:
    """Non-overlapping 4 s subdivision with trailing-window zero-pad —
    the end2end serving split (codebook/inference.py:33-43,67-75; the
    matching path's window_test_audio DROPS the partial tail instead,
    make_test_data.py:18-33). max_frames clamps like inference.py:40-41
    (MAX_FRAMES=3600 -> 15 windows)."""
    import math
    unit = int(C.NUM_FRAMES / C.FPS * C.SR)  # 4 s * 16 kHz = 64000
    n_sub = 1 if len(wav) < unit else \
        math.ceil((len(wav) - unit) / unit) + 1
    if max_frames:
        n_sub = min(n_sub, max(1, int(max_frames / C.NUM_FRAMES)))
    wins = np.zeros((n_sub, unit), np.float32)
    for i in range(n_sub):
        chunk = wav[i * unit:(i + 1) * unit]
        wins[i, :len(chunk)] = chunk
    return wins


def _load_end2end_generator(path: str, cfg):
    """GeneratorGRU inference variables from a reference torch .bin
    ({'model_dict'}, end2end.py:119-128) or a train-end2end orbax dir."""
    import os

    from .models.gru_baseline import GeneratorGRU

    model = GeneratorGRU(hidden=cfg.hidden_size, output=cfg.output_size)
    if os.path.isdir(path):
        import jax

        from .train.checkpoints import restore_checkpoint
        from .train.train_end2end import End2EndTrainer
        trainer = End2EndTrainer(cfg)
        template = trainer.init_state(jax.random.PRNGKey(0))
        state = restore_checkpoint(path, template, name="latest")
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
    else:
        from .models.torch_convert import load_generator_gru_checkpoint
        variables = load_generator_gru_checkpoint(path)
    return model, variables


def cmd_generate(args):
    """Wav in, BVH out — the product path in one command (the reference's
    demo wrapper, Speech2GestureMatching/inference.py:19-82, plus decode):
    window the audio, extract wavvq codes, match against the staged
    database, decode with the VQ-VAE, write BVH.

    --model end2end is the "w/o motion matching" ablation's serving path
    (codebook/inference.py:26-98): the trained GRU baseline predicts the
    code string directly from raw audio — no database, no KNN — and the
    rest of the decode/render tail is shared."""

    from .core.config import MATCH_PRESETS, MatchConfig, load_config
    from .core.schemas import (CodebookSignature, DatabaseBundle, load_codes,
                               load_wavlm, load_wavvq)
    from .motion.pipeline import MotionPipeline
    from .render.decode import render_result

    if args.wav.endswith(".npz"):
        wav = np.load(args.wav)["wav"].astype(np.float32)
        if wav.ndim == 2:
            wav = wav.reshape(-1)
    else:
        from .pipelines.audio_prep import load_wav_16k
        wav = load_wav_16k(args.wav)

    conf = load_config(args.config) if args.config else None
    bundle = None

    if args.model == "end2end":
        import jax

        from .core.config import End2EndConfig
        if not args.end2end_checkpoint:
            raise SystemExit("--model end2end needs --end2end-checkpoint")
        windows = _end2end_windows(wav, max_frames=args.max_frames)
        print(f"{windows.shape[0]} windows of 4 s (end2end)")
        e2e_cfg = conf.end2end if conf else End2EndConfig()
        gen, variables = _load_end2end_generator(
            args.end2end_checkpoint, e2e_cfg)
        # one batched device program over every window — the reference
        # loops host-side window at a time (inference.py:67-80)
        sample = jax.jit(lambda v, w: gen.sample(v, w))
        codes = np.asarray(sample(variables, windows))
        print(f"sampled codes {codes.shape}")
    else:
        from .match.database import (stage_database, stage_test_audio,
                                     stage_test_context)
        from .match.engine import CodeKNNEngine
        from .pipelines.database_builder import (extract_wavvq,
                                                 window_test_audio)
        for req in ("train_database", "train_codebook",
                    "codebook_signature"):
            if not getattr(args, req):
                raise SystemExit(f"--model matching needs "
                                 f"--{req.replace('_', '-')}")
        windows = window_test_audio(wav)
        print(f"{windows.shape[0]} windows of 4 s")
        preset = MATCH_PRESETS[args.preset]
        bundle = DatabaseBundle.load(args.train_database)
        train_codes = load_codes(args.train_codebook)
        signature = CodebookSignature.load(args.codebook_signature)
        cfg = MatchConfig(**{**preset.__dict__,
                             "codebook_size": signature.signature.shape[0]})
        wavlm = load_wavlm(args.train_wavlm) if args.train_wavlm else None
        wavvq = load_wavvq(args.train_wavvq) if args.train_wavvq else None
        db = stage_database(cfg, bundle, train_codes, signature,
                            wavlm=wavlm, wavvq=wavvq)

        if cfg.audio_mode == "wavvq_feat":
            from .models.vq_wav2vec import load_vq_wav2vec_checkpoint
            model, variables = load_vq_wav2vec_checkpoint(
                args.wavvq_checkpoint)
            test_wavvq = extract_wavvq(model, variables, windows)
            test_audio = stage_test_audio(cfg, db, wavvq=test_wavvq)
        else:
            from .models.wavlm import load_wavlm_checkpoint
            model, variables = load_wavlm_checkpoint(args.wavlm_checkpoint)
            from .pipelines.database_builder import extract_wavlm
            test_wavlm = extract_wavlm(model, variables, windows)
            test_audio = stage_test_audio(cfg, db, wavlm=test_wavlm)
        test_context = None
        if cfg.use_txt:
            # without transcripts the context falls back to empty-text
            # embeddings replicated per window
            from .pipelines.database_builder import hashed_embed_fn
            embed = hashed_embed_fn()
            ctx = np.tile(embed([""] * 30)[None, :, :],
                          (windows.shape[0], 1, 1)).astype(np.float32)
            test_context = stage_test_context(db, ctx)

        engine = CodeKNNEngine(cfg, db)
        result = engine.predict(test_audio, test_context)
        codes = np.asarray(result.codes)
        print(f"matched codes {codes.shape}")

    from .core.config import VQVAEConfig
    vq_cfg = conf.vqvae if conf else VQVAEConfig()
    model, params, cb = _load_vqvae(args.vqvae_checkpoint, vq_cfg)
    with open(args.pipeline) as f:
        pipeline = MotionPipeline.from_json(f.read())
    mean = np.asarray(conf.data_mean) if conf and conf.data_mean else None
    std = np.asarray(conf.data_std) if conf and conf.data_std else None

    pose_transform = None
    if getattr(args, "resync", None):
        # stage-2 resync (ResyncGestureKNN.py:155-175): the trained UNet
        # re-syncs the decoded KNN motion to the audio's MFCCs before BVH
        if bundle is None:
            if not args.train_database:
                raise SystemExit("--resync needs --train-database (the "
                                 "mfcc/body stats source)")
            bundle = DatabaseBundle.load(args.train_database)
        pose_transform = _make_resync_transform(
            args.resync, wav, bundle, n_joints=135)
        print(f"applying ResyncNet from {args.resync}")
    bvh_path, npy_path = render_result(codes, model, params, cb,
                                       pipeline, args.out, args.prefix,
                                       data_mean=mean, data_std=std,
                                       smoothing=args.smooth,
                                       pose_transform=pose_transform)
    if args.model == "end2end":
        # the reference also persists the sampled code string
        # (inference.py:96, 'code<prefix>.npy')
        code_path = os.path.join(args.out, f"code_{args.prefix}.npy")
        np.save(code_path, codes)
        print(f"wrote {code_path}")
    print(f"wrote {bvh_path}")
    if args.video and npy_path:
        from .render.visualize import render_positions
        pos = np.load(npy_path)
        out = render_positions(pos, bvh_path.replace(".bvh", ".mp4"),
                               codes=codes)
        print(f"wrote {out}")


def cmd_build_db(args):
    """Database construction for a new speaker (make_beat_dataset steps 1-4
    equivalent): (BVH, wav[, transcript]) recordings -> per-split window
    bundles + stats + pipeline snapshot (+ codes / wavvq / phases when the
    corresponding checkpoints are supplied).

    --dataset trinity instead builds the Trinity/GENEA2020 TRAINING stores
    (trinity_data_to_lmdb.py equivalent) from --trn-path/--val-path."""
    import glob
    import os

    if getattr(args, "dataset", "beat") == "trinity":
        from .pipelines.trinity import build_trinity_dataset
        if not (args.trn_path and args.val_path):
            raise SystemExit("--dataset trinity needs --trn-path and "
                             "--val-path (each holding Motion/ Audio/ "
                             "Transcripts/)")
        os.makedirs(args.out, exist_ok=True)
        paths = build_trinity_dataset(args.trn_path, args.val_path,
                                      mode=args.mode, fps=args.fps,
                                      out_dir=args.out)
        for k, v in paths.items():
            print(f"wrote {k}: {v}")
        return

    from .core.config import VQVAEConfig, load_config
    from .motion.bvh import parse_bvh
    from .motion.pipeline import MotionPipeline
    from .pipelines.database_builder import (hashed_embed_fn,
                                             process_recording, split_of,
                                             window_recordings)
    from .pipelines.transcripts import read_tab_transcript
    from .train.data import dataset_stats

    if not (args.bvh_dir and args.wav_dir):
        raise SystemExit("--bvh-dir and --wav-dir are required for the "
                         "BEAT builder (--dataset beat)")
    os.makedirs(args.out, exist_ok=True)
    bvh_files = sorted(glob.glob(os.path.join(args.bvh_dir, "*.bvh")))
    assert bvh_files, f"no .bvh files in {args.bvh_dir}"

    pipeline = None
    recordings = []
    for bvh_path in bvh_files:
        name = os.path.splitext(os.path.basename(bvh_path))[0]
        if split_of(name) is None:
            print(f"skip {name}")
            continue
        wav_path = os.path.join(args.wav_dir, name + ".wav")
        # raw 44.1 kHz (or stereo/24-bit) input converts automatically —
        # the reference requires a manual ffmpeg-normalize pass first
        # (normalize_audio.py:5-13)
        from .pipelines.audio_prep import ensure_16k_wav
        wav_path = ensure_16k_wav(wav_path,
                                  os.path.join(args.out, "_audio16k"))
        from .pipelines.audio_prep import read_wav
        wav, wav_sr = read_wav(wav_path)
        assert wav_sr == 16000, f"{wav_path}: expected 16 kHz"
        wav = wav.astype(np.float32)
        words = []
        if args.transcript_dir:
            tpath = os.path.join(args.transcript_dir, name + ".txt")
            if os.path.exists(tpath):
                words = read_tab_transcript(tpath)
                if not words and args.gentle:
                    # raw (unaligned) text: drive a gentle run
                    # (align_words, process_beat_txt.py:49-81)
                    from .pipelines.transcripts import (GentleUnavailable,
                                                        run_gentle)
                    try:
                        words = run_gentle(wav_path,
                                           open(tpath, encoding="utf-8")
                                           .read())
                    except GentleUnavailable as e:
                        print(f"{name}: gentle alignment skipped ({e})")
        bvh = parse_bvh(bvh_path)
        if pipeline is None:
            pipeline = MotionPipeline(fps=args.fps).fit(bvh)
            with open(os.path.join(args.out, "pipeline.json"), "w") as f:
                f.write(pipeline.to_json())
        rec = process_recording(name, bvh, wav, pipeline, words,
                                fps=args.fps)
        recordings.append(rec)
        print(f"{name}: {rec.rotation.shape[0]} frames "
              f"({split_of(name)})")

    mean, std = dataset_stats([{"poses": r.rotation} for r in recordings])
    np.savez(os.path.join(args.out, "stats.npz"), mean=mean, std=std)

    if args.pae_checkpoint:
        from .models.pae import PAE, PhaseExtractor
        from .models.torch_convert import load_pae_checkpoint
        conf = load_config(args.config) if args.config else None
        from .core.config import PAEConfig
        pae_cfg = conf.pae if conf else PAEConfig()
        extractor = PhaseExtractor(PAE(pae_cfg),
                                   load_pae_checkpoint(args.pae_checkpoint))
        for rec in recordings:
            rec.phase = extractor.pose_to_phase(rec.rotation, mean, std)

    embed = hashed_embed_fn() if args.hashed_context else None
    if args.sentence_model:
        # prefer the device-native JAX MiniLM when given a checkpoint dir
        # (config.json + vocab.txt + weights); a bare model *name* can only
        # resolve through the torch/sentence-transformers loader
        if os.path.isdir(args.sentence_model) and os.path.exists(
                os.path.join(args.sentence_model, "vocab.txt")):
            from .pipelines.database_builder import minilm_embed_fn
            embed = minilm_embed_fn(args.sentence_model)
        else:
            from .pipelines.database_builder import (
                sentence_transformer_embed_fn)
            embed = sentence_transformer_embed_fn(args.sentence_model)

    splits = {"train": [], "validation": [], "test": []}
    for rec in recordings:
        splits[split_of(rec.name)].append(rec)

    # load each checkpoint ONCE (not per split: WavLM alone is GB-scale)
    vq_model = wavvq_model = wavlm_model = None
    if args.vqvae_checkpoint:
        conf = load_config(args.config) if args.config else None
        vq_cfg = conf.vqvae if conf else VQVAEConfig()
        vq_model = _load_vqvae(args.vqvae_checkpoint, vq_cfg)
    if args.wavvq_checkpoint:
        from .models.vq_wav2vec import load_vq_wav2vec_checkpoint
        wavvq_model = load_vq_wav2vec_checkpoint(args.wavvq_checkpoint)
    if args.wavlm_checkpoint:
        from .models.wavlm import load_wavlm_checkpoint
        wavlm_model = load_wavlm_checkpoint(args.wavlm_checkpoint)

    for split, recs in splits.items():
        if not recs:
            continue
        bundle = window_recordings(recs, n_frames=args.n_frames,
                                   embed_fn=embed)
        path = os.path.join(args.out, f"{args.prefix}_{split}_"
                            f"{args.n_frames}_txt_2.npz")
        bundle.save(path)
        print(f"wrote {path}: {bundle.body.shape[0]} windows")

        if vq_model is not None:
            from .pipelines.database_builder import encode_windows
            model, params, cb = vq_model
            codes = encode_windows(model, params, cb, bundle.body, mean, std)
            cpath = os.path.join(args.out, f"{args.prefix}_{split}_"
                                 f"{args.n_frames}_code.npz")
            np.savez_compressed(cpath, code=codes)
            print(f"wrote {cpath}: {codes.shape}")
        if wavvq_model is not None:
            from .pipelines.database_builder import extract_wavvq
            model, variables = wavvq_model
            wavvq = extract_wavvq(model, variables, bundle.wav)
            wpath = os.path.join(args.out, f"{args.prefix}_{split}_"
                                 f"{args.n_frames}_WavVQ.npz")
            np.savez_compressed(wpath, wavvq=wavvq)
            print(f"wrote {wpath}: {wavvq.shape}")
        if wavlm_model is not None:
            from .pipelines.database_builder import extract_wavlm
            model, variables = wavlm_model
            feats = extract_wavlm(model, variables, bundle.wav)
            lpath = os.path.join(args.out, f"{args.prefix}_{split}_"
                                 f"{args.n_frames}_WavLM.npz")
            np.savez_compressed(lpath, wavlm=feats)
            print(f"wrote {lpath}: {feats.shape}")


def cmd_phase(args):
    """PAE.py --stage inference equivalent: Rotation/*.npz -> Phase/*.npz
    with dense (T, 4, 8) phases."""
    import glob
    import os

    from .core.config import load_config
    from .models.pae import PAE, PhaseExtractor
    from .models.torch_convert import load_pae_checkpoint

    conf = load_config(args.config)
    model = PAE(conf.pae)
    variables = load_pae_checkpoint(args.checkpoint,
                                    conf.pae.phase_channels)
    extractor = PhaseExtractor(model, variables)
    mean = np.asarray(conf.data_mean).squeeze()
    std = np.asarray(conf.data_std).squeeze()
    os.makedirs(args.out, exist_ok=True)
    for path in sorted(glob.glob(os.path.join(args.rotation_dir, "*.npz"))):
        name = os.path.basename(path)
        dst = os.path.join(args.out, name)
        if os.path.exists(dst):
            continue
        pose = np.load(path)["upper"]
        phase = extractor.pose_to_phase(pose, mean, std)
        np.savez_compressed(dst, phase=phase)
        print(f"{name}: phase {phase.shape}")


def cmd_train_pae(args):
    import jax
    from .core.config import load_config
    from .train.data import WindowedDataset
    from .train.train_pae import PAETrainer

    conf = load_config(args.config)
    ds = WindowedDataset.load(args.data)
    if conf.data_mean is not None:
        ds.data_mean = np.asarray(conf.data_mean)
        ds.data_std = np.asarray(conf.data_std)
    batch_size = max(args.batch_size, 8)
    batches = list(ds.batches(batch_size, seed=0))
    trainer = PAETrainer(conf.pae, steps_per_epoch=max(len(batches), 1))
    state = trainer.init_state(jax.random.PRNGKey(0))
    epochs = args.epochs or conf.pae.epochs
    hist = None
    if args.out:
        from .utils.metrics_log import ScalarHistory
        import os
        hist = ScalarHistory(os.path.join(args.out, "scalars.jsonl"))
    for epoch in range(epochs):
        for batch in batches:
            state, loss = trainer.train_step(state, batch)
        print(f"epoch {epoch}: loss {float(loss):.5f}")
        if hist:
            hist.log(epoch=epoch, loss=float(loss))
        if args.out and (epoch + 1) % conf.pae.save_per_epochs == 0:
            from .train.checkpoints import save_checkpoint
            save_checkpoint(args.out, state, name=f"{epoch:03d}")
    if args.out:
        from .train.checkpoints import save_checkpoint
        save_checkpoint(args.out, state, name="latest")


def cmd_train_end2end(args):
    import jax
    from .core.config import load_config
    from .train.data import WindowedDataset
    from .train.train_end2end import End2EndTrainer

    conf = load_config(args.config)
    ds = WindowedDataset.load(args.data)
    assert ds.audio is not None and ds.codes is not None, \
        "end2end training needs audio + codes in the dataset"
    trainer = End2EndTrainer(conf.end2end)
    state = trainer.init_state(jax.random.PRNGKey(0))
    epochs = args.epochs or conf.end2end.epochs
    rng = jax.random.PRNGKey(1)
    hist = None
    if args.out:
        from .utils.metrics_log import ScalarHistory
        import os
        hist = ScalarHistory(os.path.join(args.out, "scalars.jsonl"))
    for epoch in range(epochs):
        for wav, codes in ds.batches(args.batch_size, seed=epoch,
                                     include=("audio", "codes")):
            rng, sub = jax.random.split(rng)
            state, loss = trainer.train_step(state, wav, codes, sub)
        print(f"epoch {epoch}: loss {float(loss):.5f}")
        if hist:
            hist.log(epoch=epoch, loss=float(loss))
    if args.out:
        from .train.checkpoints import save_checkpoint
        save_checkpoint(args.out, state, name="latest")


def cmd_plot(args):
    """Offline training plots (the reference's live matplotlib windows,
    Library/Utility.py:21-75 + Plotting.py): loss/metric curves from a
    scalars.jsonl history and/or a phase-manifold PCA from a Phase npz."""
    import os

    from .render.plots import (plot_phase_channels, plot_phase_manifold,
                               plot_scalar_history, plot_wav_debug)

    os.makedirs(args.out, exist_ok=True)
    wrote = []
    if args.history:
        wrote.append(plot_scalar_history(
            args.history, os.path.join(args.out, "scalars.png"),
            tags=args.tags))
    if args.phase:
        from .core.schemas import _to_dense_phase
        data = np.load(args.phase, allow_pickle=True)
        key = "phase" if "phase" in data.files else data.files[0]
        phase = _to_dense_phase(data[key])
        if args.phase_debug:
            # per-channel Phase2D_mono curves over random 32-frame
            # windows (visualize_phase.py:64-83: one window, then a
            # 3-window overlay)
            seqs = phase if phase.ndim == 4 else phase[None]
            rng = np.random.RandomState(args.seed)
            win = min(32, seqs.shape[1])

            def pick():
                i = rng.randint(0, seqs.shape[0])
                j = rng.randint(0, max(1, seqs.shape[1] - win + 1))
                return seqs[i, j:j + win]
            wrote.append(plot_phase_channels(
                [pick()], os.path.join(args.out, "visualize_phase.png")))
            wrote.append(plot_phase_channels(
                [pick() for _ in range(3)],
                os.path.join(args.out, "visualize_phase_3.png")))
        flat = phase.reshape(-1, *phase.shape[-2:]) if phase.ndim == 4 \
            else phase
        wrote.append(plot_phase_manifold(
            flat, os.path.join(args.out, "phase_manifold.png")))
    if args.wav:
        if args.wav.endswith(".npz"):
            wav = np.load(args.wav)["wav"].astype(np.float32).reshape(-1)
            sr = C.SR
        else:
            from .pipelines.audio_prep import load_wav_16k
            wav = load_wav_16k(args.wav)
            sr = C.SR
        wrote.append(plot_wav_debug(
            wav, sr, os.path.join(args.out, "wav_debug.png")))
    if args.merge_figs:
        from .render.plots import merge_frames
        wrote.append(merge_frames(
            args.merge_figs, os.path.join(args.out, "merged_figs.mp4"),
            count=args.count, fps=args.fps))
    if not wrote:
        raise SystemExit("pass --history, --phase, --wav and/or "
                         "--merge-figs")
    for w in wrote:
        print(f"wrote {w}")


def _load_resync_variables(path: str, n_mfcc: int, n_joints: int,
                           num_frames: int):
    """ResyncNet inference variables from either a torch checkpoint
    (best_model.pth / a bare state_dict pickle) or an orbax directory
    saved by `train-resync`."""
    import os

    from .models.resync import ResyncNet

    gen = ResyncNet(out_features=n_joints)
    if os.path.isdir(path):
        import jax

        from .core.config import ResyncConfig
        from .train.checkpoints import restore_checkpoint
        from .train.train_resync import ResyncTrainer
        trainer = ResyncTrainer(ResyncConfig(), n_mfcc=n_mfcc,
                                n_joints=n_joints, num_frames=num_frames)
        template = trainer.init_state(jax.random.PRNGKey(0),
                                      num_frames=num_frames)
        state = restore_checkpoint(path, template, name="latest")
        variables = {"params": state.g_params,
                     "batch_stats": state.g_stats}
    else:
        from .models.torch_convert import load_resync_checkpoint
        variables = load_resync_checkpoint(path)
    return gen, variables


def _make_resync_transform(ckpt: str, wav: np.ndarray, bundle,
                           n_joints: int = 135, n_mfcc: int = 13):
    """Build the render_result pose_transform that applies a trained
    ResyncNet to decoded KNN motion (`generate --resync`): per 4 s window,
    (MFCC | motion) -> generator -> resynced motion. Stats come from the
    train database bundle, as in ResyncGestureKNN.main:126-137."""
    from .models.resync import predict_resynced_gesture, resync_stats
    from .ops.mfcc import MFCCConfig, sphinx_mfcc_np

    if bundle.mfcc is None or bundle.body is None:
        raise SystemExit("--resync needs a train database bundle with "
                         "'mfcc' and 'body' arrays (the stats source)")
    m_mean, m_std, g_mean, g_std = resync_stats(
        bundle.mfcc[:, :, :n_mfcc], bundle.body)
    mfcc_full = sphinx_mfcc_np(wav, MFCCConfig(frate=C.FPS)).astype(
        np.float32)[:, :n_mfcc]
    gen, variables = _load_resync_variables(
        ckpt, n_mfcc=n_mfcc, n_joints=n_joints, num_frames=C.NUM_FRAMES)

    def transform(poses: np.ndarray) -> np.ndarray:
        T = poses.shape[0]
        W = T // C.NUM_FRAMES
        mf = mfcc_full
        if mf.shape[0] < W * C.NUM_FRAMES:
            mf = np.pad(mf, ((0, W * C.NUM_FRAMES - mf.shape[0]), (0, 0)))
        mf = mf[:W * C.NUM_FRAMES].reshape(W, C.NUM_FRAMES, n_mfcc)
        motion = poses[:W * C.NUM_FRAMES].reshape(W, C.NUM_FRAMES,
                                                  n_joints)
        out = predict_resynced_gesture(gen, variables, mf, motion,
                                       m_mean, m_std, g_mean, g_std)
        resynced = poses.copy()
        resynced[:W * C.NUM_FRAMES] = out.reshape(-1, n_joints)
        return resynced

    return transform


def cmd_resync_apply(args):
    """Stage-2 resync of KNN output (ResyncGestureKNN.py:43-87,155-175):
    load knn_pred, normalize with the train database's stats, run the
    trained generator over every sequence in one device program, and save
    the resynced motion under the same npz schema."""
    from .models.resync import predict_resynced_gesture, resync_stats

    knn = np.load(args.knn)["knn_pred"]
    test = np.load(args.test_data)
    mfcc_test = test["mfcc"][:, :, :args.n_mfcc].astype(np.float32)
    train = np.load(args.train_database)
    m_mean, m_std, g_mean, g_std = resync_stats(
        train["mfcc"][:, :, :args.n_mfcc], train["body"])

    # knn_pred ships in the reference's (N, J, T) layout
    # (ResyncGestureKNN.py:160); accept (N, T, J) via --layout ntj
    if args.layout == "njt":
        knn_motion = knn.transpose(0, 2, 1)
    else:
        knn_motion = knn
    n_seq = args.frames or knn_motion.shape[0]
    knn_motion = knn_motion[:n_seq].astype(np.float32)
    mfcc_test = mfcc_test[:n_seq]
    n_joints = knn_motion.shape[2]
    num_frames = knn_motion.shape[1]
    assert mfcc_test.shape[1] == num_frames, (mfcc_test.shape,
                                              knn_motion.shape)

    gen, variables = _load_resync_variables(
        args.checkpoint, n_mfcc=args.n_mfcc, n_joints=n_joints,
        num_frames=num_frames)
    out = predict_resynced_gesture(gen, variables, mfcc_test, knn_motion,
                                   m_mean, m_std, g_mean, g_std)
    if args.layout == "njt":
        out = out.transpose(0, 2, 1)
    np.savez_compressed(args.out, knn_pred=out)
    print(f"wrote {args.out}: resynced knn_pred {out.shape}")


def cmd_train_resync(args):
    """ResyncNet WGAN-GP training (train_resync_gestureknn.py:108-187):
    data npz holds x_knn / x_real as (N, T, n_mfcc + n_joints) —
    KNN-searched motion windows with their audio features vs ground-truth
    windows."""
    import jax
    from .core.config import ResyncConfig, load_config
    from .train.train_resync import ResyncTrainer

    conf = load_config(args.config) if args.config else None
    cfg = conf.resync if conf and getattr(conf, "resync", None) \
        else ResyncConfig()
    data = np.load(args.data)
    x_knn = data["knn"].astype(np.float32)
    x_real = data["real"].astype(np.float32)
    assert x_knn.shape == x_real.shape, (x_knn.shape, x_real.shape)
    n, t, c = x_knn.shape
    n_joints = args.n_joints
    trainer = ResyncTrainer(cfg, n_mfcc=c - n_joints, n_joints=n_joints,
                            num_frames=t)
    state = trainer.init_state(jax.random.PRNGKey(0), num_frames=t)
    rng = np.random.RandomState(0)
    iters = args.iters or cfg.max_iters
    bs = min(args.batch_size or cfg.batch_size, n)
    for it in range(iters):
        idx = rng.randint(0, n, size=bs)
        state, logs = trainer.train_iteration(
            state, x_knn[idx], x_real[idx], jax.random.PRNGKey(it), it)
        if it % max(1, iters // 10) == 0:
            print(f"iter {it}: " + " ".join(f"{k} {v:.4f}"
                                            for k, v in logs.items()))
    if args.out:
        from .train.checkpoints import save_checkpoint
        save_checkpoint(args.out, state, name="latest")
        print(f"saved {args.out}")


def cmd_assemble_beat(args):
    """BEAT step-1 assembly (make_beat_dataset.py:17-96): orig-BEAT tree ->
    <out>/{Audio,Motion} with paired recordings only and repaired BVH
    Frames headers; optional resample/normalize of the copied audio."""
    import glob
    import os

    from .pipelines.audio_prep import normalize_wav, resample_wav
    from .pipelines.beat_assembly import assemble_beat_dataset

    summary = assemble_beat_dataset(args.orig_root, args.out,
                                    speakers=args.speakers)
    print(f"copied {summary['n_pairs']} paired recordings; repaired "
          f"{len(summary['repaired'])} BVH headers")
    if args.normalize or args.resample:
        out_dir = os.path.join(args.out, "Audio_normalized"
                               if args.normalize else "Audio_16k")
        backend = None
        for wav in sorted(glob.glob(
                os.path.join(summary["audio_dir"], "*.wav"))):
            dst = os.path.join(out_dir, os.path.basename(wav))
            backend = (normalize_wav(wav, dst) if args.normalize
                       else resample_wav(wav, dst))
        print(f"audio prepared into {out_dir} (backend: {backend})")


def cmd_verify_release(args):
    """The real-artifact acceptance gate (pipelines/release.py)."""
    from .pipelines.release import verify_release

    overrides = {
        "train_db": args.train_db, "test_db": args.test_db,
        "train_code": args.train_code, "signature": args.signature,
        "train_wavlm": args.train_wavlm, "test_wavlm": args.test_wavlm,
        "train_wavvq": args.train_wavvq, "test_wavvq": args.test_wavvq,
        "checkpoint": args.checkpoint,
    }
    card = verify_release(args.root, overrides=overrides,
                          expected=args.expected, config=args.config,
                          out=args.out, subsample=args.subsample,
                          budget_s=args.budget_s, seed=args.seed)
    if not card["ok"]:
        raise SystemExit(1)


def main(argv=None):
    p = argparse.ArgumentParser(prog="qpgesture_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    m = sub.add_parser("match", help="CodeKNN motion matching")
    m.add_argument("--train-database", required=True)
    m.add_argument("--train-codebook", required=True)
    m.add_argument("--codebook-signature", required=True)
    m.add_argument("--train-wavlm")
    m.add_argument("--train-wavvq")
    m.add_argument("--test-data")
    m.add_argument("--test-wavlm")
    m.add_argument("--test-wavvq")
    m.add_argument("--out", default="./result.npz")
    m.add_argument("--preset", default="shipped",
                   choices=["shipped", "shipped_fast", "wavvq",
                            "wavvq_aud_only", "mfcc",
                            "no_phase", "no_text", "no_audio"])
    m.add_argument("--desired-k", type=int, default=0)
    m.add_argument("--feat-dtype", default=None,
                   choices=["float32", "bfloat16", "float16"],
                   help="audio feature-DB HBM residency dtype (bf16/f16 "
                        "halve the resident DB — the whole-corpus wavlm "
                        "single-chip mode; see MatchConfig.feat_dtype)")
    m.add_argument("--max-frames", type=int, default=0)
    m.add_argument("--ties", default="stable",
                   choices=["stable", "reference"],
                   help="tie policy: 'stable' (deterministic, all-device) "
                        "or 'reference' (bit-parity with the original "
                        "binary's unstable introsort + f64 rank sums)")
    m.add_argument("--sharded", default="auto",
                   choices=["auto", "never", "always"],
                   help="database sharding over the device mesh: 'auto' "
                        "spills to the J-sharded path when the staged DB "
                        "would exceed ~60%% of one chip's HBM (bit-"
                        "identical results); --feat-dtype bfloat16/float16 "
                        "via the preset config halves residency first")
    m.set_defaults(fn=cmd_match)

    wu = sub.add_parser(
        "warmup", help="pre-compile serving programs into the compile "
                       "cache (run once at deploy time)")
    wu.add_argument("--train-database", required=True)
    wu.add_argument("--train-codebook", required=True)
    wu.add_argument("--codebook-signature", required=True)
    wu.add_argument("--train-wavlm")
    wu.add_argument("--train-wavvq")
    wu.add_argument("--preset", default="shipped",
                    choices=["shipped", "shipped_fast", "wavvq",
                             "wavvq_aud_only", "mfcc",
                             "no_phase", "no_text", "no_audio"])
    wu.add_argument("--buckets", default="1,2,4,8,16",
                    help="comma-separated window counts to compile "
                         "(CodeKNNEngine.BUCKETS prefix by default)")
    wu.add_argument("--decode", action="store_true",
                    help="also warm the VQ-VAE decode program per bucket")
    wu.add_argument("--serving", action="store_true",
                    help="with --decode: also warm ServingPipeline's FUSED "
                         "match+decode program per bucket (a distinct HLO "
                         "module from engine.predict + standalone decode)")
    wu.add_argument("--checkpoint",
                    help="VQ-VAE checkpoint for --decode (optional: "
                         "executables are shape-specialized, random "
                         "weights warm the same cache entries)")
    wu.add_argument("--config")
    wu.add_argument("--desired-k", type=int, default=0,
                    help="warm with this desired_k (it is a static closure "
                         "constant of the traced program: production runs "
                         "with a different --desired-k compile cold)")
    wu.add_argument("--feat-dtype", default=None,
                    choices=["float32", "bfloat16", "float16"],
                    help="warm with this feature-DB residency dtype "
                         "(match the production --feat-dtype: the staged "
                         "DB dtype changes the compiled program)")
    wu.add_argument("--streams", type=int, default=0,
                    help="also warm the StreamingPool tick program for "
                         "this many concurrent live streams, plus the "
                         "solo StreamingSession push program")
    wu.add_argument("--rawpose-batch", type=int, default=0,
                    help="also warm the K-vmapped raw-pose GestureKNN "
                         "batch search for this many clips (the repo's "
                         "longest relay compile, ~7 min cold)")
    wu.set_defaults(fn=cmd_warmup)

    d = sub.add_parser("decode", help="decode result.npz to BVH")
    d.add_argument("--result", required=True)
    d.add_argument("--checkpoint", required=True)
    d.add_argument("--pipeline", required=True,
                   help="MotionPipeline JSON snapshot")
    d.add_argument("--config")
    d.add_argument("--out", default="./output")
    d.add_argument("--prefix", default="generated")
    d.add_argument("--smooth", action="store_true")
    d.set_defaults(fn=cmd_decode)

    s = sub.add_parser("signature", help="build code.npz signatures")
    s.add_argument("--checkpoint", required=True)
    s.add_argument("--config")
    s.add_argument("--out", default="./code.npz")
    s.set_defaults(fn=cmd_signature)

    t = sub.add_parser("test-audio", help="wav -> wavvq_240.npz")
    t.add_argument("--wav", required=True)
    t.add_argument("--out", default="./wavvq_240.npz")
    t.add_argument("--wavvq-checkpoint")
    t.set_defaults(fn=cmd_test_audio)

    b = sub.add_parser("bench", help="run the headline benchmark")
    b.set_defaults(fn=cmd_bench)

    ev = sub.add_parser("evaluate",
                        help="Hellinger + FGD between motion sets")
    ev.add_argument("--generated", required=True)
    ev.add_argument("--reference", required=True)
    ev.add_argument("--window", type=int, default=240)
    ev.add_argument("--vqvae-checkpoint")
    ev.add_argument("--fgd-extractor",
                    help="trained FGD feature extractor (train-fgd CLI) "
                         "for the paper's feature-space FGD")
    ev.add_argument("--config")
    ev.set_defaults(fn=cmd_evaluate)

    tf = sub.add_parser("train-fgd",
                        help="train the feature-space FGD extractor")
    tf.add_argument("--data", required=True,
                    help="ground-truth windows: npz with body/poses, .npy, "
                         "or a WindowedDataset dir")
    tf.add_argument("--out", required=True)
    tf.add_argument("--window", type=int, default=240,
                    help="window length when --data holds flat (T, C)")
    tf.add_argument("--latent", type=int, default=32)
    tf.add_argument("--epochs", type=int, default=20)
    tf.add_argument("--batch-size", type=int, default=64)
    tf.add_argument("--seed", type=int, default=0)
    tf.set_defaults(fn=cmd_train_fgd)

    tv = sub.add_parser("train-vqvae", help="train the gesture VQ-VAE")
    tv.add_argument("--config", required=True)
    tv.add_argument("--data", required=True,
                    help="WindowedDataset directory")
    tv.add_argument("--out", default="./output/train_codebook")
    tv.add_argument("--epochs", type=int)
    tv.add_argument("--resume", action="store_true",
                    help="resume from <out>/latest if present")
    tv.set_defaults(fn=cmd_train_vqvae)

    g = sub.add_parser("generate", help="wav -> gestures (match + decode, "
                       "or the end2end GRU ablation)")
    g.add_argument("--wav", required=True)
    g.add_argument("--model", choices=("matching", "end2end"),
                   default="matching",
                   help="'matching' = KNN against the database (default); "
                        "'end2end' = the w/o-motion-matching GRU baseline "
                        "(codebook/inference.py)")
    g.add_argument("--train-database",
                   help="required for --model matching (and for --resync)")
    g.add_argument("--train-codebook")
    g.add_argument("--codebook-signature")
    g.add_argument("--train-wavlm")
    g.add_argument("--train-wavvq")
    g.add_argument("--wavvq-checkpoint")
    g.add_argument("--wavlm-checkpoint")
    g.add_argument("--end2end-checkpoint", metavar="CKPT",
                   help="GeneratorGRU weights (torch end2end_*.bin or "
                        "train-end2end orbax dir) for --model end2end")
    g.add_argument("--max-frames", type=int, default=0,
                   help="clamp end2end generation length "
                        "(inference.py MAX_FRAMES)")
    g.add_argument("--vqvae-checkpoint", required=True)
    g.add_argument("--pipeline", required=True)
    g.add_argument("--config")
    g.add_argument("--preset", default="wavvq")
    g.add_argument("--out", default="./output")
    g.add_argument("--prefix", default="generated")
    g.add_argument("--smooth", action="store_true")
    g.add_argument("--video", action="store_true")
    g.add_argument("--resync", metavar="CKPT",
                   help="apply a trained ResyncNet to the decoded motion "
                        "(torch best_model.pth or train-resync orbax dir)")
    g.set_defaults(fn=cmd_generate)

    ra = sub.add_parser(
        "resync-apply",
        help="stage-2 ResyncNet application to KNN output "
             "(ResyncGestureKNN.py:43-87)")
    ra.add_argument("--knn", required=True,
                    help="npz with knn_pred (N, J, T) motion")
    ra.add_argument("--test-data", required=True,
                    help="npz with test 'mfcc' (N, T, >=13)")
    ra.add_argument("--train-database", required=True,
                    help="npz with train 'mfcc' + 'body' (the stats "
                         "source, ResyncGestureKNN.main:126-137)")
    ra.add_argument("--checkpoint", required=True)
    ra.add_argument("--out", required=True)
    ra.add_argument("--frames", type=int, default=0,
                    help="resync only the first N sequences (0 = all; "
                         "the reference's frames arg)")
    ra.add_argument("--layout", choices=("njt", "ntj"), default="njt")
    ra.add_argument("--n-mfcc", type=int, default=13)
    ra.set_defaults(fn=cmd_resync_apply)

    bd = sub.add_parser("build-db", help="build a speaker database from "
                        "(BVH, wav, transcript) recordings")
    bd.add_argument("--dataset", default="beat",
                    choices=["beat", "trinity"],
                    help="'trinity' = Trinity/GENEA2020 training-store "
                         "builder (trinity_data_to_lmdb.py equivalent; "
                         "uses --trn-path/--val-path/--mode)")
    bd.add_argument("--bvh-dir")
    bd.add_argument("--wav-dir")
    bd.add_argument("--transcript-dir")
    bd.add_argument("--trn-path", help="trinity: training split dir "
                                       "(Motion/ Audio/ Transcripts/)")
    bd.add_argument("--val-path", help="trinity: test split dir")
    bd.add_argument("--mode", default="rotation",
                    choices=["rotation", "position"],
                    help="trinity: pose parameterization")
    bd.add_argument("--out", required=True)
    bd.add_argument("--prefix", default="speaker")
    bd.add_argument("--fps", type=int, default=60)
    bd.add_argument("--n-frames", type=int, default=240)
    bd.add_argument("--config")
    bd.add_argument("--vqvae-checkpoint")
    bd.add_argument("--wavvq-checkpoint")
    bd.add_argument("--wavlm-checkpoint")
    bd.add_argument("--pae-checkpoint")
    bd.add_argument("--sentence-model",
                    help="MiniLM checkpoint dir for context embeddings "
                         "(runs the device-native JAX port when the dir "
                         "has vocab.txt; a bare model name falls back to "
                         "torch sentence-transformers)")
    bd.add_argument("--hashed-context", action="store_true",
                    help="deterministic hashed embeddings (air-gapped)")
    bd.add_argument("--gentle", action="store_true",
                    help="align raw-text transcripts with gentle "
                         "($GENTLE_URL or $GENTLE_CMD)")
    bd.set_defaults(fn=cmd_build_db)

    ph = sub.add_parser("phase", help="extract PAE phases for Rotation/*.npz")
    ph.add_argument("--checkpoint", required=True)
    ph.add_argument("--config", required=True)
    ph.add_argument("--rotation-dir", required=True)
    ph.add_argument("--out", required=True)
    ph.set_defaults(fn=cmd_phase)

    tp = sub.add_parser("train-pae", help="train the periodic autoencoder")
    tp.add_argument("--config", required=True)
    tp.add_argument("--data", required=True)
    tp.add_argument("--out")
    tp.add_argument("--epochs", type=int)
    tp.add_argument("--batch-size", type=int, default=32)
    tp.set_defaults(fn=cmd_train_pae)

    te = sub.add_parser("train-end2end", help="train the GRU baseline")
    te.add_argument("--config", required=True)
    te.add_argument("--data", required=True)
    te.add_argument("--out")
    te.add_argument("--epochs", type=int)
    te.add_argument("--batch-size", type=int, default=32)
    te.set_defaults(fn=cmd_train_end2end)

    pl = sub.add_parser("plot", help="training curves / phase-manifold / "
                        "phase+audio debug PNGs")
    pl.add_argument("--history", help="scalars.jsonl path")
    pl.add_argument("--phase", help="Phase npz (dense or object format)")
    pl.add_argument("--phase-debug", action="store_true",
                    help="also render per-channel Phase2D_mono curve "
                         "grids over random 32-frame windows "
                         "(visualize_phase.py:34-83)")
    pl.add_argument("--wav", help="wav/npz for time+frequency-domain "
                    "debug views (visualize_phase.py:13-31)")
    pl.add_argument("--seed", type=int, default=0,
                    help="window picker seed for --phase-debug")
    pl.add_argument("--tags", nargs="*")
    pl.add_argument("--merge-figs", metavar="PATTERN",
                    help="stitch a numbered image sequence into a video "
                         "(merge_figs.py:5-15); format string with one "
                         "{} slot, e.g. 'figs/{}.jpg'")
    pl.add_argument("--count", type=int, default=20,
                    help="frame count for --merge-figs")
    pl.add_argument("--fps", type=int, default=30,
                    help="frame rate for --merge-figs")
    pl.add_argument("--out", default="./plots")
    pl.set_defaults(fn=cmd_plot)

    tr = sub.add_parser("train-resync",
                        help="train the ResyncNet WGAN-GP refiner")
    tr.add_argument("--data", required=True,
                    help="npz with knn/real (N, T, n_mfcc+n_joints) arrays")
    tr.add_argument("--config")
    tr.add_argument("--n-joints", type=int, default=135)
    tr.add_argument("--iters", type=int)
    tr.add_argument("--batch-size", type=int)
    tr.add_argument("--out")
    tr.set_defaults(fn=cmd_train_resync)

    ab = sub.add_parser("assemble-beat",
                        help="step-1 orig-BEAT assembly: copy paired "
                             "wav/bvh + repair Frames headers")
    ab.add_argument("--orig-root", required=True)
    ab.add_argument("--out", required=True)
    ab.add_argument("--speakers", nargs="*",
                    help="restrict to these speaker ids")
    ab.add_argument("--resample", action="store_true",
                    help="also produce Audio_16k/ (ffmpeg/sox/python)")
    ab.add_argument("--normalize", action="store_true",
                    help="also produce Audio_normalized/ "
                         "(ffmpeg-normalize equivalent)")
    ab.set_defaults(fn=cmd_assemble_beat)

    vr = sub.add_parser(
        "verify-release",
        help="one-command acceptance gate on the reference's published "
             "artifact tree (README quick start layout)")
    vr.add_argument("root", help="artifact root containing data/ and "
                                 "pretrained_model/")
    vr.add_argument("--expected",
                    help="result.npz produced by the original reference "
                         "binary, for byte-exact index parity")
    vr.add_argument("--config", help="codebook.yml for the VQ-VAE shape "
                                     "and data mean/std")
    vr.add_argument("--out", help="write the gate's result.npz here")
    vr.add_argument("--budget-s", type=float, default=5.0,
                    help="wall-clock budget for the warm quick-start match")
    vr.add_argument("--subsample", type=int, default=8,
                    help="database sequences for the exact-parity harness")
    vr.add_argument("--seed", type=int,
                    help="override the match rng seed (the reference pins "
                         "123456 at import, GestureKNN.py:19-22)")
    for k in ("train-db", "test-db", "train-code", "signature",
              "train-wavlm", "test-wavlm", "train-wavvq", "test-wavvq",
              "checkpoint"):
        vr.add_argument(f"--{k}", help=f"override the {k} artifact path")
    vr.set_defaults(fn=cmd_verify_release)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
