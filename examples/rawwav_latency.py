"""Raw-audio -> gesture latency on the live backend (serve.RawWavServer).

The bench.py figures stage features on host first (the reference's own
assumption: its torch encoders run as a separate pass). This probe measures
the FUSED ingress at production scale: full-size WavLM-Large / vq-wav2vec
JAX encoders (random weights — no checkpoints ship in this environment, the
compute is identical), speaker-10-scale database (1024 windows), 24 s clip
(6 x 4 s int16 windows), full-size VQ-VAE decode. Reports e2e wall (through
the host link) and link-free device time (utils/devtime), plus XLA
cost-analysis FLOPs for the fused program.

    python examples/rawwav_latency.py [wavvq|wavlm|wavvq_split|wavlm_split]

The *_split variants measure RawWavServer(fused=False): encoder and
match+decode as two dispatches (the relay-robust deployment point — the
fused WavLM-Large program is the repo's largest XLA compile and the one
relay-attached chips drop mid-RPC).
"""
import json
import os
import sys
import time

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(_ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

from bench import _build_common, _build_encoder, _stage_mode  # noqa: E402
from qpgesture_tpu.core.config import VQVAEConfig  # noqa: E402
from qpgesture_tpu.models.vqvae import VQVAE  # noqa: E402
from qpgesture_tpu.serve import RawWavServer  # noqa: E402
from qpgesture_tpu.utils import devtime  # noqa: E402

J, W, N_SAMPLES = 1024, 6, 64000


def run(mode: str) -> dict:
    # mode syntax: wavvq|wavlm[_split][:precision] — the optional suffix
    # sets the WavLM encoder MXU precision (highest|high|default); e.g.
    # `wavlm_split:default` is the bf16-encoder serving preset.
    enc_precision = "highest"
    if ":" in mode:
        mode, enc_precision = mode.split(":", 1)
    split = mode.endswith("_split")
    base = mode[:-6] if split else mode
    rng = np.random.RandomState(0)
    bundle, codes, signature = _build_common(rng, J)
    cfg, db, engine, _, test_ctx_staged = _stage_mode(
        base, rng, J, W, bundle, codes, signature)

    vq_cfg = VQVAEConfig()
    model = VQVAE(vq_cfg)
    params, cb = model.init(jax.random.PRNGKey(0), sample_len=240)
    cb = model.init_codebook_from_batch(
        params, jnp.asarray(rng.randn(2, 240, 135).astype(np.float32)),
        jax.random.PRNGKey(1))

    enc_apply, enc_params = _build_encoder(base, N_SAMPLES,
                                           precision=enc_precision)
    server = RawWavServer(engine, model, params, cb, enc_apply, enc_params,
                          fused=not split)

    wav = (rng.randn(W, N_SAMPLES) * 3000).astype(np.int16)
    ctx = rng.randn(W, 30, 384).astype(np.float32)

    parity = None
    if PARITY and base != "wavvq" and enc_precision != "highest":
        # on-chip index-parity probe for the low-precision encoder: same
        # weights (deterministic init), same clips, encoder at `highest`
        # vs `enc_precision` — report selected-index agreement
        ref_apply, ref_params = _build_encoder(base, N_SAMPLES,
                                               precision="highest")
        ref_server = RawWavServer(engine, model, params, cb, ref_apply,
                                  ref_params, fused=not split)
        n_same = n_total = n_clips_same = 0
        for k in range(PARITY_CLIPS):
            prng = np.random.RandomState(100 + k)
            pw = (prng.randn(W, N_SAMPLES) * 3000).astype(np.int16)
            pc = prng.randn(W, 30, 384).astype(np.float32)
            got, _ = server.serve(pw, pc, init_code=7,
                                  rng=np.random.RandomState(cfg.seed))
            want, _ = ref_server.serve(pw, pc, init_code=7,
                                       rng=np.random.RandomState(cfg.seed))
            n_same += int((got == want).sum())
            n_total += got.size
            n_clips_same += int((got == want).all())
        parity = {"clips": PARITY_CLIPS,
                  "clips_identical": n_clips_same,
                  "index_agreement": round(n_same / n_total, 4)}

    t0 = time.perf_counter()
    codes_out, poses = server.serve(wav, ctx, init_code=7)
    compile_wall = time.perf_counter() - t0
    assert codes_out.shape == (W, 30) and poses.shape == (W * 240, 135)
    if WARM_ONLY:
        # deploy-time warmup of the raw-wav ingress programs (they close
        # over the encoder graph, so the generic `warmup` CLI can't warm
        # them): one serve() populated the persistent compile cache
        return {"mode": mode, "first_call_wall_s": round(compile_wall, 1),
                "warm_only": True}

    times = []
    for _ in range(7):
        t0 = time.perf_counter()
        server.serve(wav, ctx, init_code=7)
        times.append(time.perf_counter() - t0)
    p50 = float(np.percentile(times, 50))

    # device-only time + FLOPs (fused: one program; split: encoder and
    # match+decode measured separately and summed)
    S = server.n_steps
    Q = W * S
    ic = jnp.asarray(np.int32(7))
    ip = jnp.zeros((8, 16), jnp.float32)
    rm = jnp.zeros((Q,), bool)
    rc = jnp.zeros((Q,), jnp.int32)
    rp = jnp.zeros((Q, 8, 16), jnp.float32)
    wav_d = jnp.asarray(wav)
    ctx_d = jnp.asarray(ctx)
    extra = {}
    if split:
        from qpgesture_tpu.match.engine import _predict_impl

        def fn_enc(ep, w, c):
            return server._enc_impl(ep, w, c)

        enc_s, _ = devtime.device_seconds_per_iter(
            fn_enc, (enc_params, wav_d, ctx_d), k_small=1, k_large=3,
            reps=5)
        ta_d, tc_d = server._enc_impl(enc_params, wav_d, ctx_d)

        def fn_match(dev, devdb, ta, tc, ic, ip, rb, rm, rc, rp):
            return _predict_impl(cfg, S, dev, devdb, ta, tc, ic, ip,
                                 rb, rm, rc, rp)[0]

        margs = (engine.dev, engine.devdb, ta_d, tc_d, ic, ip, None,
                 rm, rc, rp)
        match_s, _ = devtime.device_seconds_per_iter(
            fn_match, margs, k_small=1, k_large=3, reps=5)

        blocks = fn_match(*margs)
        codes_d = server._extract_codes(blocks, clips=1)
        dargs = (params, cb, codes_d.reshape(1, -1))

        def fn_dec(*a):
            return server._decode_impl(*a)

        dec_s, _ = devtime.device_seconds_per_iter(
            fn_dec, dargs, k_small=1, k_large=3, reps=5)
        dev_s = enc_s + match_s + dec_s
        flops = ((devtime.cost_analysis_flops(server._enc_impl,
                                              enc_params, wav_d, ctx_d)
                  or 0)
                 + (devtime.cost_analysis_flops(_predict_impl, cfg, S,
                                                *margs[:4], ic, ip, None,
                                                rm, rc, rp) or 0)
                 + (devtime.cost_analysis_flops(server._decode_impl,
                                                *dargs) or 0)) or None
        extra = {"enc_ms": round(enc_s * 1e3, 2),
                 "match_ms": round(match_s * 1e3, 2),
                 "decode_ms": round(dec_s * 1e3, 2)}
    else:
        args = (engine.dev, engine.devdb, params, cb, enc_params, wav_d,
                ctx_d, ic, ip, None, rm, rc, rp)

        def fn(*a):
            return server._impl(*a)[0]

        dev_s, _ = devtime.device_seconds_per_iter(fn, args, k_small=1,
                                                   k_large=3, reps=5)
        flops = devtime.cost_analysis_flops(server._impl, *args)
    kind, peak = devtime.peak_flops_per_s()
    gest_s = W * 4.0
    out = {
        "mode": mode if enc_precision == "highest"
        else f"{mode}:{enc_precision}",
        "e2e_p50_ms": round(p50 * 1e3, 2),
        "device_ms": round(dev_s * 1e3, 2),
        **extra,
        "gest_s_per_s": round(gest_s / p50, 1),
        "gest_s_per_device_s": round(gest_s / dev_s, 1) if dev_s > 0
        else None,
        "first_call_wall_s": round(compile_wall, 1),
        "flops": flops,
    }
    if flops and dev_s > 0:
        out["tflops_effective"] = round(flops / dev_s / 1e12, 2)
        u = devtime.mfu(flops, dev_s, peak)
        if u is not None:
            out["mfu_bf16_peak"] = round(u, 4)
    if parity is not None:
        out["encoder_parity_vs_highest"] = parity
    return out


WARM_ONLY = False
PARITY = False
PARITY_CLIPS = 5

if __name__ == "__main__":
    argv = [a for a in sys.argv[1:]
            if a not in ("--warm-only", "--parity")]
    WARM_ONLY = "--warm-only" in sys.argv[1:]
    PARITY = "--parity" in sys.argv[1:]
    modes = argv or ["wavvq", "wavlm"]
    for m in modes:
        print(json.dumps(run(m)), flush=True)
