"""Database-scale study: device matching time vs database size J.

The reference's published speaker databases are a few hundred 4 s windows
each (speaker-1 fixture: 140/109/106 windows, dataset/orig_BEAT readme;
GestureKNN.sh matches against ONE speaker at a time). bench.py's J=1024
already overshoots that. This probe measures how the single-chip engine
scales when the database grows to whole-corpus size — J=16384 approximates
all 30 BEAT speakers staged as ONE database — in both shipped audio modes:

  * per-J link-free device time split into candidate tables vs fusion scan
    (utils/devtime in-dispatch differencing);
  * staged-database HBM footprint (sum of device-array bytes);
  * gesture-seconds matched per device-second at each scale.

Expected shape: the tables phase (Levenshtein DP / cosine matmul) is
O(Q*J), the fusion scan's per-step candidate merge is O(J) with a fixed
top-k selection, so both grow ~linearly in J while the chip stays busier —
gest-s/device-s should fall sub-linearly until the tables saturate the MXU
(wavlm) / VPU (wavvq). Beyond one chip, parallel/sharded_match splits J
across mesh devices bit-exactly (tests/test_sharded_match.py), so these
per-chip numbers are also the per-shard numbers at J_total = J * n_dev.

    python examples/scale_study.py [J ...]   (default: 1024 4096 16384)
"""
import json
import os
import sys

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(_ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

from bench import _build_common, _match_flops, _stage_mode  # noqa: E402
from qpgesture_tpu.utils import devtime  # noqa: E402

W = 6  # 24 s clip


def _hbm_bytes(tree) -> int:
    return sum(x.nbytes for x in jax.tree_util.tree_leaves(tree)
               if hasattr(x, "nbytes"))


def run(mode: str, J: int, peak: float,
        feat_dtype: str = "float32") -> dict:
    from qpgesture_tpu.match.engine import _predict_impl, _tables_impl

    rng = np.random.RandomState(0)
    bundle, codes, signature = _build_common(rng, J)
    cfg, db, engine, test_audio, test_ctx = _stage_mode(
        mode, rng, J, W, bundle, codes, signature, feat_dtype=feat_dtype)
    S = test_audio.shape[1]
    ta = jnp.asarray(test_audio)
    tc = jnp.asarray(test_ctx)
    ic = jnp.asarray(np.int32(7))
    ip = jnp.zeros((8, 16), jnp.float32)

    def fn_predict(dev, devdb, ta, tc, ic, ip):
        blocks, _, _ = _predict_impl(cfg, S, dev, devdb, ta, tc, ic, ip,
                                     None)
        return blocks

    def fn_tables(devdb, ta, tc):
        t = _tables_impl(cfg, devdb, ta, tc)
        return (t.aud_rank, t.txt_rank)

    pred_s, compile_s = devtime.device_seconds_per_iter(
        fn_predict, (engine.dev, engine.devdb, ta, tc, ic, ip),
        k_small=2, k_large=8, reps=5)
    tab_s, _ = devtime.device_seconds_per_iter(
        fn_tables, (engine.devdb, ta, tc), k_small=2, k_large=8, reps=5)

    flops, cells = _match_flops(cfg, db, W, S)
    gest_s = W * 4.0
    out = {
        "mode": mode, "J": J, "feat_dtype": feat_dtype,
        "device_ms": round(pred_s * 1e3, 3),
        "tables_ms": round(tab_s * 1e3, 3),
        "fuse_scan_ms": round(max(pred_s - tab_s, 0.0) * 1e3, 3),
        "gest_s_per_device_s": round(gest_s / pred_s, 1)
        if pred_s > 0 else None,
        "db_hbm_mb": round(_hbm_bytes(engine.devdb) / 2**20, 1),
        "compile_s": round(compile_s, 2),
    }
    if cells and tab_s > 0:
        out["lev_gcells_per_s"] = round(cells / tab_s / 1e9, 2)
    if flops and tab_s > 0:
        out["tflops_effective"] = round(flops / tab_s / 1e12, 3)
        u = devtime.mfu(flops, tab_s, peak)
        if u is not None:
            out["mfu_bf16_peak"] = round(u, 4)
    return out


if __name__ == "__main__":
    fdt = "float32"
    modes = ("wavvq", "wavlm")
    args = []
    for a in sys.argv[1:]:
        if a.startswith("--feat-dtype="):
            fdt = a.split("=", 1)[1]
        elif a.startswith("--modes="):
            modes = tuple(a.split("=", 1)[1].split(","))
        else:
            args.append(a)
    sizes = [int(a) for a in args] or [1024, 4096, 16384]
    _, peak = devtime.peak_flops_per_s()
    for mode in modes:
        for J in sizes:
            try:
                print(json.dumps(run(mode, J, peak, feat_dtype=fdt)),
                      flush=True)
            except Exception as e:  # e.g. HBM OOM at the largest wavlm J
                msg = str(e).splitlines()[0][:200] if str(e) else repr(e)
                print(json.dumps({"mode": mode, "J": J,
                                  "feat_dtype": fdt, "error": msg}),
                      flush=True)
