"""Control masks, analytics, visualization, profiling, pallas kernel."""
import numpy as np
import pytest

import jax.numpy as jnp

from qpgesture_tpu.core import constants as C
from qpgesture_tpu.match.control import create_control_filter
from qpgesture_tpu.ops.levenshtein import levenshtein_matrix_np
from qpgesture_tpu.ops.pallas_kernels import levenshtein_matrix_pallas
from qpgesture_tpu.render.analytics import (code_frequency,
                                            code_word_association,
                                            signature_pca)
from qpgesture_tpu.utils.profiling import Profiler, block_and_time


def test_control_filter_default(rng):
    feat = rng.randn(4, C.NUM_AUDIO_FEAT + C.NUM_BODY_FEAT, 64)
    mask = create_control_filter(feat, None)
    assert mask.shape == (4, 64) and mask.all()


def test_control_filter_hand_high(rng):
    feat = rng.randn(4, C.NUM_AUDIO_FEAT + C.NUM_BODY_FEAT, 64)
    mask = create_control_filter(feat, "hand_high")
    frac = mask.mean()
    assert 0.10 < frac < 0.20  # ~15% above the 0.85 quantile


def test_pallas_levenshtein_matches_oracle(rng):
    a = rng.randint(0, 5000, size=(4, 11)).astype(np.int32)
    b = rng.randint(0, 5000, size=(200, 11)).astype(np.int32)
    b[7] = a[2]
    got = np.asarray(levenshtein_matrix_pallas(jnp.asarray(a),
                                               jnp.asarray(b)))
    np.testing.assert_array_equal(got, levenshtein_matrix_np(a, b))


def test_signature_pca(rng):
    sig = rng.randn(64, 135)
    proj = signature_pca(sig)
    assert proj.shape == (64, 2)
    # first component captures more variance than second
    assert proj[:, 0].var() >= proj[:, 1].var()


def test_code_frequency():
    codes = np.array([[1, 1, 2], [3, 1, 2]])
    freq = code_frequency(codes)
    assert freq[0] == (1, 3)


def test_code_word_association():
    codes = np.array([[5, 7], [5, 9]])
    words = [["hello world", "foo"], ["hello", "bar"]]
    assoc = code_word_association(codes, words, min_count=2)
    assert ("hello", 2) in assoc[5]


def test_profiler():
    prof = Profiler()
    with prof.phase("a"):
        with prof.phase("b"):
            pass
    rep = prof.report()
    assert "a" in rep and "a/b" in rep
    assert rep["a"]["count"] == 1


def test_block_and_time():
    import jax
    fn = jax.jit(lambda x: x * 2)
    out, secs = block_and_time(fn, jnp.ones(8), n=2)
    assert secs >= 0 and np.all(np.asarray(out) == 2)


def test_plot_cli_and_library(tmp_path, rng):
    """Offline plotting (closes the reference's live-window gap,
    Library/Utility.py:21-75 + Plotting.py): scalar curves from a JSONL
    history and a phase-manifold PCA PNG."""
    from qpgesture_tpu.cli import main as cli_main
    from qpgesture_tpu.utils.metrics_log import ScalarHistory

    hist = str(tmp_path / "scalars.jsonl")
    h = ScalarHistory(hist)
    for e in range(1, 6):
        h.log(epoch=e, loss=1.0 / e, fit=2.0 / e, val_err=0.5 / e)
    h.close()
    phase = str(tmp_path / "phase.npz")
    np.savez(phase, phase=rng.rand(2, 100, 4, 8).astype(np.float32))

    out = str(tmp_path / "plots")
    cli_main(["plot", "--history", hist, "--phase", phase, "--out", out])
    import os
    assert os.path.getsize(os.path.join(out, "scalars.png")) > 1000
    assert os.path.getsize(os.path.join(out, "phase_manifold.png")) > 1000

    # --phase-debug + --wav: the visualize_phase.py debug views
    # (VERDICT r4 #7) — per-channel Phase2D_mono grids (single window +
    # 3-window overlay) and the time/frequency-domain wav panels
    wav = str(tmp_path / "in.npz")
    np.savez(wav, wav=(0.2 * rng.randn(16000 * 2)).astype(np.float32))
    out2 = str(tmp_path / "plots2")
    cli_main(["plot", "--phase", phase, "--phase-debug", "--wav", wav,
              "--out", out2])
    for name in ("visualize_phase.png", "visualize_phase_3.png",
                 "wav_debug.png", "phase_manifold.png"):
        assert os.path.getsize(os.path.join(out2, name)) > 1000, name

    # --merge-figs: numbered image sequence -> video (merge_figs.py:5-15),
    # with missing indices skipped rather than crashing
    figs = tmp_path / "figs"
    figs.mkdir()
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    for i in (0, 1, 3):
        fig, ax = plt.subplots(figsize=(1.6, 1.2))
        ax.plot([0, 1], [i, 1 - i])
        fig.savefig(figs / f"{i}.png")
        plt.close(fig)
    out3 = str(tmp_path / "plots3")
    cli_main(["plot", "--merge-figs", str(figs) + "/{}.png",
              "--count", "4", "--fps", "5", "--out", out3])
    vids = [f for f in os.listdir(out3) if f.startswith("merged_figs")]
    assert vids and os.path.getsize(os.path.join(out3, vids[0])) > 500


def test_train_vqvae_resume(tmp_path, rng):
    """Failure recovery: a crashed run resumes from the rolling 'latest'
    checkpoint with the full state (params+opt+EMA codebook+step) and the
    correct epoch counter — the reference saves an epoch counter but never
    restores it (train.py:114-117)."""
    import jax
    from qpgesture_tpu.core.config import TrainConfig, VQVAEConfig
    from qpgesture_tpu.parallel.mesh import make_mesh
    from qpgesture_tpu.train.checkpoints import restore_checkpoint
    from qpgesture_tpu.train.train_vqvae import VQVAETrainer

    small = VQVAEConfig(width=16, depth=1, emb_width=16, l_bins=16,
                        input_dim=9, sample_length=4)
    tcfg = TrainConfig(batch_size=16, lr=1e-3, milestones=(1000,))
    trainer = VQVAETrainer(small, tcfg, mesh=make_mesh(8))
    x = rng.randn(32, 32, 9).astype(np.float32)
    batches = [x[:16], x[16:]]

    def fresh_state():
        # the train step donates its input state, so each run needs its own
        # (deterministically identical) copy
        s = trainer.init_state(jax.random.PRNGKey(0), sample_len=32)
        return trainer.init_codebook(s, x[:16], jax.random.PRNGKey(1))

    ckpt = str(tmp_path / "ckpt")

    # uninterrupted 4-epoch run
    full, _ = trainer.fit(fresh_state(), batches, epochs=4,
                          rng=jax.random.PRNGKey(3), checkpoint_dir=None)

    # "crash" after 2 epochs, then resume from latest for epochs 3-4
    trainer.fit(fresh_state(), batches, epochs=2,
                rng=jax.random.PRNGKey(3), checkpoint_dir=ckpt)
    restored = restore_checkpoint(ckpt, fresh_state(), name="latest")
    assert int(restored.step) == 4  # 2 epochs x 2 batches
    # NOTE: fit() re-splits its rng per step from the given key, so to get
    # bit-equality we must hand the resumed run the same per-step keys the
    # full run would use; replicate fit's split sequence for 2 epochs
    key = jax.random.PRNGKey(3)
    for _ in range(4):
        key, _ = jax.random.split(key)
    resumed, _ = trainer.fit(restored, batches, epochs=4, rng=key,
                             checkpoint_dir=None, start_epoch=3)
    for a, b in zip(jax.tree_util.tree_leaves(full.params),
                    jax.tree_util.tree_leaves(resumed.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    assert int(resumed.step) == int(full.step) == 8


def test_bench_regression_guard(tmp_path):
    """bench.py --check snapshot parsing + regression detection: accepts
    raw bench JSON, driver wrappers, and the driver's CLIPPED-head tails
    (BENCH_r{N}.json records only the last bytes of stdout)."""
    import json
    import sys
    sys.path.insert(0, "/root/repo")
    from bench import check_regressions, load_snapshot

    inner = {"metric": "m", "wavvq": {"device": {"device_ms": 3.0,
                                                 "tables_ms": 1.0}},
             "train_vqvae": {"device_ms_per_step": 100.0}}
    raw = tmp_path / "raw.json"
    raw.write_text(json.dumps(inner))
    assert load_snapshot(str(raw))["wavvq"]["device"]["device_ms"] == 3.0

    wrapped = tmp_path / "wrap.json"
    wrapped.write_text(json.dumps({"rc": 0,
                                   "tail": "noise\n" + json.dumps(inner)}))
    assert load_snapshot(str(wrapped))["train_vqvae"][
        "device_ms_per_step"] == 100.0

    # clipped head (driver tail truncation): line starts mid-key
    clipped = tmp_path / "clip.json"
    full = json.dumps(inner)
    clipped.write_text(json.dumps({"rc": 0, "tail": full[12:]}))
    snap = load_snapshot(str(clipped))
    assert snap["wavvq"]["device"]["device_ms"] == 3.0

    # the shipped round-3 snapshot parses
    snap3 = load_snapshot("/root/repo/BENCH_r03.json")
    assert snap3["wavvq"]["device"]["device_ms"] > 0

    ok = {"wavvq": {"device": {"device_ms": 3.1, "tables_ms": 1.1}},
          "train_vqvae": {"device_ms_per_step": 105.0}}
    assert check_regressions(ok, inner) == []
    slow = {"wavvq": {"device": {"device_ms": 4.0, "tables_ms": 1.0}},
            "train_vqvae": {"device_ms_per_step": 100.0}}
    bad = check_regressions(slow, inner)
    assert len(bad) == 1 and "wavvq.device.device_ms" in bad[0]


def test_bench_incremental_emission(tmp_path, capsys, monkeypatch):
    """The round-5 timeout fix: every _emit prints ONE compact JSON line
    (under the driver's ~2.5 kB stdout-tail buffer, carrying the
    regression-check key paths) and mirrors the full detail to
    bench_full.json; _find_check_snapshot picks the newest PARSEABLE
    driver snapshot, skipping rc=124 husks like BENCH_r04."""
    import json
    import sys
    sys.path.insert(0, "/root/repo")
    import bench
    from bench import (_REGRESSION_KEYS, _dig, _find_check_snapshot,
                       check_regressions, load_snapshot)

    # realistic full-detail payload: the shipped round-3 driver capture
    full = load_snapshot("/root/repo/BENCH_r03.json")
    full.update(metric="gesture_seconds_matched_per_wall_second",
                value=408.271, unit="gesture-s/s", vs_baseline=5103.4,
                pending=["rawwav:wavvq"], skipped=[])
    monkeypatch.setattr(bench, "_FULL_PATH", str(tmp_path / "full.json"))
    compact = bench._emit(full)

    line = capsys.readouterr().out.strip().splitlines()[-1]
    assert len(line) < 2200, f"compact line too long: {len(line)}B"
    parsed = json.loads(line)
    assert parsed == compact
    assert parsed["metric"] == "gesture_seconds_matched_per_wall_second"
    assert parsed["pending"] == ["rawwav:wavvq"]
    # every regression key the guard digs for survives compaction when
    # present in the full dict (rawwav modes not in full are fine)
    for name, path in _REGRESSION_KEYS:
        if _dig(full, path) is not None:
            assert _dig(compact, path) == _dig(full, path), name
    # the compact snapshot is itself checkable
    assert check_regressions(compact, compact) == []
    # and the full detail landed on disk, unabridged
    disk = json.loads((tmp_path / "full.json").read_text())
    assert disk["wavlm"]["device"]["tables_ms_high"] == \
        full["wavlm"]["device"]["tables_ms_high"]

    # snapshot discovery: r9 is an rc=124 husk (no JSON in tail), r8 parses
    (tmp_path / "BENCH_r08.json").write_text(json.dumps(
        {"rc": 0, "tail": json.dumps({"metric": "m", "value": 1})}))
    (tmp_path / "BENCH_r09.json").write_text(json.dumps(
        {"rc": 124, "tail": "benchmarking wavvq...\n"}))
    assert _find_check_snapshot(str(tmp_path)).endswith("BENCH_r08.json")
    monkeypatch.setenv("QPG_BENCH_CHECK", "none")
    assert _find_check_snapshot(str(tmp_path)) is None
