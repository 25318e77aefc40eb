"""Audio featurization tests: MFCC vs the vendored Sphinx implementation
(imported from the read-only reference as a golden oracle), jnp batched vs
host oracle, and the GRU/resync model shapes."""
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qpgesture_tpu.ops.mfcc import (MFCCConfig, SphinxMFCCJax, mel_filterbank,
                                    s2dctmat, sphinx_mfcc_np)


def _reference_mfcc():
    """Import the reference's vendored Sphinx MFCC as a golden oracle
    (librosa stubbed out: the class itself never uses it)."""
    if "librosa" not in sys.modules:
        stub = types.ModuleType("librosa")
        # a None __spec__ makes importlib.util.find_spec("librosa") raise
        # ValueError, crashing transformers' availability probe in any test
        # that imports transformers AFTER this one (ordering flake)
        import importlib.machinery
        stub.__spec__ = importlib.machinery.ModuleSpec("librosa", loader=None)
        sys.modules["librosa"] = stub
    sys.path.insert(0, "/root/reference/codebook/Speech2GestureMatching")
    try:
        import mfcc as ref_mfcc
        return ref_mfcc
    except Exception:
        return None


@pytest.mark.parametrize("frate", [20, 60])
def test_mfcc_matches_reference(frate, rng):
    ref = _reference_mfcc()
    if ref is None:
        pytest.skip("reference mfcc not importable")
    sig = rng.randn(16000).astype(np.float64) * 0.1
    obj = ref.MFCC(frate=frate)
    want = obj.sig2s2mfc_energy(sig, None)[:, :-2]
    got = sphinx_mfcc_np(sig, MFCCConfig(frate=frate))
    np.testing.assert_allclose(got, want, atol=1e-8)


def test_mfcc_jax_matches_oracle(rng):
    sigs = (rng.randn(3, 16000) * 0.1).astype(np.float32)
    cfg = MFCCConfig(frate=60)
    jaxed = SphinxMFCCJax(cfg)(sigs)
    for b in range(3):
        ref = sphinx_mfcc_np(sigs[b].astype(np.float64), cfg)
        np.testing.assert_allclose(jaxed[b], ref, atol=2e-3)


def test_filterbank_properties():
    fb = mel_filterbank()
    assert fb.shape == (257, 40)
    assert (fb >= 0).all()
    dct = s2dctmat()
    assert dct.shape == (13, 40)
    # first column halved (the 'legacy' quirk); row 0 is otherwise all ones
    np.testing.assert_allclose(dct[0, 0], 0.5)
    np.testing.assert_allclose(dct[0, 1:], np.ones(39))


def test_gru_baseline_shapes(rng):
    from qpgesture_tpu.models.gru_baseline import GeneratorGRU
    model = GeneratorGRU(hidden=16, output=32)
    wav = jnp.asarray(rng.randn(2, 64000).astype(np.float32))
    targets = jnp.asarray(rng.randint(0, 32, size=(2, 30)))
    variables = model.init(jax.random.PRNGKey(0), wav, targets)
    logits, loss = model.apply(variables, wav, targets)
    assert logits.shape == (2, 30, 32)
    assert np.isfinite(float(loss))
    codes = model.sample(variables, wav)
    assert codes.shape == (2, 30)


def test_gru_cell_matches_torch(rng):
    torch = pytest.importorskip("torch")
    from qpgesture_tpu.models.gru_baseline import TorchGRUCell, _run_gru
    H, D, T = 8, 5, 7
    tgru = torch.nn.GRU(D, H, num_layers=1, batch_first=True)
    cell = TorchGRUCell(H)
    sd = tgru.state_dict()
    params = {"params": {
        "w_ih": np.asarray(sd["weight_ih_l0"]).T,
        "w_hh": np.asarray(sd["weight_hh_l0"]).T,
        "b_ih": np.asarray(sd["bias_ih_l0"]),
        "b_hh": np.asarray(sd["bias_hh_l0"]),
    }}
    x = rng.randn(2, T, D).astype(np.float32)
    h = jnp.zeros((2, H))
    outs = []
    hcur = h
    for t in range(T):
        hcur, _ = cell.apply(params, hcur, jnp.asarray(x[:, t]))
        outs.append(hcur)
    got = np.stack([np.asarray(o) for o in outs], axis=1)
    with torch.no_grad():
        want, _ = tgru(torch.from_numpy(x))
    np.testing.assert_allclose(got, want.numpy(), atol=1e-5)


def test_resync_shapes(rng):
    from qpgesture_tpu.models.resync import (Discriminator, ResyncNet,
                                             gradient_penalty)
    gen = ResyncNet(out_features=9)
    x = jnp.asarray(rng.randn(2, 64, 13 + 9).astype(np.float32))
    variables = gen.init(jax.random.PRNGKey(0), x)
    y = gen.apply(variables, x)
    assert y.shape == (2, 64, 9)
    disc = Discriminator(num_frames=64)
    dx = jnp.asarray(rng.randn(2, 64, 13 + 9).astype(np.float32))
    dvars = disc.init(jax.random.PRNGKey(1), dx)
    score = disc.apply(dvars, dx)
    assert score.shape == (2, 1)
    gp = gradient_penalty(disc.apply, dvars, dx, dx * 0.5,
                          jax.random.PRNGKey(2))
    assert np.isfinite(float(gp))


def test_generator_gru_conversion(rng):
    """Full GeneratorGRU checkpoint conversion vs a torch-built
    reference-topology model (generate.py:9-31,312-350)."""
    torch = pytest.importorskip("torch")
    import torch.nn as tnn
    from qpgesture_tpu.models.gru_baseline import GeneratorGRU
    from qpgesture_tpu.models.torch_convert import convert_generator_gru

    class TWavEncoder(tnn.Module):
        def __init__(self):
            super().__init__()
            self.feat_extractor = tnn.Sequential(
                tnn.Conv1d(1, 8, 16, stride=3), tnn.BatchNorm1d(8),
                tnn.LeakyReLU(0.3, inplace=True),
                tnn.Conv1d(8, 16, 16, stride=3), tnn.BatchNorm1d(16),
                tnn.LeakyReLU(0.3, inplace=True),
                tnn.Conv1d(16, 32, 16, stride=6), tnn.BatchNorm1d(32),
                tnn.LeakyReLU(0.3, inplace=True),
                tnn.Conv1d(32, 64, 16, stride=6), tnn.BatchNorm1d(64),
                tnn.LeakyReLU(0.3, inplace=True),
                tnn.Conv1d(64, 32, 16, stride=6))

        def forward(self, wav):
            return self.feat_extractor(wav.unsqueeze(1)).transpose(1, 2)

    class TGen(tnn.Module):
        def __init__(self):
            super().__init__()
            self.WavEncoder = TWavEncoder()
            self.project = tnn.GRU(32, 200, num_layers=2, dropout=0.1,
                                   bidirectional=True, batch_first=True)
            self.norm = tnn.LayerNorm(200)
            self.out = tnn.Linear(200, 512)

        def forward(self, x):
            f = self.WavEncoder(x)
            o, _ = self.project(f)
            o = o[:, :, :200] + o[:, :, 200:]
            return self.out(self.norm(o))

    torch.manual_seed(5)
    tmodel = TGen().eval()
    variables = convert_generator_gru(tmodel.state_dict())
    model = GeneratorGRU(hidden=200, output=512)
    wav = rng.randn(2, 64000).astype(np.float32) * 0.1
    with torch.no_grad():
        want = tmodel(torch.from_numpy(wav)).numpy()
    got, _ = model.apply(variables, jnp.asarray(wav), train=False)
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-3)
    corr = np.corrcoef(np.asarray(got).ravel(), want.ravel())[0, 1]
    assert corr > 0.9999


# ----------------------------------------------------------------------
# WORLD DIO + StoneMask transcription (pipelines/pitch_world.py)
# ----------------------------------------------------------------------

def _voiced_signal(rng, f0_hz=150.0, vibrato=5.0, secs=2.0, sr=16000):
    t = np.arange(int(sr * secs)) / sr
    f0_true = f0_hz + vibrato * np.sin(2 * np.pi * 2 * t)
    phase = 2 * np.pi * np.cumsum(f0_true) / sr
    sig = sum((1.0 / k) * np.sin(k * phase) for k in range(1, 6))
    sig = sig + 0.01 * rng.randn(len(sig))
    return sig.astype(np.float64), t, f0_true


@pytest.mark.parametrize("f0_hz", [110.0, 150.0, 220.0, 330.0])
def test_world_dio_tracks_f0(rng, f0_hz):
    from qpgesture_tpu.pipelines.pitch_world import dio, stonemask
    sig, t, f0_true = _voiced_signal(rng, f0_hz=f0_hz)
    f0, pos = dio(sig, 16000, frame_period=16.0)
    refined = stonemask(sig, f0, pos, 16000)
    mid = f0 > 0
    mid[:8] = False
    mid[-8:] = False
    assert mid.mean() > 0.8, "voiced signal mostly detected as voiced"
    want = np.interp(pos[mid], t, f0_true)
    assert np.abs(f0[mid] - want).mean() < 2.0
    # stonemask must not degrade the dio estimate
    assert np.abs(refined[mid] - want).mean() <= \
        np.abs(f0[mid] - want).mean() + 0.05


def test_world_dio_unvoiced_is_zero(rng):
    from qpgesture_tpu.pipelines.pitch_world import dio
    noise = rng.randn(16000)
    f0, _ = dio(noise, 16000, frame_period=16.0)
    assert (f0 > 0).mean() < 0.1
    silence = np.zeros(16000)
    f0s, _ = dio(silence, 16000, frame_period=16.0)
    assert (f0s == 0).all()


def test_world_pitch_reference_contract(rng):
    """get_pitch_world follows speech_feat.get_pitch's output contract:
    per-hop frames, log'd (unvoiced -> log(eps)), norm off by default in
    the DB builder (make_beat_dataset.py:170)."""
    from qpgesture_tpu.pipelines.pitch_world import get_pitch_world
    sig, _, _ = _voiced_signal(rng, secs=1.0)
    p = get_pitch_world(sig, sr=16000, hop=256, log=True, norm=False)
    n_expected = int(1000.0 * len(sig) / 16000 / 16.0) + 1
    assert p.shape == (n_expected,)
    assert np.isfinite(p).all()
    # voiced log-f0 around log(150) ~ 5.01
    assert np.median(p[8:-8]) == pytest.approx(np.log(150.0), abs=0.15)


def test_generator_linear_conversion(rng):
    """GeneratorLinear vs a torch-built Generator_linear
    (generate.py:34-60): LayerNorm BEFORE the bias-free projection."""
    torch = pytest.importorskip("torch")
    import torch.nn as tnn
    from qpgesture_tpu.models.gru_baseline import GeneratorLinear
    from qpgesture_tpu.models.torch_convert import convert_generator_linear

    class TWavEncoder(tnn.Module):
        def __init__(self):
            super().__init__()
            self.feat_extractor = tnn.Sequential(
                tnn.Conv1d(1, 8, 16, stride=3), tnn.BatchNorm1d(8),
                tnn.LeakyReLU(0.3, inplace=True),
                tnn.Conv1d(8, 16, 16, stride=3), tnn.BatchNorm1d(16),
                tnn.LeakyReLU(0.3, inplace=True),
                tnn.Conv1d(16, 32, 16, stride=6), tnn.BatchNorm1d(32),
                tnn.LeakyReLU(0.3, inplace=True),
                tnn.Conv1d(32, 64, 16, stride=6), tnn.BatchNorm1d(64),
                tnn.LeakyReLU(0.3, inplace=True),
                tnn.Conv1d(64, 32, 16, stride=6))

        def forward(self, wav):
            return self.feat_extractor(wav.unsqueeze(1)).transpose(1, 2)

    class TGenLinear(tnn.Module):
        def __init__(self):
            super().__init__()
            self.WavEncoder = TWavEncoder()
            self.project = tnn.Linear(32, 512, bias=False)
            self.norm = tnn.LayerNorm(32)

        def forward(self, x):
            f = self.norm(self.WavEncoder(x))
            return self.project(f)

    torch.manual_seed(9)
    tmodel = TGenLinear().eval()
    variables = convert_generator_linear(tmodel.state_dict())
    model = GeneratorLinear(output=512)
    wav = rng.randn(2, 64000).astype(np.float32) * 0.1
    with torch.no_grad():
        want = tmodel(torch.from_numpy(wav)).numpy()
    got, _ = model.apply(variables, jnp.asarray(wav), train=False)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-3)
    # CE loss + argmax sample paths run
    targets = rng.randint(0, 512, size=(2, 30))
    _, loss = model.apply(variables, jnp.asarray(wav),
                          jnp.asarray(targets), train=False)
    assert np.isfinite(float(loss))
    codes = model.sample(variables, jnp.asarray(wav))
    want_codes = want.argmax(-1)
    np.testing.assert_array_equal(np.asarray(codes), want_codes)
