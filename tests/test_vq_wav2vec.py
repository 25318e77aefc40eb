"""vq-wav2vec port: output equivalence vs a plain-torch oracle.

fairseq is not installed in this image and the public vq-wav2vec.pt is not
vendored, so (same recipe that worked for WavLM) the oracle below is a
transcription of the *published* fairseq inference graph used by the
reference (`model.feature_extractor` + `model.vector_quantizer.forward_idx`,
/root/reference/process/make_test_data.py:43-64,
make_beat_dataset.py:388-429):

  * ConvFeatureExtractionModel (fairseq/models/wav2vec/wav2vec.py): per layer
    Sequential(Conv1d(bias=False), Dropout, Fp32GroupNorm(1, dim, affine),
    activation), optional decimated skip connections, log compression
    log(1 + |x|);
  * GumbelVectorQuantizer (fairseq/modules/gumbel_vector_quantizer.py):
    weight_proj = Linear(dim, groups*num_vars) at depth 1, or a nested
    Sequential of (depth-1) Sequential(Linear(dim->dim*factor), act) blocks
    plus a final Linear at depth > 1; inference codes = per-group argmax.

Random weights are loaded into the oracle with load_state_dict(strict=True),
which pins the state-dict key layout the converter must accept; the JAX port
must then match layer-by-layer and end-to-end — (398, 2) codes on a
64000-sample window, the wavvq_240.npz contract.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qpgesture_tpu.models.vq_wav2vec import (VQWav2Vec, VQWav2VecConfig,
                                             convert_vq_wav2vec)

torch = pytest.importorskip("torch")
nn = torch.nn


# ----------------------------------------------------------------------
# torch oracle: published fairseq vq-wav2vec inference graph
# ----------------------------------------------------------------------

def _torch_act(name):
    return nn.GELU() if name == "gelu" else nn.ReLU()


class _ConvFeatureExtractionModel(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg

        def block(n_in, n_out, k, stride):
            return nn.Sequential(
                nn.Conv1d(n_in, n_out, k, stride=stride, bias=False),
                nn.Dropout(p=0.0),
                nn.GroupNorm(1, n_out, affine=True),
                _torch_act(cfg.activation),
            )

        in_d = 1
        self.conv_layers = nn.ModuleList()
        for dim, k, stride in cfg.conv_layers:
            self.conv_layers.append(block(in_d, dim, k, stride))
            in_d = dim

    def forward(self, x, collect=None):
        # (B, T) -> (B, C, T'), exactly fairseq's forward
        x = x.unsqueeze(1)
        for conv in self.conv_layers:
            residual = x
            x = conv(x)
            if self.cfg.skip_connections and x.size(1) == residual.size(1):
                tsz, r_tsz = x.size(2), residual.size(2)
                residual = residual[..., :: r_tsz // tsz][..., :tsz]
                x = (x + residual) * self.cfg.residual_scale
            if collect is not None:
                collect.append(x)
        if self.cfg.log_compression:
            x = (x.abs() + 1).log()
        return x


class _GumbelVectorQuantizer(nn.Module):
    def __init__(self, cfg, dim=None):
        super().__init__()
        self.cfg = cfg
        dim = dim or cfg.conv_layers[-1][0]
        out = cfg.groups * cfg.num_vars
        if cfg.weight_proj_depth > 1:
            def block(i, o):
                return nn.Sequential(nn.Linear(i, o),
                                     _torch_act(cfg.activation))
            inner = dim * cfg.weight_proj_factor
            self.weight_proj = nn.Sequential(
                *[block(dim if i == 0 else inner, inner)
                  for i in range(cfg.weight_proj_depth - 1)],
                nn.Linear(inner, out))
        else:
            self.weight_proj = nn.Linear(dim, out)

    def forward_idx(self, x):
        # time_first=False in vq-wav2vec: x is (B, C, T)
        x = x.transpose(1, 2)
        bsz, tsz, fsz = x.shape
        logits = self.weight_proj(x.reshape(-1, fsz))
        flat = logits.view(bsz * tsz * self.cfg.groups, -1)
        targets = flat.argmax(dim=-1).view(bsz, tsz, self.cfg.groups)
        return logits.view(bsz, tsz, -1), targets


class _VQWav2VecOracle(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.feature_extractor = _ConvFeatureExtractionModel(cfg)
        self.vector_quantizer = _GumbelVectorQuantizer(cfg)


def _random_state_dict(oracle, rng):
    """Random weights in the oracle's own (fairseq) key layout."""
    sd = {}
    for k, v in oracle.state_dict().items():
        sd[k] = torch.from_numpy(
            (rng.randn(*v.shape) * 0.2).astype(np.float32))
    return sd


def _fake_fairseq_sd(rng, depth=1):
    """Random weights in fairseq key layout as numpy (for on-disk checkpoint
    fixtures, e.g. tests/test_generate_cli.py)."""
    oracle = _VQWav2VecOracle(VQWav2VecConfig(weight_proj_depth=depth))
    return {k: v.numpy() for k, v in _random_state_dict(oracle, rng).items()}


# ----------------------------------------------------------------------
# equivalence tests
# ----------------------------------------------------------------------

def _run_pair(cfg, wav, rng):
    oracle = _VQWav2VecOracle(cfg).eval()
    sd = _random_state_dict(oracle, rng)
    oracle.load_state_dict(sd, strict=True)  # pins the key layout

    got_cfg, variables = convert_vq_wav2vec(sd)
    assert got_cfg.weight_proj_depth == cfg.weight_proj_depth
    model = VQWav2Vec(cfg)

    twav = torch.from_numpy(wav)
    collect = []
    with torch.no_grad():
        z = oracle.feature_extractor(twav, collect=collect)
        want_logits, want_codes = oracle.vector_quantizer.forward_idx(z)

    codes, state = model.apply(variables, jnp.asarray(wav),
                               mutable=["intermediates"])
    inter = state["intermediates"]
    return (z, collect, want_logits, want_codes.numpy(),
            np.asarray(codes), inter)


def test_full_size_end_to_end_64000(rng):
    """The wavvq_240.npz contract at full checkpoint geometry: 4 s of 16 kHz
    audio -> (398, 2) codes, depth-2 weight_proj (the published vq-wav2vec
    Gumbel checkpoint's --vq-depth 2 --vq-vars 320 --vq-groups 2
    --activation gelu)."""
    cfg = VQWav2VecConfig(weight_proj_depth=2)
    wav = (rng.randn(1, 64000) * 0.5).astype(np.float32)
    z, collect, want_logits, want_codes, got_codes, inter = _run_pair(
        cfg, wav, rng)

    assert got_codes.shape == (1, 398, 2)
    assert want_codes.shape == (1, 398, 2)

    # layer-by-layer: each conv block output (torch NCT -> NTC)
    fe = inter["feature_extractor"]
    for i, t_out in enumerate(collect):
        j_out = np.asarray(fe[f"conv{i}"][0])
        np.testing.assert_allclose(
            j_out, t_out.numpy().transpose(0, 2, 1), atol=2e-4,
            err_msg=f"conv block {i}")

    # logits and end-to-end codes
    j_logits = np.asarray(inter["vector_quantizer"]["logits"][0])
    np.testing.assert_allclose(
        j_logits.reshape(want_logits.shape), want_logits.numpy(), atol=2e-3)
    np.testing.assert_array_equal(got_codes, want_codes)
    assert got_codes.min() >= 0 and got_codes.max() < cfg.num_vars


@pytest.mark.parametrize("depth", [1, 3])
def test_depth_variants(rng, depth):
    cfg = VQWav2VecConfig(weight_proj_depth=depth)
    wav = (rng.randn(2, 16000) * 0.5).astype(np.float32)
    *_, want_codes, got_codes, _ = _run_pair(cfg, wav, rng)
    np.testing.assert_array_equal(got_codes, want_codes)


def test_skip_connections_variant(rng):
    cfg = VQWav2VecConfig(skip_connections=True, activation="relu")
    wav = (rng.randn(1, 16000) * 0.5).astype(np.float32)
    *_, want_codes, got_codes, _ = _run_pair(cfg, wav, rng)
    np.testing.assert_array_equal(got_codes, want_codes)


def test_flat_weight_proj_layout(rng):
    """Converter also accepts a flat Sequential(Linear, act, Linear) layout
    (weight_proj.0 / weight_proj.2) seen in some forks."""
    cfg = VQWav2VecConfig(weight_proj_depth=2)
    inner = 512 * cfg.weight_proj_factor
    out = cfg.groups * cfg.num_vars
    sd = {}
    in_d = 1
    for i, (dim, k, s) in enumerate(cfg.conv_layers):
        base = f"feature_extractor.conv_layers.{i}"
        sd[base + ".0.weight"] = torch.from_numpy(
            (rng.randn(dim, in_d, k) * 0.2).astype(np.float32))
        sd[base + ".2.weight"] = torch.from_numpy(
            rng.rand(dim).astype(np.float32))
        sd[base + ".2.bias"] = torch.from_numpy(
            rng.randn(dim).astype(np.float32))
        in_d = dim
    sd["vector_quantizer.weight_proj.0.weight"] = torch.from_numpy(
        (rng.randn(inner, 512) * 0.1).astype(np.float32))
    sd["vector_quantizer.weight_proj.0.bias"] = torch.from_numpy(
        rng.randn(inner).astype(np.float32))
    sd["vector_quantizer.weight_proj.2.weight"] = torch.from_numpy(
        (rng.randn(out, inner) * 0.1).astype(np.float32))
    sd["vector_quantizer.weight_proj.2.bias"] = torch.from_numpy(
        rng.randn(out).astype(np.float32))

    got_cfg, variables = convert_vq_wav2vec(sd)
    assert got_cfg.weight_proj_depth == 2
    m = VQWav2Vec(VQWav2VecConfig(weight_proj_depth=2))
    wav = jnp.asarray(rng.randn(1, 16000).astype(np.float32))
    codes = m.apply(variables, wav)
    assert codes.shape[0] == 1 and codes.shape[2] == 2


def test_output_schema(rng):
    cfg = VQWav2VecConfig()
    m = VQWav2Vec(cfg)
    wav = jnp.asarray(rng.randn(2, 64000).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), wav)
    codes = m.apply(v, wav)
    # the wavvq_240.npz contract: (B, 398, 2) codes in [0, 320)
    assert codes.shape == (2, 398, 2)
    assert codes.dtype == jnp.int32
    assert int(codes.min()) >= 0 and int(codes.max()) < 320
    codes2 = m.apply(v, wav)
    np.testing.assert_array_equal(np.asarray(codes), np.asarray(codes2))
