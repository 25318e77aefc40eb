"""vq-wav2vec port tests: output schema, converter key coverage for both
weight_proj depths, determinism."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qpgesture_tpu.models.vq_wav2vec import (VQWav2Vec, VQWav2VecConfig,
                                             convert_vq_wav2vec)


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
    # deterministic
    codes2 = m.apply(v, wav)
    np.testing.assert_array_equal(np.asarray(codes), np.asarray(codes2))


def _fake_fairseq_sd(rng, depth):
    sd = {}
    cfg = VQWav2VecConfig(weight_proj_depth=depth)
    in_d = 1
    for i, (dim, k, s) in enumerate(cfg.conv_layers):
        base = f"feature_extractor.conv_layers.{i}"
        sd[f"{base}.0.weight"] = rng.randn(dim, in_d, k).astype(np.float32)
        sd[f"{base}.2.weight"] = rng.rand(dim).astype(np.float32)
        sd[f"{base}.2.bias"] = rng.randn(dim).astype(np.float32)
        in_d = dim
    out = cfg.groups * cfg.num_vars
    if depth > 1:
        inner = cfg.weight_proj_factor * out
        sd["vector_quantizer.weight_proj.0.weight"] = \
            rng.randn(inner, 512).astype(np.float32)
        sd["vector_quantizer.weight_proj.0.bias"] = \
            rng.randn(inner).astype(np.float32)
        sd["vector_quantizer.weight_proj.2.weight"] = \
            rng.randn(out, inner).astype(np.float32)
        sd["vector_quantizer.weight_proj.2.bias"] = \
            rng.randn(out).astype(np.float32)
    else:
        sd["vector_quantizer.weight_proj.weight"] = \
            rng.randn(out, 512).astype(np.float32)
        sd["vector_quantizer.weight_proj.bias"] = \
            rng.randn(out).astype(np.float32)
    return sd


@pytest.mark.parametrize("depth", [1, 2])
def test_converter(rng, depth):
    sd = _fake_fairseq_sd(rng, depth)
    cfg, variables = convert_vq_wav2vec(sd)
    assert cfg.weight_proj_depth == depth
    m = VQWav2Vec(cfg)
    wav = jnp.asarray(rng.randn(1, 16000).astype(np.float32))
    codes = m.apply(variables, wav)
    assert codes.shape[0] == 1 and codes.shape[2] == 2
