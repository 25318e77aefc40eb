"""WavLM JAX port vs the reference's vendored torch implementation (imported
read-only as the golden oracle, random weights, reduced size)."""
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from qpgesture_tpu.models.wavlm import (WavLMJax, WavLMJaxConfig,
                                        convert_wavlm,
                                        relative_position_bucket)

torch = pytest.importorskip("torch")


def _load_reference():
    sys.path.insert(0, "/root/reference/process/WavLM")
    try:
        import WavLM as ref
        return ref
    except Exception:
        return None


SMALL_KW = dict(encoder_layers=2, encoder_embed_dim=64,
                encoder_ffn_embed_dim=128, encoder_attention_heads=4,
                num_buckets=32, max_distance=80)


def _small_cfg(**over):
    return WavLMJaxConfig(
        conv_feature_layers=((32, 10, 5), (32, 3, 2), (32, 3, 2)),
        **{**SMALL_KW, **over})


def _ref_model(ref, jcfg):
    layers = "[(32,10,5)] + [(32,3,2)] * 2"
    cfg = ref.WavLMConfig({
        "encoder_layers": jcfg.encoder_layers,
        "encoder_embed_dim": jcfg.encoder_embed_dim,
        "encoder_ffn_embed_dim": jcfg.encoder_ffn_embed_dim,
        "encoder_attention_heads": jcfg.encoder_attention_heads,
        "extractor_mode": jcfg.extractor_mode,
        "conv_bias": jcfg.conv_bias,
        "layer_norm_first": jcfg.layer_norm_first,
        "normalize": jcfg.normalize,
        "relative_position_embedding": jcfg.relative_position_embedding,
        "num_buckets": jcfg.num_buckets,
        "max_distance": jcfg.max_distance,
        "gru_rel_pos": jcfg.gru_rel_pos,
        "conv_feature_layers": layers,
        "encoder_layerdrop": 0.0,
        "dropout": 0.0, "attention_dropout": 0.0, "activation_dropout": 0.0,
        "dropout_input": 0.0, "dropout_features": 0.0,
    })
    return ref.WavLM(cfg).eval()


@pytest.mark.parametrize("mode", ["large_style", "base_style"])
def test_wavlm_matches_reference(mode, rng):
    ref = _load_reference()
    if ref is None:
        pytest.skip("reference WavLM not importable")
    if mode == "large_style":
        jcfg = _small_cfg(extractor_mode="layer_norm", conv_bias=True,
                          layer_norm_first=True, normalize=True,
                          relative_position_embedding=True, gru_rel_pos=True)
    else:
        jcfg = _small_cfg(extractor_mode="default", conv_bias=False,
                          layer_norm_first=False, normalize=False,
                          relative_position_embedding=True, gru_rel_pos=True)
    torch.manual_seed(3)
    tmodel = _ref_model(ref, jcfg)
    # amplify the gate projection: at random init grep_linear outputs are
    # ~0 and the gate is ~constant for ANY input, which once masked the
    # wrong-gate-input bug (gate must come from the raw per-head hidden
    # state, not the q_proj output — modules.py:523-533 fast path)
    with torch.no_grad():
        for name, p in tmodel.named_parameters():
            if "grep_linear" in name:
                p.mul_(8.0)
    sd = tmodel.state_dict()
    variables = convert_wavlm(sd, jcfg)
    model = WavLMJax(jcfg)

    wav = rng.randn(2, 3200).astype(np.float32) * 0.2
    twav = torch.from_numpy(wav)
    if jcfg.normalize:
        twav = torch.nn.functional.layer_norm(twav, twav.shape[1:])
    with torch.no_grad():
        want = tmodel.extract_features(twav)[0].numpy()
    got = np.asarray(model.apply(variables, jnp.asarray(wav)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=5e-3)
    # tight correlation check (layer-norm chains amplify f32 noise)
    corr = np.corrcoef(got.ravel(), want.ravel())[0, 1]
    assert corr > 0.9999


def test_attention_gate_input_matches_reference():
    """Single attention layer vs the reference fast path (modules.py:503+)
    with AMPLIFIED gate weights: isolates the gated-relative-position-bias
    path, where the gate input must be the RAW per-head hidden state, not
    the q_proj output (a bug the end-to-end test cannot resolve at toy
    scale — the two inputs differ by up to ~3.6, gates by ~0.1)."""
    sys.path.insert(0, "/root/reference/process/WavLM")
    try:
        import modules as ref_modules
    except Exception:
        pytest.skip("reference modules not importable")
    from qpgesture_tpu.models.wavlm import WavLMAttention
    import jax

    D, H, T, B = 64, 4, 23, 2
    torch.manual_seed(5)
    tattn = ref_modules.MultiheadAttention(
        D, H, dropout=0.0, self_attention=True,
        has_relative_attention_bias=True, num_buckets=32, max_distance=80,
        gru_rel_pos=True).eval()
    with torch.no_grad():
        for name, p in tattn.named_parameters():
            if "grep_linear" in name or "relative_attention_bias" in name:
                p.mul_(5.0)

    jcfg = _small_cfg(relative_position_embedding=True, gru_rel_pos=True)
    model = WavLMAttention(jcfg, has_bias_table=True)
    sd = tattn.state_dict()

    def t2j(w):
        return jnp.asarray(w.numpy())

    params = {
        "q_proj": {"kernel": t2j(sd["q_proj.weight"].T),
                   "bias": t2j(sd["q_proj.bias"])},
        "k_proj": {"kernel": t2j(sd["k_proj.weight"].T),
                   "bias": t2j(sd["k_proj.bias"])},
        "v_proj": {"kernel": t2j(sd["v_proj.weight"].T),
                   "bias": t2j(sd["v_proj.bias"])},
        "out_proj": {"kernel": t2j(sd["out_proj.weight"].T),
                     "bias": t2j(sd["out_proj.bias"])},
        "grep_linear": {"kernel": t2j(sd["grep_linear.weight"].T),
                        "bias": t2j(sd["grep_linear.bias"])},
        "grep_a": t2j(sd["grep_a"]),
        "rel_bias": t2j(sd["relative_attention_bias.weight"]),
    }

    x = np.random.RandomState(11).randn(B, T, D).astype(np.float32)
    with torch.no_grad():
        tx = torch.from_numpy(x).transpose(0, 1)  # (T, B, D)
        want, _, _ = tattn(query=tx, key=tx, value=tx, position_bias=None)
        want = want.transpose(0, 1).numpy()
    got, _ = model.apply({"params": params}, jnp.asarray(x), None)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)
    ref = _load_reference()
    if ref is None:
        pytest.skip("reference WavLM not importable")
    sys.path.insert(0, "/root/reference/process/WavLM")
    from modules import MultiheadAttention
    mha = MultiheadAttention(16, 2, has_relative_attention_bias=True,
                             num_buckets=32, max_distance=80)
    pos = np.arange(40)
    rel = pos[None, :] - pos[:, None]
    want = mha._relative_positions_bucket(torch.from_numpy(rel)).numpy()
    got = relative_position_bucket(rel, 32, 80)
    np.testing.assert_array_equal(got, want)
