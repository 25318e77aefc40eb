"""Parity tests for the legacy Seq2Seq attention stack (models/seq2seq.py)
against the ACTUAL reference implementation
(/root/reference/codebook/generate/generate.py:69-309), loaded directly —
the model is never constructed by the reference's own entry points, so
cross-checking the real torch module is the only ground truth available.
"""
import importlib.util
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

REF_GENERATE = "/root/reference/codebook/generate/generate.py"

pytestmark = pytest.mark.skipif(not os.path.exists(REF_GENERATE),
                                reason="reference tree not present")


def _load_reference_generate():
    spec = importlib.util.spec_from_file_location("ref_generate",
                                                  REF_GENERATE)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class _Args:
    def __init__(self, hidden_size, n_layers, dropout_prob, n_pre_poses):
        self.hidden_size = hidden_size
        self.n_layers = n_layers
        self.dropout_prob = dropout_prob
        self.n_pre_poses = n_pre_poses


VOCAB, EMBED, HIDDEN, POSE_DIM = 50, 16, 32, 27
N_FRAMES, N_PRE = 20, 4


def _build_pair(n_layers, seed=7):
    """Matching (torch reference, flax port, converted variables)."""
    from qpgesture_tpu.models.seq2seq import Seq2SeqNet
    from qpgesture_tpu.models.torch_convert import convert_seq2seq

    ref = _load_reference_generate()
    torch.manual_seed(seed)
    args = _Args(HIDDEN, n_layers, 0.1, N_PRE)
    tmodel = ref.Seq2SeqNet(args, POSE_DIM, N_FRAMES, VOCAB, EMBED,
                            word_embeddings=None).eval()
    model = Seq2SeqNet(vocab=VOCAB, embed=EMBED, hidden=HIDDEN,
                       pose_dim=POSE_DIM, n_frames=N_FRAMES,
                       n_pre_poses=N_PRE, n_layers=n_layers, dropout=0.1)
    variables = convert_seq2seq(tmodel.state_dict(), n_layers=n_layers)
    return tmodel, model, variables


def _inputs(rng, batch=4, t_text=12):
    # pack_padded_sequence requires lengths sorted decreasing
    lengths = np.sort(rng.randint(1, t_text + 1, size=batch))[::-1].copy()
    lengths[0] = t_text
    tokens = rng.randint(0, VOCAB, size=(batch, t_text)).astype(np.int64)
    for b, n in enumerate(lengths):
        tokens[b, n:] = 0
    poses = rng.randn(batch, N_FRAMES, POSE_DIM).astype(np.float32)
    return tokens, lengths.astype(np.int64), poses


@pytest.mark.parametrize("n_layers", [1, 2])
def test_seq2seq_forward_parity(n_layers):
    """Full Seq2SeqNet forward (teacher-forced prefix + autoregressive
    tail) matches the reference torch module in eval mode, including the
    packed-sequence encoder and the interleaved-hidden decoder seeding."""
    tmodel, model, variables = _build_pair(n_layers)
    rng = np.random.RandomState(3)
    tokens, lengths, poses = _inputs(rng)

    with torch.no_grad():
        want = tmodel(torch.from_numpy(tokens), list(lengths),
                      torch.from_numpy(poses), None).numpy()
    got = model.apply(variables, jnp.asarray(tokens), jnp.asarray(lengths),
                      jnp.asarray(poses), train=False)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)


def test_encoder_packed_semantics():
    """TextEncoderRNN reproduces torch packed bi-GRU behavior on ragged
    lengths: summed-direction outputs (zero past each length) AND the
    (layers*directions)-interleaved final hidden stack."""
    from qpgesture_tpu.models.seq2seq import TextEncoderRNN
    from qpgesture_tpu.models.torch_convert import convert_seq2seq

    ref = _load_reference_generate()
    torch.manual_seed(11)
    n_layers = 2
    tenc = ref.EncoderRNN(VOCAB, EMBED, HIDDEN, n_layers=n_layers,
                          dropout=0.0).eval()
    # reuse the Seq2Seq converter by aliasing the keys it expects
    sd = {f"encoder.{k}": v for k, v in tenc.state_dict().items()}

    full = dict(sd)
    # minimal decoder params so convert_seq2seq can run: not used here
    import torch.nn as tnn
    dec = tnn.ModuleDict({
        "attn_attn": tnn.Linear(2 * HIDDEN, HIDDEN),
        "pre0": tnn.Linear(POSE_DIM + HIDDEN, HIDDEN),
        "bn": tnn.BatchNorm1d(HIDDEN),
        "out": tnn.Linear(HIDDEN, POSE_DIM),
        "gru": tnn.GRU(HIDDEN, HIDDEN, n_layers),
    })
    full.update({
        "decoder.decoder.attn.attn.weight": dec["attn_attn"].weight,
        "decoder.decoder.attn.attn.bias": dec["attn_attn"].bias,
        "decoder.decoder.attn.v": torch.rand(HIDDEN),
        "decoder.decoder.pre_linear.0.weight": dec["pre0"].weight,
        "decoder.decoder.pre_linear.0.bias": dec["pre0"].bias,
        "decoder.decoder.pre_linear.1.weight": dec["bn"].weight,
        "decoder.decoder.pre_linear.1.bias": dec["bn"].bias,
        "decoder.decoder.pre_linear.1.running_mean": dec["bn"].running_mean,
        "decoder.decoder.pre_linear.1.running_var": dec["bn"].running_var,
        "decoder.decoder.out.weight": dec["out"].weight,
        "decoder.decoder.out.bias": dec["out"].bias,
    })
    for k, v in dec["gru"].state_dict().items():
        full[f"decoder.decoder.gru.{k}"] = v
    variables = convert_seq2seq(full, n_layers=n_layers)
    enc_vars = {"params": variables["params"]["encoder"]}

    rng = np.random.RandomState(5)
    tokens, lengths, _ = _inputs(rng, batch=5, t_text=9)
    with torch.no_grad():
        want_out, want_hid = tenc(
            torch.from_numpy(tokens).transpose(0, 1), list(lengths))
    enc = TextEncoderRNN(VOCAB, EMBED, HIDDEN, layers=n_layers, dropout=0.0)
    got_out, got_hid = enc.apply(enc_vars, jnp.asarray(tokens),
                                 jnp.asarray(lengths), train=False)
    # torch returns (T, B, H); ours (B, T, H)
    np.testing.assert_allclose(np.asarray(got_out).transpose(1, 0, 2),
                               want_out.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_hid), want_hid.numpy(),
                               atol=1e-5)
    # pad positions really are zero (pad_packed behavior)
    got_np = np.asarray(got_out)
    for b, n in enumerate(lengths):
        assert np.all(got_np[b, n:] == 0.0)


def test_seq2seq_train_mode_runs():
    """Train mode: dropout rngs split per scan step, BatchNorm batch stats
    threaded through the decode scan carry (running stats update)."""
    from qpgesture_tpu.models.seq2seq import Seq2SeqNet

    model = Seq2SeqNet(vocab=VOCAB, embed=EMBED, hidden=HIDDEN,
                       pose_dim=POSE_DIM, n_frames=N_FRAMES,
                       n_pre_poses=N_PRE, n_layers=2, dropout=0.1)
    rng = np.random.RandomState(1)
    tokens, lengths, poses = _inputs(rng)
    # init through the eval path: it creates the BatchNorm statistics that
    # the train-mode scan then carries (a collection cannot be CREATED
    # inside a variable_carry scan — see Seq2SeqNet docstring)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(tokens), jnp.asarray(lengths), jnp.asarray(poses),
        train=False)
    out, mutated = model.apply(
        variables, jnp.asarray(tokens), jnp.asarray(lengths),
        jnp.asarray(poses), train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(2)})
    assert out.shape == (4, N_FRAMES, POSE_DIM)
    bn = mutated["batch_stats"]["decoder"]["pre_bn"]
    assert not np.allclose(np.asarray(bn["mean"]), 0.0)


def test_decoder_cell_discrete_and_speaker():
    """Discrete-code input path + speaker embedding (generate.py:189-233)
    produce the right shapes and a normalized attention distribution."""
    from qpgesture_tpu.models.seq2seq import AttnDecoderCell

    cell = AttnDecoderCell(hidden=HIDDEN, output=64, layers=1,
                           discrete=True, speaker_n=6)
    rng = np.random.RandomState(2)
    codes = jnp.asarray(rng.randint(0, 64, size=(3,)))
    hid = jnp.asarray(rng.randn(1, 3, HIDDEN).astype(np.float32))
    enc = jnp.asarray(rng.randn(3, 9, HIDDEN).astype(np.float32))
    vid = jnp.asarray(rng.randint(0, 6, size=(3,)))
    variables = cell.init(jax.random.PRNGKey(0), codes, hid, enc, vid)
    out, new_hid, attn = cell.apply(variables, codes, hid, enc, vid)
    assert out.shape == (3, 64)
    assert new_hid.shape == (1, 3, HIDDEN)
    np.testing.assert_allclose(np.asarray(attn).sum(axis=1), 1.0,
                               atol=1e-5)
