"""MiniLM JAX port vs HF transformers BertModel (the stack inside
sentence-transformers paraphrase-MiniLM-L6-v2, make_beat_dataset.py:446-447)
— random weights, reduced size, plus WordPiece tokenizer parity."""
import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from qpgesture_tpu.models.minilm import (MiniLMConfig, MiniLMEncoder,
                                         MiniLMJax, WordPieceTokenizer,
                                         convert_minilm, load_minilm,
                                         mean_pool)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


SMALL = MiniLMConfig(vocab_size=120, hidden_size=48, num_layers=2,
                     num_heads=4, intermediate_size=96,
                     max_position_embeddings=64, max_seq_length=32)

VOCAB = (["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
         + ["the", "quick", "brown", "fox", "jump", "##s", "##ed", "##ing",
            "over", "lazy", "dog", "wave", "hand", "##hand", "hello",
            "world", ",", ".", "!", "?", "'", "un", "##aff", "##able",
            "run", "##ner", "caf", "##e", "a", "b", "c"]
         + [f"tok{i}" for i in range(84)])


def _hf_model(cfg: MiniLMConfig):
    hf_cfg = transformers.BertConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        intermediate_size=cfg.intermediate_size,
        max_position_embeddings=cfg.max_position_embeddings,
        type_vocab_size=cfg.type_vocab_size,
        layer_norm_eps=cfg.layer_norm_eps,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    return transformers.BertModel(hf_cfg).eval()


def test_minilm_matches_hf_bert(rng):
    torch.manual_seed(7)
    tmodel = _hf_model(SMALL)
    variables = convert_minilm(tmodel.state_dict(), SMALL)
    model = MiniLMJax(SMALL)

    B, T = 3, 17
    ids = rng.randint(0, SMALL.vocab_size, size=(B, T)).astype(np.int32)
    # ragged mask: rows of length 17, 9, 5
    mask = np.zeros((B, T), np.int32)
    for i, n in enumerate((17, 9, 5)):
        mask[i, :n] = 1
    with torch.no_grad():
        out = tmodel(input_ids=torch.from_numpy(ids).long(),
                     attention_mask=torch.from_numpy(mask).long())
        want = out.last_hidden_state.numpy()
    got = np.asarray(model.apply(variables, jnp.asarray(ids),
                                 jnp.asarray(mask)))
    assert got.shape == want.shape
    # padded positions differ (HF computes them, we do too — both garbage);
    # compare only real tokens
    np.testing.assert_allclose(got[mask > 0], want[mask > 0], atol=2e-5)

    # mean-pool parity (the actual sentence embedding)
    m = torch.from_numpy(mask)[..., None].float()
    want_pool = ((out.last_hidden_state * m).sum(1)
                 / m.sum(1).clamp(min=1e-9)).numpy()
    got_pool = np.asarray(mean_pool(jnp.asarray(got), jnp.asarray(mask)))
    np.testing.assert_allclose(got_pool, want_pool, atol=2e-5)


def test_convert_accepts_sentence_transformers_layout():
    torch.manual_seed(1)
    tmodel = _hf_model(SMALL)
    plain = convert_minilm(tmodel.state_dict(), SMALL)
    prefixed = convert_minilm(
        {f"0.auto_model.{k}": v for k, v in tmodel.state_dict().items()},
        SMALL)
    import jax
    jax.tree_util.tree_map(np.testing.assert_array_equal, plain, prefixed)


@pytest.mark.parametrize("text", [
    "The quick brown fox jumps over the lazy dog.",
    "Hello, world! unaffable runner",
    "CAFE cafe Café",            # lowercase + accent strip
    "",                               # empty -> just [CLS][SEP]
    "zzzzz qqq",                      # all-unknown words
    "a,b.c!  weird   spacing\tand\ncontrol",
    "word-with-dashes it's 'quoted'",
])
def test_wordpiece_tokenizer_matches_hf(tmp_path, text):
    vocab_file = tmp_path / "vocab.txt"
    vocab_file.write_text("\n".join(VOCAB) + "\n", encoding="utf-8")
    hf_tok = transformers.BertTokenizer(str(vocab_file), do_lower_case=True)
    tok = WordPieceTokenizer.from_vocab_file(str(vocab_file))
    assert tok.tokenize(text) == hf_tok.tokenize(text)
    want = hf_tok.encode(text, truncation=True, max_length=SMALL.max_seq_length)
    assert tok.encode(text, SMALL.max_seq_length) == want


def test_wordpiece_truncation_matches_hf(tmp_path):
    vocab_file = tmp_path / "vocab.txt"
    vocab_file.write_text("\n".join(VOCAB) + "\n", encoding="utf-8")
    hf_tok = transformers.BertTokenizer(str(vocab_file), do_lower_case=True)
    tok = WordPieceTokenizer.from_vocab_file(str(vocab_file))
    text = " ".join(["the quick brown fox"] * 20)
    want = hf_tok.encode(text, truncation=True, max_length=10)
    assert tok.encode(text, 10) == want


def _write_checkpoint(dirpath, tmodel):
    os.makedirs(dirpath, exist_ok=True)
    torch.save(tmodel.state_dict(),
               os.path.join(dirpath, "pytorch_model.bin"))
    with open(os.path.join(dirpath, "config.json"), "w") as f:
        json.dump({"vocab_size": SMALL.vocab_size,
                   "hidden_size": SMALL.hidden_size,
                   "num_hidden_layers": SMALL.num_layers,
                   "num_attention_heads": SMALL.num_heads,
                   "intermediate_size": SMALL.intermediate_size,
                   "max_position_embeddings":
                       SMALL.max_position_embeddings}, f)
    with open(os.path.join(dirpath, "vocab.txt"), "w") as f:
        f.write("\n".join(VOCAB) + "\n")
    with open(os.path.join(dirpath, "sentence_bert_config.json"), "w") as f:
        json.dump({"max_seq_length": SMALL.max_seq_length}, f)


def test_minilm_encoder_end_to_end(tmp_path):
    """load_minilm on an on-disk checkpoint dir == torch mean-pool path
    (the exact computation sentence-transformers runs for paraphrase-*)."""
    torch.manual_seed(3)
    tmodel = _hf_model(SMALL)
    ckpt = str(tmp_path / "minilm")
    _write_checkpoint(ckpt, tmodel)

    enc = load_minilm(ckpt)
    assert enc.model.cfg.max_seq_length == SMALL.max_seq_length

    texts = ["the quick brown fox", "hello world!",
             "", "unaffable runner jumps over the lazy dog"]
    got = enc.encode(texts)
    assert got.shape == (4, SMALL.hidden_size)

    hf_tok = transformers.BertTokenizer(os.path.join(ckpt, "vocab.txt"),
                                        do_lower_case=True)
    with torch.no_grad():
        b = hf_tok(texts, padding=True, truncation=True,
                   max_length=SMALL.max_seq_length, return_tensors="pt")
        hidden = tmodel(input_ids=b["input_ids"],
                        attention_mask=b["attention_mask"]
                        ).last_hidden_state
        m = b["attention_mask"][..., None].float()
        want = ((hidden * m).sum(1) / m.sum(1).clamp(min=1e-9)).numpy()
    np.testing.assert_allclose(got, want, atol=2e-5)

    # bucket invariance: same text embeds identically in different batches
    solo = enc.encode([texts[3]])
    np.testing.assert_allclose(solo[0], got[3], atol=2e-6)


def test_minilm_encoder_empty_batch(tmp_path):
    torch.manual_seed(3)
    _write_checkpoint(str(tmp_path / "m"), _hf_model(SMALL))
    enc = load_minilm(str(tmp_path / "m"))
    assert enc.encode([]).shape == (0, SMALL.hidden_size)
