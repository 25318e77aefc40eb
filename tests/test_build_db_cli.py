"""build-db CLI: full 15-joint BEAT-like recordings -> window bundles."""
import os

import pytest
import wave as wavemod

import numpy as np

from qpgesture_tpu.cli import main as cli_main
from qpgesture_tpu.core.constants import TARGET_JOINTS
from qpgesture_tpu.core.schemas import DatabaseBundle


def make_beat_like_bvh(rng, n_frames, fps=120):
    """Full skeleton: Hips + the 15 target joints + legs (dropped later)."""
    def joint(name, children, offset=(0.0, 5.0, 0.0)):
        kids = "".join(children)
        return (f"JOINT {name}\n{{\nOFFSET {offset[0]} {offset[1]} "
                f"{offset[2]}\nCHANNELS 3 Zrotation Xrotation Yrotation\n"
                f"{kids}}}\n")

    end = "End Site\n{\nOFFSET 0.0 2.0 0.0\n}\n"
    head = joint("Head", [end])
    neck1 = joint("Neck1", [head])
    neck = joint("Neck", [neck1])
    rhand = joint("RightHand", [end])
    rfore = joint("RightForeArm", [rhand])
    rarm = joint("RightArm", [rfore], (-3.0, 0.0, 0.0))
    rsh = joint("RightShoulder", [rarm], (-2.0, 4.0, 0.0))
    lhand = joint("LeftHand", [end])
    lfore = joint("LeftForeArm", [lhand])
    larm = joint("LeftArm", [lfore], (3.0, 0.0, 0.0))
    lsh = joint("LeftShoulder", [larm], (2.0, 4.0, 0.0))
    spine3 = joint("Spine3", [neck, rsh, lsh])
    spine2 = joint("Spine2", [spine3])
    spine1 = joint("Spine1", [spine2])
    spine = joint("Spine", [spine1])
    rleg = joint("RightUpLeg", [end], (-3.0, -4.0, 0.0))
    hierarchy = ("HIERARCHY\nROOT Hips\n{\nOFFSET 0 0 0\n"
                 "CHANNELS 6 Xposition Yposition Zposition Zrotation "
                 "Xrotation Yrotation\n" + spine + rleg + "}\nMOTION\n")
    n_ch = 6 + 3 * 17
    vals = np.round(rng.randn(n_frames, n_ch) * 15, 4)
    lines = "\n".join(" ".join("%.4f" % v for v in row) for row in vals)
    return (hierarchy + f"Frames: {n_frames}\nFrame Time: {1/fps:.6f}\n"
            + lines + "\n")


def test_build_db_cli(tmp_path, rng):
    bvh_dir = tmp_path / "bvh"
    wav_dir = tmp_path / "wav"
    txt_dir = tmp_path / "txt"
    out_dir = tmp_path / "db"
    for d in (bvh_dir, wav_dir, txt_dir):
        os.makedirs(d)
    sr = 16000
    names = ["1_spk_0_1_8", "1_spk_0_103_110"]
    for name in names:
        dur = 9.0
        with open(bvh_dir / f"{name}.bvh", "w") as f:
            f.write(make_beat_like_bvh(rng, int(dur * 120)))
        wav = (0.2 * np.sin(2 * np.pi * 200 * np.arange(int(dur * sr)) / sr)
               ).astype(np.float32)
        with wavemod.open(str(wav_dir / f"{name}.wav"), "w") as f:
            f.setnchannels(1)
            f.setsampwidth(2)
            f.setframerate(sr)
            f.writeframes((wav * 32767).astype(np.int16).tobytes())
        with open(txt_dir / f"{name}.txt", "w") as f:
            f.write("0.5\t0.9\thello\n2.0\t2.4\tworld\n")

    cli_main(["build-db", "--bvh-dir", str(bvh_dir), "--wav-dir",
              str(wav_dir), "--transcript-dir", str(txt_dir),
              "--out", str(out_dir), "--prefix", "spk",
              "--hashed-context"])

    train = DatabaseBundle.load(str(out_dir / "spk_train_240_txt_2.npz"))
    test = DatabaseBundle.load(str(out_dir / "spk_test_240_txt_2.npz"))
    assert train.body.shape[1:] == (240, 135)
    assert train.body.shape[0] >= 2
    assert test.body.shape[0] >= 2
    assert train.context.shape[1:] == (30, 1, 384)
    assert train.mfcc.shape[1] == 240
    stats = np.load(out_dir / "stats.npz")
    assert stats["mean"].shape == (135,)
    assert os.path.exists(out_dir / "pipeline.json")


def test_transformers_mean_pool_embed_fn(tmp_path):
    """The no-sentence-transformers fallback: a tiny local BERT checkpoint
    exercises tokenize -> AutoModel -> masked mean pooling; result must
    equal the manual computation."""
    pytest.importorskip("transformers")
    import torch
    from transformers import BertConfig, BertModel, BertTokenizer

    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
             "hello", "world", "gesture", "speech"]
    mdir = tmp_path / "tinybert"
    mdir.mkdir()
    (mdir / "vocab.txt").write_text("\n".join(vocab) + "\n")
    cfg = BertConfig(vocab_size=len(vocab), hidden_size=16,
                     num_hidden_layers=1, num_attention_heads=2,
                     intermediate_size=32, max_position_embeddings=32)
    torch.manual_seed(0)
    model = BertModel(cfg)
    model.save_pretrained(str(mdir))
    tok = BertTokenizer(str(mdir / "vocab.txt"))
    tok.save_pretrained(str(mdir))

    from qpgesture_tpu.pipelines.database_builder import (
        sentence_transformer_embed_fn, transformers_mean_pool_embed_fn)
    embed = transformers_mean_pool_embed_fn(str(mdir))
    out = embed(["hello world", "gesture speech hello"])
    assert out.shape == (2, 16) and np.isfinite(out).all()

    # manual check of the masked mean pooling on one sentence
    enc = tok(["hello world"], return_tensors="pt")
    with torch.no_grad():
        hidden = BertModel.from_pretrained(str(mdir)).eval()(
            **enc).last_hidden_state[0]
    np.testing.assert_allclose(out[0], hidden.mean(0).numpy(), atol=1e-5)

    # the public entry point falls through to this implementation when
    # sentence_transformers is absent (it is, in this image)
    embed2 = sentence_transformer_embed_fn(str(mdir))
    np.testing.assert_allclose(embed2(["hello world"])[0], out[0],
                               atol=1e-6)


def test_build_db_cli_device_native_minilm(tmp_path, rng):
    """--sentence-model with a checkpoint DIR routes through the JAX
    MiniLM port (minilm_embed_fn), producing (n, 30, 1, D) context equal
    to embedding the slot texts with the torch mean-pool oracle."""
    torch = pytest.importorskip("torch")
    from test_minilm import SMALL, _hf_model, _write_checkpoint

    bvh_dir = tmp_path / "bvh"
    wav_dir = tmp_path / "wav"
    txt_dir = tmp_path / "txt"
    out_dir = tmp_path / "db"
    for d in (bvh_dir, wav_dir, txt_dir):
        os.makedirs(d)
    sr = 16000
    name = "1_spk_0_1_8"
    dur = 9.0
    with open(bvh_dir / f"{name}.bvh", "w") as f:
        f.write(make_beat_like_bvh(rng, int(dur * 120)))
    wav = (0.2 * np.sin(2 * np.pi * 200 * np.arange(int(dur * sr)) / sr)
           ).astype(np.float32)
    with wavemod.open(str(wav_dir / f"{name}.wav"), "w") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes((wav * 32767).astype(np.int16).tobytes())
    with open(txt_dir / f"{name}.txt", "w") as f:
        f.write("0.5\t0.9\thello\n2.0\t2.4\tworld\n")

    torch.manual_seed(21)
    ckpt = str(tmp_path / "minilm")
    _write_checkpoint(ckpt, _hf_model(SMALL))

    cli_main(["build-db", "--bvh-dir", str(bvh_dir), "--wav-dir",
              str(wav_dir), "--transcript-dir", str(txt_dir),
              "--out", str(out_dir), "--prefix", "spk",
              "--sentence-model", ckpt])
    train = DatabaseBundle.load(str(out_dir / "spk_train_240_txt_2.npz"))
    assert train.context.shape[1:] == (30, 1, SMALL.hidden_size)

    # same context as embedding the slot texts directly with the port
    from qpgesture_tpu.models.minilm import load_minilm
    from qpgesture_tpu.pipelines.database_builder import context_slots
    from qpgesture_tpu.pipelines.transcripts import read_tab_transcript
    enc = load_minilm(ckpt)
    words = read_tab_transcript(str(txt_dir / f"{name}.txt"))
    want0 = enc(context_slots(words, 0.0, 4.0))
    np.testing.assert_allclose(train.context[0, :, 0, :], want0, atol=1e-6)
