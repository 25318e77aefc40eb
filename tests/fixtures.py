"""Synthetic database fixtures at the reference's exact tensor shapes
(dataset/orig_BEAT/readme.md documents the real pipeline's shapes; no real
BEAT data ships with either repo, so tests use seeded random databases)."""
import numpy as np

from qpgesture_tpu.core import constants as C
from qpgesture_tpu.core.schemas import CodebookSignature, DatabaseBundle


def make_fixture(rng: np.random.RandomState, n_seq: int = 5,
                 n_test: int = 2, codebook: int = C.CODEBOOK_SIZE):
    """Returns (bundle, codes, signature, wavlm, wavvq,
    test_wavlm, test_wavvq, test_context)."""
    J, W = n_seq, n_test
    bundle = DatabaseBundle(
        body=rng.randn(J, C.NUM_FRAMES, C.POSE_DIM).astype(np.float32),
        mfcc=rng.randn(J, C.NUM_FRAMES, 14).astype(np.float32),
        energy=rng.rand(J, C.NUM_FRAMES).astype(np.float32),
        pitch=rng.rand(J, C.NUM_FRAMES).astype(np.float32),
        volume=rng.rand(J, C.NUM_FRAMES).astype(np.float32),
        context=rng.randn(J, C.NUM_FRAMES_CODE, 1,
                          C.CONTEXT_DIM).astype(np.float32),
        phase=np.stack([
            rng.rand(J, C.NUM_FRAMES, 8),      # phase in [0, 1)
            rng.rand(J, C.NUM_FRAMES, 8) * 4,  # freq
            rng.rand(J, C.NUM_FRAMES, 8),      # amplitude
            rng.randn(J, C.NUM_FRAMES, 8) * .1,  # offset
        ], axis=2).astype(np.float32),
    )
    codes = rng.randint(0, codebook, size=(J, C.NUM_FRAMES_CODE)
                        ).astype(np.int32)
    signature = CodebookSignature(
        code=np.tile(np.arange(codebook)[:, None], (1, C.NUM_FRAMES_CODE)),
        poses=rng.randn(codebook, C.NUM_FRAMES, C.POSE_DIM
                        ).astype(np.float32),
        signature=rng.randn(codebook, C.POSE_DIM).astype(np.float32))
    wavlm = rng.randn(J, C.WAVLM_FRAMES, 32).astype(np.float32)
    wavvq = rng.randint(0, C.WAVVQ_VOCAB,
                        size=(J, C.WAVVQ_FRAMES, 2)).astype(np.int32)
    test_wavlm = rng.randn(W, C.WAVLM_FRAMES, 32).astype(np.float32)
    test_wavvq = rng.randint(0, C.WAVVQ_VOCAB,
                             size=(W, C.WAVVQ_FRAMES, 2)).astype(np.int32)
    test_context = rng.randn(W, C.NUM_FRAMES_CODE,
                             C.CONTEXT_DIM).astype(np.float32)
    test_bundle = DatabaseBundle(
        mfcc=rng.randn(W, C.NUM_FRAMES, 14).astype(np.float32))
    return dict(bundle=bundle, codes=codes, signature=signature,
                wavlm=wavlm, wavvq=wavvq, test_wavlm=test_wavlm,
                test_wavvq=test_wavvq, test_context=test_context,
                test_bundle=test_bundle)
