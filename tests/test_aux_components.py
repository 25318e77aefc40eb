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
