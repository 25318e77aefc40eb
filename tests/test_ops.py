"""Unit tests for ranking, Levenshtein, stacking, and geometry ops."""
import numpy as np
import pytest

from qpgesture_tpu.ops.ranking import (kth_smallest_index_jnp,
                                       kth_smallest_index_np, rank_jnp,
                                       rank_np)
from qpgesture_tpu.ops.levenshtein import (combine_wavvq, levenshtein_matrix,
                                           levenshtein_matrix_np,
                                           levenshtein_np)
from qpgesture_tpu.ops.stacking import (interpolate_linear, stack_post,
                                        stack_wavvq)
from qpgesture_tpu.match.geometry import mode_geometry, text_geometry


def test_rank_matches_numpy_double_argsort(rng):
    x = rng.rand(512).astype(np.float32)
    expected = np.argsort(x).argsort()  # untied values: unstable == stable
    np.testing.assert_array_equal(rank_np(x), expected)
    np.testing.assert_array_equal(np.asarray(rank_jnp(x)), expected)


def test_rank_stable_ties():
    x = np.array([1.0, 0.5, 0.5, 2.0], dtype=np.float32)
    np.testing.assert_array_equal(rank_np(x), [2, 0, 1, 3])
    np.testing.assert_array_equal(np.asarray(rank_jnp(x)), [2, 0, 1, 3])


def test_kth_smallest(rng):
    x = rng.rand(100).astype(np.float32)
    for k in (0, 3, 50):
        assert kth_smallest_index_np(x, k) == int(np.argsort(x)[k])
        assert int(kth_smallest_index_jnp(x, k)) == int(np.argsort(x)[k])


def test_levenshtein_vs_c_library(rng):
    Levenshtein = pytest.importorskip("Levenshtein")
    for _ in range(50):
        la, lb = rng.randint(1, 15, size=2)
        a = rng.randint(0, 640, size=la)
        b = rng.randint(0, 640, size=lb)
        sa = "".join(chr(int(x)) for x in a)
        sb = "".join(chr(int(x)) for x in b)
        assert levenshtein_np(a, b) == Levenshtein.distance(sa, sb)


def test_levenshtein_matrix_jnp_vs_oracle(rng):
    a = rng.randint(0, 102400, size=(5, 11)).astype(np.int32)
    b = rng.randint(0, 102400, size=(17, 11)).astype(np.int32)
    # force some near-duplicates for interesting distances
    b[3] = a[0]
    b[4, :5] = a[1, :5]
    np.testing.assert_array_equal(np.asarray(levenshtein_matrix(a, b)),
                                  levenshtein_matrix_np(a, b))


def test_combine_wavvq_matches_reference_layout(rng):
    # 22-dim stacked feature: 11 frames x 2 groups, frame-major
    feat = rng.randint(0, 320, size=(22,))
    combined = combine_wavvq(feat)
    frames = feat.reshape(11, 2)
    np.testing.assert_array_equal(combined, frames[:, 0] * 320 + frames[:, 1])


def test_stack_post_matches_reference_loop(rng):
    x = rng.rand(3, 240, 13).astype(np.float32)
    n_stack, interval = 6, 4
    # reference loop (data_processing.py:208-212)
    ref = np.zeros((3, 240, n_stack, 13))
    for i in range(n_stack):
        post_pad = np.zeros((3, i * interval, 13))
        ref[:, :, i, :] = np.concatenate((x[:, (i * interval):], post_pad),
                                         axis=1)
    np.testing.assert_allclose(stack_post(x, n_stack, interval),
                               ref.reshape(3, 240, -1), rtol=1e-6)


def test_stack_post_short_clip(rng):
    """Clips shorter than (n_stack-1)*interval must zero-pad, not crash
    (shift clamps to T)."""
    x = rng.rand(2, 15, 3).astype(np.float32)
    out = stack_post(x, 6, 4)
    assert out.shape == (2, 15, 18)
    np.testing.assert_array_equal(out[:, :, 15:], 0)  # shift=20 > T plane
    np.testing.assert_allclose(out[:, :, :3], x)


def test_stack_wavvq_matches_reference_loop(rng):
    wavvq = rng.randint(0, 320, size=(2, 398, 2))
    got = stack_wavvq(wavvq)
    assert got.shape == (2, 398, 22)
    # reference two-sided construction (data_processing.py:297-317)
    NUM, FIvq = 6, 398 / 30
    f1 = np.zeros((2, 398, NUM, 2))
    for i in range(NUM):
        pre = int((NUM - i - 1) * FIvq)
        pad = np.zeros((2, pre, 2))
        f1[:, :, i, :] = np.concatenate((pad, wavvq[:, :398 - pre]), axis=1)
    f1 = f1.reshape(2, 398, -1)
    f2 = np.zeros((2, 398, NUM, 2))
    for i in range(NUM):
        post = int(i * FIvq)
        pad = np.zeros((2, post, 2))
        f2[:, :, i, :] = np.concatenate((wavvq[:, post:], pad), axis=1)
    f2 = np.delete(f2, 0, axis=2).reshape(2, 398, -1)
    ref = np.concatenate((f1, f2), axis=-1)
    np.testing.assert_array_equal(got, ref)


def test_interpolate_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    rng = np.random.RandomState(0)
    x = rng.rand(2, 199, 7).astype(np.float32)
    ref = F.interpolate(torch.from_numpy(x).transpose(1, 2), size=180,
                        align_corners=True, mode="linear")
    ref = ref.transpose(1, 2).numpy()
    np.testing.assert_allclose(interpolate_linear(x, 180), ref, atol=1e-5)


def test_wavvq_geometry_float_accumulation():
    g = mode_geometry("wavvq_feat")
    # while k < 398 - 4*398/30: 26 blocks, frame idx by int() truncation
    assert len(g.block_code_idx) == 26
    assert g.block_code_idx[0] == 0 and g.block_frame_idx[0] == 0
    # reproduce by explicit accumulation
    ks, k = [], 0.0
    while k < 398 - 4 * (398 / 30):
        ks.append(k)
        k += 398 / 30
    np.testing.assert_array_equal(g.block_frame_idx,
                                  [int(v) for v in ks])
    np.testing.assert_array_equal(g.block_code_idx,
                                  [int(v / (398 / 30)) for v in ks])
    # 8 steps per window, context slots 0,4,...,28
    assert len(g.step_clip_idx) == 8
    np.testing.assert_array_equal(g.step_context_idx, np.arange(0, 32, 4))


def test_wavlm_geometry():
    g = mode_geometry("wavlm_feat")
    assert g.n_db_frm == 180 and g.step_sz == 6
    np.testing.assert_array_equal(g.block_frame_idx, np.arange(0, 156, 6))
    np.testing.assert_array_equal(g.block_code_idx, np.arange(26))
    np.testing.assert_array_equal(g.step_clip_idx, np.arange(0, 180, 24))
    np.testing.assert_array_equal(g.step_context_idx, np.arange(0, 32, 4))


def test_mfcc_geometry():
    g = mode_geometry("feat")
    assert g.n_db_frm == 240 and g.step_sz == 8
    np.testing.assert_array_equal(g.block_frame_idx, np.arange(0, 208, 8))
    np.testing.assert_array_equal(g.step_clip_idx, np.arange(0, 240, 32))


def test_text_geometry():
    slots, frames = text_geometry()
    np.testing.assert_array_equal(frames, np.arange(0, 208, 8))
    np.testing.assert_array_equal(slots, np.arange(26))


def test_long_clip_geometry():
    """3600-frame mfcc clips (the reference's 60 s variant) walk 113 steps
    of 32 frames (while i < 3600, i += 32)."""
    g = mode_geometry("feat", clip_len=3600)
    assert len(g.step_clip_idx) == 113
    np.testing.assert_array_equal(g.step_clip_idx[:3], [0, 32, 64])


def test_legacy_phase_object_npz(tmp_path):
    """DatabaseBundle converts the reference's object-dtype torch-tensor
    phase arrays to dense (n, T, 4, 8) on load (superseding
    fix_device_bug.py)."""
    torch = pytest.importorskip("torch")
    from qpgesture_tpu.core.schemas import DatabaseBundle
    rng2 = np.random.RandomState(0)
    dense = rng2.rand(2, 6, 4, 8).astype(np.float32)
    obj = np.empty((2, 6, 4), dtype=object)
    for i in range(2):
        for j in range(6):
            for p in range(4):
                obj[i, j, p] = torch.tensor(dense[i, j, p].reshape(1, 8, 1))
    path = str(tmp_path / "legacy.npz")
    np.savez_compressed(path, phase=obj)
    bundle = DatabaseBundle.load(path)
    np.testing.assert_allclose(bundle.phase, dense, atol=1e-7)
