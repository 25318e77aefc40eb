"""Raw-pose GestureKNN (the Habibie-style frame-matching baseline).

The reference's `main()` path (GestureKNN.py:70-341): autoregressive
frame-block search where each step finds, per database sequence, the nearest
frame to the current pose feature (skipping exact matches, padded tails, and
control-masked frames), rank-sum-fuses that pose distance with the cosine
audio distance of the candidate block's first frame, and copies the selected
8-frame block. Timings in the reference: 1h58m for 185 sequences
(GestureKNN.py:410).

Device design: per step, the pose-distance matrix over all (sequence, frame)
pairs is one fused expansion matmul; the per-sequence first-valid-candidate
is an argmin under a validity mask; the sequential dependency (the pose
feature advances by the chosen block) is a lax.scan.

Documented deviation: database sequences with no valid candidate are ranked
last (+inf distance) instead of being dropped from the candidate list, which
preserves selection for any desired_k below the valid count.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import constants as C
from ..ops.ranking import rank_np


@dataclass
class GestureKNNData:
    """Staged database: features (K, L, A+P) normalized, motion (K, L, J)."""
    feat: np.ndarray
    motion: np.ndarray
    control_mask: np.ndarray
    n_aud: int
    step_sz: int = 8


def stage_gesture_knn(mfcc: np.ndarray, body: np.ndarray,
                      control_type=None,
                      step_sz: int = 8) -> GestureKNNData:
    """Build the raw-pose database from window npz arrays, matching
    load_train_db (data_processing.py:12-64): audio feature = 6-frame MFCC
    stack (stride 4), body feature = 4-frame stack (stride 4) of the
    BODY_FEAT_IDX joints' 9-dim rotations; features z-normalized with the
    train stats and the test features normalized with the audio slice
    (predict_gesture_from_audio, GestureKNN.py:299-325).

    mfcc: (K, T, >=13); body: (K, T, 135). Returns staged (unnormalized)
    data plus stats — callers normalize via `normalize_gesture_knn`.
    """
    from ..ops.stacking import stack_post
    from .control import create_control_filter

    mfcc = mfcc[:, :, :C.NUM_MFCC_FEAT].astype(np.float64)
    K, T = mfcc.shape[:2]
    motion = body.reshape(K, T, -1, 9)
    slc = np.take(motion, C.BODY_FEAT_IDX, axis=2).reshape(K, T, -1)
    body_feat = stack_post(slc, C.NUM_BODY_FEAT_FRAMES, C.FRAME_INTERVAL)
    audio_feat = stack_post(mfcc, C.NUM_AUDIO_FEAT_FRAMES, C.FRAME_INTERVAL)
    features = np.concatenate([audio_feat, body_feat], axis=2)
    n_aud = audio_feat.shape[2]
    mask = create_control_filter(features.transpose(0, 2, 1), control_type,
                                 n_aud_feat=n_aud)
    return GestureKNNData(feat=features.astype(np.float32),
                          motion=body.astype(np.float32),
                          control_mask=mask, n_aud=n_aud, step_sz=step_sz)


def normalize_gesture_knn(db: GestureKNNData, test_mfcc: np.ndarray
                          ) -> Tuple[GestureKNNData, np.ndarray]:
    """z-normalize the database features with train stats and stage test
    audio features with the audio-slice stats (GestureKNN.py:306-314).
    Returns (normalized db, (W, n_aud, T) normalized test features)."""
    from ..ops.stacking import stack_post

    feat = db.feat.astype(np.float64)
    mean = feat.mean(axis=(0, 1))
    std = feat.std(axis=(0, 1))
    norm = ((feat - mean) / (std + 1e-8)).astype(np.float32)
    test = stack_post(test_mfcc[:, :, :C.NUM_MFCC_FEAT].astype(np.float64),
                      C.NUM_AUDIO_FEAT_FRAMES, C.FRAME_INTERVAL)
    test = ((test - mean[:db.n_aud]) / (std[:db.n_aud] + 1e-8))
    out_db = GestureKNNData(feat=norm, motion=db.motion,
                            control_mask=db.control_mask, n_aud=db.n_aud,
                            step_sz=db.step_sz)
    return out_db, test.transpose(0, 2, 1).astype(np.float32)


def _valid_frames(d: np.ndarray, mask_row: np.ndarray,
                  step: int) -> np.ndarray:
    L = d.shape[0]
    f_idx = np.arange(L)
    ok = (d != 0.0) & (f_idx <= L - step)
    ok &= (mask_row + np.concatenate(
        [mask_row[step - 1:], np.zeros(step - 1)])[:L]) == 2
    # The reference's candidate loop runs `while ctr < len(sorted_idx) - 1`
    # (GestureKNN.py:174) and so never examines the frame that sorts LAST
    # (the max-distance frame) — a sequence whose only valid frame is that
    # one is dropped. Replicate with the stable-tie analogue: exclude the
    # last index among frames achieving the max distance.
    ok[np.where(d == d.max())[0][-1]] = False
    return ok


def search_motion_np(db: GestureKNNData, feat_test: np.ndarray,
                     init_seq: int, init_frm: int,
                     desired_k: int = 0,
                     tie_kind: str = "stable") -> np.ndarray:
    """NumPy oracle for GestureKNN.search_motion (GestureKNN.py:102-211).
    feat_test: (n_aud, n_frames). Returns (n_joints, n_frames).

    tie_kind='reference' uses NumPy's default unstable argsort like the
    reference (rank-sum collisions are frequent with few sequences)."""
    n_aud, step = db.n_aud, db.step_sz
    K, L = db.feat.shape[:2]
    n_frames = feat_test.shape[1]
    feat = np.concatenate([feat_test[:, :1], feat_test], axis=1)
    pose_feat = np.zeros((db.feat.shape[2] - n_aud, feat.shape[1]),
                         np.float32)
    pose_feat[:, 0] = db.feat[init_seq, init_frm, n_aud:]
    pred = np.zeros((db.motion.shape[2], n_frames + 1), np.float32)

    j = 1
    while j < n_frames:
        cur = pose_feat[:, j - 1]
        pos_dist = np.full(K, np.inf, np.float32)
        frame_sel = np.zeros(K, np.int64)
        for k in range(K):
            if db.control_mask[k].sum() == 0:
                continue
            d = np.linalg.norm(db.feat[k, :, n_aud:] - cur, axis=1)
            ok = _valid_frames(d, db.control_mask[k], step)
            if not ok.any():
                continue
            dm = np.where(ok, d, np.inf)
            f = int(np.argmin(dm))
            pos_dist[k] = dm[f]
            frame_sel[k] = f
        aud_q = feat[:n_aud, j]
        aud_dist = np.full(K, np.inf, np.float32)
        for k in range(K):
            if np.isfinite(pos_dist[k]):
                cand = db.feat[k, frame_sel[k], :n_aud]
                na = np.linalg.norm(aud_q) or 1.0
                nb = np.linalg.norm(cand) or 1.0
                aud_dist[k] = 1.0 - np.dot(aud_q / na, cand / nb)
        if tie_kind == "reference":
            def _rank(x):
                return np.asarray(x).argsort().argsort()
            kind = None
        else:
            _rank = rank_np
            kind = "stable"
        combined = (_rank(pos_dist).astype(np.float64)
                    + _rank(aud_dist).astype(np.float64))
        combined = np.where(np.isfinite(pos_dist), combined, np.inf)
        sel = int(np.argsort(combined, kind=kind)[desired_k])
        f = frame_sel[sel]
        blk_feat = db.feat[sel, f:f + step, n_aud:].T       # (P, <=step)
        blk_pose = db.motion[sel, f:f + step].T             # (J, <=step)
        # clamp to the remaining columns: for n_frames % step != 0 the final
        # block overhangs the output buffers (the jitted engine handles this
        # by padding; the oracle must not crash where the engine works)
        w = min(blk_feat.shape[1], pose_feat.shape[1] - j)
        pose_feat[:, j:j + w] = blk_feat[:, :w]
        pred[:, j:j + w] = blk_pose[:, :w]
        j += step
    return pred[:, 1:]


def _search_motion_core(feat_db, motion_db, mask, feat_test, init_pose,
                        desired_k, n_aud: int, step: int, n_steps: int):
    """Scan over steps. feat_db: (K, L, A+P); feat_test padded
    (A, 1+n_frames); desired_k traced (one compile serves every k, and the
    batched path vmaps per-sequence ks)."""
    K, L = feat_db.shape[:2]
    P = feat_db.shape[2] - n_aud
    pose_db = feat_db[:, :, n_aud:]                       # (K, L, P)
    aud_db = feat_db[:, :, :n_aud]
    f_idx = jnp.arange(L)
    tail_ok = f_idx <= L - step
    mask_ok = (mask + jnp.concatenate(
        [mask[:, step - 1:], jnp.zeros((K, step - 1))], axis=1)[:, :L]) == 2
    static_ok = tail_ok[None, :] & mask_ok                # (K, L)
    seq_alive = mask.sum(axis=1) > 0

    from ..ops.ranking import rank_jnp

    def body(pose_cur, j):
        # Direct difference form, NOT the expanded a2-2ab+b2 matmul: every
        # step's query pose is copied verbatim from the selected block, so
        # an exact-match frame exists in the database and the oracle's
        # `d != 0.0` skip guard depends on that distance being EXACTLY
        # zero. The expanded form's mixed reduction orders leave a tiny
        # positive residual that would let the self-match win rank 0 and
        # replay the source sequence. (Same bandwidth either way — both
        # read all of pose_db once; the contraction is memory-bound.)
        diff = pose_db - pose_cur
        d = jnp.sqrt(jnp.sum(diff * diff, axis=-1))       # (K, L)
        ok = static_ok & (d != 0.0) & seq_alive[:, None]
        # reference off-by-one: the max-distance frame (last in sort order;
        # stable-tie analogue = last occurrence of the max) is never
        # examined as a candidate (GestureKNN.py:174) — see _valid_frames
        last_max = (L - 1) - jnp.argmax(d[:, ::-1] == d.max(
            axis=1, keepdims=True), axis=1)               # (K,)
        ok &= f_idx[None, :] != last_max[:, None]
        dm = jnp.where(ok, d, jnp.inf)
        f_sel = jnp.argmin(dm, axis=1)                    # (K,)
        pos_dist = jnp.take_along_axis(dm, f_sel[:, None], axis=1)[:, 0]
        valid = jnp.isfinite(pos_dist)

        aud_q = feat_test[:, j]
        cand = jnp.take_along_axis(
            aud_db, f_sel[:, None, None], axis=1)[:, 0]   # (K, A)
        nq = jnp.linalg.norm(aud_q)
        nq = jnp.where(nq > 0, nq, 1.0)
        nc = jnp.linalg.norm(cand, axis=1)
        nc = jnp.where(nc > 0, nc, 1.0)
        # f32 matvec: bf16 MXU multiplies shift distances ~1e-3, flipping
        # rank orders vs the NumPy oracle (same rationale as the pose
        # distance above and engine.cosine_distance_matrix)
        aud_dist = 1.0 - jnp.dot(cand, aud_q / nq,
                                 precision=jax.lax.Precision.HIGHEST) / nc
        aud_dist = jnp.where(valid, aud_dist, jnp.inf)
        pos_for_rank = jnp.where(valid, pos_dist, jnp.inf)
        combined = (rank_jnp(pos_for_rank).astype(jnp.float32)
                    + rank_jnp(aud_dist).astype(jnp.float32))
        combined = jnp.where(valid, combined, jnp.inf)
        sel = jnp.argsort(combined)[desired_k]
        f = f_sel[sel]
        blk_feat = jax.lax.dynamic_slice(
            pose_db[sel], (f, 0), (step, P))              # (step, P)
        blk_pose = jax.lax.dynamic_slice(
            motion_db[sel], (f, 0), (step, motion_db.shape[2]))
        return blk_feat[-1], (blk_pose, blk_feat)

    js = 1 + step * jnp.arange(n_steps)
    _, (blocks, feats) = jax.lax.scan(body, init_pose, js)
    return blocks, feats  # (n_steps, step, J), (n_steps, step, P)


_search_motion_jit = partial(jax.jit, static_argnames=(
    "n_aud", "step", "n_steps"))(_search_motion_core)


@partial(jax.jit, static_argnames=("n_aud", "step", "n_steps"))
def _search_motion_batch_jit(feat_db, motion_db, mask, feat_tests,
                             init_poses, desired_ks,
                             n_aud: int, step: int, n_steps: int):
    """C independent searches in ONE device program (vmap over the scan);
    the database tensors are shared, so the batched pose-distance pass
    reads them once per step for all sequences."""
    return jax.vmap(
        lambda ft, ip, dk: _search_motion_core(
            feat_db, motion_db, mask, ft, ip, dk, n_aud, step, n_steps)
    )(feat_tests, init_poses, desired_ks)


class GestureKNNEngine:
    """Device engine for the raw-pose baseline. Database tensors ship to
    HBM once at construction and stay resident across search_motion calls
    (re-uploading the ~60 MB feature tables per sequence dominated the
    wall time through a tunnel-attached host: 2.8 s -> ~50 ms/seq)."""

    def __init__(self, db: GestureKNNData):
        self.db = db
        self._feat_d, self._motion_d, self._mask_d = jax.device_put(
            (db.feat, db.motion, db.control_mask.astype(np.float32)))

    def init_frame(self, rng: np.random.RandomState) -> Tuple[int, int]:
        """Random valid start frame (init_frame, GestureKNN.py:91-99)."""
        K, L = self.db.feat.shape[:2]
        while True:
            s, f = rng.randint(0, K), rng.randint(0, L)
            if self.db.control_mask[s, f] == 1:
                return s, f

    def search_motion(self, feat_test: np.ndarray, init_seq: int,
                      init_frm: int, desired_k: int = 0) -> np.ndarray:
        db = self.db
        step = db.step_sz
        n_frames = feat_test.shape[1]
        n_steps = int(np.ceil((n_frames - 1) / step))
        feat = np.concatenate([feat_test[:, :1], feat_test], axis=1)
        # pad so each step's j index is in range
        pad = 1 + n_steps * step + step - feat.shape[1]
        if pad > 0:
            feat = np.pad(feat, ((0, 0), (0, pad)))
        init_pose = jnp.asarray(db.feat[init_seq, init_frm, db.n_aud:])
        blocks, _ = _search_motion_jit(
            self._feat_d, self._motion_d, self._mask_d,
            jnp.asarray(feat.astype(np.float32)), init_pose,
            jnp.int32(desired_k), db.n_aud, step, n_steps)
        width = max(1 + n_steps * step, n_frames + 1)
        out = np.zeros((db.motion.shape[2], width), np.float32)
        flat = np.asarray(blocks).reshape(n_steps * step, -1).T
        out[:, 1:1 + n_steps * step] = flat
        # pred_motion[:, 1:] (GestureKNN.py:150): drop the init column
        return out[:, 1:1 + n_frames]

    def search_motion_batch(self, feat_tests: np.ndarray,
                            init_seqs: np.ndarray, init_frms: np.ndarray,
                            desired_ks: Optional[np.ndarray] = None
                            ) -> np.ndarray:
        """C independent searches in ONE device program.

        feat_tests: (C, n_aud, n_frames) — same length per sequence (the
        reference's test sets are fixed-length windows). Batching is the
        raw-pose analogue of CodeKNNEngine.predict_batch: the reference's
        1 h 58 m / 185-sequence workload collapses into ceil(185/C)
        dispatches instead of paying a host-link round trip per sequence.
        Bit-identical per sequence to search_motion.
        """
        db = self.db
        step = db.step_sz
        C, _, n_frames = feat_tests.shape
        n_steps = int(np.ceil((n_frames - 1) / step))
        feats = np.concatenate([feat_tests[:, :, :1], feat_tests], axis=2)
        pad = 1 + n_steps * step + step - feats.shape[2]
        if pad > 0:
            feats = np.pad(feats, ((0, 0), (0, 0), (0, pad)))
        if desired_ks is None:
            desired_ks = np.zeros((C,), np.int32)
        init_poses = db.feat[np.asarray(init_seqs), np.asarray(init_frms),
                             db.n_aud:]
        blocks, _ = _search_motion_batch_jit(
            self._feat_d, self._motion_d, self._mask_d,
            jnp.asarray(feats.astype(np.float32)),
            jnp.asarray(init_poses),
            jnp.asarray(desired_ks, jnp.int32),
            db.n_aud, step, n_steps)
        width = max(1 + n_steps * step, n_frames + 1)
        out = np.zeros((C, db.motion.shape[2], width), np.float32)
        flat = np.asarray(blocks).reshape(C, n_steps * step, -1)
        out[:, :, 1:1 + n_steps * step] = flat.transpose(0, 2, 1)
        return out[:, :, 1:1 + n_frames]


def search_fake_motion_np(db: GestureKNNData, feat_test: np.ndarray,
                          desired_k: int = 0) -> np.ndarray:
    """Audio-only search (search_fake_motion, GestureKNN.py:214-296), used
    to synthesize mismatched motion for ResyncNet training: per step, rank
    database sequences by the cosine distance between the step's audio
    feature and each sequence's best frame; no pose chaining."""
    n_aud, step = db.n_aud, db.step_sz
    K, L = db.feat.shape[:2]
    n_frames = feat_test.shape[1]
    pred = np.zeros((db.motion.shape[2], n_frames), np.float32)
    j = 0
    while j < n_frames:
        q = feat_test[:, j]
        nq = np.linalg.norm(q) or 1.0
        pos_dist = np.full(K, np.inf, np.float32)
        frame_sel = np.zeros(K, np.int64)
        for k in range(K):
            if db.control_mask[k].sum() == 0:
                continue
            cand = db.feat[k, :, :n_aud]
            nc = np.linalg.norm(cand, axis=1)
            nc = np.where(nc > 0, nc, 1.0)
            d = 1.0 - (cand @ (q / nq)) / nc
            ok = _valid_frames(d, db.control_mask[k], step)
            if not ok.any():
                continue
            dm = np.where(ok, d, np.inf)
            f = int(np.argmin(dm))
            pos_dist[k] = dm[f]
            frame_sel[k] = f
        order = np.argsort(rank_np(pos_dist), kind="stable")
        sel = int(order[min(desired_k, K - 1)])
        f = frame_sel[sel]
        blk = db.motion[sel, f:f + step].T
        w = min(blk.shape[1], n_frames - j)
        pred[:, j:j + w] = blk[:, :w]
        j += step
    return pred


def fake_training_pairs(db: GestureKNNData, feat_tests: np.ndarray,
                        rng: np.random.RandomState) -> np.ndarray:
    """Stochastic-k fake motion for a batch of test features
    (predict_gesture_from_audio fake path, GestureKNN.py:330-335)."""
    ks = desired_k_distribution(feat_tests.shape[0], rng)
    return np.stack([search_fake_motion_np(db, feat_tests[i], int(ks[i]))
                     for i in range(feat_tests.shape[0])])


def desired_k_distribution(n: int, rng: np.random.RandomState) -> np.ndarray:
    """The stochastic k sampling of predict_gesture_from_audio
    (GestureKNN.py:330-331): P(k=0)=0.5, remainder uniform over 1..14."""
    p = [0.5] + [0.5 / 14] * 14
    return rng.choice(15, n, p=p)
