"""Database-sharded candidate search.

For databases too large for one chip's HBM (or to cut latency), the candidate
feature tensors shard over the 'data' mesh axis along the sequence (J)
dimension; each device reduces its shard to per-code (min distance, argmin)
and the shards combine with a two-pass pmin that preserves the reference's
first-in-scan-order tie-break (GestureKNN.py:686-689) globally. Only the
small code/continuation tables stay replicated for the final gathers. This
is the TPU equivalence of the role NCCL would have played in the reference's
inert distributed scaffolding (SURVEY §2.8).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..core.config import MatchConfig
from ..match.database import MatchDatabase
from ..match.engine import (DeviceTables, _phase_starts,
                            cosine_distance_matrix, cosine_distance_prenorm,
                            matmul_precision, segment_min_argmin,
                            string_distance_matrix, tables_from_minargs)
from .mesh import DATA_AXIS, pad_to_multiple

_BIG = np.int32(2 ** 30)


def _shard_reduce(cfg: MatchConfig, q, db_feat, db_codes, valid, axis: str,
                  is_strings: bool, B: int, precision: str = "highest"):
    """Runs per device inside shard_map: local distances + segment reduction,
    then cross-device min with scan-order ties. String distances go through
    the engine's shared dispatch (wavvq 'sum' layout + the Pallas kernel on
    real TPUs)."""
    Js = db_feat.shape[0]
    if is_strings:
        dist = string_distance_matrix(q, db_feat)
    else:
        flat = db_feat.reshape(Js * B, db_feat.shape[-1])
        if flat.dtype != jnp.float32:
            # low-precision residency (cfg.feat_dtype): the shard arrives
            # pre-normalized + cast from sharded_candidate_reduce
            dist = cosine_distance_prenorm(q, flat,
                                           matmul_precision(precision))
        else:
            dist = cosine_distance_matrix(q, flat,
                                          matmul_precision(precision))
    dist = jnp.where(valid.reshape(1, Js * B), dist, jnp.inf)
    seg = db_codes.reshape(-1)
    mins, args, matched = segment_min_argmin(
        dist, seg, cfg.codebook_size, cfg.unmatched_dist)
    # local flat index -> global flat index
    shard = jax.lax.axis_index(axis)
    args_global = args + shard * (Js * B)
    args_global = jnp.where(matched, args_global, _BIG)
    mins = jnp.where(matched, mins, jnp.inf)

    gmin = jax.lax.pmin(mins, axis)
    cand = jnp.where(mins == gmin, args_global, _BIG)
    garg = jax.lax.pmin(cand, axis)
    gmatched = jnp.isfinite(gmin)
    gmin = jnp.where(gmatched, gmin, cfg.unmatched_dist)
    garg = jnp.where(gmatched, garg, 0)
    return gmin, garg, gmatched


from functools import lru_cache


@lru_cache(maxsize=None)
def _sharded_reduce_fn(cfg: MatchConfig, mesh: Mesh, is_strings: bool,
                       B: int, precision: str):
    """Jitted shard_map, cached per (cfg, mesh, mode, B): rebuilding the
    jit object per call would re-trace (and through a relay, re-lower)
    every predict_sharded instead of hitting the compile cache."""
    fn = shard_map(
        partial(_shard_reduce, cfg, axis=DATA_AXIS, is_strings=is_strings,
                B=B, precision=precision),
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=(P(), P(), P()),
        check_rep=False)
    return jax.jit(fn)


def sharded_candidate_reduce(cfg: MatchConfig, mesh: Mesh,
                             queries: np.ndarray, feat: np.ndarray,
                             codes: np.ndarray, is_strings: bool,
                             precision: str = "highest",
                             residency_dtype: str = "float32"):
    """queries: (Q, D) or (Q, L)/(Q, G, L) int strings; feat: (J, B, ...);
    codes: (J, B). Returns (mins (Q, K), args (Q, K) global flat index,
    matched) with the J axis sharded across the mesh.

    residency_dtype: per-TENSOR HBM dtype — the audio caller passes
    cfg.feat_dtype; the text side always stays f32 (matching
    device_match_db's single-chip residency policy)."""
    n_dev = mesh.devices.size
    J, B = codes.shape
    if not is_strings and residency_dtype != "float32":
        # host f32-normalize + cast — the SAME helper device_match_db's
        # single-chip residency mode uses, so both paths stage
        # bit-identical feature rows (and neither pays the 2x f32
        # device-normalize staging peak)
        from ..match.engine import stage_cosine_features
        flat = stage_cosine_features(
            feat.reshape(-1, feat.shape[-1]), residency_dtype)
        feat = flat.reshape(feat.shape)
    feat_p, _ = pad_to_multiple(feat, n_dev)
    codes_p, _ = pad_to_multiple(codes, n_dev)
    valid = np.zeros((feat_p.shape[0], B), bool)
    valid[:J] = True

    q = jax.device_put(jnp.asarray(queries),
                       NamedSharding(mesh, P()))
    fn = _sharded_reduce_fn(cfg, mesh, is_strings, B, precision)
    mins, args, matched = fn(q, jnp.asarray(feat_p),
                             jnp.asarray(codes_p),
                             jnp.asarray(valid))
    return mins, args, matched


def build_sharded_tables(cfg: MatchConfig, db: MatchDatabase, mesh: Mesh,
                         test_audio: Optional[np.ndarray],
                         test_context: Optional[np.ndarray]) -> DeviceTables:
    """Sharded-database version of engine.build_device_tables — identical
    outputs, J-sharded distance work."""
    aud = txt = (None,) * 5
    n_steps = 0
    if cfg.use_aud:
        W, S = test_audio.shape[:2]
        n_steps = S
        q = test_audio.reshape(W * S, *test_audio.shape[2:])
        if cfg.audio_mode == "wavvq_feat":
            feat, is_str = db.aud_strings, True
        else:
            feat, is_str = db.aud_feat, False
        mins, args, matched = sharded_candidate_reduce(
            cfg, mesh, q, feat, db.aud_codes, is_str,
            cfg.cosine_precision,
            residency_dtype="float32" if is_str else cfg.feat_dtype)
        aud = tables_from_minargs(cfg, mins, args, matched,
                                  jnp.asarray(db.aud_blocks),
                                  jnp.asarray(_phase_starts(db.aud_frames)))
    if cfg.use_txt:
        W, S = test_context.shape[:2]
        n_steps = S
        q = test_context.reshape(W * S, -1)
        mins, args, matched = sharded_candidate_reduce(
            cfg, mesh, q, db.txt_feat, db.txt_codes, False)
        txt = tables_from_minargs(cfg, mins, args, matched,
                                  jnp.asarray(db.txt_blocks),
                                  jnp.asarray(_phase_starts(db.txt_frames)))
    return DeviceTables(aud_rank=aud[0], aud_block=aud[1], aud_seq=aud[2],
                        aud_start=aud[3], txt_rank=txt[0], txt_block=txt[1],
                        txt_seq=txt[2], txt_start=txt[3], n_steps=n_steps,
                        aud_pos=aud[4], txt_pos=txt[4])


def sharded_min_reduce_demo(mesh: Mesh) -> None:
    """Tiny self-check used by the multichip dry run: sharded reduction must
    equal the single-device reduction."""
    rng = np.random.RandomState(0)
    cfg = MatchConfig(codebook_size=16, use_txt=False, use_phase=False)
    J, B, D, Q = 8, 4, 32, 3
    feat = rng.randn(J, B, D).astype(np.float32)
    codes = rng.randint(0, 16, size=(J, B)).astype(np.int32)
    q = rng.randn(Q, D).astype(np.float32)
    mins, args, matched = sharded_candidate_reduce(cfg, mesh, q, feat, codes,
                                                   False)
    dist = np.asarray(cosine_distance_matrix(
        jnp.asarray(q), jnp.asarray(feat.reshape(J * B, D))))
    ref_m, ref_a, ref_ok = segment_min_argmin(
        jnp.asarray(dist), jnp.asarray(codes.reshape(-1)), 16,
        cfg.unmatched_dist)
    np.testing.assert_allclose(np.asarray(mins), np.asarray(ref_m),
                               atol=1e-5)
    ok = np.asarray(ref_ok)
    np.testing.assert_array_equal(np.asarray(args)[ok], np.asarray(ref_a)[ok])
