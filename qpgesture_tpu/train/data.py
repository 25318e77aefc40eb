"""Host input pipeline: windowed pose/audio samples from plain arrays.

Replaces the reference's LMDB + pyarrow two-stage cache
(codebook/data_loader/lmdb_data_loader.py:20-74, data_preprocessor.py:30-106)
with a memory-mapped npz/npy store: clips are windowed with the same
MINLEN / stride arithmetic, normalized with the dataset mean/std
(clip(std, 0.01)), and batched with a seeded shuffle.
"""
from __future__ import annotations

import math
import os
from dataclasses import dataclass
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np


def window_clip(poses: np.ndarray, audio: Optional[np.ndarray],
                n_poses: int, stride: int, fps: int = 60,
                sr: int = 16000) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Slice one clip into windows (DataPreprocessor.
    _sample_from_clip_allspeakers, data_preprocessor.py:55-106):
    num_subdivision = floor((MINLEN - n_poses) / stride) + 1; audio windows
    are aligned by fraction-of-clip, length n_poses/fps*sr."""
    minlen = len(poses)
    if audio is not None:
        minlen = min(minlen, int(len(audio) * fps / sr))
    n_sub = math.floor((minlen - n_poses) / stride) + 1
    if n_sub <= 0:
        empty_a = None if audio is None else np.zeros((0, 0), audio.dtype)
        return np.zeros((0, n_poses) + poses.shape[1:], poses.dtype), empty_a
    pose_wins = np.stack([poses[i * stride:i * stride + n_poses]
                          for i in range(n_sub)])
    audio_wins = None
    if audio is not None:
        alen = int(n_poses / fps * sr)
        outs = []
        for i in range(n_sub):
            start = math.floor(i * stride / len(poses) * len(audio))
            seg = audio[start:start + alen]
            if len(seg) < alen:
                seg = np.pad(seg, (0, alen - len(seg)))
            outs.append(seg)
        audio_wins = np.stack(outs)
    return pose_wins, audio_wins


@dataclass
class WindowedDataset:
    """In-memory/memmap window store with z-normalization and batching."""
    poses: np.ndarray                     # (N, n_poses, C)
    audio: Optional[np.ndarray] = None    # (N, samples)
    codes: Optional[np.ndarray] = None    # (N, n_codes)
    data_mean: Optional[np.ndarray] = None
    data_std: Optional[np.ndarray] = None

    def __len__(self) -> int:
        return self.poses.shape[0]

    def normalized_poses(self) -> np.ndarray:
        if self.data_mean is None:
            return self.poses
        std = np.clip(self.data_std, 0.01, None)
        return (self.poses - self.data_mean) / std

    def batches(self, batch_size: int, *, shuffle: bool = True,
                seed: int = 0, drop_last: bool = True,
                include: Sequence[str] = ("poses",)
                ) -> Iterator:
        n = len(self)
        order = np.arange(n)
        if shuffle:
            np.random.RandomState(seed).shuffle(order)
        # normalize per batch AFTER the fancy-index gather: normalizing the
        # whole store up front would materialize a full float copy of a
        # (possibly memory-mapped) dataset on every epoch
        std = None if self.data_mean is None \
            else np.clip(self.data_std, 0.01, None)
        stop = n - (n % batch_size) if drop_last else n
        for s in range(0, stop, batch_size):
            idx = order[s:s + batch_size]
            out = []
            for key in include:
                if key == "poses":
                    p = np.asarray(self.poses[idx], np.float32)
                    if std is not None:
                        p = (p - self.data_mean) / std
                    out.append(p.astype(np.float32))
                elif key == "audio":
                    out.append(self.audio[idx].astype(np.float32))
                elif key == "codes":
                    out.append(self.codes[idx].astype(np.int32))
            yield out[0] if len(out) == 1 else tuple(out)

    @classmethod
    def from_clips(cls, clips: List[dict], n_poses: int, stride: int,
                   fps: int = 60, data_mean=None, data_std=None
                   ) -> "WindowedDataset":
        """clips: [{'poses': (T, C), 'audio': (S,) or None}, ...].

        Audio presence must be uniform across clips: mixing audio and
        audio-less clips would silently misalign the concatenated pose and
        audio rows (row i of `audio` would belong to a different clip than
        row i of `poses`)."""
        pose_list, audio_list = [], []
        for clip in clips:
            p, a = window_clip(clip["poses"], clip.get("audio"), n_poses,
                               stride, fps)
            if len(p):
                pose_list.append(p)
                if a is not None:
                    audio_list.append(a)
        if audio_list and len(audio_list) != len(pose_list):
            raise ValueError(
                f"{len(audio_list)} of {len(pose_list)} windowed clips have "
                "audio; mixed audio presence would misalign pose/audio rows "
                "— provide audio for every clip or for none")
        poses = np.concatenate(pose_list) if pose_list else \
            np.zeros((0, n_poses, clips[0]["poses"].shape[-1]))
        audio = np.concatenate(audio_list) if audio_list else None
        return cls(poses=poses, audio=audio,
                   data_mean=None if data_mean is None
                   else np.asarray(data_mean),
                   data_std=None if data_std is None
                   else np.asarray(data_std))

    def save(self, directory: str) -> None:
        os.makedirs(directory, exist_ok=True)
        np.save(os.path.join(directory, "poses.npy"), self.poses)
        if self.audio is not None:
            np.save(os.path.join(directory, "audio.npy"), self.audio)
        if self.codes is not None:
            np.save(os.path.join(directory, "codes.npy"), self.codes)
        if self.data_mean is not None:
            np.savez(os.path.join(directory, "stats.npz"),
                     mean=self.data_mean, std=self.data_std)

    @classmethod
    def load(cls, directory: str, mmap: bool = True) -> "WindowedDataset":
        mode = "r" if mmap else None
        poses = np.load(os.path.join(directory, "poses.npy"), mmap_mode=mode)
        audio = codes = mean = std = None
        ap = os.path.join(directory, "audio.npy")
        if os.path.exists(ap):
            audio = np.load(ap, mmap_mode=mode)
        cp = os.path.join(directory, "codes.npy")
        if os.path.exists(cp):
            codes = np.load(cp, mmap_mode=mode)
        sp = os.path.join(directory, "stats.npz")
        if os.path.exists(sp):
            stats = np.load(sp)
            mean, std = stats["mean"], stats["std"]
        return cls(poses=poses, audio=audio, codes=codes,
                   data_mean=mean, data_std=std)


def clips_to_store(clips: List[dict], path: str) -> int:
    """Serialize raw clips into the native mmap RecordStore (the LMDB-cache
    replacement): each record is one clip's poses (+ audio) as raw npy
    bytes. Returns the record count."""
    import io

    from ..utils.native import RecordStore

    writer = RecordStore.create(path)
    for clip in clips:
        buf = io.BytesIO()
        np.savez(buf, poses=clip["poses"],
                 audio=clip.get("audio") if clip.get("audio") is not None
                 else np.zeros(0, np.float32))
        writer.append(buf.getvalue())
    return writer.finalize()


def store_to_dataset(path: str, n_poses: int, stride: int, fps: int = 60,
                     data_mean=None, data_std=None) -> "WindowedDataset":
    """Window every clip in a RecordStore into a WindowedDataset."""
    import io

    from ..utils.native import RecordStore

    store = RecordStore.open(path)
    clips = []
    for i in range(len(store)):
        data = np.load(io.BytesIO(store[i]))
        audio = data["audio"]
        clips.append({"poses": data["poses"],
                      "audio": audio if audio.size else None})
    store.close()
    return WindowedDataset.from_clips(clips, n_poses, stride, fps,
                                      data_mean, data_std)


class DeviceClipStore:
    """HBM-resident training input: raw clips ship to device ONCE and each
    batch's overlapping windows are gathered on device.

    The host pipeline (WindowedDataset.from_clips) materializes stride-32
    overlapping 240-frame windows — ~n_poses/stride times the raw clips —
    and re-uploads them every epoch. Like the phase extractor's device
    gather, this stores the concatenated raw clips in HBM (one upload for
    the whole run) and a jitted gather+normalize produces each batch from
    tiny (B,) start indices. Batches equal
    WindowedDataset.from_clips(...).batches(...) with the same seed to
    within one f32 ulp (XLA may fuse the normalize division; tested),
    minus the per-epoch link traffic.
    """

    def __init__(self, clips: List[dict], n_poses: int, stride: int,
                 data_mean=None, data_std=None):
        import jax
        import jax.numpy as jnp

        starts: List[int] = []
        offset = 0
        arrays = []
        for clip in clips:
            poses = np.asarray(clip["poses"])
            n_sub = math.floor((len(poses) - n_poses) / stride) + 1
            for i in range(max(n_sub, 0)):
                starts.append(offset + i * stride)
            arrays.append(poses)
            offset += len(poses)
        flat = np.concatenate(arrays).astype(np.float32)
        self.n_poses = n_poses
        self._starts = np.asarray(starts, np.int32)
        self._flat = jax.device_put(flat)
        mean = None if data_mean is None else np.asarray(data_mean,
                                                         np.float32)
        std = None if data_std is None else np.clip(
            np.asarray(data_std, np.float32), 0.01, None)

        def gather(flat_dev, idx):
            win = flat_dev[idx[:, None]
                           + jnp.arange(n_poses)[None, :]]  # (B, n_poses, C)
            if mean is not None:
                win = (win - mean) / std
            return win

        self._gather = jax.jit(gather)

    @classmethod
    def from_store(cls, path: str, n_poses: int, stride: int,
                   data_mean=None, data_std=None) -> "DeviceClipStore":
        """Build from a raw-clip RecordStore (clips_to_store output)."""
        import io

        from ..utils.native import RecordStore

        store = RecordStore.open(path)
        clips = [{"poses": np.load(io.BytesIO(store[i]))["poses"]}
                 for i in range(len(store))]
        store.close()
        return cls(clips, n_poses, stride, data_mean, data_std)

    def __len__(self) -> int:
        return len(self._starts)

    def batches(self, batch_size: int, *, shuffle: bool = True,
                seed: int = 0, drop_last: bool = True) -> Iterator:
        """Yields device-resident (B, n_poses, C) batches (normalized)."""
        import jax.numpy as jnp
        n = len(self)
        order = np.arange(n)
        if shuffle:
            np.random.RandomState(seed).shuffle(order)
        stop = n - (n % batch_size) if drop_last else n
        for s in range(0, stop, batch_size):
            idx = self._starts[order[s:s + batch_size]]
            yield self._gather(self._flat, jnp.asarray(idx))


def device_prefetch(batches: Iterator, size: int = 2) -> Iterator:
    """Overlap host->device transfer with compute: keep `size` batches in
    flight on device. Essential when the host link is slow (the batch upload
    otherwise serializes with the train step)."""
    import collections

    import jax

    queue = collections.deque()
    it = iter(batches)

    def put(batch):
        return jax.device_put(batch)

    try:
        for _ in range(size):
            queue.append(put(next(it)))
    except StopIteration:
        pass
    while queue:
        batch = queue.popleft()
        try:
            queue.append(put(next(it)))
        except StopIteration:
            pass
        yield batch


def dataset_stats(clips: List[dict]) -> Tuple[np.ndarray, np.ndarray]:
    """Per-channel mean/std over all frames of all clips — the numbers the
    reference prints for pasting into YAML (beat_data_to_lmdb.py:255-262)."""
    all_poses = np.concatenate([c["poses"] for c in clips], axis=0)
    return all_poses.mean(axis=0), all_poses.std(axis=0)
