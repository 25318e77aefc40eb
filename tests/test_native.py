"""Native runtime tests: C++ Levenshtein vs the same C library the reference
uses, record store round trip (native + python fallback), float parsing."""
import numpy as np
import pytest

from qpgesture_tpu.utils import native


def test_builds():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("g++ unavailable")
    assert lib is not None


def test_levenshtein_native_vs_c_library(rng):
    Levenshtein = pytest.importorskip("Levenshtein")
    a = rng.randint(0, 640, size=(5, 11)).astype(np.int32)
    b = rng.randint(0, 640, size=(9, 11)).astype(np.int32)
    b[2] = a[1]
    got = native.levenshtein_matrix_native(a, b)
    for i in range(5):
        for j in range(9):
            sa = "".join(chr(int(x)) for x in a[i])
            sb = "".join(chr(int(x)) for x in b[j])
            assert got[i, j] == Levenshtein.distance(sa, sb)


def test_parse_floats(rng):
    vals = rng.randn(1000)
    text = " ".join("%.6f" % v for v in vals)
    out = native.parse_floats_native(text, 1000)
    np.testing.assert_allclose(out, np.round(vals, 6), atol=1e-9)


def test_record_store_roundtrip(tmp_path, rng):
    path = str(tmp_path / "store.qpg")
    writer = native.RecordStore.create(path)
    records = [rng.bytes(rng.randint(1, 5000)) for _ in range(20)]
    for r in records:
        writer.append(r)
    assert writer.finalize() == 20
    store = native.RecordStore.open(path)
    assert len(store) == 20
    for i, r in enumerate(records):
        assert store[i] == r
    store.close()


def test_record_store_python_fallback(tmp_path, rng):
    """The pure-python reader must read native-written stores and vice
    versa (same on-disk format)."""
    path = str(tmp_path / "store2.qpg")
    writer = native._PyStoreWriter(path)
    records = [bytes([i]) * (i + 1) for i in range(5)]
    for r in records:
        writer.append(r)
    writer.finalize()
    # python reader
    store = native._PyStore(path)
    for i, r in enumerate(records):
        assert store[i] == r
    store.close()
    # native reader, if built
    if native.get_lib() is not None:
        store = native.RecordStore.open(path)
        for i, r in enumerate(records):
            assert store[i] == r
        store.close()


def test_clips_store_roundtrip(tmp_path, rng):
    """Training clips through the native store -> windowed dataset."""
    from qpgesture_tpu.train.data import (WindowedDataset, clips_to_store,
                                          store_to_dataset)
    clips = [{"poses": rng.randn(300, 9).astype(np.float32),
              "audio": rng.randn(80000).astype(np.float32)},
             {"poses": rng.randn(280, 9).astype(np.float32),
              "audio": rng.randn(74000).astype(np.float32)}]
    path = str(tmp_path / "clips.qpg")
    assert clips_to_store(clips, path) == 2
    ds = store_to_dataset(path, n_poses=40, stride=20)
    direct = WindowedDataset.from_clips(clips, n_poses=40, stride=20)
    np.testing.assert_array_equal(ds.poses, direct.poses)
    np.testing.assert_array_equal(ds.audio, direct.audio)
    # mixed audio presence would misalign pose/audio rows -> must raise
    mixed = [clips[0], {"poses": clips[1]["poses"], "audio": None}]
    import pytest
    with pytest.raises(ValueError, match="mixed audio"):
        WindowedDataset.from_clips(mixed, n_poses=40, stride=20)


def test_record_store_rejects_truncated(tmp_path, rng):
    """A truncated/corrupt store must fail to open (the reader validates
    the tail index against the mapped size), not read out of bounds."""
    from qpgesture_tpu.utils import native
    if native.get_lib() is None:
        import pytest
        pytest.skip("native lib unavailable")
    path = str(tmp_path / "store3.qpg")
    w = native.RecordStore.create(path)
    for i in range(5):
        w.append(bytes([i]) * 100)
    w.finalize()
    blob = open(path, "rb").read()
    # truncate mid-index: tail (n, index_off) now points past the file
    trunc = str(tmp_path / "trunc.qpg")
    with open(trunc, "wb") as f:
        f.write(blob[:len(blob) - 24])
    import pytest
    with pytest.raises(OSError):
        native.RecordStore.open(trunc)
    # corrupt index_off
    bad = bytearray(blob)
    bad[-8:] = (2 ** 62).to_bytes(8, "little")
    corrupt = str(tmp_path / "corrupt.qpg")
    with open(corrupt, "wb") as f:
        f.write(bytes(bad))
    with pytest.raises(OSError):
        native.RecordStore.open(corrupt)
    # the pure-python fallback reader must enforce the SAME contract
    for broken in (trunc, corrupt):
        with pytest.raises(OSError):
            native._PyStore(broken)
    ok = native._PyStore(path)
    assert len(ok) == 5 and ok[2] == bytes([2]) * 100
    ok.close()


def test_pitch_world_native_matches_python():
    """The C++ DIO+StoneMask must agree with the NumPy transcription on
    speech-shaped signals: identical voiced/unvoiced masks and <1e-6
    relative f0 on voiced frames (closing the pyworld-parity caveat with a
    cross-implementation check; pyworld itself is absent in this image)."""
    from qpgesture_tpu.pipelines.pitch_world import dio, stonemask
    from qpgesture_tpu.utils.native import get_lib, pitch_world_native
    if get_lib() is None:
        import pytest
        pytest.skip("native library unavailable")

    sr, hop = 16000, 256
    rng = np.random.RandomState(5)
    t = np.arange(sr * 2) / sr
    # vib: peak instantaneous-frequency deviation in Hz (at 1.5 Hz rate)
    for trial, (f0_true, vib) in enumerate([(120.0, 3.0), (220.0, 0.0),
                                            (95.0, 5.0)]):
        phase = 2 * np.pi * (f0_true * t + vib / (2 * np.pi * 1.5)
                             * np.sin(2 * np.pi * 1.5 * t))
        wav = (0.6 * np.sin(phase) + 0.25 * np.sin(2 * phase)
               + 0.1 * np.sin(3 * phase))
        # unvoiced head/tail + noise floor
        wav[: sr // 4] = 0.005 * rng.randn(sr // 4)
        wav[-sr // 4:] = 0.005 * rng.randn(sr // 4)
        wav += 0.002 * rng.randn(len(wav))

        fp = hop / sr * 1000.0
        f0_py, pos = dio(wav, sr, frame_period=fp)
        f0_py = stonemask(wav, f0_py, pos, sr)
        f0_c = pitch_world_native(wav, sr, frame_period=fp)
        assert f0_c is not None and f0_c.shape == f0_py.shape
        voiced_py = f0_py > 0
        voiced_c = f0_c > 0
        np.testing.assert_array_equal(voiced_py, voiced_c,
                                      err_msg=f"trial {trial} voicing mask")
        if voiced_py.any():
            rel = np.abs(f0_c[voiced_py] - f0_py[voiced_py]) \
                / f0_py[voiced_py]
            assert rel.max() < 1e-6, (trial, rel.max())
        # sanity: the tracker actually locks onto the true pitch
        mid = voiced_py & (np.arange(len(f0_py)) > len(f0_py) // 3) \
            & (np.arange(len(f0_py)) < 2 * len(f0_py) // 3)
        if mid.any():
            assert abs(np.median(f0_py[mid]) - f0_true) < 0.15 * f0_true
