"""ctypes bindings for the native audio runtime (native/pat_audio.cc).

Provides fast C++ WAV decode, windowed-sinc polyphase resampling and a
multithreaded batch decoder. ``Audio`` uses these when the shared library
is present (build with native/build.sh); otherwise the pure-numpy path in
core/io.py is used — behavior is identical, this is a throughput
optimization of the host decode stage (SURVEY.md §2.9).
"""

from __future__ import annotations

import ctypes
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

_LIB_PATH = Path(__file__).parent / "libpat_audio.so"
_lib = None

_CODEC_PATH = Path(__file__).parent / "libpat_codec.so"
_codec = None
_codec_failed = False


def _load_codec():
    """FFmpeg-backed any-format decoder (native/pat_codec.cc), optional."""
    global _codec, _codec_failed
    if _codec is not None or _codec_failed:
        return _codec
    if not _CODEC_PATH.exists():
        _codec_failed = True
        return None
    try:
        lib = ctypes.CDLL(str(_CODEC_PATH))
    except OSError:            # FFmpeg runtime libraries missing
        _codec_failed = True
        return None
    lib.pat_codec_info.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_longlong)]
    lib.pat_codec_info.restype = ctypes.c_int
    lib.pat_codec_decode_alloc.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.pat_codec_decode_alloc.restype = ctypes.c_longlong
    lib.pat_codec_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
    lib.pat_codec_free.restype = None
    lib.pat_codec_encode.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
        ctypes.c_longlong, ctypes.c_int, ctypes.c_int]
    lib.pat_codec_encode.restype = ctypes.c_int
    _codec = lib
    return lib


def codec_available() -> bool:
    return _load_codec() is not None


def codec_info(path: str) -> Optional[Tuple[int, int, int]]:
    """(sample_rate, channels, num_frames) for any FFmpeg-readable file.

    num_frames is exact for lossless codecs, duration-estimated for lossy
    ones (same contract as the reference's torchcodec metadata).
    """
    lib = _load_codec()
    if lib is None:
        return None
    sr = ctypes.c_int()
    ch = ctypes.c_int()
    n = ctypes.c_longlong()
    rc = lib.pat_codec_info(path.encode(), ctypes.byref(sr),
                            ctypes.byref(ch), ctypes.byref(n))
    if rc != 0:
        return None
    return sr.value, ch.value, n.value


def codec_encode(path: str, waveform: np.ndarray, sample_rate: int) -> bool:
    """Encode a (channels, frames) float32 waveform into any container
    FFmpeg can guess from the extension (.flac/.mp3/.ogg/...)."""
    lib = _load_codec()
    if lib is None:
        return False
    waveform = np.ascontiguousarray(waveform, dtype=np.float32)
    if waveform.ndim == 1:
        waveform = waveform[None]
    rc = lib.pat_codec_encode(
        str(path).encode(),
        waveform.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        waveform.shape[1], waveform.shape[0], int(sample_rate))
    return rc == 0


def codec_decode(path: str) -> Optional[Tuple[np.ndarray, int]]:
    """Decode any FFmpeg-readable file -> ((channels, frames) f32, rate)."""
    lib = _load_codec()
    if lib is None:
        return None
    buf = ctypes.POINTER(ctypes.c_float)()
    ch = ctypes.c_int()
    sr = ctypes.c_int()
    frames = lib.pat_codec_decode_alloc(path.encode(), ctypes.byref(buf),
                                        ctypes.byref(ch), ctypes.byref(sr))
    if frames < 0:
        return None
    try:
        out = np.ctypeslib.as_array(
            buf, shape=(ch.value, int(frames))).copy()
    finally:
        lib.pat_codec_free(buf)
    return out, sr.value


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.pat_wav_info.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_longlong)]
    lib.pat_wav_info.restype = ctypes.c_int
    lib.pat_wav_decode.argtypes = [
        ctypes.c_char_p, ctypes.c_longlong, ctypes.c_longlong,
        ctypes.POINTER(ctypes.c_float)]
    lib.pat_wav_decode.restype = ctypes.c_longlong
    lib.pat_resample.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_longlong, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_longlong]
    lib.pat_resample.restype = ctypes.c_longlong
    lib.pat_batch_decode_resample.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_longlong,
        ctypes.POINTER(ctypes.c_longlong)]
    lib.pat_batch_decode_resample.restype = ctypes.c_int
    if hasattr(lib, "pat_dpcm4_encode"):   # older checked-in .so builds
        lib.pat_dpcm4_encode.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_longlong,
            ctypes.c_longlong, ctypes.POINTER(ctypes.c_ubyte)]
        lib.pat_dpcm4_encode.restype = ctypes.c_longlong
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def wav_info(path: str) -> Optional[Tuple[int, int, int]]:
    """(sample_rate, channels, num_frames) or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    sr = ctypes.c_int()
    ch = ctypes.c_int()
    n = ctypes.c_longlong()
    rc = lib.pat_wav_info(path.encode(), ctypes.byref(sr),
                          ctypes.byref(ch), ctypes.byref(n))
    if rc != 0:
        return None
    return sr.value, ch.value, n.value


def wav_decode(path: str, frame_offset: int = 0,
               num_frames: int = -1) -> Optional[np.ndarray]:
    """Decode to (channels, frames) float32, or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    info = wav_info(path)
    if info is None:
        return None
    sr, ch, total = info
    if num_frames < 0:
        num_frames = total - frame_offset
    out = np.empty((ch, num_frames), dtype=np.float32)
    rc = lib.pat_wav_decode(
        path.encode(), frame_offset, num_frames,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc < 0:
        return None
    return out


def resample(waveform: np.ndarray, in_rate: int, out_rate: int
             ) -> Optional[np.ndarray]:
    """Per-channel windowed-sinc resample, or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    waveform = np.ascontiguousarray(waveform, dtype=np.float32)
    squeeze = waveform.ndim == 1
    if squeeze:
        waveform = waveform[None]
    out_len = int(waveform.shape[1] * out_rate / in_rate)
    out = np.empty((waveform.shape[0], out_len), dtype=np.float32)
    for c in range(waveform.shape[0]):
        n = lib.pat_resample(
            waveform[c].ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            waveform.shape[1], in_rate, out_rate,
            out[c].ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out_len)
        if n < 0:
            return None
    return out[0] if squeeze else out


def batch_decode_resample(paths: List[str], target_rate: int,
                          max_seconds: float
                          ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Parallel decode+downmix+resample into one (n, samples) buffer."""
    lib = _load()
    if lib is None:
        return None
    n = len(paths)
    max_len = int(max_seconds * target_rate)
    out = np.empty((n, max_len), dtype=np.float32)
    lengths = np.empty(n, dtype=np.int64)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rc = lib.pat_batch_decode_resample(
        arr, n, target_rate,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), max_len,
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)))
    if rc < 0:
        return None
    return out, lengths


def dpcm4_encode(waveform: np.ndarray, padded_len: int
                 ) -> Optional[np.ndarray]:
    """Block-adaptive 4-bit DPCM transport encode (native half of the
    TPU upload codec; see core/inference.py for layout + device decode).

    ``waveform`` is a mono (samples,) float32 array; ``padded_len`` must
    be a multiple of 256 and >= len(waveform) (the tail encodes digital
    silence). Returns a (padded_len//256, 132) uint8 block stream, or
    None when the shared library is unavailable.
    """
    lib = _load()
    if lib is None or not hasattr(lib, "pat_dpcm4_encode"):
        return None
    waveform = np.ascontiguousarray(waveform, dtype=np.float32)
    if waveform.ndim != 1 or padded_len % 256 or \
            waveform.shape[0] > padded_len:
        return None
    out = np.empty((padded_len // 256, 132), dtype=np.uint8)
    rc = lib.pat_dpcm4_encode(
        waveform.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        waveform.shape[0], padded_len,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)))
    if rc != out.size:
        return None
    return out
