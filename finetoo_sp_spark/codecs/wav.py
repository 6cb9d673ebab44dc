"""Pure-stdlib RIFF/WAVE PCM codec (decode + deterministic encoder).

The audio leg of the multimodal column: WAV is the one audio container
that needs no entropy codec (raw PCM frames behind a chunked RIFF
header), so — like codecs/png.py for images — a complete, exact
decoder is feasible with numpy alone, and compressed formats (MP3,
Opus, AAC) raise so corpus kernels skip rather than die.

Format per RIFF 1991 spec / RFC 2361 WAVE taxonomy: 'RIFF' size 'WAVE'
then chunks; 'fmt ' carries (audio_format, channels, sample_rate,
byte_rate, block_align, bits); 'data' carries interleaved PCM frames.
Only audio_format=1 (integer PCM, 8/16/32-bit) decodes here.

Everything is numpy ``frombuffer`` views — no per-sample Python.
"""

from __future__ import annotations

import struct

import numpy as np


class WavError(ValueError):
    pass


def decode_wav(b: bytes) -> tuple[int, int, int, np.ndarray]:
    """Parse a PCM WAV file.

    Returns (sample_rate, n_channels, bits_per_sample, samples) where
    ``samples`` is an int32 array of shape (n_frames, n_channels)
    (8-bit unsigned PCM is centered to signed per the WAV convention).
    Raises :class:`WavError` on anything that is not integer-PCM WAVE —
    including truncated chunks — so callers can skip, not crash.
    """
    if len(b) < 12 or b[0:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise WavError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        (size,) = struct.unpack_from("<I", b, pos + 4)
        body = b[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise WavError(f"truncated chunk {cid!r}")
        if cid == b"fmt ":
            if size < 16:
                raise WavError("fmt chunk too short")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise WavError("missing fmt or data chunk")
    audio_format, channels, rate, _byte_rate, _block_align, bits = fmt
    if audio_format != 1:
        raise WavError(f"non-PCM audio_format {audio_format} (compressed?)")
    if channels < 1 or rate < 1:
        raise WavError("bad fmt fields")
    if bits == 16:
        samples = np.frombuffer(data, dtype="<i2").astype(np.int32)
    elif bits == 8:
        samples = np.frombuffer(data, dtype=np.uint8).astype(np.int32) - 128
    elif bits == 32:
        samples = np.frombuffer(data, dtype="<i4").astype(np.int32)
    else:
        raise WavError(f"unsupported bits_per_sample {bits}")
    n_frames = len(samples) // channels
    return rate, channels, bits, samples[: n_frames * channels].reshape(
        n_frames, channels
    )


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Deterministic 16-bit PCM WAV writer (mono or multichannel).

    ``samples``: int array, shape (n_frames,) or (n_frames, channels),
    values in int16 range. Byte-stable across runs — the synthetic
    corpus generator and pytest fixtures depend on that.
    """
    s = np.asarray(samples)
    if s.ndim == 1:
        s = s[:, None]
    channels = s.shape[1]
    pcm = s.astype("<i2").tobytes()
    block_align = channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * block_align, block_align, 16
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(pcm)) + pcm
    return b"RIFF" + struct.pack("<I", len(body)) + body
