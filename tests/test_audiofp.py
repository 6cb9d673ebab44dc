"""Audio fingerprint: loudness invariance, pitch sensitivity, short/
undecodable-asset skipping, multi-channel handling. The corpus-level
value check is the audio_fingerprint_dups oracle row."""

from __future__ import annotations

import numpy as np
import pandas as pd

from finetoo_sp_spark.codecs.wav import encode_wav
from finetoo_sp_spark.operators.audiofp import (
    audio_dup_clusters,
    audio_fingerprint,
)


def _square(n, amp, period):
    t = np.arange(n)
    return np.where((t // (period // 2)) % 2 == 0, amp, -amp).astype(np.int16)


def _assets(spark, rows):
    pdf = pd.DataFrame(rows, columns=["asset_id", "payload"])
    return spark.createDataFrame(pdf, "asset_id long, payload binary")


def test_loudness_invariant_pitch_sensitive(spark):
    rows = [
        (0, encode_wav(_square(400, 1000, 8), 8000)),
        (1, encode_wav(_square(400, 3000, 8), 8000)),  # louder, same pitch
        (2, encode_wav(_square(400, 1000, 12), 8000)),  # same loud, new pitch
    ]
    out = {r["asset_id"]: r for r in audio_dup_clusters(_assets(spark, rows)).collect()}
    assert out[0]["zcr_fp"] == out[1]["zcr_fp"]
    assert out[0]["zcr_fp"] != out[2]["zcr_fp"]
    assert out[0]["energy_fp"] != out[1]["energy_fp"]
    assert out[0]["cluster_id"] == out[1]["cluster_id"] == 0
    assert out[0]["n_cluster"] == 2 and out[2]["n_cluster"] == 1


def test_short_and_garbage_assets_skipped(spark):
    rows = [
        (0, encode_wav(_square(400, 1000, 8), 8000)),
        (1, encode_wav(_square(100, 1000, 8), 8000)),  # < 6*64 samples
        (2, b"not a wav at all"),
    ]
    out = audio_fingerprint(_assets(spark, rows)).collect()
    assert [r["asset_id"] for r in out] == [0]


def test_fingerprint_values_hand_checked(spark):
    # period 8 (hp=4): internal crossings per 64-sample frame =
    # (64f+63)//4 - (64f)//4 = 15 for every f; amp 1000 -> bit_length 10.
    rows = [(7, encode_wav(_square(384, 1000, 8), 8000))]
    r = audio_fingerprint(_assets(spark, rows)).collect()[0]
    assert r["zcr_fp"] == "F" * 6
    assert r["energy_fp"] == "A" * 6  # hex(10)


def test_stereo_uses_channel_zero(spark):
    left = _square(400, 1000, 8)
    right = _square(400, 2000, 12)
    inter = np.empty(800, dtype=np.int16)
    inter[0::2], inter[1::2] = left, right
    # encode_wav writes mono; build a stereo RIFF by patching the fmt
    # header fields (channels=2, byte-rate and block-align doubled).
    raw = bytearray(encode_wav(inter, 8000))
    raw[22:24] = (2).to_bytes(2, "little")  # channels
    raw[28:32] = (8000 * 4).to_bytes(4, "little")  # byte rate
    raw[32:34] = (4).to_bytes(2, "little")  # block align
    mono = audio_fingerprint(_assets(spark, [(0, encode_wav(left, 8000))])).collect()[0]
    st = audio_fingerprint(_assets(spark, [(1, bytes(raw))])).collect()[0]
    assert st["zcr_fp"] == mono["zcr_fp"]
    assert st["energy_fp"] == mono["energy_fp"]
