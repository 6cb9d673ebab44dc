"""Audio fingerprinting + fingerprint-keyed near-dup clustering.

Brings the dedup discipline the text side already has (sha / MinHash /
SimHash families, operators/dedup.py) to the AUDIO column: a compact
integer fingerprint per asset, then exact-key clustering on the
pitch-shaped half of the fingerprint — the classic cheap acoustic-id
basis (frame energy + zero-crossing rate; ZCR is the standard integer
pitch proxy, energy the loudness envelope — see Wang'03 §2 for the
landmark family this simplifies). Everything is INTEGER, so a DuckDB
oracle recomputes the fingerprints from the synthesis formula alone.

Fingerprint layout over the first ``n_frames`` non-overlapping frames
of ``frame_len`` mono samples:

- ``energy_fp``: per frame, hex(min(15, bit_length(mean_abs))) where
  mean_abs = sum(|x|) // frame_len — a log2 loudness nibble;
- ``zcr_fp``: per frame, hex(min(15, internal sign transitions)) — a
  pitch nibble. Transitions are counted strictly inside the frame
  (pairs k-1,k for k in 1..frame_len-1), so frames are independent.

Near-dup rule: assets with the SAME ``zcr_fp`` (same pitch contour,
any loudness/duration) form a cluster keyed by the min asset id —
mirroring exact_dedup's min-id survivor rule. Loudness-invariance is
the point: re-encoded/re-mastered copies keep their pitch contour.

Scale shape: fingerprinting is one Arrow-batched mapInPandas over the
binary column (no shuffle); clustering is one groupBy on the fp key
(uniform hex keys — the same profile as sha-keyed exact dedup) plus an
equi-join back. No window, no driver state, no collect.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

FP_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("energy_fp", StringType(), False),
        StructField("zcr_fp", StringType(), False),
    ]
)


def audio_fingerprint(
    assets: DataFrame, frame_len: int = 64, n_frames: int = 6
) -> DataFrame:
    """(asset_id, energy_fp, zcr_fp) per decodable audio asset.

    Assets shorter than ``frame_len * n_frames`` mono samples are
    SKIPPED (a fingerprint over padding would collide everything), as
    are undecodable payloads — never task-fatal. Multi-channel audio
    fingerprints channel 0."""
    from finetoo_sp_spark.codecs.wav import decode_wav
    from struct import error as struct_error

    need = frame_len * n_frames

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            recs = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                try:
                    _, _, _, samples = decode_wav(bytes(payload))
                except (ValueError, NotImplementedError, struct_error):
                    continue
                mono = samples[:, 0]  # decode_wav: (n_frames, n_channels)
                if mono.shape[0] < need:
                    continue
                fr = mono[:need].astype(np.int64).reshape(n_frames, frame_len)
                mean_abs = np.abs(fr).sum(axis=1) // frame_len
                eq = [min(15, int(m).bit_length()) for m in mean_abs]
                sign_flip = (fr[:, 1:] >= 0) != (fr[:, :-1] >= 0)
                zq = np.minimum(15, sign_flip.sum(axis=1))
                recs.append(
                    (
                        asset_id,
                        "".join("%X" % v for v in eq),
                        "".join("%X" % v for v in zq),
                    )
                )
            yield pd.DataFrame(
                recs, columns=["asset_id", "energy_fp", "zcr_fp"]
            )

    return assets.select("asset_id", "payload").mapInPandas(run, schema=FP_SCHEMA)


def audio_dup_clusters(
    assets: DataFrame, frame_len: int = 64, n_frames: int = 6
) -> DataFrame:
    """(asset_id, energy_fp, zcr_fp, cluster_id, n_cluster): cluster =
    all assets sharing a pitch contour (zcr_fp), keyed by min asset id.
    ``n_cluster`` sizes the cluster; keep/drop policy composes on top
    exactly as with exact_dedup (keep = asset_id == cluster_id)."""
    fp = audio_fingerprint(assets, frame_len, n_frames)
    clusters = fp.groupBy("zcr_fp").agg(
        F.min("asset_id").alias("cluster_id"),
        F.count(F.lit(1)).alias("n_cluster"),
    )
    return fp.join(clusters, "zcr_fp").select(
        "asset_id", "energy_fp", "zcr_fp", "cluster_id", "n_cluster"
    )
