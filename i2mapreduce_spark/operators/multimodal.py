"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design for image/audio/video at 100 TB:
- payloads are `binary` columns (or object-store URIs for >~1 MB blobs so
  the shuffle never carries them); metadata is a typed struct column
  (modality, width/height or sample_rate/duration, codec, byte length);
- decode / feature-extract / resize / frame-sample run as Arrow-batched
  mapInPandas stages so each Python worker amortizes library setup per
  batch, not per row;
- decoded features are fixed-width `array<float>` columns that flow into
  the similarity operators unchanged.

The decode step itself needs codec libraries that are NOT in this
container, so it is stubbed: `decode_stub` raises NotImplementedError
unless `fake=True`, where a clearly-marked deterministic fake produces
bytes-derived features — the Spark-side plumbing (schema, batching,
partitioning, UDF signatures) is real and tested either way.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F


def _round_half_away(x: float, nd: int = 4) -> float:
    """round-half-away-from-zero for non-negative x — DuckDB's double
    rounding rule (python round() is banker's and flips exact .xxxx5
    ties the other way, e.g. 0.03125 -> 0.0312 vs DuckDB's 0.0313)."""
    m = 10 ** nd
    return math.floor(x * m + 0.5) / m

#: metadata struct carried alongside every binary payload
META_SCHEMA = (
    "modality string, byte_len int, width int, height int, sample_rate int"
)


def attach_binary_payload(df: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """Fixture adapter: wrap a text column as an opaque binary payload with
    typed metadata, standing in for real image/audio bytes."""
    payload = F.col(text_col).cast("binary")
    meta = F.struct(
        F.lit("image").alias("modality"),
        F.length(payload).alias("byte_len"),
        (F.length(payload) % 64 + 1).alias("width"),
        (F.length(payload) % 48 + 1).alias("height"),
        F.lit(0).alias("sample_rate"),
    )
    # a row with no bytes is not a media row: drop it here so every
    # downstream decode/feature kernel sees only real payloads (their
    # oracles filter `text IS NOT NULL` identically)
    return df.select(
        F.col(id_col), payload.alias("payload"), meta.alias("meta")
    ).filter(F.col("payload").isNotNull())


def decode_stub(payload: bytes, modality: str, fake: bool = False) -> np.ndarray:
    """Decode one payload to a pixel/sample array.

    STUB: real decoding needs Pillow/av/soundfile, absent from this
    container.  fake=True returns a deterministic bytes-derived array so
    the distributed plumbing can be exercised end-to-end.
    """
    if not fake:
        raise NotImplementedError(
            "media codecs not available in this environment; "
            "pass fake=True for the deterministic test double"
        )
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
    return arr


def extract_features(df: DataFrame, dim: int = 16, fake: bool = True,
                     id_col: str = "doc_id") -> DataFrame:
    """Binary payload -> fixed-width feature vector via mapInPandas.

    Deterministic fake 'feature extractor': bucket byte histogram, L2
    normalized.  The stage shape (Arrow batch in, fixed array<double>
    out) is exactly what a real CLIP/audio embedder would use.
    """
    def extract(batches):
        for pdf in batches:
            ids, feats, lens = [], [], []
            for did, payload, meta in zip(
                pdf[id_col].values, pdf["payload"].values, pdf["meta"].values
            ):
                arr = decode_stub(bytes(payload), meta["modality"], fake=fake)
                hist, _ = np.histogram(arr % dim, bins=dim, range=(0, dim))
                v = hist.astype(np.float64)
                norm = np.linalg.norm(v)
                feats.append((v / norm if norm else v).round(6).tolist())
                ids.append(did)
                lens.append(int(meta["byte_len"]))
            yield pd.DataFrame({id_col: ids, "byte_len": lens, "feature": feats})

    return df.mapInPandas(
        extract, schema=f"{id_col} long, byte_len int, feature array<double>"
    )


def resize(df: DataFrame, out_w: int = 8, out_h: int = 6,
           fake: bool = True, id_col: str = "doc_id") -> DataFrame:
    """Image-resize stage shape: payload -> decode (stubbed) -> H x W
    pixel grid -> area-average pool to a fixed out_h x out_w grid, via
    Arrow-batched mapInPandas.  Output is reduced to scalars (pixel mean
    + two pooled corner cells) so downstream stays flat-columnar.

    The fake 'image' tiles the payload bytes to meta.height x meta.width
    (np.resize pad-by-repeat — deterministic); pooling uses integer bucket
    maps, so the result is exactly reproducible across partitionings.
    Every emitted value is a single exact-integer-sum / count quotient:
    one IEEE division, bit-identical in any engine — a mean over the 48
    bucket AVERAGES would instead be float-summation-order-sensitive and
    flaps 4dp rounding ties (observed on the fixtures).
    """
    def _resize(batches):
        for pdf in batches:
            ids, means, c00s, clasts = [], [], [], []
            for did, payload, meta in zip(
                pdf[id_col].values, pdf["payload"].values, pdf["meta"].values
            ):
                arr = decode_stub(bytes(payload), meta["modality"], fake=fake)
                h, w = int(meta["height"]), int(meta["width"])
                img = np.resize(arr, (h, w))
                ys = (np.arange(h) * out_h) // h
                xs = (np.arange(w) * out_w) // w
                pooled = np.zeros((out_h, out_w))
                cnt = np.zeros((out_h, out_w))
                np.add.at(pooled, (ys[:, None], xs[None, :]), img)
                np.add.at(cnt, (ys[:, None], xs[None, :]), 1.0)
                grid = pooled / np.maximum(cnt, 1.0)
                ids.append(did)
                means.append(_round_half_away(float(img.sum()) / img.size))
                c00s.append(_round_half_away(float(grid[0, 0])))
                clasts.append(_round_half_away(float(grid[-1, -1])))
            yield pd.DataFrame({
                id_col: ids, "px_mean": means, "px_c00": c00s, "px_last": clasts,
            })

    return df.mapInPandas(
        _resize,
        schema=f"{id_col} long, px_mean double, px_c00 double, px_last double",
    )


def phash(df: DataFrame, out_w: int = 8, out_h: int = 6,
          fake: bool = True, id_col: str = "doc_id") -> DataFrame:
    """Perceptual-hash stage shape: payload -> decode (stubbed) -> pool to
    an out_h x out_w grid -> one bit per cell (cell above the global
    pixel mean) packed into a 48-bit integer — the aHash family used for
    near-duplicate image detection at corpus scale (hamming distance on
    the hash replaces pixel comparison).

    Exactness: the bit test is the integer cross-multiplication
    cell_sum * total_count > total_sum * cell_count — no float division
    anywhere, so the hash is bit-identical in any engine/partitioning.
    Output: (doc_id, phash, n_bits)."""
    def _hash(batches):
        for pdf in batches:
            ids, hs, nb = [], [], []
            for did, payload, meta in zip(
                pdf[id_col].values, pdf["payload"].values, pdf["meta"].values
            ):
                arr = decode_stub(bytes(payload), meta["modality"], fake=fake)
                h, w = int(meta["height"]), int(meta["width"])
                img = np.resize(arr, (h, w)).astype(np.int64)
                ys = (np.arange(h) * out_h) // h
                xs = (np.arange(w) * out_w) // w
                sums = np.zeros((out_h, out_w), dtype=np.int64)
                cnts = np.zeros((out_h, out_w), dtype=np.int64)
                np.add.at(sums, (ys[:, None], xs[None, :]), img)
                np.add.at(cnts, (ys[:, None], xs[None, :]), 1)
                tot_s, tot_c = int(img.sum()), int(img.size)
                bits = (sums * tot_c) > (tot_s * cnts)
                val = 0
                for by in range(out_h):
                    for bx in range(out_w):
                        if bits[by, bx]:
                            val |= 1 << (by * out_w + bx)
                ids.append(did)
                hs.append(val)
                nb.append(int(bits.sum()))
            yield pd.DataFrame({id_col: ids, "phash": hs, "n_bits": nb})

    return df.mapInPandas(
        _hash, schema=f"{id_col} long, phash long, n_bits int"
    )


def frame_sample(df: DataFrame, every_n: int = 10, id_col: str = "doc_id") -> DataFrame:
    """Frame-sampling stage shape: one payload -> N frame rows (1->N
    explode through mapInPandas, like video frame extraction)."""
    def sample(batches):
        for pdf in batches:
            ids, frames, offsets = [], [], []
            for did, payload in zip(pdf[id_col].values, pdf["payload"].values):
                raw = bytes(payload)
                for off in range(0, len(raw), every_n):
                    ids.append(did)
                    offsets.append(off)
                    frames.append(raw[off:off + every_n])
            yield pd.DataFrame({id_col: ids, "frame_off": offsets, "frame": frames})

    return df.select(id_col, "payload").mapInPandas(
        sample, schema=f"{id_col} long, frame_off int, frame binary"
    )


AUDIO_FRAME = 64         # samples per analysis frame
AUDIO_MAX_FRAMES = 4     # analyze the first N complete frames


def audio_frame_energy(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Audio-analysis stage shape: payload -> PCM samples (stubbed
    decode: raw bytes as uint8 amplitudes) -> framewise RMS energy over
    the first 4 complete 64-sample frames, via Arrow-batched mapInPandas
    exploding 1 payload row into <=4 frame rows.

    RMS divides an exact integer sum-of-squares by the fixed frame size
    before one sqrt + 6 dp round, so the value is engine-reproducible.
    The real-decoder swap point is decode_stub, same as every other
    multimodal kernel here."""
    def energies(batches):
        for pdf in batches:
            ids, fidx, rms = [], [], []
            for did, payload, meta in zip(
                pdf[id_col].values, pdf["payload"].values, pdf["meta"].values
            ):
                arr = decode_stub(bytes(payload), meta["modality"], fake=True)
                n_frames = min(AUDIO_MAX_FRAMES, len(arr) // AUDIO_FRAME)
                for f in range(n_frames):
                    frame = arr[f * AUDIO_FRAME:(f + 1) * AUDIO_FRAME]
                    e = float(np.sqrt(np.sum(frame * frame) / AUDIO_FRAME))
                    ids.append(did)
                    fidx.append(f)
                    rms.append(_round_half_away(e, 6))
            yield pd.DataFrame({id_col: ids, "frame_idx": fidx, "rms": rms})

    return df.mapInPandas(
        energies, schema=f"{id_col} long, frame_idx int, rms double"
    )
