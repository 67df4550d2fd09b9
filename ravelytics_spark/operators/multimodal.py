"""Multimodal column operators (SURVEY OP-X5): decode / feature-extract
/ resize / frame-sample over opaque ``binary`` columns.

The Spark-side plumbing is real and tested: schemas, Arrow-batched
``mapInPandas`` signatures, partition sizing. The pixel/sample decode
itself is STUBBED — image/audio codecs are not in this container — as a
deterministic fake keyed on content bytes, behind ``_decode_image_impl``
/ ``_decode_audio_impl``. Swapping in PIL/librosa changes ONE function
each; nothing in the distributed plan changes.

Batch shape: mapInPandas receives an iterator of pandas DataFrames
(one Arrow batch each); we re-batch nothing and emit one output row per
input row. Binary payloads dominate memory, so callers should
``repartition`` so that rows_per_partition × avg_asset_size fits the
executor (see ``partition_for_assets``).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("mean_luma", T.DoubleType()),
        T.StructField("phash", T.StringType()),
    ]
)

AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("rms", T.DoubleType()),
    ]
)

FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_phash", T.StringType()),
    ]
)


def _decode_image_impl(content: bytes) -> tuple[int, int, int, float, str]:
    """STUB decode — deterministic fake derived from the content hash.
    Production: ``img = PIL.Image.open(io.BytesIO(content))`` and return
    real (width, height, channels, mean luma, perceptual hash).
    """
    h = hashlib.sha256(content).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    return width, height, 3, h[2] / 255.0, h[:8].hex()


def _decode_audio_impl(content: bytes) -> tuple[float, int, float]:
    """STUB decode — deterministic fake. Production: librosa/soundfile."""
    h = hashlib.sha256(content).digest()
    return len(content) / 16000.0, 16000, h[0] / 255.0


def image_features(assets: DataFrame, decode=None) -> DataFrame:
    """Decode + feature-extract images: Arrow-batched mapInPandas over
    (path, content). Column pruning keeps non-selected asset columns out
    of the Arrow transfer.

    ``decode`` is the codec seam: any callable with the
    ``_decode_image_impl`` signature (bytes → (width, height,
    n_channels, mean_luma, phash)); it is captured by value into the
    mapInPandas closure, so a real PIL/pyvips decoder drops in WITHOUT
    touching the distributed plan (proven by a real pure-Python PNG
    decoder in tests/test_multimodal.py)."""
    decode = decode or _decode_image_impl

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode(bytes(c)) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "path": pdf["path"].values,
                    "width": [f[0] for f in feats],
                    "height": [f[1] for f in feats],
                    "n_channels": [f[2] for f in feats],
                    "mean_luma": [f[3] for f in feats],
                    "phash": [f[4] for f in feats],
                }
            )

    return assets.select("path", "content").mapInPandas(run, IMAGE_FEATURES_SCHEMA)


def audio_features(assets: DataFrame, decode=None) -> DataFrame:
    """Decode + feature-extract audio previews (the OP-S9 assets).
    ``decode``: codec seam, same contract as ``image_features`` —
    bytes → (duration_s, sample_rate, rms)."""
    decode = decode or _decode_audio_impl

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode(bytes(c)) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "path": pdf["path"].values,
                    "duration_s": [f[0] for f in feats],
                    "sample_rate": [f[1] for f in feats],
                    "rms": [f[2] for f in feats],
                }
            )

    return assets.select("path", "content").mapInPandas(run, AUDIO_FEATURES_SCHEMA)


def sample_frames(assets: DataFrame, every_n: int = 10, max_frames: int = 5) -> DataFrame:
    """Frame-sample a video column: one output row per sampled frame
    (row explosion happens INSIDE mapInPandas, so the binary decodes
    once per asset, not once per frame). STUB: frames are hash-derived."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            paths, idxs, hashes = [], [], []
            for path, content in zip(pdf["path"], pdf["content"]):
                h = hashlib.sha256(bytes(content)).digest()
                n = min(max_frames, 1 + h[3] % max_frames)
                for i in range(n):
                    paths.append(path)
                    idxs.append(i * every_n)
                    hashes.append(hashlib.sha256(h + bytes([i])).digest()[:8].hex())
            yield pd.DataFrame({"path": paths, "frame_idx": idxs, "frame_phash": hashes})

    return assets.select("path", "content").mapInPandas(run, FRAME_SAMPLE_SCHEMA)


def partition_for_assets(
    assets: DataFrame, avg_asset_bytes: int, target_partition_bytes: int = 128 << 20
) -> DataFrame:
    """Repartition so each task holds ~target_partition_bytes of binary
    payload — the knob that keeps Arrow batches inside executor memory
    at 100 TB (e.g. 5 MB images → ~26 rows/task at the 128 MB default)."""
    rows_per_partition = max(1, target_partition_bytes // max(1, avg_asset_bytes))
    n = assets.count()
    num = max(1, (n + rows_per_partition - 1) // rows_per_partition)
    return assets.repartition(num)


RESIZED_IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("src_width", T.IntegerType()),
        T.StructField("src_height", T.IntegerType()),
        T.StructField("out_width", T.IntegerType()),
        T.StructField("out_height", T.IntegerType()),
        T.StructField("content", T.BinaryType()),
    ]
)


def _encode_resized_impl(content: bytes, out_w: int, out_h: int) -> bytes:
    """STUB encode — deterministic fake payload keyed on (content,
    dims). Production: ``img.resize((out_w, out_h)).save(buf, 'JPEG')``
    and return ``buf.getvalue()``."""
    return hashlib.sha256(
        content + out_w.to_bytes(4, "big") + out_h.to_bytes(4, "big")
    ).digest()


def fit_box(w: int, h: int, max_w: int, max_h: int) -> tuple[int, int]:
    """Aspect-preserving fit into (max_w, max_h), never upscaling —
    the REAL resize geometry (integer floor like PIL.thumbnail), kept
    engine-side-testable and separate from the stubbed codec."""
    if w <= max_w and h <= max_h:
        return w, h
    scale = min(max_w / w, max_h / h)
    return max(1, int(w * scale)), max(1, int(h * scale))


def resize_images(
    assets: DataFrame,
    max_w: int = 256,
    max_h: int = 256,
    decode=None,
    encode=None,
) -> DataFrame:
    """Resize the image column into a bounding box (OP-X5 resize):
    Arrow-batched mapInPandas, one output row per input row, binary in
    → binary out, so the op composes with the same
    ``partition_for_assets`` sizing as the other asset maps. The fit
    geometry (aspect-preserving, never upscaling) is real; ``decode``
    / ``encode`` are the codec seams (same drop-in contract as
    ``image_features``: a real PIL decoder/encoder changes nothing in
    the distributed plan). At 100 TB this is the thumbnail stage of a
    vision-data pipeline: map-only, no shuffle, output partitions
    shrink with the payload."""
    decode = decode or _decode_image_impl
    encode = encode or _encode_resized_impl

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "path": [],
                "src_width": [],
                "src_height": [],
                "out_width": [],
                "out_height": [],
                "content": [],
            }
            for path, content in zip(pdf["path"], pdf["content"]):
                raw = bytes(content)
                w, h, _ch, _luma, _ph = decode(raw)
                ow, oh = fit_box(w, h, max_w, max_h)
                rows["path"].append(path)
                rows["src_width"].append(w)
                rows["src_height"].append(h)
                rows["out_width"].append(ow)
                rows["out_height"].append(oh)
                rows["content"].append(encode(raw, ow, oh))
            yield pd.DataFrame(rows)

    return assets.select("path", "content").mapInPandas(
        run, RESIZED_IMAGE_SCHEMA
    )
