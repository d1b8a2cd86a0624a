"""Multimodal column plumbing (SURVEY.md §2 #26).

Treats image/audio/video payloads as opaque ``binary`` columns with typed
metadata, processed in Arrow batches via ``mapInPandas`` — the Spark-side
pattern for decode / feature-extract / resize at 100 TB: binary columns
stay out of JVM row buffers until the Python worker, batches stream
through Arrow, and the extraction parallelizes per input partition.

The actual codec decode is STUBBED (``decode_media`` raises
NotImplementedError — image/audio libraries are not available in this
environment); ``multimodal_extract`` uses a deterministic byte-level
feature extractor instead, so the plumbing (schema, batching, UDF
signature, partitioning) is real and tested end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ecommerce_dbt_medallion_spark.sources.registry import load_table

BLOB_REPEATS = 4  # synthesized blob = 4 chained md5 digests = 64 bytes

FORMATS = ["png", "jpeg", "webp"]


def multimodal_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents + synthesized binary payload and typed metadata.

    Stands in for a real lakehouse table with an image column: blob bytes
    are deterministic (chained md5 of the text), metadata mirrors what an
    ingest pipeline records (format, nominal dimensions).
    """
    docs = load_table(spark, sf_dir, "documents")
    blob = F.concat(
        *[
            F.unhex(F.md5(F.concat(F.col("text"), F.lit(f"#{i}"))))
            for i in range(BLOB_REPEATS)
        ]
    )
    fmt = (
        F.when(F.col("doc_id") % 3 == 0, FORMATS[0])
        .when(F.col("doc_id") % 3 == 1, FORMATS[1])
        .otherwise(FORMATS[2])
    )
    return docs.select(
        "doc_id",
        blob.alias("media_blob"),
        F.struct(
            fmt.alias("format"),
            (64 + F.col("doc_id") % 576).cast("int").alias("width"),
            (48 + F.col("doc_id") % 432).cast("int").alias("height"),
        ).alias("media_meta"),
    )


def decode_media(blob: bytes, fmt: str):  # pragma: no cover - stub boundary
    """Real codec decode (PIL / libvips / ffmpeg) plugs in here.

    STUB: media codecs are not available in this environment.
    """
    raise NotImplementedError(
        f"decode_media({fmt}): media codecs unavailable; "
        "swap in PIL/libvips/ffmpeg in a full deployment"
    )


# The 8-dim "embedding" is emitted as scalar columns e0..e7 (not
# array<double>): scalar columns sort/hash under the driver's pandas
# canonicalizer, and each ej = byte_j / 255.0 is a single fp division
# both engines compute bit-identically (no rounding step).
EXTRACT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("format", StringType()),
        StructField("byte_len", LongType()),
        StructField("magic_hex", StringType()),
        StructField("checksum", LongType()),
    ]
    + [StructField(f"e{j}", DoubleType()) for j in range(8)]
)


def _extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched feature extraction — pure byte math, deterministic.

    (A real deployment would call decode_media here and emit pixel stats /
    model embeddings; the batch shape and schema stay identical.)
    """
    for pdf in batches:
        blobs = pdf["media_blob"]
        out = {
            "doc_id": pdf["doc_id"].astype("int64"),
            "format": [m["format"] for m in pdf["media_meta"]],
            "byte_len": [len(b) for b in blobs],
            "magic_hex": [bytes(b[:4]).hex() for b in blobs],
            "checksum": [sum(b) % 997 for b in blobs],
        }
        for j in range(8):
            out[f"e{j}"] = [bytes(b)[j] / 255.0 for b in blobs]
        yield pd.DataFrame(out)


def multimodal_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#26: binary-column batch feature extraction via mapInPandas."""
    return multimodal_docs(spark, sf_dir).mapInPandas(
        _extract_batches, EXTRACT_SCHEMA
    )


# ------------------------------------------------------------ oracle
# The synthesized blob is 4 chained md5 digests of the text, so every
# extracted feature is hex-digit arithmetic DuckDB reproduces exactly:
# byte i of the blob is the i-th hex pair of the concatenated digests.

_HEX = "0123456789abcdef"
# 1-indexed byte i from hex string h: value of hex pair (2i-1, 2i)
_BYTE = (
    f"((strpos('{_HEX}', substr({{h}}, 2*{{i}} - 1, 1)) - 1) * 16"
    f" + strpos('{_HEX}', substr({{h}}, 2*{{i}}, 1)) - 1)"
)


def oracle_multimodal_extract() -> str:
    ejs = ",\n    ".join(
        "cast("
        + _BYTE.format(h="hexs", i=j + 1)
        + f" as double) / cast(255 as double) as e{j}"
        for j in range(8)
    )
    return f"""
with b as (
    select doc_id,
        md5(text || '#0') || md5(text || '#1') ||
        md5(text || '#2') || md5(text || '#3') as hexs
    from documents
)
select
    doc_id,
    case cast(doc_id % 3 as int)
        when 0 then '{FORMATS[0]}' when 1 then '{FORMATS[1]}'
        else '{FORMATS[2]}' end as format,
    cast({16 * BLOB_REPEATS} as bigint) as byte_len,
    substr(hexs, 1, 8) as magic_hex,
    cast(list_aggregate(
        list_transform(range(1, {16 * BLOB_REPEATS} + 1),
                       i -> {_BYTE.format(h="hexs", i="i")}),
        'sum') % 997 as bigint) as checksum,
    {ejs}
from b
"""
