"""Multimodal-column plumbing (SURVEY.md §2.9 / north-star).

Media (image/audio/video) is modeled the way a 100 TB lake stores it:
an opaque ``binary`` payload column plus typed metadata, processed by
Arrow-batched ``mapInPandas`` operators so bytes never round-trip
through Python row-at-a-time.

This container has no image/audio codecs, so the actual decode is a
clearly-marked stub (:func:`decode_media` raises NotImplementedError;
the pipeline uses :func:`fake_decode_features`, a deterministic
md5-based feature extractor). Everything Spark-side — the binary
column construction, the metadata schema, the mapInPandas batch
signature, the frame-sampling fan-out — is real and oracle-checked.

The synthetic payload is ``encode(text, 'utf-8')`` from the documents
table: deterministic bytes whose md5 both engines can compute, which
is exactly what a content-addressed media lake keys on.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sfdc_cdc_aws_spark.registry import query
from sfdc_cdc_aws_spark.sources import load_table

_MIMES = ("image/png", "audio/wav", "video/mp4")


def decode_media(payload: bytes, mime: str):  # pragma: no cover - stub
    """Real codec hook (PIL / soundfile / av). Not available in this
    container — STUB. A deployment would replace this with the actual
    decoder; the batch plumbing around it does not change."""
    raise NotImplementedError(
        "media codecs are not installed in this environment; "
        "use fake_decode_features() for the deterministic test path"
    )


def fake_decode_features(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for decode+feature-extract: byte length
    and a 32-bit content hash (md5 prefix) — reproducible in SQL so
    the Arrow plumbing itself is hash-checkable."""
    import hashlib

    return len(payload), int(hashlib.md5(payload).hexdigest()[:8], 16)


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → media lake shape: (doc_id, mime, payload binary,
    meta struct). The mime cycles deterministically over doc_id."""
    # widen=False: with the stub feature fn the per-row work is
    # trivial, so fanning out to one Arrow batch per core costs more
    # in Python-worker startup than it saves; a real codec (seconds
    # per video) would flip this to widen=True.
    d = load_table(spark, sf_dir, "documents")
    mime = F.element_at(
        F.array(*[F.lit(m) for m in _MIMES]), (F.col("doc_id") % 3 + 1).cast("int")
    )
    payload = F.encode(F.col("text"), "utf-8")
    return d.select(
        "doc_id",
        mime.alias("mime"),
        payload.alias("payload"),
        F.struct(
            F.octet_length(payload).alias("n_bytes"),
            F.col("lang").alias("lang"),
        ).alias("meta"),
    )


@query(
    "multimodal_meta",
    oracle="""
SELECT doc_id,
       CASE doc_id % 3 WHEN 0 THEN 'image/png'
                       WHEN 1 THEN 'audio/wav'
                       ELSE 'video/mp4' END AS mime,
       octet_length(encode(text)) AS n_bytes,
       lang
FROM documents
""",
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The typed-metadata view of the binary media column — what a
    catalog scan returns without touching payload bytes (column
    pruning keeps the binary column out of the parquet read
    entirely)."""
    m = media_table(spark, sf_dir)
    return m.select(
        "doc_id", "mime", F.col("meta.n_bytes").alias("n_bytes"), F.col("meta.lang").alias("lang")
    )


_FEATURES_SCHEMA = (
    "doc_id bigint, mime string, n_bytes bigint, content_hash32 bigint, n_frames bigint"
)


@query(
    "media_features",
    oracle="""
SELECT doc_id,
       CASE doc_id % 3 WHEN 0 THEN 'image/png'
                       WHEN 1 THEN 'audio/wav'
                       ELSE 'video/mp4' END AS mime,
       octet_length(encode(text)) AS n_bytes,
       ('0x' || substr(md5(text), 1, 8))::BIGINT AS content_hash32,
       CASE WHEN doc_id % 3 = 2
            THEN octet_length(encode(text)) // 100 + 1
            ELSE 0 END AS n_frames
FROM documents
""",
)
def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode / feature-extract over Arrow batches (``mapInPandas``):
    one Python worker call per ~10k-row batch, payload bytes move via
    Arrow, never per-row pickling. The feature fn is the deterministic
    stub; swapping in a real codec changes one function, not the
    plan. Videos get a fake frame count (bytes//100+1) to drive the
    frame-sampling fan-out."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(fake_decode_features)
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": pdf["mime"],
                    "n_bytes": feats.map(lambda t: t[0]),
                    "content_hash32": feats.map(lambda t: t[1]),
                }
            )
            out["n_frames"] = (out["n_bytes"] // 100 + 1).where(
                out["mime"] == "video/mp4", 0
            )
            yield out

    m = media_table(spark, sf_dir).select("doc_id", "mime", "payload")
    return m.mapInPandas(extract, schema=_FEATURES_SCHEMA)


@query(
    "frame_sample",
    oracle="""
WITH vids AS (
  SELECT doc_id, octet_length(encode(text)) // 100 + 1 AS n_frames
  FROM documents WHERE doc_id % 3 = 2
)
SELECT doc_id, unnest(generate_series(0, n_frames - 1, 10)) AS frame_no
FROM vids
""",
)
def frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: every 10th frame per video — the explode-style
    fan-out a video pipeline runs before per-frame feature UDFs. The
    sequence is generated engine-side (no Python)."""
    feats = media_features(spark, sf_dir)
    return (
        feats.where(F.col("mime") == "video/mp4")
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(10))
            ).alias("frame_no"),
        )
    )


CHUNK_BYTES = 400


@query(
    "audio_chunk",
    oracle=f"""
SELECT doc_id,
       unnest(generate_series(0, octet_length(encode(text)) - 1, {CHUNK_BYTES}))
         AS chunk_offset,
       least({CHUNK_BYTES},
             octet_length(encode(text))
               - unnest(generate_series(0, octet_length(encode(text)) - 1,
                                        {CHUNK_BYTES}))) AS chunk_len
FROM documents WHERE doc_id % 3 = 1
""",
)
def audio_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size chunking of audio payloads (the audio twin of
    ``frame_sample``): one row per CHUNK_BYTES window with its offset
    and actual length — the fan-out an ASR/embedding pipeline runs
    before per-chunk UDFs. Offsets are generated engine-side with
    ``sequence``; the byte math stays on metadata, payload bytes are
    untouched until a downstream decode UDF slices them."""
    m = media_table(spark, sf_dir)
    n_bytes = F.col("meta.n_bytes")
    offsets = F.explode(
        F.sequence(F.lit(0), n_bytes - 1, F.lit(CHUNK_BYTES))
    ).alias("chunk_offset")
    return (
        m.where(F.col("mime") == "audio/wav")
        .select("doc_id", offsets, n_bytes.alias("_n"))
        .select(
            "doc_id",
            "chunk_offset",
            F.least(F.lit(CHUNK_BYTES), F.col("_n") - F.col("chunk_offset")).alias(
                "chunk_len"
            ),
        )
    )


@query(
    "media_dedup_exact",
    oracle="""
WITH uploads AS (
  SELECT d.doc_id, s.text
  FROM documents d JOIN documents s
    ON s.doc_id = d.doc_id - (CASE WHEN d.doc_id % 10 = 7 THEN 1 ELSE 0 END)
)
SELECT md5(text) AS content_md5,
       count(*) AS n_copies,
       min(doc_id) AS keeper_doc_id,
       count(DISTINCT CASE doc_id % 3 WHEN 0 THEN 'image/png'
                                      WHEN 1 THEN 'audio/wav'
                                      ELSE 'video/mp4' END) AS n_mimes
FROM uploads
GROUP BY 1 HAVING count(*) >= 2
""",
)
def media_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-addressed media dedup over an upload log: group
    payloads by md5 of the raw bytes and report every duplicate
    group with its keeper (the lowest doc_id) — the storage-dedup
    primitive of a media lake (identical bytes uploaded under
    different ids/mimes store once). The synthetic upload log makes
    the fixture non-degenerate deterministically: every doc_id ≡ 7
    (mod 10) re-uploads the previous document's bytes under its own
    id and mime — so most duplicate groups also show ``n_mimes = 2``,
    the byte-identical-but-differently-registered catalog-hygiene
    signal that text-level dedup has no analog for.

    Plan: the payload-fetch self-join is an equi-join on doc_id
    (broadcast- or co-partitionable); the md5 is computed narrow and
    the dedup shuffle carries (32-byte digest, partial aggregates)
    after a map-side partial — payload bytes themselves never move.
    Same discipline as exact_dedup_docs (dedup.py), applied to raw
    media bytes instead of normalized text."""
    d = load_table(spark, sf_dir, "documents")
    src_id = F.col("u.doc_id") - F.when(
        F.col("u.doc_id") % 10 == 7, F.lit(1)
    ).otherwise(F.lit(0))
    mime = F.element_at(
        F.array(*[F.lit(m) for m in _MIMES]),
        (F.col("u.doc_id") % 3 + 1).cast("int"),
    )
    uploads = (
        d.alias("u")
        .join(d.alias("s"), F.col("s.doc_id") == src_id)
        .select(
            F.col("u.doc_id").alias("doc_id"),
            mime.alias("mime"),
            F.encode(F.col("s.text"), "utf-8").alias("payload"),
        )
    )
    return (
        uploads.groupBy(F.md5(F.col("payload")).alias("content_md5"))
        .agg(
            F.count("*").alias("n_copies"),
            F.min("doc_id").alias("keeper_doc_id"),
            F.count_distinct(F.col("mime")).alias("n_mimes"),
        )
        .where(F.col("n_copies") >= 2)
    )
