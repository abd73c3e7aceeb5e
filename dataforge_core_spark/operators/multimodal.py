"""Multimodal-column operators: opaque ``binary`` payloads + typed metadata.

Design for image/audio/video at 100 TB: payloads travel as parquet
``binary`` columns partitioned by content hash; decode / feature-extract /
resize / frame-sample run as Arrow-batched ``mapInPandas`` stages (one
Python worker per partition, zero driver involvement).  The actual media
decode is STUBBED here (no image/audio libraries in this container —
``_decode_image`` raises NotImplementedError unless PIL is importable and
is replaced by a deterministic fake for the pipeline tests); everything
around it — schema contract, partitioning, UDF signature, Arrow batch
shape — is real and oracle-tested.

The binary payload is synthesized from ``documents.text`` (utf-8 bytes) so
the pipeline runs on driver testdata; a real deployment points the reader
at real media bytes with the same schema.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession

META_SCHEMA = (
    "doc_id bigint, n_bytes int, content_md5 string, "
    "fake_width int, fake_height int"
)

FRAME_SCHEMA = "doc_id bigint, frame_no int, frame_md5 string"


def _decode_image(payload: bytes):
    """Real decode path — stub.

    Raises NotImplementedError when no imaging library is available; the
    pipeline uses deterministic fake dimensions instead (derived from the
    byte length) so the Spark-side plumbing is fully testable.
    """
    try:
        from PIL import Image  # noqa: F401  (not present in this container)
        import io

        return Image.open(io.BytesIO(payload))
    except ImportError:
        raise NotImplementedError(
            "media decode requires an imaging library; "
            "using deterministic fake metadata instead"
        )


def _payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> (doc_id, payload binary).  encode() is JVM-side."""
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return df.selectExpr("doc_id", "encode(text, 'utf-8') AS payload")


def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-extract over binary payloads via Arrow-batched mapInPandas."""
    import pandas as pd

    # NOTE: the closure must be fully self-contained (no references to
    # this module's globals) — Python workers unpickle it without the
    # repo on their sys.path when the driver loads __spark_entry__ by
    # file path from another working directory.
    def extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import hashlib

        import pandas as pd

        def decode_image(payload: bytes):
            try:
                import io

                from PIL import Image  # not present in this container

                return Image.open(io.BytesIO(payload))
            except ImportError:
                raise NotImplementedError(
                    "media decode requires an imaging library"
                )

        for pdf in batches:
            payloads = pdf["payload"]
            n_bytes = payloads.map(len)
            md5s = payloads.map(lambda b: hashlib.md5(b).hexdigest())
            try:
                # real path would decode and read true dimensions
                decode_image(payloads.iloc[0] if len(payloads) else b"")
                raise AssertionError("unreachable in this container")
            except NotImplementedError:
                # deterministic fake dimensions derived from the bytes
                width = (n_bytes % 640 + 1).astype("int32")
                height = (n_bytes * 7 % 480 + 1).astype("int32")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n_bytes.astype("int32"),
                    "content_md5": md5s,
                    "fake_width": width,
                    "fake_height": height,
                }
            )

    return _payloads(spark, sf_dir).mapInPandas(extract, META_SCHEMA)


_META_ORACLE = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
       md5(text) AS content_md5,
       CAST(octet_length(encode(text)) % 640 + 1 AS INTEGER) AS fake_width,
       CAST(octet_length(encode(text)) * 7 % 480 + 1 AS INTEGER) AS fake_height
FROM documents
"""


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: each payload yields (n_bytes mod 4) + 1 frames —
    a flatMap-shaped mapInPandas (rows out != rows in), the shape a real
    video frame sampler has."""
    import pandas as pd

    def sample(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import hashlib

        import pandas as pd

        for pdf in batches:
            out_doc, out_no, out_md5 = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = len(payload) % 4 + 1
                for i in range(n_frames):
                    out_doc.append(doc_id)
                    out_no.append(i)
                    out_md5.append(
                        hashlib.md5(payload + str(i).encode()).hexdigest()
                    )
            yield pd.DataFrame(
                {
                    "doc_id": out_doc,
                    "frame_no": pd.Series(out_no, dtype="int32"),
                    "frame_md5": out_md5,
                }
            )

    return _payloads(spark, sf_dir).mapInPandas(sample, FRAME_SCHEMA)


_FRAME_ORACLE = """
SELECT d.doc_id,
       CAST(f.i AS INTEGER) AS frame_no,
       md5(d.text || CAST(f.i AS VARCHAR)) AS frame_md5
FROM documents d,
     LATERAL (SELECT unnest(generate_series(0,
              octet_length(encode(d.text)) % 4)) AS i) f
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "multimodal_meta": multimodal_meta,
        "multimodal_frame_sample": multimodal_frame_sample,
    }


def oracles() -> dict[str, str]:
    return {
        "multimodal_meta": _META_ORACLE,
        "multimodal_frame_sample": _FRAME_ORACLE,
    }
