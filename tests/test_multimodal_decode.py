"""Stdlib media decode: the synth stage emits valid PNG/BMP/WAV bytes and
the decode stage recovers the encoded parameters by parsing headers only;
corrupt payloads become error rows, not job failures."""

from __future__ import annotations

import pandas as pd


def _run(fn, pdf: pd.DataFrame) -> pd.DataFrame:
    return pd.concat(list(fn(iter([pdf])))).reset_index(drop=True)


def test_synth_decode_roundtrip():
    from dataforge_core_spark.operators.multimodal import (
        media_decode_fn,
        media_synth_fn,
    )

    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            # lengths pick the dims: len 5 / 7 / 11 / 64 utf-8 bytes
            "text": ["aaaaa", "bbbbbbb", "c" * 11, "d" * 64],
        }
    )
    payloads = _run(media_synth_fn(), docs)
    out = _run(media_decode_fn(), payloads)

    by_id = {r.doc_id: r for r in out.itertuples()}
    assert by_id[0].fmt == "png"
    assert (by_id[0].width, by_id[0].height) == (5 % 64 + 1, 5 % 48 + 1)
    assert by_id[1].fmt == "bmp"
    assert (by_id[1].width, by_id[1].height) == (7 % 16 + 1, 7 % 8 + 1)
    assert by_id[2].fmt == "wav"
    assert by_id[2].channels == 11 % 2 + 1
    assert by_id[2].sample_rate == 8000 + (11 % 8) * 1000
    assert by_id[3].fmt == "png"
    assert (by_id[3].width, by_id[3].height) == (64 % 64 + 1, 64 % 48 + 1)


def test_decode_is_header_driven_not_id_driven():
    """The parser dispatches on magic bytes, not on doc_id."""
    from dataforge_core_spark.operators.multimodal import (
        media_decode_fn,
        media_synth_fn,
    )

    payloads = _run(
        media_synth_fn(), pd.DataFrame({"doc_id": [2], "text": ["hello"]})
    )
    # relabel the WAV payload with a doc_id that synth would make a PNG
    payloads["doc_id"] = [99]
    out = _run(media_decode_fn(), payloads)
    assert out.iloc[0].fmt == "wav"


def test_corrupt_payloads_become_error_rows():
    from dataforge_core_spark.operators.multimodal import media_decode_fn

    bad = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "payload": [
                b"",  # empty
                b"\x89PNG\r\n\x1a\nXXXX",  # truncated PNG
                b"\x89PNG\r\n\x1a\n"  # IHDR with wrong CRC
                + b"\x00\x00\x00\x0dIHDR"
                + b"\x00" * 13
                + b"\xde\xad\xbe\xef",
                b"RIFFxxxxJUNK",  # RIFF but not WAVE
            ],
        }
    )
    out = _run(media_decode_fn(), bad)
    assert list(out["fmt"]) == ["unknown"] * 4
    assert out["width"].isna().all()


def test_valid_png_signature_and_crc():
    """Synth output is structurally valid: signature, CRC-correct IHDR."""
    import struct
    import zlib

    from dataforge_core_spark.operators.multimodal import media_synth_fn

    p = _run(
        media_synth_fn(), pd.DataFrame({"doc_id": [0], "text": ["abc"]})
    ).iloc[0]["payload"]
    assert p[:8] == b"\x89PNG\r\n\x1a\n"
    (ln,) = struct.unpack(">I", p[8:12])
    chunk = p[12 : 16 + ln]
    (crc,) = struct.unpack(">I", p[16 + ln : 20 + ln])
    assert chunk[:4] == b"IHDR" and ln == 13
    assert zlib.crc32(chunk) & 0xFFFFFFFF == crc
