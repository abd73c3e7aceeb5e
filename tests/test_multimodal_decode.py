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


def test_resize_real_pixels_nearest_neighbor():
    """The resize stage does REAL pixel work: a hand-built 4x2 gradient
    BMP resized into a 2x1 box must contain exactly the nearest-neighbor
    source pixels, and the output must re-decode as a valid BMP."""
    import struct

    from dataforge_core_spark.operators.multimodal import (
        media_decode_fn,
        media_resize_fn,
    )

    w, h = 4, 2
    stride = (w * 3 + 3) // 4 * 4
    # bottom-up rows; pixel (x, y_from_top): b = 10*x + y_from_top
    rows = []
    for y_bottom in range(h):
        y_top = h - 1 - y_bottom
        row = bytearray()
        for x in range(w):
            row += bytes([10 * x + y_top, 0, 0])
        row += b"\x00" * (stride - len(row))
        rows.append(bytes(row))
    pix = b"".join(rows)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix), 2835, 2835, 0, 0
    )
    bmp = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(pix), 0, 0, 54)
    bmp += info + pix

    resize = media_resize_fn(max_w=2, max_h=1)
    out = _run(
        resize, pd.DataFrame({"doc_id": [0], "payload": [bmp]})
    )
    resized = out.iloc[0].payload
    dec = _run(media_decode_fn(), out)
    assert (dec.iloc[0].fmt, dec.iloc[0].width, dec.iloc[0].height) == (
        "bmp", 2, 1,
    )
    # scale = min(1, 2/4, 1/2) = 0.5 -> out 2x1; NN picks src x in {0, 2},
    # src row index 0 of the stored (bottom-up) array
    (data_off,) = struct.unpack("<I", resized[10:14])
    px = resized[data_off : data_off + 6]
    src_row0 = rows[0]
    assert px[0:3] == src_row0[0:3]
    assert px[3:6] == src_row0[6:9]


def test_resize_png_roundtrip_and_wav_rate():
    """Resized PNGs re-decode with fit-within-box dims (zlib re-encode +
    CRCs valid); WAV payloads decimate to <=4 kHz keeping channels."""
    from dataforge_core_spark.operators.multimodal import (
        media_decode_fn,
        media_resize_fn,
        media_synth_fn,
    )

    docs = pd.DataFrame(
        {
            "doc_id": [0, 2],  # kind 0 -> png, kind 2 -> wav
            "text": ["x" * 40, "y" * 11],
        }
    )
    payloads = _run(media_synth_fn(), docs)
    resized = _run(media_resize_fn(), payloads)
    dec = _run(media_decode_fn(), resized)
    by_id = {r.doc_id: r for r in dec.itertuples()}
    # png: 41x41 -> scale 16/41 -> 16x16
    w, hh = 40 % 64 + 1, 40 % 48 + 1
    s = min(1.0, 16 / w, 16 / hh)
    assert (by_id[0].fmt, by_id[0].width, by_id[0].height) == (
        "png", max(1, int(w * s)), max(1, int(hh * s)),
    )
    assert by_id[2].fmt == "wav"
    assert by_id[2].sample_rate == 4000
    assert by_id[2].channels == 11 % 2 + 1
