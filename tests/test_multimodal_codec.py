"""decode_image's import-tried real-codec branch (VERDICT r2 #7).

The kernel plumbing (Arrow batching, signature, schema) is identical with
and without PIL; only the decode body differs.  Exactly one of these two
tests runs in any given environment — this container has no PIL, so the
stub branch is the live one here; the real branch is what runs wherever a
codec is installed.
"""

from __future__ import annotations

import pytest

from naive_query_engine_spark.operators.multimodal import (
    DECODE_SCHEMA,
    decode_image,
    make_decode_meta_map,
)

try:
    import PIL  # noqa: F401

    HAS_PIL = True
except ImportError:
    HAS_PIL = False


@pytest.mark.skipif(HAS_PIL, reason="PIL installed — the stub branch is dead here")
def test_decode_image_raises_cleanly_without_codec():
    with pytest.raises(NotImplementedError, match="codec"):
        decode_image(b"\x89PNG\r\n\x1a\n garbage")


@pytest.mark.skipif(not HAS_PIL, reason="real-codec branch needs PIL")
def test_decode_image_real_codec(spark):
    """With PIL present: decode real PNG bytes, directly and through the
    unchanged mapInPandas kernel."""
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (17, 23)).save(buf, format="PNG")
    png = buf.getvalue()

    meta = decode_image(png)
    assert (meta["width"], meta["height"], meta["format"]) == (17, 23, "PNG")

    def real_decode(payload):  # adapt dict → the kernel's 4-tuple contract
        m = decode_image(bytes(payload))
        return m["n_bytes"], m["width"], m["height"], 1

    df = spark.createDataFrame([(1, bytearray(png))], "doc_id long, payload binary")
    [row] = df.mapInPandas(make_decode_meta_map(real_decode), DECODE_SCHEMA).collect()
    assert (row.width, row.height, row.n_bytes) == (17, 23, len(png))
