"""PNG codec (utils/image.py): encode/decode round trips.

Stdlib-only codec backing /v1/images/generations b64_json payloads.
"""

import numpy as np
import pytest

from whisper_tensor_tpu.utils.image import png_bytes, png_to_array


@pytest.mark.parametrize("shape", [(7, 5, 3), (4, 9, 4), (6, 6, 1), (3, 8)])
def test_png_round_trip(shape):
    rng = np.random.default_rng(sum(shape))
    a = rng.integers(0, 256, size=shape, dtype=np.uint8)
    out = png_to_array(png_bytes(a))
    want = a if a.ndim == 3 else a[:, :, None]
    np.testing.assert_array_equal(out, want)


def test_png_decoder_all_filters():
    """The decoder must undo Sub/Up/Average/Paeth rows too (PNGs from
    other encoders); build a stream with one row per filter kind."""
    import struct
    import zlib

    from whisper_tensor_tpu.utils.image import _SIG, _chunk

    rng = np.random.default_rng(0)
    a = rng.integers(0, 256, size=(5, 4, 3), dtype=np.uint8)
    bpp = 3
    rows = []
    prev = np.zeros(12, np.int32)
    for y, kind in enumerate([0, 1, 2, 3, 4]):
        cur = a[y].reshape(-1).astype(np.int32)
        enc = cur.copy()
        for i in range(12):
            left = int(cur[i - bpp]) if i >= bpp else 0
            up = int(prev[i])
            ul = int(prev[i - bpp]) if i >= bpp else 0
            if kind == 1:
                enc[i] = (cur[i] - left) % 256
            elif kind == 2:
                enc[i] = (cur[i] - up) % 256
            elif kind == 3:
                enc[i] = (cur[i] - (left + up) // 2) % 256
            elif kind == 4:
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa <= pb and pa <= pc) else (
                    up if pb <= pc else ul)
                enc[i] = (cur[i] - pred) % 256
        rows.append(bytes([kind]) + enc.astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", 4, 5, 8, 2, 0, 0, 0)
    data = (_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(b"".join(rows)))
            + _chunk(b"IEND", b""))
    np.testing.assert_array_equal(png_to_array(data), a)


def test_png_rejects_garbage():
    with pytest.raises(ValueError):
        png_to_array(b"not a png at all")
    with pytest.raises(ValueError):
        png_bytes(np.zeros((4, 4), np.float32))


def test_wav_bytes_round_trip():
    from whisper_tensor_tpu.utils.audio import read_wav_bytes, wav_bytes

    rng = np.random.default_rng(1)
    s = np.clip(rng.standard_normal(1000) * 0.3, -1, 1).astype(np.float32)
    out, rate = read_wav_bytes(wav_bytes(s, 16000))
    assert rate == 16000
    np.testing.assert_allclose(out, s, atol=1.0 / 16000)
