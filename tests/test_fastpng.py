"""Golden tests for the fast palette-PNG encoder (utils/fastpng.py):
every encode must round-trip byte-exactly through PIL's PNG decoder,
for both the native C encoder and the pure-Python zlib fallback."""

import io

import numpy as np
import pytest
from PIL import Image

from wseg_tpu.data.pascal_voc import get_palette
from wseg_tpu.utils import fastpng


def _cases():
    rng = np.random.RandomState(0)
    blob = np.zeros((96, 128), np.uint8)
    for _ in range(6):
        y, x = rng.randint(0, 96), rng.randint(0, 128)
        ry, rx = rng.randint(10, 40), rng.randint(10, 50)
        yy, xx = np.ogrid[:96, :128]
        blob[((yy - y) / ry) ** 2 + ((xx - x) / rx) ** 2 < 1] = \
            rng.randint(1, 21)
    return [
        ("blobby", blob),
        ("random_labels", rng.randint(0, 21, (64, 97)).astype(np.uint8)),
        ("full_range", rng.randint(0, 256, (37, 41)).astype(np.uint8)),
        ("all_zero", np.zeros((50, 33), np.uint8)),
        ("all_255", np.full((3, 7), 255, np.uint8)),
        ("single_px", np.array([[5]], np.uint8)),
        ("one_row", (np.arange(300) % 256).astype(np.uint8)[None]),
        ("one_col", (np.arange(300) % 21).astype(np.uint8)[:, None]),
    ]


@pytest.mark.parametrize("name,mask", _cases(), ids=[c[0] for c in _cases()])
def test_roundtrip(name, mask):
    data = fastpng.encode_indexed_png(mask, get_palette())
    back = np.asarray(Image.open(io.BytesIO(data)))
    assert back.dtype == np.uint8
    np.testing.assert_array_equal(back, mask)


@pytest.mark.parametrize("name,mask", _cases(), ids=[c[0] for c in _cases()])
def test_roundtrip_python_fallback(name, mask, monkeypatch):
    monkeypatch.setattr(fastpng, "_load", lambda: None)
    data = fastpng.encode_indexed_png(mask, get_palette())
    back = np.asarray(Image.open(io.BytesIO(data)))
    np.testing.assert_array_equal(back, mask)


def test_palette_preserved(tmp_path):
    pal = get_palette()
    mask = np.arange(21, dtype=np.uint8)[None].repeat(4, 0)
    p = tmp_path / "m.png"
    fastpng.write_indexed_png(str(p), mask, pal)
    im = Image.open(p)
    assert im.mode == "P"
    got = im.getpalette()
    assert got[:len(pal)] == list(pal)[:len(got)]
    rgb = np.asarray(im.convert("RGB"))
    exp = np.asarray(pal, np.uint8).reshape(-1, 3)[mask.reshape(-1)]
    np.testing.assert_array_equal(rgb.reshape(-1, 3), exp)
