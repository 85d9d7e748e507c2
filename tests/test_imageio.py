"""Native image loader (native/src/imageio.cpp + pipeline/loader.py).

Oracle: PIL. The native JPEG decode must be bit-identical to PIL's (both sit
on libjpeg with default fancy upsampling); the native letterbox resample
shares PIL BILINEAR's triangle-filter geometry but runs in float, so pixels
may differ by ~1 LSB. Windows must match `compute_window` exactly.
"""

import os

import numpy as np
import pytest
from PIL import Image

from maskrcnn_tpu.native import get_imageio_lib
from maskrcnn_tpu.pipeline.loader import (PrefetchLoader, decode_rgb,
                                          letterbox_rgb, load_batch,
                                          load_letterboxed)
from maskrcnn_tpu.pipeline.preprocess import letterbox_numpy

needs_native = pytest.mark.skipif(get_imageio_lib() is None,
                                  reason="no g++/libjpeg toolchain")


@pytest.fixture(scope="module")
def jpeg_dir(tmp_path_factory):
    td = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(7)
    paths = []
    for i, (h, w) in enumerate([(480, 640), (333, 217), (64, 1024)]):
        img = rng.uniform(0, 255, (h, w, 3)).astype(np.uint8)
        p = str(td / f"img{i}.jpg")
        Image.fromarray(img).save(p, quality=92)
        paths.append(p)
    # one grayscale JPEG (libjpeg must upconvert to RGB like PIL .convert)
    gray = rng.uniform(0, 255, (120, 90)).astype(np.uint8)
    p = str(td / "gray.jpg")
    Image.fromarray(gray, mode="L").save(p, quality=90)
    paths.append(p)
    # one PNG to exercise the PIL-decode + native-resample path
    img = rng.uniform(0, 255, (100, 160, 3)).astype(np.uint8)
    p = str(td / "img.png")
    Image.fromarray(img).save(p)
    paths.append(p)
    return paths


@needs_native
def test_jpeg_decode_bit_exact(jpeg_dir):
    for p in jpeg_dir:
        if not p.endswith(".jpg"):
            continue
        pil = np.asarray(Image.open(p).convert("RGB"))
        nat = decode_rgb(p)
        assert nat.dtype == np.uint8 and nat.shape == pil.shape
        np.testing.assert_array_equal(nat, pil)


@needs_native
@pytest.mark.parametrize("shape", [(480, 640), (640, 480), (1, 1),
                                   (3, 1024), (1023, 17), (100, 70),
                                   (256, 256)])
def test_letterbox_matches_pil(shape):
    rng = np.random.default_rng(sum(shape))
    img = rng.uniform(0, 255, (*shape, 3)).astype(np.uint8)
    c_pil, w_pil = letterbox_numpy(img, 256)
    c_nat, w_nat = letterbox_rgb(img, 256)
    assert w_nat == w_pil
    assert c_nat.dtype == np.float32 and c_nat.shape == c_pil.shape
    # float vs PIL's fixed-point uint8 intermediates: <= ~1.5 LSB
    assert np.abs(c_nat - c_pil).max() <= 2.0


@needs_native
def test_fused_jpeg_letterbox(jpeg_dir):
    p = jpeg_dir[0]
    canvas, win = load_letterboxed(p, 320)
    ref_img = np.asarray(Image.open(p).convert("RGB"))
    ref_canvas, ref_win = letterbox_numpy(ref_img, 320)
    assert win == ref_win
    assert np.abs(canvas - ref_canvas).max() <= 2.0
    # padding stays exactly zero
    assert canvas[:win.y1].max(initial=0.0) == 0.0
    assert canvas[win.y2:].max(initial=0.0) == 0.0


def test_non_jpeg_falls_back(jpeg_dir):
    png = [p for p in jpeg_dir if p.endswith(".png")][0]
    canvas, win = load_letterboxed(png, 128)
    ref_img = np.asarray(Image.open(png).convert("RGB"))
    ref_canvas, ref_win = letterbox_numpy(ref_img, 128)
    assert win == ref_win
    assert np.abs(canvas - ref_canvas).max() <= 2.0


def test_prefetch_loader_order_and_content(jpeg_dir):
    items = [(i, jpeg_dir[i % len(jpeg_dir)]) for i in range(9)]
    got = list(PrefetchLoader(iter(items), 96, workers=2, depth=3))
    assert [k for k, _, _ in got] == list(range(9))
    for key, canvas, win in got:
        ref_c, ref_w = load_letterboxed(jpeg_dir[key % len(jpeg_dir)], 96)
        assert win == ref_w
        np.testing.assert_array_equal(canvas, ref_c)


def test_load_batch_shapes(jpeg_dir):
    canvases, windows = load_batch(jpeg_dir, 64, workers=2)
    assert canvases.shape == (len(jpeg_dir), 64, 64, 3)
    assert canvases.dtype == np.float32
    assert len(windows) == len(jpeg_dir)


@needs_native
def test_decode_error_paths(tmp_path):
    lib = get_imageio_lib()
    bad = tmp_path / "broken.jpg"
    bad.write_bytes(b"not a jpeg at all")
    hw = np.zeros(2, np.int64)
    import ctypes
    rc = lib.img_jpeg_dims(str(bad).encode(),
                           hw.ctypes.data_as(
                               ctypes.POINTER(ctypes.c_int64)))
    assert rc < 0
    rc = lib.img_jpeg_dims(str(tmp_path / "missing.jpg").encode(),
                           hw.ctypes.data_as(
                               ctypes.POINTER(ctypes.c_int64)))
    assert rc < 0
    # loader falls back to PIL, which raises a real error
    with pytest.raises(Exception):
        load_letterboxed(str(bad), 64)


@needs_native
def test_bytes_decode_matches_file(jpeg_dir):
    from maskrcnn_tpu.pipeline.loader import (decode_rgb_bytes,
                                              load_letterboxed_bytes)

    p = jpeg_dir[1]
    data = open(p, "rb").read()
    np.testing.assert_array_equal(decode_rgb_bytes(data), decode_rgb(p))
    c_mem, w_mem = load_letterboxed_bytes(data, 192)
    c_file, w_file = load_letterboxed(p, 192)
    assert w_mem == w_file
    np.testing.assert_array_equal(c_mem, c_file)


def test_bytes_decode_non_jpeg_falls_back(jpeg_dir):
    from maskrcnn_tpu.pipeline.loader import decode_rgb_bytes

    png = [p for p in jpeg_dir if p.endswith(".png")][0]
    data = open(png, "rb").read()
    ref = np.asarray(Image.open(png).convert("RGB"))
    np.testing.assert_array_equal(decode_rgb_bytes(data), ref)


@needs_native
def test_native_paste_mask_matches_pil():
    """Native paste_mask == the PIL path it replaces, within a tiny
    threshold-boundary flip budget (PIL resizes in fixed point)."""
    from PIL import Image

    from maskrcnn_tpu.pipeline.detector import paste_mask

    def pil_paste(mask, box, shape, threshold=0.5):
        oy1, ox1, oy2, ox2 = box
        h = max(int(round(oy2)) - int(round(oy1)), 1)
        w = max(int(round(ox2)) - int(round(ox1)), 1)
        y0, x0 = int(round(oy1)), int(round(ox1))
        r = Image.fromarray((mask * 255).astype(np.uint8)).resize(
            (w, h), Image.BILINEAR)
        r = np.asarray(r, np.float32) / 255.0
        canvas = np.zeros(shape, bool)
        yy1, xx1 = max(y0, 0), max(x0, 0)
        yy2, xx2 = min(y0 + h, shape[0]), min(x0 + w, shape[1])
        canvas[yy1:yy2, xx1:xx2] = (
            r[yy1 - y0:yy2 - y0, xx1 - x0:xx2 - x0] >= threshold)
        return canvas

    rng = np.random.default_rng(11)
    mask = rng.random((28, 28)).astype(np.float32)
    cases = [(-15.3, -20.9, 300.2, 401.7), (10.2, 20.7, 11.0, 21.1),
             (470.0, 630.0, 500.0, 700.0), (0.0, 0.0, 479.0, 639.0),
             (100.5, 200.5, 150.5, 260.5)]
    for box in cases:
        got = paste_mask(mask, box, (480, 640))
        want = pil_paste(mask, box, (480, 640))
        assert got.shape == want.shape and got.dtype == np.dtype(bool)
        assert (got != want).mean() < 2e-3, box


def test_rle_encode_rowmajor_matches_fortran():
    from maskrcnn_tpu.evalkit.mask_rle import decode, encode

    rng = np.random.default_rng(5)
    for shape in [(1, 1), (7, 3), (64, 64), (480, 640)]:
        m = (rng.random(shape) > 0.7).astype(np.uint8)
        r_c = encode(np.ascontiguousarray(m))       # strided native walk
        r_f = encode(np.asfortranarray(m))          # classic copy path
        assert list(r_c.counts) == list(r_f.counts)
        np.testing.assert_array_equal(decode(r_c), m)


def test_letterbox_channel_normalization():
    """Grayscale/1-channel/RGBA inputs are normalized to RGB before the
    native resampler (which reads exactly H*W*3 bytes)."""
    rng = np.random.default_rng(3)
    gray = rng.uniform(0, 255, (60, 80)).astype(np.uint8)
    rgb = np.repeat(gray[:, :, None], 3, axis=2)
    want, wwin = letterbox_rgb(rgb, 64)
    for variant in (gray, gray[:, :, None],
                    np.concatenate([rgb, gray[:, :, None]], axis=2)):
        got, win = letterbox_rgb(variant, 64)
        assert win == wwin
        np.testing.assert_array_equal(got, want)
    with pytest.raises(ValueError):
        letterbox_rgb(np.zeros((4, 4, 2), np.uint8), 64)


def test_window_clamps_degenerate_aspect():
    # 3x1024 at size 128: unclamped round() would give a 0-row window
    from maskrcnn_tpu.pipeline.preprocess import compute_window
    win = compute_window(3, 1024, 128)
    assert win.y2 - win.y1 >= 1 and win.x2 - win.x1 == 128
    img = np.full((3, 1024, 3), 200, np.uint8)
    canvas, w = letterbox_numpy(img, 128)
    assert canvas[w.y1:w.y2].max() > 0
