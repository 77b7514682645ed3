"""Native libjpeg decode + Pillow-bit-exact resize (native/image_decoder.cpp).

The TPU-native replacement for the reference's PIL-in-worker-processes image
path (reference vqa/datasets/images.py:23-24 decode, vqa/datasets/coco.py:
84-92 Scale->CenterCrop, vqa/lib/dataloader.py:126-155 workers): one GIL-free
C call per batch must reproduce models/convnets.preprocess_image_uint8
byte-for-byte, and fall back cleanly per-item for non-JPEG input.
"""

import io

import numpy as np
import pytest

from vqa_counterexamples_tpu.data.native_decoder import NativeImageDecoder
from vqa_counterexamples_tpu.models.convnets import preprocess_image_uint8


@pytest.fixture(scope="module")
def decoder():
    dec = NativeImageDecoder(n_threads=2)
    if not dec.available:
        pytest.skip("native decoder unavailable (no g++/libjpeg)")
    return dec


def _jpeg_bytes(arr, mode=None, quality=92):
    from PIL import Image

    img = Image.fromarray(arr, mode=mode)
    buf = io.BytesIO()
    img.save(buf, "JPEG", quality=quality)
    return buf.getvalue()


def _pil_reference(raw, size):
    from PIL import Image

    return preprocess_image_uint8(
        Image.open(io.BytesIO(raw)).convert("RGB"), size)


def _smooth_rgb(h, w, seed):
    rng = np.random.default_rng(seed)
    x = np.linspace(0, 255, w)[None, :] + np.linspace(0, 100, h)[:, None]
    g = (x + rng.normal(0, 20, (h, w))).clip(0, 255).astype(np.uint8)
    return np.stack([g, np.roll(g, 7, axis=1), 255 - g], axis=-1)


@pytest.mark.parametrize("shape", [(480, 640), (640, 480), (448, 448),
                                   (200, 300), (500, 500), (683, 1024)])
def test_byte_exact_vs_pil(decoder, shape):
    """Landscape/portrait/square, downscale and upscale: exact equality —
    the fixed-point resample replicates Pillow's arithmetic, and both
    decoders are libjpeg(-turbo)."""
    h, w = shape
    raw = _jpeg_bytes(_smooth_rgb(h, w, h * w))
    out, ok = decoder.decode_buffers([raw], size=448)
    assert bool(ok[0])
    np.testing.assert_array_equal(out[0], _pil_reference(raw, 448))


def test_grayscale_jpeg(decoder):
    """Mode-L JPEGs: single-channel resample + expand == PIL convert('RGB')."""
    rng = np.random.default_rng(3)
    raw = _jpeg_bytes(rng.integers(0, 255, (500, 700), dtype=np.uint8)
                      .astype(np.uint8), mode="L")
    out, ok = decoder.decode_buffers([raw], size=448)
    assert bool(ok[0])
    ref = _pil_reference(raw, 448)
    np.testing.assert_array_equal(out[0], ref)
    assert (out[0][..., 0] == out[0][..., 1]).all()


def test_small_size_and_batch(decoder):
    """Batch decode at a non-default size (the test-suite extract size)."""
    raws = [_jpeg_bytes(_smooth_rgb(80, 70, i)) for i in range(5)]
    out, ok = decoder.decode_buffers(raws, size=64)
    assert ok.all() and out.shape == (5, 64, 64, 3)
    for i, raw in enumerate(raws):
        np.testing.assert_array_equal(out[i], _pil_reference(raw, 64))


def test_bad_items_flagged_not_fatal(decoder):
    """Corrupt/PNG/empty items return ok=False (callers fall back to PIL);
    good items in the same batch still decode."""
    from PIL import Image

    png = io.BytesIO()
    Image.fromarray(_smooth_rgb(100, 100, 0)).save(png, "PNG")
    good = _jpeg_bytes(_smooth_rgb(480, 640, 1))
    out, ok = decoder.decode_buffers(
        [good, b"not a jpeg", png.getvalue(), b""], size=64)
    assert ok.tolist() == [True, False, False, False]
    np.testing.assert_array_equal(out[0], _pil_reference(good, 64))
    assert (out[1:] == 0).all()


def test_decode_files(decoder, tmp_path):
    """File-path entry point: same bytes, missing files flagged."""
    raw = _jpeg_bytes(_smooth_rgb(480, 640, 9))
    p = tmp_path / "img.jpg"
    p.write_bytes(raw)
    out, ok = decoder.decode_files([str(p), str(tmp_path / "missing.jpg")],
                                   size=64)
    assert ok.tolist() == [True, False]
    np.testing.assert_array_equal(out[0], _pil_reference(raw, 64))


def test_unavailable_decoder_degrades():
    """With the library missing the wrapper reports unavailable and returns
    all-False masks instead of raising."""
    dec = NativeImageDecoder(build=False)
    if dec.available:  # library exists on this machine; force the null path
        dec._lib = None
    out, ok = dec.decode_buffers([b"xx"], size=32)
    assert not ok.any() and out.shape == (1, 32, 32, 3)


def test_extract_cli_mixed_jpeg_png(tmp_path):
    """The extract CLI's native batch decode falls back to PIL per-item:
    a PNG in the image dir (listed by the reference's images.py:27-50
    extension filter) must extract identically to its JPEG siblings'
    pipeline rather than crash or zero out."""
    from PIL import Image

    from vqa_counterexamples_tpu.cli import extract as extract_cli
    from vqa_counterexamples_tpu.data.features import FeatureStore

    img_dir = tmp_path / "raw" / "val2014"
    img_dir.mkdir(parents=True)
    rng = np.random.default_rng(7)
    for i in range(3):
        arr = rng.integers(0, 255, size=(90, 80, 3)).astype(np.uint8)
        Image.fromarray(arr).save(img_dir / ("img_%d.jpg" % i))
    png_arr = rng.integers(0, 255, size=(90, 80, 3)).astype(np.uint8)
    Image.fromarray(png_arr).save(img_dir / "img_3.png")

    prefix = extract_cli.main([
        "--dir_data", str(tmp_path), "--data_split", "val",
        "--arch", "resnet50", "--size", "64", "-b", "2", "--mode", "noatt"])
    store = FeatureStore.load(prefix)
    assert store.features.shape == (4, 2048)
    assert np.isfinite(store.features).all()
    # the PNG row went through the PIL fallback, not left as zeros
    assert np.abs(store.features[store.names.index("img_3.png")]).sum() > 0


def test_truncated_jpeg_rejected(decoder):
    """A half-truncated JPEG decodes 'successfully' in raw libjpeg (gray
    fill + warning) — PIL raises instead, so the native path must flag it
    for fallback rather than silently writing a half-gray image into the
    feature store."""
    raw = _jpeg_bytes(_smooth_rgb(480, 640, 21))
    out, ok = decoder.decode_buffers([raw[: len(raw) // 2]], size=64)
    assert not ok[0]
