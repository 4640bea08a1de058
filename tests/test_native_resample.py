"""Native C++ resampler: byte-exact parity with PIL.

The native path may only ship if it is bit-identical to what the reference's
host pipeline produces (PIL Image.resize, dataloaders/JSRT.py:62-65) — any
deviation would silently change every downstream number."""

import numpy as np
import pytest
from PIL import Image

from tedm_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built (no g++?)"
)

SIZES = [
    ((256, 256), (128, 128)),   # 2x downscale (the training config)
    ((2048, 2048), (128, 128)),  # JSRT-native-resolution downscale
    ((100, 173), (128, 128)),    # non-square, mixed up/downscale
    ((64, 64), (128, 128)),      # upscale
    ((128, 128), (128, 128)),    # identity
    ((131, 67), (37, 91)),       # odd sizes both ways
]


def _rand(shape, seed):
    return np.random.RandomState(seed).randint(0, 256, shape, dtype=np.uint8)


@pytest.mark.parametrize("in_shape,out_shape", SIZES)
@pytest.mark.parametrize("filt,pil_filt", [
    ("bicubic", Image.BICUBIC),
    ("bilinear", Image.BILINEAR),
    ("nearest", Image.NEAREST),
])
def test_resize_matches_pil_exactly(in_shape, out_shape, filt, pil_filt):
    img = _rand(in_shape, seed=sum(in_shape) + sum(out_shape))
    oh, ow = out_shape
    ref = np.asarray(Image.fromarray(img).resize((ow, oh), pil_filt))
    got = native.resize_u8(img, (oh, ow), filter=filt)
    np.testing.assert_array_equal(got, ref)


def test_default_filter_matches_pil_default():
    """PIL's Image.resize default for mode 'L' must equal our 'bicubic'."""
    img = _rand((300, 200), seed=7)
    ref = np.asarray(Image.fromarray(img).resize((128, 128)))
    got = native.resize_u8(img, (128, 128))
    np.testing.assert_array_equal(got, ref)


def test_batch_matches_single_and_pil():
    imgs = _rand((6, 211, 190), seed=11)
    out = native.resize_batch_u8(imgs, (128, 128), num_threads=3)
    for i in range(imgs.shape[0]):
        ref = np.asarray(Image.fromarray(imgs[i]).resize((128, 128)))
        np.testing.assert_array_equal(out[i], ref)


def test_gif_mask_path_parity(tmp_path):
    """Full mask path: GIF decode -> convert('L') -> resize, native vs PIL
    (reference mask handling, dataloaders/JSRT.py:67-88)."""
    rs = np.random.RandomState(3)
    mask = (rs.rand(247, 247) > 0.5).astype(np.uint8) * 255
    p = tmp_path / "m.gif"
    Image.fromarray(mask).save(p)
    im = Image.open(p).convert("L")
    ref = np.asarray(im.resize((128, 128)))
    got = native.resize_u8(np.asarray(im, np.uint8), (128, 128))
    np.testing.assert_array_equal(got, ref)


def _png_cases(tmp_path):
    """One PNG per mode PIL would hand us (gray8, RGB, RGBA, palette,
    gray16, 1-bit)."""
    rs = np.random.RandomState(9)
    cases = {}
    g8 = rs.randint(0, 256, (220, 180), np.uint8)
    cases["gray8"] = Image.fromarray(g8, "L")
    cases["rgb"] = Image.fromarray(rs.randint(0, 256, (150, 200, 3), np.uint8), "RGB")
    cases["rgba"] = Image.fromarray(rs.randint(0, 256, (150, 200, 4), np.uint8), "RGBA")
    cases["palette"] = cases["rgb"].convert("P", palette=Image.ADAPTIVE)
    cases["gray16"] = Image.fromarray(
        rs.randint(0, 2**16, (120, 90), np.uint16), "I;16"
    )
    cases["bit1"] = cases["gray8"].convert("1")
    paths = {}
    for name, im in cases.items():
        p = tmp_path / f"{name}.png"
        im.save(p)
        paths[name] = str(p)
    return paths


@pytest.mark.skipif(not native.png_available(), reason="libpng not linked")
def test_png_decode_resize_matches_pil(tmp_path):
    """Fused native decode+grayscale+resize == PIL open/convert('L')/resize
    for every PNG flavor; the common flavors MUST take the native path
    (None would silently unpin the contract), rarer ones may fall back but
    must never return wrong bytes."""
    must_decode = {"gray8", "rgb", "rgba", "palette", "gray16", "bit1"}
    for name, p in _png_cases(tmp_path).items():
        ref = np.asarray(Image.open(p).convert("L").resize((128, 128)))
        got = native.load_resize_png(p, (128, 128))
        if got is None:
            assert name not in must_decode, f"{name} fell back to PIL"
            continue
        np.testing.assert_array_equal(got, ref, err_msg=f"mode {name}")


@pytest.mark.skipif(not native.png_available(), reason="libpng not linked")
def test_png_gray16_alpha_matches_pil(tmp_path):
    """16-bit gray+alpha: Pillow reads it as 8-bit-per-channel (high byte),
    NOT with the I;16 clamp — regression test for the gray16 branch."""
    rs = np.random.RandomState(13)
    g = rs.randint(0, 2**16, (40, 30), np.uint16)
    a = np.full((40, 30), 65535, np.uint16)
    import struct, zlib

    # hand-rolled 16-bit gray+alpha PNG (PIL can't write LA;16B)
    raw = b""
    ga = np.stack([g, a], axis=-1).astype(">u2")
    for row in ga:
        raw += b"\x00" + row.tobytes()
    def chunk(tag, data):
        c = struct.pack(">I", len(data)) + tag + data
        return c + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", 30, 40, 16, 4, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(raw))
           + chunk(b"IEND", b""))
    p = tmp_path / "ga16.png"
    p.write_bytes(png)
    ref = np.asarray(Image.open(p).convert("L").resize((16, 16)))
    got = native.load_resize_png(str(p), (16, 16))
    if got is not None:
        np.testing.assert_array_equal(got, ref)


@pytest.mark.skipif(not native.png_available(), reason="libpng not linked")
def test_png_batch_and_failure_reporting(tmp_path):
    paths = list(_png_cases(tmp_path).values())
    bad = str(tmp_path / "missing.png")
    out, ok = native.load_resize_png_batch(paths + [bad], (64, 64), num_threads=2)
    assert not ok[-1]
    for i, p in enumerate(paths):
        if not ok[i]:
            continue
        ref = np.asarray(Image.open(p).convert("L").resize((64, 64)))
        np.testing.assert_array_equal(out[i], ref)


def test_cxr14_get_batch_matches_per_item(tmp_path):
    """Loader's whole-batch native path == per-item __getitem__ exactly."""
    import pandas as pd

    from tedm_tpu.data.datasets import CXR14Dataset
    from tedm_tpu.data.pipeline import Loader

    rs = np.random.RandomState(2)
    names = []
    for i in range(5):
        a = rs.randint(0, 256, (200 + 7 * i, 180), np.uint8)
        name = f"x{i}.png"
        Image.fromarray(a).save(tmp_path / name)
        names.append(name)
    pd.DataFrame({"Image Index": names}).to_csv(tmp_path / "train_split.csv", index=False)
    ds = CXR14Dataset(str(tmp_path), "train_split.csv", img_size=64,
                      splits_dir=str(tmp_path))
    per_item = np.stack([ds[i] for i in range(5)])
    batched = ds.get_batch(list(range(5)))
    np.testing.assert_array_equal(per_item, batched)
    # and through the Loader (batch 3 -> one full + one padded batch)
    batches = list(Loader(ds, batch_size=3, shuffle=False))
    got = np.concatenate([b["image"] for b in batches])[:5]
    np.testing.assert_array_equal(got, per_item)
    assert batches[1]["valid"].tolist() == [1.0, 1.0, 0.0]


def test_dataset_loader_uses_native_and_matches_pil(tmp_path, monkeypatch):
    """datasets._load_pil_image produces the same floats with the native
    path on and off."""
    from tedm_tpu.data import datasets

    img = _rand((400, 300), seed=5)
    p = tmp_path / "x.png"
    Image.fromarray(img).save(p)

    fast = datasets._load_pil_image(str(p), 128)
    monkeypatch.setenv("TEDM_NATIVE", "0")
    slow = datasets._load_pil_image(str(p), 128)
    np.testing.assert_array_equal(fast, slow)
    assert fast.shape == (128, 128, 1) and fast.dtype == np.float32
