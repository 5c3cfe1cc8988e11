"""Tiling math (P14) + multimodal plumbing stubs."""

import pytest

from deepseek_ocr_omnidocbench_spark.operators.multimodal import (
    MAX_CROPS,
    MIN_CROPS,
    count_tiles,
    decode_image,
    fake_decode_image,
    tile_boxes,
    tile_media,
)


def test_square_image_grid():
    cols, rows = count_tiles(1280, 1280)
    assert cols == rows
    assert MIN_CROPS <= cols * rows <= MAX_CROPS


def test_wide_image_prefers_wide_grid():
    cols, rows = count_tiles(2560, 640)
    assert cols > rows


def test_tall_image_prefers_tall_grid():
    cols, rows = count_tiles(640, 2560)
    assert rows > cols


def test_grid_within_crop_budget():
    for w, h in [(500, 500), (4000, 500), (500, 4000), (1920, 1080), (793, 1122)]:
        cols, rows = count_tiles(w, h)
        assert MIN_CROPS <= cols * rows <= MAX_CROPS, (w, h)


def test_tile_boxes_tile_the_canvas():
    boxes = tile_boxes(1280, 1280)
    cols, rows = count_tiles(1280, 1280)
    assert len(boxes) == cols * rows
    assert boxes[0] == (0, 0, 640, 640)
    xs = {b[0] for b in boxes}
    assert xs == {640 * i for i in range(cols)}
    for x0, y0, x1, y1 in boxes:
        assert x1 - x0 == 640 and y1 - y0 == 640


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG...")


def test_fake_decode_deterministic():
    a = fake_decode_image(b"some image bytes")
    assert a == fake_decode_image(b"some image bytes")
    assert 512 <= a[0] <= 2048 and 512 <= a[1] <= 2048


def test_tile_media_spark(spark):
    df = spark.createDataFrame(
        [("m1", b"imagebytes-one"), ("m2", b"imagebytes-two"), ("m3", None)],
        ["media_id", "data"])
    rows = tile_media(df).collect()
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r)
    assert set(by_media) == {"m1", "m2"}  # null media dropped
    for mid, tiles in by_media.items():
        globals_ = [t for t in tiles if t["is_global_view"]]
        assert len(globals_) == 1
        n_crops = len(tiles) - 1
        assert MIN_CROPS <= n_crops <= MAX_CROPS
        idx = sorted(t["tile_idx"] for t in tiles)
        assert idx == list(range(len(tiles)))
