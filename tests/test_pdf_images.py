"""PDF image-XObject placements: CTM math, union-find merge, DCT
dimension sniffing (anchor.py:142-151,162-225 semantics, from scratch)."""

import random

from deepseek_ocr_omnidocbench_spark.operators.pdf_extract import (
    _mat_mult,
    _merge_placements,
    _transform,
    extract_pdf_markdown,
    image_anchors,
    pdf_image_report,
)
from deepseek_ocr_omnidocbench_spark.sources.pages import _mini_jpeg, _mini_pdf


def _pdf_with_image(w=200, h=100, x=50, y=300, *, dict_w=None, dict_h=None,
                    extra_ops="", compress=False):
    """Single-page PDF with one /DCTDecode image placed via q/cm/Do."""
    import zlib

    jpeg = _mini_jpeg(w, h)
    content = ("BT /F1 12 Tf 72 700 Td (hello image) Tj ET\n"
               "q\n%s%d 0 0 %d %d %d cm\n/Im0 Do\nQ" % (extra_ops, w, h, x, y))
    payload = zlib.compress(content.encode()) if compress else content.encode()
    filt = " /Filter /FlateDecode" if compress else ""
    objs = [
        ("<< /Length %d%s >>\nstream\n" % (len(payload), filt)).encode()
        + payload + b"\nendstream",
        b"<< /Type /XObject /Subtype /Image /Width %d /Height %d "
        b"/ColorSpace /DeviceRGB /BitsPerComponent 8 /Filter /DCTDecode "
        b"/Length %d >>\nstream\n%s\nendstream"
        % (dict_w if dict_w is not None else w,
           dict_h if dict_h is not None else h, len(jpeg), jpeg),
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        b"<< /Type /Page /Parent 5 0 R /MediaBox [0 0 612 792] "
        b"/Contents 1 0 R /Resources << /Font << /F1 3 0 R >> "
        b"/XObject << /Im0 2 0 R >> >> >>",
        b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>",
        b"<< /Type /Catalog /Pages 5 0 R >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    for i, body in enumerate(objs, 1):
        out += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    out += b"trailer\n<< /Size 7 /Root 6 0 R >>\n%%EOF\n"
    return bytes(out)


def test_matrix_math():
    # translate then scale: point (1,1) -> (1+10, 1+20) -> scaled
    translate = (1.0, 0.0, 0.0, 1.0, 10.0, 20.0)
    scale = (2.0, 0.0, 0.0, 3.0, 0.0, 0.0)
    m = _mat_mult(translate, scale)
    assert _transform(1.0, 1.0, m) == (22.0, 63.0)


def test_single_placement_bbox_and_dims():
    blob = _pdf_with_image(w=200, h=100, x=50, y=300)
    report = pdf_image_report(blob)
    (page,) = [p for p in report if p]
    (rec,) = page
    assert (rec["x0"], rec["y0"], rec["x1"], rec["y1"]) == (50, 300, 250, 400)
    assert rec["fmt"] == "jpeg" and rec["filter"] == "DCTDecode"
    assert rec["width"] == rec["width_true"] == 200
    assert rec["height"] == rec["height_true"] == 100
    assert rec["dims_match"] is True
    # image XObjects must not disturb text extraction
    assert "hello image" in extract_pdf_markdown(blob)


def test_lying_dict_dims_flagged():
    blob = _pdf_with_image(w=200, h=100, dict_w=999, dict_h=1)
    (rec,) = [r for p in pdf_image_report(blob) for r in p]
    assert rec["width"] == 999 and rec["width_true"] == 200
    assert rec["dims_match"] is False


def test_nested_q_cm_stack():
    # outer translate inside q...Q plus inner scale compose; Q pops back
    blob = _pdf_with_image(w=10, h=10, x=0, y=0,
                           extra_ops="1 0 0 1 100 200 cm\nq\n")
    (rec,) = [r for p in pdf_image_report(blob) for r in p]
    # cm order in content: translate(100,200) then scale-place(10,10,0,0):
    # unit square -> scale cm maps to (0..10), then translate -> 100..110
    assert (rec["x0"], rec["y0"], rec["x1"], rec["y1"]) == (100, 200, 110, 210)


def test_overlapping_placements_merge():
    jpeg = _mini_jpeg(64, 64)
    content = ("q 100 0 0 100 50 50 cm /Im0 Do Q\n"
               "q 100 0 0 100 120 120 cm /Im1 Do Q\n"   # overlaps Im0
               "q 50 0 0 50 500 600 cm /Im2 Do Q")      # separate
    objs = [
        ("<< /Length %d >>\nstream\n%s\nendstream" % (len(content), content)).encode(),
        b"<< /Subtype /Image /Width 64 /Height 64 /Filter /DCTDecode >>\nstream\n" + jpeg + b"\nendstream",
        b"<< /Subtype /Image /Width 64 /Height 64 /Filter /DCTDecode >>\nstream\n" + jpeg + b"\nendstream",
        b"<< /Subtype /Image /Width 64 /Height 64 /Filter /DCTDecode >>\nstream\n" + jpeg + b"\nendstream",
        b"<< /Type /Page /Contents 1 0 R /Resources << /XObject "
        b"<< /Im0 2 0 R /Im1 3 0 R /Im2 4 0 R >> >> >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    for i, body in enumerate(objs, 1):
        out += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    report = pdf_image_report(bytes(out))
    (page,) = [p for p in report if p]
    assert len(page) == 2
    merged = [r for r in page if "+" in r["name"]][0]
    assert (merged["x0"], merged["y0"], merged["x1"], merged["y1"]) == (50, 50, 220, 220)
    lone = [r for r in page if "+" not in r["name"]][0]
    assert (lone["x0"], lone["y0"]) == (500, 600)


def test_merge_placements_transitive_chain():
    def box(x):  # unit-width chain: 0-1.2, 1-2.2, 2-3.2 all link up
        return {"name": "i%d" % x, "x0": float(x), "y0": 0.0,
                "x1": x + 1.2, "y1": 1.0}
    merged = _merge_placements([box(0), box(1), box(2)])
    assert len(merged) == 1
    assert merged[0]["x1"] == 3.2


def test_anchor_strings_reference_shape():
    blob = _pdf_with_image(w=200, h=100, x=50, y=300)
    anchors = [a for a in image_anchors(blob) if a]
    assert anchors == ["[Image 50x300 to 250x400]"]


def test_compressed_content_stream_placements():
    blob = _pdf_with_image(w=80, h=40, x=10, y=20, compress=True)
    (rec,) = [r for p in pdf_image_report(blob) for r in p]
    assert (rec["x0"], rec["y0"], rec["x1"], rec["y1"]) == (10, 20, 90, 60)


def test_no_images_and_non_pdf():
    rng = random.Random("img:1")
    assert pdf_image_report(_mini_pdf(rng)) == []
    assert pdf_image_report(b"<html></html>") == []
    assert pdf_image_report(None) is None
    assert image_anchors(None) is None


def test_mini_pdf_with_images_text_unchanged():
    md_plain = extract_pdf_markdown(_mini_pdf(random.Random("s:9")))
    md_img = extract_pdf_markdown(_mini_pdf(random.Random("s:9"), with_images=True))
    assert md_plain == md_img  # images never leak into extracted text
    blob = _mini_pdf(random.Random("s:9"), with_images=True)
    report = pdf_image_report(blob)
    assert sum(len(p) for p in report) >= 1
    for rec in (r for p in report for r in p):
        assert rec["dims_match"] is True


def test_spark_pdf_image_placements(spark):
    from deepseek_ocr_omnidocbench_spark.operators.multimodal import (
        pdf_image_placements,
    )

    rows = []
    for i in range(6):
        rng = random.Random("spark-img:%d" % i)
        blob = _mini_pdf(rng, compress=(i % 2 == 0), with_images=(i % 3 != 0))
        rows.append(("https://x.org/%d.pdf" % i, bytearray(blob)))
    rows.append(("https://x.org/html", bytearray(b"<html><p>n</p></html>")))
    rows.append(("https://x.org/null", None))
    df = spark.createDataFrame(rows, "url string, html binary")
    out = pdf_image_placements(df).collect()
    assert len(out) >= 2
    urls = {r.url for r in out}
    assert "https://x.org/html" not in urls and "https://x.org/null" not in urls
    for r in out:
        assert r.dims_match is True
        assert r.width == r.width_true and r.height == r.height_true
        assert r.x1 > r.x0 and r.y1 > r.y0
        assert r.fmt == "jpeg" and r.filter == "DCTDecode"
