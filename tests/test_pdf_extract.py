"""Minimal PDF text/layout extraction (P9/P10 port)."""

import random

from deepseek_ocr_omnidocbench_spark.operators.pdf_extract import (
    _layout_to_markdown,
    _unescape_pdf,
    extract_pdf_markdown,
)
from deepseek_ocr_omnidocbench_spark.sources.pages import _mini_pdf


def test_non_pdf_bytes():
    assert extract_pdf_markdown(b"not a pdf") == ""
    assert extract_pdf_markdown(None) is None


def test_mini_pdf_extracts_text():
    rng = random.Random("t:1")
    blob = _mini_pdf(rng)
    md = extract_pdf_markdown(blob)
    assert md
    assert md.startswith("# ")  # 24pt first line becomes a heading


def test_layout_reading_order():
    # (y, x, size, text): top-to-bottom, left-to-right within a line
    els = [(700.0, 300.0, 12.0, "right"), (700.5, 10.0, 12.0, "left"),
           (690.0, 10.0, 12.0, "below")]
    md = _layout_to_markdown(els)
    assert md == "left right below"


def test_paragraph_gap_splits_blocks():
    els = [(700.0, 10.0, 12.0, "para one"), (650.0, 10.0, 12.0, "para two")]
    md = _layout_to_markdown(els)
    assert md == "para one\n\npara two"  # 50pt gap > PARA_GAP


def test_heading_font_size():
    els = [(700.0, 10.0, 20.0, "Big Title"), (680.0, 10.0, 12.0, "body")]
    md = _layout_to_markdown(els)
    assert md.startswith("# Big Title")


def test_pdf_string_unescape():
    assert _unescape_pdf(r"a\(b\)c") == "a(b)c"
    assert _unescape_pdf(r"x\\y") == "x\\y"
    assert _unescape_pdf(r"\101") == "A"
    assert _unescape_pdf(r"tab\there") == "tab\there"


def test_flate_compressed_twin_extracts_identically():
    """A Flate-compressed content stream must extract byte-identically to
    its uncompressed twin (real-world CC PDFs are all compressed)."""
    plain = extract_pdf_markdown(_mini_pdf(random.Random("f:9")))
    flate = extract_pdf_markdown(_mini_pdf(random.Random("f:9"), compress=True))
    assert plain and flate == plain


def _pdf_lzw_encode(data: bytes) -> bytes:
    """PDF-variant LZW encoder (test-side twin of _lzw_decode): clear
    code first, early-change width bumps, EOD terminator."""
    table = {bytes([i]): i for i in range(256)}
    next_code, width = 258, 9
    chunks = [(256, 9)]
    w = b""
    for ch in data:
        c = bytes([ch])
        if w + c in table:
            w += c
            continue
        chunks.append((table[w], width))
        table[w + c] = next_code
        next_code += 1
        if next_code >= (1 << width) and width < 12:
            width += 1
        w = c
    if w:
        chunks.append((table[w], width))
    chunks.append((257, width))
    acc = bits = 0
    out = bytearray()
    for code, cw in chunks:
        acc = (acc << cw) | code
        bits += cw
        while bits >= 8:
            bits -= 8
            out.append((acc >> bits) & 0xFF)
    if bits:
        out.append((acc << (8 - bits)) & 0xFF)
    return bytes(out)


def _one_stream_pdf(payload: bytes, filt: str) -> bytes:
    return (b"%PDF-1.4\n1 0 obj\n<< /Length " + str(len(payload)).encode()
            + (" /Filter /%s >>\n" % filt).encode()
            + b"stream\n" + payload + b"\nendstream\nendobj\n%%EOF")


CONTENT = b"BT\n/F1 12 Tf\n72 700 Td\n(lzw works here) Tj\nET"


def test_lzw_stream_extracts():
    blob = _one_stream_pdf(_pdf_lzw_encode(CONTENT), "LZWDecode")
    assert extract_pdf_markdown(blob) == "lzw works here"


def test_lzw_roundtrips_across_width_bumps():
    import random as _r

    from deepseek_ocr_omnidocbench_spark.operators.pdf_extract import _lzw_decode

    rng = _r.Random(5)
    for n in (0, 1, 300, 2500, 6000):
        data = bytes(rng.choice(b"abcdef ()BT") for _ in range(n))
        assert _lzw_decode(_pdf_lzw_encode(data)) == data


def test_asciihex_stream_extracts():
    import binascii

    payload = binascii.hexlify(CONTENT) + b">"
    blob = _one_stream_pdf(payload, "ASCIIHexDecode")
    assert extract_pdf_markdown(blob) == "lzw works here"


def test_ascii85_stream_extracts():
    import base64

    payload = base64.a85encode(CONTENT) + b"~>"
    blob = _one_stream_pdf(payload, "ASCII85Decode")
    assert extract_pdf_markdown(blob) == "lzw works here"


def test_ascii85_flate_chain_extracts():
    """Filter chain [/ASCII85Decode /FlateDecode] — transport decode
    first, then inflate (common in pre-binary-transport PDFs)."""
    import base64
    import zlib as _z

    payload = base64.a85encode(_z.compress(CONTENT)) + b"~>"
    blob = (b"%PDF-1.4\n1 0 obj\n<< /Length " + str(len(payload)).encode()
            + b" /Filter [/ASCII85Decode /FlateDecode] >>\n"
            + b"stream\n" + payload + b"\nendstream\nendobj\n%%EOF")
    assert extract_pdf_markdown(blob) == "lzw works here"


def _rle_encode(data: bytes) -> bytes:
    """Test-side twin of _rle_decode: naive literal/run packer."""
    out = bytearray()
    i = 0
    while i < len(data):
        run = 1
        while (i + run < len(data) and run < 128
               and data[i + run] == data[i]):
            run += 1
        if run >= 2:
            out += bytes([257 - run, data[i]])
            i += run
        else:
            j = i + 1
            while (j < len(data) and j - i < 128
                   and not (j + 1 < len(data) and data[j] == data[j + 1])):
                j += 1
            out += bytes([j - i - 1]) + data[i:j]
            i = j
    out.append(128)
    return bytes(out)


def test_runlength_stream_extracts():
    blob = _one_stream_pdf(_rle_encode(CONTENT), "RunLengthDecode")
    assert extract_pdf_markdown(blob) == "lzw works here"


def test_unrelated_rl_name_does_not_trigger_rle_decode():
    """ISO 32000 reserves /RL and /A85 for inline images; a stream dict
    carrying an unrelated /RLx key must still decode via its real
    /Filter instead of being RunLength-mangled."""
    import zlib as _z

    payload = _z.compress(CONTENT)
    blob = (b"%PDF-1.4\n1 0 obj\n<< /Length " + str(len(payload)).encode()
            + b" /RLx 3 /A85meta (x) /Filter /FlateDecode >>\n"
            + b"stream\n" + payload + b"\nendstream\nendobj\n%%EOF")
    assert extract_pdf_markdown(blob) == "lzw works here"


def test_runlength_roundtrips():
    import random as _r

    from deepseek_ocr_omnidocbench_spark.operators.pdf_extract import _rle_decode

    rng = _r.Random(7)
    for n in (0, 1, 129, 300, 4000):
        data = bytes(rng.choice(b"aaaabc") for _ in range(n))
        assert _rle_decode(_rle_encode(data)) == data
    assert _rle_decode(bytes([255]) + b"x" + bytes([128])) == b"xx"
    assert _rle_decode(bytes([129]) + b"x" + bytes([128])) == b"x" * 128
    assert _rle_decode(bytes([0])) is None  # truncated literal


def test_flate_garbage_stream_is_skipped():
    blob = (b"%PDF-1.4\n1 0 obj\n<< /Length 9 /Filter /FlateDecode >>\n"
            b"stream\nnot-flate\nendstream\nendobj\n%%EOF")
    assert extract_pdf_markdown(blob) == ""


def test_determinism():
    rng1, rng2 = random.Random("s:5"), random.Random("s:5")
    assert extract_pdf_markdown(_mini_pdf(rng1)) == extract_pdf_markdown(_mini_pdf(rng2))
