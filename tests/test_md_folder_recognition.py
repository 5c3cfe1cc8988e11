"""Markdown folder source (S2/S3 filename fallbacks) + recognition task."""

import os

from pyspark.sql import functions as F

from deepseek_ocr_omnidocbench_spark.plans.recognition import (
    recog_formula_normalize,
    recognition_report,
    score_recognition,
)
from deepseek_ocr_omnidocbench_spark.sources.md_folder import (
    missing_predictions,
    resolve_predictions,
    scan_md_folder,
)


def write(folder, name, body):
    with open(os.path.join(folder, name), "w") as f:
        f.write(body)


def test_four_fallback_conventions(spark, tmp_path):
    folder = str(tmp_path)
    write(folder, "page1.md", "direct")          # 1: stem.md
    write(folder, "page2.mmd", "nougat")         # 2: stem-.pdf + .mmd
    write(folder, "page3.md", "marker")          # 3: stem-.pdf + .md
    write(folder, "page4.jpg.md", "mineru")      # 4: fullname.md
    images = spark.createDataFrame(
        [("page1.jpg",), ("page2.pdf.jpg",), ("page3.pdf.jpg",),
         ("page4.jpg",), ("page5.jpg",)], ["img_id"])
    files = scan_md_folder(spark, folder)
    got = {r["img_id"]: r["md"] for r in resolve_predictions(images, files).collect()}
    assert got == {"page1.jpg": "direct", "page2.pdf.jpg": "nougat",
                   "page3.pdf.jpg": "marker", "page4.jpg": "mineru"}
    missing = [r["img_id"] for r in missing_predictions(images,
               resolve_predictions(images, files)).collect()]
    assert missing == ["page5.jpg"]


def test_priority_order_prefers_md_over_mmd(spark, tmp_path):
    folder = str(tmp_path)
    write(folder, "pg.md", "primary")
    write(folder, "pg.mmd", "secondary")
    images = spark.createDataFrame([("pg.pdf.jpg",)], ["img_id"])
    # stem = "pg.pdf"; prio1 cand "pg.pdf.md" missing; prio2 "pg.mmd" hit
    got = resolve_predictions(images, scan_md_folder(spark, folder)).collect()
    assert got[0]["md"] == "secondary"
    images2 = spark.createDataFrame([("pg.jpg",)], ["img_id"])
    got2 = resolve_predictions(images2, scan_md_folder(spark, folder)).collect()
    assert got2[0]["md"] == "primary"


def test_recog_formula_normalize():
    assert recog_formula_normalize("x + y = z") == "x+y=z"
    assert recog_formula_normalize(r"\mathrm {a b}") == r"\mathrm{ab}"
    # letter-letter whitespace is kept (words stay separated)
    assert recog_formula_normalize("ab cd") == "ab cd"


def test_score_recognition(spark):
    pairs = spark.createDataFrame(
        [("i1", "text", "Hello, world!", "Hello world"),
         ("i1", "formula", r"$$x + y$$", r"\[ x+y \]"),
         ("i2", "table", "<table><tr><td>1</td></tr></table>",
          "<table><tr><td>1</td></tr></table>"),
         ("i2", "formula_line", "a + b", "a+b")],
        ["img_id", "category_type", "gt", "pred"])
    scored = score_recognition(pairs)
    rows = {(r["img_id"], r["category_type"]): r for r in scored.collect()}
    assert rows[("i1", "text")]["edit_dist"] == 0.0     # punctuation stripped
    assert rows[("i1", "formula")]["edit_dist"] == 0.0  # $$ and \[ \] normalize
    assert rows[("i2", "table")]["edit_dist"] == 0.0
    assert rows[("i2", "formula_line")]["edit_dist"] == 0.0
    rep = {r["category_type"]: r for r in recognition_report(scored).collect()}
    assert rep["text"]["n_samples"] == 1
    assert all(r["edit_sample_avg"] == 0.0 for r in rep.values())
