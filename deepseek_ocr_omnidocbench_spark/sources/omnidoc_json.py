"""Loader for real OmniDocBench-format ground-truth JSON (SURVEY §1.1).

Flattens the page -> layout_dets nesting into the gt_elements rows the
eval harness consumes (one row per element, truncated relations carried
as ``truncated_pair`` links), plus the page-attribute table.  Mirrors
End2EndDataset's loading (OmniDocBench/dataset/end2end_dataset.py:30-45,
58-69): page-attribute filters apply before matching, ``extra.relation``
entries of type 'truncated' drive block merging, elements keep their
``ignore`` flag (category lists, not the flag, decide scoring).

The JSON is small (annotations, not data); parsing happens driver-side
and lands in DataFrames.  At 10^12-page scale the same rows would live
in an Iceberg table written once by this flattening.
"""

from __future__ import annotations

import json
import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from ..plans.evaluate import GT_SCHEMA, PAGE_ATTR_SCHEMA


def _attr_map(d: Optional[dict]) -> dict:
    out = {}
    for k, v in (d or {}).items():
        if isinstance(v, list):
            out[k] = ",".join(str(x) for x in v)
        elif v is not None:
            out[k] = str(v)
    return out


def flatten_pages(pages: list[dict],
                  page_filter: Optional[dict] = None) -> tuple[list, list]:
    """-> (gt_rows, page_attr_rows) matching GT_SCHEMA / PAGE_ATTR_SCHEMA."""
    gt_rows: list[dict] = []
    page_rows: list[dict] = []
    for page in pages:
        info = page.get("page_info") or {}
        pattr = info.get("page_attribute") or {}
        if page_filter and any(pattr.get(k) != v for k, v in page_filter.items()):
            continue
        img_id = os.path.basename(info.get("image_path") or "")
        special = pattr.get("special_issue") or []
        if not isinstance(special, list):
            special = [special]
        page_rows.append({
            "img_id": img_id,
            "page_attribute": {k: str(v) for k, v in pattr.items()
                               if not isinstance(v, list) and v is not None},
            "special_issue": [str(s) for s in special],
        })
        # truncated links: source -> target (chains merge transitively)
        truncated: dict[int, int] = {}
        for rel in (page.get("extra") or {}).get("relation") or []:
            if rel.get("relation_type") == "truncated":
                truncated[int(rel["source_anno_id"])] = int(rel["target_anno_id"])
        for det in page.get("layout_dets") or []:
            anno_id = det.get("anno_id")
            order = det.get("order")
            gt_rows.append({
                "img_id": img_id,
                "anno_id": int(anno_id) if anno_id is not None else None,
                "category_type": det.get("category_type"),
                "order": float(order) if order is not None else None,
                "text": det.get("text"),
                "latex": det.get("latex"),
                "html": det.get("html"),
                "ignore": bool(det.get("ignore", False)),
                "attribute": _attr_map(det.get("attribute")),
                "truncated_pair": truncated.get(int(anno_id))
                if anno_id is not None else None,
            })
    return gt_rows, page_rows


def load_omnidoc_json(spark: SparkSession, path: str,
                      page_filter: Optional[dict] = None
                      ) -> tuple[DataFrame, DataFrame]:
    """-> (gt_elements, page_attrs) DataFrames from an OmniDocBench JSON."""
    with open(path) as f:
        pages = json.load(f)
    gt_rows, page_rows = flatten_pages(pages, page_filter)
    return (spark.createDataFrame(gt_rows, GT_SCHEMA),
            spark.createDataFrame(page_rows, PAGE_ATTR_SCHEMA))
