"""PySpark-native document-extraction + OmniDocBench-style evaluation engine.

A from-scratch, Spark-first implementation of the capabilities of the
reference repo alphaXiv/DeepSeek-OCR-OmniDocBench (studied read-only at
/root/reference): HTML/PDF -> markdown main-content extraction over
Common-Crawl-style page tables, the OmniDocBench evaluation harness
(element matching + edit-distance/TEDS/reading-order metrics) re-expressed
as distributed DataFrame aggregations, plus the training-data-pipeline
operators (dedup, similarity search, text analysis) such an engine needs
at 100 TB scale.

Design rules:
  * DataFrame/SQL first; Catalyst does the optimizing.
  * Python only inside Arrow-batched pandas UDFs / applyInPandas.
  * Shuffles keyed on img_id/url-hash with salting for skew.
"""

__version__ = "0.1.0"
