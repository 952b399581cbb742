"""ocr_ray — a Ray-Data-native document-text-extraction engine.

Recasts the reference's two-stage detect-then-recognize OCR flow
(/root/reference: models/detection/base_detector.py -> models/ocr/base_ocr.py)
as a detect-then-extract flow over Common-Crawl-style Parquet web pages:

  stage 1  segment each page into candidate content blocks
           (DOM heuristics for HTML, layout parse for PDF payloads)
  stage 2  extract + normalize text spans per block, deterministic order

Everything is expressed Ray-Data-first: ``ray.data.Dataset`` pipelines of
``map_batches`` over Arrow batches, actor pools for stateful parser stages,
explicit url-hash repartitioning, and a single ``groupby(url)`` reassembly
shuffle.  No module in this package calls ``ray.init`` / ``ray.shutdown``.
"""

__version__ = "0.1.0"
