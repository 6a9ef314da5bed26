"""idn_area_etl_spark — a PySpark-native analytics/ETL engine.

A from-scratch re-expression of the capabilities of the reference
``fityannugroho/idn-area-etl`` (see SURVEY.md), built Spark-first:

- The cleansing function library (reference ``utils.py``) is implemented
  as **native Catalyst column expressions** (``functions/``) — no Python
  UDFs in the hot path, so the whole pipeline stays inside
  whole-stage codegen on the JVM.
- Extraction pipelines (reference ``extractors.py``) operate on a
  long-form raw-table DataFrame ``(page_no, table_no, row_no,
  cells: array<string>)`` and route tables via a registry with
  first-match-wins dispatch (``operators/``).
- A general query surface over TPC-H-ish data plus LLM-data-pipeline
  operators (dedup / similarity / text analysis / multimodal) live in
  ``plans/`` and ``operators/``.

Everything is designed for a large cluster: declarative DataFrame plans
(Catalyst does pushdown/pruning), broadcast joins for per-table
metadata, no driver-side loops over data, explicit ordering columns
where the reference relies on document order.
"""

__version__ = "0.1.0"
