"""r_e_hive__spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query and data-processing capabilities of the
reference system ``rtvw16/R-E-hive`` (a Drizzle-ORM/Postgres business
platform; see /root/repo/SURVEY.md for the full structural survey), expressed
as an idiomatic Spark SQL / DataFrame engine:

- fixed ``StructType`` schemas over Parquet with a catalog of registered views
  (``catalog.py``, ``schemas.py``);
- event-sourced semantics: every in-place mutation of the reference becomes an
  append-only fact table + a derived current-state view
  (``pipelines/views.py``);
- the reference's 10-level recursive referral traversal
  (render-complete-deploy.js:246-316) as an iterative DataFrame self-join
  (``operators/graph.py``);
- the commission engine (render-complete-deploy.js:208-316) as a
  set-at-a-time batch pipeline (``pipelines/redemption.py``);
- LLM-data-pipeline extension operators: dedup, similarity search, text
  analysis, multimodal columns (``operators/``);
- Structured Streaming equivalents for the event fan-out surface
  (``streaming/``).

Everything here is public-knowledge PySpark; no code is copied from the
reference (which is JavaScript and contains no execution engine).
"""

__version__ = "0.1.0"

from r_e_hive__spark.session import get_spark  # noqa: F401
