"""iceberg_insert_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the capabilities of ``dataphion/iceberg-insert``
(reference: /root/reference/icebergIngest, a single-threaded Java JSON->Iceberg
ingest utility) re-expressed Spark-first, plus the relational / windowed /
streaming / LLM-data-pipeline operator surface declared in SURVEY.md §2.

Design principles (SURVEY.md §4.3):
  * DataFrame/SQL declarative plans; Catalyst + AQE pick physical strategies.
  * No driver-side materialization anywhere (the reference buffers whole blobs
    on one thread, App.java:190-193 — that pattern is banned here).
  * Broadcast small dimensions, hash-distribute writes, LSH instead of
    cross-join at scale.
"""

__version__ = "0.1.0"
