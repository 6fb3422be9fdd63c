"""ssidentity_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference (SamClarke2012/SSIDentity: passive 802.11 probe-request capture →
parse → derive → append-only store → correlation analytics), re-expressed
Spark-first: Structured Streaming ingest over binary frames, partitioned
Parquet storage, and a declarative DataFrame/SQL analytics surface that lets
Catalyst + AQE pick physical strategy. Extended with the LLM-data-pipeline
operator families (dedup, similarity search, multimodal columns, text
analysis) designed for 100 TB scale.

Blueprint: SURVEY.md at the repo root.
"""

__version__ = "0.1.0"
