"""tgres_spark — a PySpark-native time-series + data-pipeline engine
with the query and processing capabilities of tgres/tgres.

Layout:
- model:      SeriesFrame contract (name, t, value) + determinism helpers
- operators:  RRD consolidation + the Graphite DSL function library
- sources:    parquet tables, graphite line protocol, statsd packets
- aggregator: statsd flush semantics (counters/gauges/timers)
- dsl:        Graphite target-expression parser → DataFrame plans
- streaming:  Structured Streaming ingest pipeline
- pipeline:   LLM-data ops (dedup, ANN, text stats, multimodal)
"""

__version__ = "0.1.0"
