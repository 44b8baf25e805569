"""pyjelly_spark: a PySpark-native knowledge-graph construction engine.

Capabilities mirror the pyjelly reference (Jelly-RDF binary RDF streams)
re-expressed Spark-first: triple extraction from source-code tables,
entity linking, connected-component canonicalization, and Jelly protobuf
stream materialization — plus the large-scale training-data operators
(dedup, similarity search, text analysis) that a 100 TB pipeline needs.
"""

__version__ = "0.1.0"
