"""Spark sources/sinks: Jelly streams (batch + structured streaming),
N-Triples/N-Quads, and the Iceberg-shaped source-code table."""

from pyjelly_spark.sources.jelly_io import (  # noqa: F401
    guess_options,
    read_jelly,
    read_jelly_frame_meta,
    read_jelly_namespaces,
    read_jelly_stream,
    transcode,
    write_jelly,
)
from pyjelly_spark.sources.jelly_datasource import (  # noqa: F401
    JellyDataSource,
    register_jelly,
)
from pyjelly_spark.sources.nt_source import read_nt, write_nt  # noqa: F401
