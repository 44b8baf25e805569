"""Pure-Python Jelly (RDF binary protocol) codec, no protobuf dependency."""

from pyjelly_spark.jelly.constants import (  # noqa: F401
    JellyError,
    StreamOptions,
    TablePreset,
)
from pyjelly_spark.jelly.decoder import StreamDecoder, decode_flat  # noqa: F401
from pyjelly_spark.jelly.encoder import StreamEncoder, encode_flat, split_iri  # noqa: F401
from pyjelly_spark.jelly.grouped import (  # noqa: F401
    decode_grouped,
    encode_grouped,
    grouped_options,
    split_to_graphs,
)
