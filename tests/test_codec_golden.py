"""Byte-level oracle tests against golden .jelly binaries in the reference.

The golden files were produced by the reference implementation; decoding
them and byte-identically re-encoding proves wire + state-machine parity
without needing protobuf/rdflib installed.

Goldens (/root/repo/FIXTURES.md §4):
- sample.jelly: delimited TRIPLES/FLAT_TRIPLES, tables 4000/150/32, v1
- triple_stream_with_metadata.jelly: frame sizes [245, 55] + metadata
- quads_stream_with_metadata.jelly: graph sizes [33, 35, 15] + metadata
"""

import os

import pytest

from pyjelly_spark.jelly import constants as c
from pyjelly_spark.jelly.decoder import StreamDecoder, split_frame
from pyjelly_spark.jelly.encoder import StreamEncoder, delimit
from pyjelly_spark.jelly.ioutils import (
    frames_from_bytes,
    looks_delimited,
    read_stream_options,
)

REF = "/root/reference/tests"
SAMPLE = f"{REF}/integration_tests/test_examples/example_data/sample.jelly"
TRIPLE_META = (
    f"{REF}/unit_tests/test_parse/test_frame_metadata/"
    "triple_stream_with_metadata.jelly"
)
QUAD_META = (
    f"{REF}/unit_tests/test_parse/test_frame_metadata/"
    "quads_stream_with_metadata.jelly"
)

requires_goldens = pytest.mark.skipif(
    not os.path.exists(SAMPLE), reason="reference goldens not available"
)


def _load(path):
    with open(path, "rb") as handle:
        return handle.read()


@requires_goldens
class TestSniffing:
    def test_sample_is_delimited(self):
        assert looks_delimited(_load(SAMPLE)[:3])

    @pytest.mark.parametrize(
        ("head", "expected"),
        [
            (bytes([0x00, 0x00, 0x00]), True),
            (bytes([0x00, 0x00, 0x0A]), True),
            (bytes([0x00, 0x0A, 0x00]), True),
            (bytes([0x00, 0x0A, 0x0A]), True),
            (bytes([0x0A, 0x00, 0x00]), False),
            (bytes([0x0A, 0x00, 0x0A]), False),
            (bytes([0x0A, 0x0A, 0x00]), True),
            (bytes([0x0A, 0x0A, 0x0A]), False),
        ],
    )
    def test_truth_table(self, head, expected):
        # ported doctest table, /root/reference/pyjelly/parse/ioutils.py:27-49
        assert looks_delimited(head) is expected


@requires_goldens
class TestSampleGolden:
    def test_options_header(self):
        opts = read_stream_options(_load(SAMPLE))
        assert opts.physical_type == c.PHYSICAL_TRIPLES
        assert opts.logical_type == c.LOGICAL_FLAT_TRIPLES
        assert opts.preset == c.TablePreset(4000, 150, 32)
        assert opts.version == 1

    def test_decodes_to_triples(self):
        events = []
        decoder = StreamDecoder()
        for frame in frames_from_bytes(_load(SAMPLE)):
            events.extend(decoder.decode_frame(frame))
        assert events, "sample.jelly should contain statements"
        assert all(e[0] == "triple" for e in events)

    def test_reencode_byte_identical(self):
        """Decode the golden, re-encode with matching options, compare bytes.

        This passes only if every protocol decision matches the reference:
        split points, lookup eviction, delta rules, suppression, framing.
        """
        data = _load(SAMPLE)
        opts = read_stream_options(data)
        decoder = StreamDecoder()
        statements = []
        frame_sizes = []
        for frame in frames_from_bytes(data):
            rows, _meta = split_frame(frame)
            frame_sizes.append(len(rows))
            for row in rows:
                event = decoder.decode_row(row)
                if event is not None:
                    statements.append(event)

        encoder = StreamEncoder(opts)
        out = bytearray()
        for event in statements:
            assert event[0] == "triple"
            frame = encoder.add_triple(event[1], event[2], event[3])
            if frame is not None:
                out += delimit(frame)
        tail = encoder.take_frame()
        if tail is not None:
            out += delimit(tail)
        assert bytes(out) == data


@requires_goldens
class TestMetadataGoldens:
    def test_triple_stream_frame_graph_sizes(self):
        # expected sizes ported from test_frame_metadata.py:38-49
        data = _load(TRIPLE_META)
        decoder = StreamDecoder()
        sizes = []
        metas = []
        for frame in frames_from_bytes(data):
            rows, metadata = split_frame(frame)
            events = [
                e for e in (decoder.decode_row(r) for r in rows) if e is not None
            ]
            sizes.append(len(events))
            metas.append(metadata)
        assert sizes == [245, 55]
        assert metas == [{"c": b"\x00"}, {}]

    def test_quads_stream_graph_sizes(self):
        # expected sizes ported from test_frame_metadata.py:9-29
        data = _load(QUAD_META)
        decoder = StreamDecoder()
        sizes = []
        metas = []
        for frame in frames_from_bytes(data):
            rows, metadata = split_frame(frame)
            events = [
                e for e in (decoder.decode_row(r) for r in rows) if e is not None
            ]
            sizes.append(len(events))
            metas.append(metadata)
        assert sizes == [33, 35, 15]
        assert metas == [{"c": b"\x00"}, {"c": b"\x01"}, {}]


TEMP_EXAMPLES = f"{REF}/integration_tests/test_examples/temp"


@pytest.mark.skipif(
    not os.path.exists(f"{TEMP_EXAMPLES}/foaf.jelly"),
    reason="reference example outputs not available",
)
class TestExampleOutputGoldens:
    """Parity against .jelly files the reference's example scripts produced.

    foaf.jelly is the richest golden available (620 triples, 3 frames at
    the 250-row default boundary, real FOAF ontology IRIs/literals).
    """

    # (file, n_triples, byte_identical_under_row_framing)
    CASES = [
        ("foaf.jelly", 620, True),
        ("output.jelly", 10, False),  # one-frame-per-event framing
        ("flat_output.jelly", 10, True),
        ("temp_output.jelly", 10, True),
    ]

    @pytest.mark.parametrize(("name", "n", "_bi"), CASES)
    def test_decodes(self, name, n, _bi):
        data = _load(f"{TEMP_EXAMPLES}/{name}")
        assert looks_delimited(data[:3])
        decoder = StreamDecoder()
        events = []
        for frame in frames_from_bytes(data):
            events.extend(decoder.decode_frame(frame))
        assert len(events) == n
        assert all(e[0] == "triple" for e in events)

    @pytest.mark.parametrize(
        ("name", "_n", "byte_identical"),
        [case for case in CASES if case[2]],
    )
    def test_reencode_byte_identical(self, name, _n, byte_identical):
        data = _load(f"{TEMP_EXAMPLES}/{name}")
        opts = read_stream_options(data)
        decoder = StreamDecoder()
        statements = []
        for frame in frames_from_bytes(data):
            rows, _meta = split_frame(frame)
            for row in rows:
                event = decoder.decode_row(row)
                if event is not None:
                    statements.append(event)
        encoder = StreamEncoder(opts)
        out = bytearray()
        for event in statements:
            frame = encoder.add_triple(event[1], event[2], event[3])
            if frame is not None:
                out += delimit(frame)
        tail = encoder.take_frame()
        if tail is not None:
            out += delimit(tail)
        assert bytes(out) == data
