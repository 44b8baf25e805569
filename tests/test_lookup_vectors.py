"""Lookup/LRU + delta-encoding conformance vectors.

These expectations are ported from the reference's unit tests (the spec's
MUSTs): /root/reference/tests/unit_tests/test_serialize/test_lookups/
test_lookup.py:39-126 and test_lookup_encoder.py:30-208, plus the decoder
duals /root/reference/tests/unit_tests/test_parse/test_lookup_decoder.py.
"""

import pytest
from hypothesis import given
from hypothesis import strategies as st

from pyjelly_spark.jelly.constants import JellyError
from pyjelly_spark.jelly.decoder import DecodeTable
from pyjelly_spark.jelly.encoder import LruIndex, TableState, split_iri


class TestLruIndex:
    def test_zero_capacity_rejects_insert(self):
        table = LruIndex(0)
        with pytest.raises(JellyError):
            table.add("foo")

    @pytest.mark.parametrize("capacity", [1, 2, 10, 11, 50, 1190])
    def test_never_exceeds_capacity(self, capacity):
        table = LruIndex(capacity)
        for i in range(capacity):
            table.add(f"key{i}")
            assert len(table) <= capacity
        for i in range(capacity, capacity * 2):
            table.add(f"key{i}")
            assert len(table) == capacity

    def test_sequential_indices(self):
        table = LruIndex(3)
        assert [table.add(k) for k in ("k1", "k2", "k3")] == [1, 2, 3]

    def test_eviction_recycles_indices(self):
        table = LruIndex(3)
        for k in ("k1", "k2", "k3"):
            table.add(k)
        assert [table.add(f"k{i}") for i in range(4, 10)] == [1, 2, 3, 1, 2, 3]

    def test_hit_refreshes_recency(self):
        # mirrors test_make_last_to_evict (reference test_lookup.py:69-114)
        table = LruIndex(3)
        a = table.add("a")
        b = table.add("b")
        table.hit("a")                      # order: b, a
        c = table.add("c")                  # order: b, a, c
        assert table.add("d") == b          # evicts b
        assert table.add("e") == a          # evicts a
        assert table.add("f") == c          # evicts c
        table.hit("e")                      # order: d, f, e
        d_idx = table.hit("d")
        table.hit("e")
        # rebuild exact scenario: d, f, e with hit order d(oldest) f e
        assert d_idx is not None

    def test_full_eviction_order_scenario(self):
        """Byte-for-byte port of the reference eviction walk."""
        table = LruIndex(3)
        a = table.add("a")
        b = table.add("b")
        table.hit("a")
        c = table.add("c")
        d = table.add("d")
        assert d == b
        e = table.add("e")
        assert e == a
        f = table.add("f")
        assert f == c
        table.hit("e")
        g = table.add("g")
        assert g == d
        h = table.add("h")
        assert h == f
        i = table.add("i")
        assert i == e

    def test_hit_missing_returns_none(self):
        assert LruIndex(1).hit("nope") is None


class TestDeltaEncoding:
    """Ports of test_lookup_encoder.py expectations."""

    def test_entry_id_zero_compression(self):
        state = TableState(4)
        assert state.entry_id("foo") == 0  # index 1 == 0+1 -> compressed
        assert state.entry_id("") == 0     # index 2 == 1+1
        assert state.entry_id("bar") == 0  # index 3
        state.last_set = 10
        assert state.entry_id("baz") == 4  # 4 != 11 -> explicit

    def test_entry_id_none_when_present(self):
        state = TableState(4)
        state.entry_id("foo")
        assert state.entry_id("foo") is None

    def test_term_use_returns_real_index(self):
        state = TableState(5)
        for key in ("foo", "bar", "biz", "baz", "qux"):
            state.entry_id(key)
        assert state._use("qux") == 5
        assert state._use("bar") == 2
        assert state._use("baz") == 4
        assert state._use("foo") == 1
        assert state._use("biz") == 3

    def test_name_ref_auto_increment(self):
        state = TableState(3)
        state.entry_id("foo")
        state.entry_id("bar")
        assert state.name_ref("foo") == 0  # 1 == 0+1
        assert state.name_ref("bar") == 0  # 2 == 1+1
        state.entry_id("baz")
        assert state.name_ref("baz") == 0  # 3 == 2+1

    def test_prefix_ref_sticky(self):
        state = TableState(3)
        state.entry_id("foo")
        state.entry_id("bar")
        assert state.prefix_ref("foo") == 1
        assert state.prefix_ref("foo") == 0  # same as last used
        assert state.prefix_ref("bar") == 2
        assert state.prefix_ref("bar") == 0
        state.entry_id("baz")
        assert state.prefix_ref("baz") == 3
        assert state.prefix_ref("baz") == 0

    def test_prefix_ref_empty_never_used(self):
        state = TableState(3)
        assert state.prefix_ref("") == 0
        assert len(state.table) == 0

    def test_prefix_ref_empty_after_nonempty(self):
        state = TableState(3)
        state.entry_id("foo")
        state.entry_id("")
        assert state.prefix_ref("foo") == 1
        assert state.prefix_ref("") == 2

    def test_prefix_ref_disabled_table(self):
        state = TableState(0)
        assert state.prefix_ref("foo") == 0
        assert state.prefix_ref("bar") == 0

    def test_datatype_ref_disabled_table(self):
        state = TableState(0)
        assert state.datatype_ref("foo") == 0

    def test_datatype_ref_explicit(self):
        state = TableState(3)
        state.entry_id("dt1")
        state.entry_id("dt2")
        assert state.datatype_ref("dt1") == 1
        assert state.datatype_ref("dt1") == 1  # never compressed to 0
        assert state.datatype_ref("dt2") == 2


class TestDecodeTable:
    def test_zero_assign_means_sequential(self):
        table = DecodeTable(4)
        table.put(0, "a")  # -> 1
        table.put(0, "b")  # -> 2
        table.put(4, "c")  # explicit jump
        table.put(1, "d")  # explicit overwrite, last_set follows
        table.put(0, "e")  # -> 2 (last_set 1 + 1)
        assert table.fetch(1) == "d"
        assert table.fetch(2) == "e"
        assert table.fetch(4) == "c"

    def test_prefix_zero_sticky(self):
        table = DecodeTable(4)
        assert table.prefix_at(0) == ""  # never used
        table.put(0, "p1")
        assert table.prefix_at(1) == "p1"
        assert table.prefix_at(0) == "p1"  # sticky

    def test_name_zero_auto_increment(self):
        table = DecodeTable(4)
        table.put(0, "n1")
        table.put(0, "n2")
        assert table.name_at(0) == "n1"  # last_used 0 -> 1
        assert table.name_at(0) == "n2"  # last_used 1 -> 2

    def test_datatype_zero_invalid(self):
        table = DecodeTable(4)
        with pytest.raises(JellyError):
            table.datatype_at(0)

    def test_oversized_table_rejected(self):
        with pytest.raises(JellyError):
            DecodeTable(4097)

    @given(st.integers(min_value=1, max_value=200), st.integers(min_value=0, max_value=500))
    def test_roundtrip_random_sizes(self, capacity, n_keys):
        """Encoder-assigned ids always decode back to the same string."""
        enc = TableState(capacity)
        dec = DecodeTable(capacity)
        for i in range(n_keys):
            key = f"key-{i % (capacity * 2)}"
            entry = enc.entry_id(key)
            if entry is not None:
                dec.put(entry, key)
            idx = enc._use(key)
            assert dec.fetch(idx) == key


class TestSplitIri:
    @pytest.mark.parametrize(
        ("iri", "expected"),
        [
            ("http://example.org/ns#thing", ("http://example.org/ns#", "thing")),
            ("http://example.org/ns/thing", ("http://example.org/ns/", "thing")),
            ("http://example.org/a#b/c", ("http://example.org/a#", "b/c")),
            ("urn:uuid:1234", ("", "urn:uuid:1234")),
            ("http://example.org/", ("http://example.org/", "")),
            ("#frag", ("#", "frag")),
            ("", ("", "")),
        ],
    )
    def test_split(self, iri, expected):
        assert split_iri(iri) == expected
