"""Property-based tests (hypothesis) for the sketch operators' pure
logic: the streaming KMV update must be a true mergeable synopsis —
batch-split invariant for EVERY input, not just the unit-test cases."""

from __future__ import annotations

import hashlib

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from pyjelly_spark.streaming.jobs import KMV_K, _kmv_update


class FakeState:
    def __init__(self):
        self.exists = False
        self._v = None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v
        self.exists = True


def _final(batches):
    st_ = FakeState()
    out = []
    for b in batches:
        out.extend(_kmv_update(("g",), iter([b]), st_))
    last = pd.concat(out).sort_values("ver").iloc[-1]
    return (last["n_min"], last["kth_hash"])


def _sha60(x) -> int:
    return int(hashlib.sha256(str(x).encode()).hexdigest()[:15], 16)


@settings(max_examples=60, deadline=None)
@given(
    keys=st.lists(st.integers(min_value=0, max_value=10**6), min_size=1, max_size=120),
    cuts=st.lists(st.integers(min_value=0, max_value=120), max_size=4),
)
def test_kmv_stream_split_invariant(keys, cuts):
    whole = _final([pd.DataFrame({"user_id": pd.Series(keys, dtype="int64")})])

    bounds = sorted({min(c, len(keys)) for c in cuts} | {0, len(keys)})
    batches = [
        pd.DataFrame({"user_id": pd.Series(keys[a:b], dtype="int64")})
        for a, b in zip(bounds, bounds[1:])
        if b > a
    ]
    assert _final(batches) == whole

    # ground truth: k smallest distinct hashes
    hs = sorted({_sha60(k) for k in keys})
    n_min = min(len(hs), KMV_K)
    kth = hs[KMV_K - 1] if len(hs) >= KMV_K else None
    assert whole == (n_min, kth)
