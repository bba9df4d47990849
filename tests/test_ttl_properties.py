"""Property-based TTL semantics: random op/clock sequences must always
satisfy the reference's deadline rules (strict = last-access based,
non-strict = last-write based; -1/0 specials). An independent shadow model
recomputes liveness from the raw op log on every step.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from spark_state_provider_spark.streaming.ttl import TtlStateStore

KEYS = ["k1", "k2", "k3"]

op = st.one_of(
    st.tuples(st.just("put"), st.sampled_from(KEYS), st.integers(0, 100)),
    st.tuples(st.just("get"), st.sampled_from(KEYS), st.none()),
    st.tuples(st.just("remove"), st.sampled_from(KEYS), st.none()),
    st.tuples(st.just("advance"), st.none(), st.integers(1, 10)),
    st.tuples(st.just("sweep"), st.none(), st.none()),
)


class Clock:
    def __init__(self):
        self.t = 0.0

    def __call__(self):
        return self.t


def run_model(ops, ttl, strict):
    """Execute ops on the store while a shadow dict tracks expected
    liveness from first principles."""
    clock = Clock()
    store = TtlStateStore(ttl_secs=ttl, strict=strict, clock=clock)
    shadow: dict[str, dict] = {}  # key -> {value, last_put, last_access}

    def expired(e):
        if ttl == -1:
            return False
        basis = e["last_access"] if strict else e["last_put"]
        return clock.t - basis >= ttl

    for kind, key, arg in ops:
        if kind == "put":
            store.put(key, arg)
            if ttl != 0:
                shadow[key] = {"value": arg, "last_put": clock.t, "last_access": clock.t}
        elif kind == "get":
            got = store.get(key)
            e = shadow.get(key)
            if e is None:
                assert got is None
            elif strict and expired(e):
                assert got is None
                del shadow[key]  # strict get evicts expired entries
            else:
                assert got == e["value"], (key, got, e)
                if strict:
                    e["last_access"] = clock.t  # read resets strict deadline
        elif kind == "remove":
            store.remove(key)
            shadow.pop(key, None)
        elif kind == "advance":
            clock.t += arg
        elif kind == "sweep":
            removed = store.sweep()
            dead = [k for k, e in shadow.items() if expired(e)]
            assert removed == len(dead), (removed, dead)
            for k in dead:
                del shadow[k]

    # final invariant: visible size == live shadow entries
    live = [k for k, e in shadow.items() if not (strict and expired(e))]
    assert store.size == len(live), (store.size, live)


@settings(max_examples=200, deadline=None)
@given(ops=st.lists(op, max_size=40), ttl=st.sampled_from([-1, 0, 3, 7]))
def test_strict_semantics_hold(ops, ttl):
    run_model(ops, ttl, strict=True)


@settings(max_examples=200, deadline=None)
@given(ops=st.lists(op, max_size=40), ttl=st.sampled_from([-1, 0, 3, 7]))
def test_lazy_semantics_hold(ops, ttl):
    run_model(ops, ttl, strict=False)
