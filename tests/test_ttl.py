"""Deterministic TTL semantics tests — replicating every scenario of the
reference's RocksDbStateTimeoutSuite (FIXTURES.md §5) with an injected
clock instead of Guava's FakeTicker. No wall-clock sleeps anywhere.
"""

from __future__ import annotations

from spark_state_provider_spark.streaming.state_timeout import (
    STATE_EXPIRY_SECS,
    coerce_expiry,
    get_expiration_by_query,
)
from spark_state_provider_spark.streaming.ttl import TtlStateStore


class FakeClock:
    def __init__(self) -> None:
        self.t = 0.0

    def advance(self, secs: float) -> None:
        self.t += secs

    def __call__(self) -> float:
        return self.t


def make(ttl, strict=True):
    clock = FakeClock()
    return TtlStateStore(ttl_secs=ttl, strict=strict, clock=clock), clock


# -- scenario 1: ttl = -1 → no timeout (suite :46-62) -----------------------


def test_no_timeout_key_survives_any_advance():
    store, clock = make(-1)
    store.put("k1", 1)
    clock.advance(10_000_000)
    assert store.get("k1") == 1
    assert store.size == 1


# -- scenario 2: ttl = 0 → stateless, puts instantly invisible (:64-83) -----


def test_stateless_puts_invisible():
    store, clock = make(0)
    store.put("k1", 1)
    store.put("k2", 2)
    assert store.get("k1") is None
    assert store.size == 0
    assert list(store.iterator()) == []


# -- scenario 3: expiry at exactly ttl (:85-102) ----------------------------


def test_processing_timeout_at_exactly_ttl():
    store, clock = make(5)
    store.put("k1", 1)
    clock.advance(3)
    assert store.get("k1") == 1  # visible at t+3 (this read resets it)
    store2, clock2 = make(5)
    store2.put("k1", 1)
    clock2.advance(5)
    assert store2.get("k1") is None  # gone at exactly t+5
    assert store2.size == 0


# -- scenario 4: deadline resets on get/put/update; keys independent (:104-151)


def test_reset_on_get():
    store, clock = make(5)
    store.put("k1", 1)
    clock.advance(4)
    assert store.get("k1") == 1  # read access restarts the 5s window
    clock.advance(4)
    assert store.get("k1") == 1  # 8s after put but 4s after last access
    clock.advance(5)
    assert store.get("k1") is None


def test_reset_on_put_and_update():
    store, clock = make(5)
    store.put("k1", 1)
    clock.advance(4)
    store.put("k1", 2)  # overwrite resets
    clock.advance(4)
    assert store.get("k1") == 2
    clock.advance(4)
    store.update("k1", lambda v: v + 1, 0)  # read-modify-write resets
    clock.advance(4)
    assert store.get("k1") == 3


def test_interleaved_keys_expire_independently():
    store, clock = make(5)
    store.put("k1", 1)
    clock.advance(3)
    store.put("k2", 2)
    clock.advance(3)  # k1: 6s stale → gone; k2: 3s → alive
    assert store.get("k1") is None
    assert store.get("k2") == 2
    assert store.size == 1


# -- scenario 5: per-query TTLs from one conf (:153-221) --------------------


def test_per_query_ttl_independent(spark):
    conf = spark.conf
    conf.set(f"{STATE_EXPIRY_SECS}.fast_query", "3")
    conf.set(f"{STATE_EXPIRY_SECS}.slow_query", "5")
    assert get_expiration_by_query(conf, "fast_query") == 3
    assert get_expiration_by_query(conf, "slow_query") == 5
    # unknown query → unsuffixed key → default -1
    assert get_expiration_by_query(conf, "other_query") == -1
    conf.set(STATE_EXPIRY_SECS, "7")
    assert get_expiration_by_query(conf, "other_query") == 7
    assert get_expiration_by_query(conf, None) == 7  # UNNAMED_QUERY fallback
    conf.unset(STATE_EXPIRY_SECS)

    fast, fclock = make(3)
    slow, sclock = make(5)
    fast.put("k", "f")
    slow.put("k", "s")
    fclock.advance(4)
    sclock.advance(4)
    assert fast.get("k") is None
    assert slow.get("k") == "s"


# -- non-strict (lazy) mode: visible until sweep, write-clocked -------------


def test_non_strict_lazy_expiry():
    store, clock = make(5, strict=False)
    store.put("k1", 1)
    clock.advance(10)
    assert store.get("k1") == 1  # lazy: still visible before compaction
    assert store.sweep() == 1  # compaction removes it
    assert store.get("k1") is None


def test_non_strict_clock_is_write_based():
    store, clock = make(5, strict=False)
    store.put("k1", 1)
    clock.advance(4)
    store.get("k1")  # reads do NOT reset the lazy deadline
    clock.advance(2)
    assert store.sweep() == 1  # 6s after last WRITE → expired


# -- conf parsing parity ----------------------------------------------------


def test_coerce_expiry_specials():
    assert coerce_expiry(None) == -1
    assert coerce_expiry(-7) == -1  # negatives coerce to -1 (implicits.scala:66)
    assert coerce_expiry("42") == 42
    assert coerce_expiry("not-a-number") == -1
    assert coerce_expiry(0) == 0
