"""TTL state semantics — the reference's one genuinely novel operator.

Reference behavior being replicated (RocksDbStateStoreProvider.scala:57-80,
107, 126-131, 189-191, 256-261, 698-713; README.md:38-108):

* **non-strict** (lazy, TtlDB-style): a key's deadline is ``last_put + ttl``
  but expiry is only applied at compaction — reads may still see a value
  past its TTL until a sweep runs ("persisted data … removed (lazily) after
  the timeout"). RocksDB's ``TtlDB`` clocks from the last *write*.
* **strict** (Guava ``expireAfterAccess`` overlay): the deadline is
  ``last_access + ttl`` where *access* = create, update, **and read**
  (RocksDbStateTimeoutSuite.scala:104-151 asserts the reset-on-get rule);
  ``get``/``iterator``/``size`` consult the overlay so an expired key is
  invisible at exactly ``ttl`` seconds after its last access.
* specials: ``-1`` → never expire; ``0`` → stateless, puts instantly
  invisible (size stays 0).
* timing is processing-time and independent of query progress
  (README.md:46-52); the clock is injectable (the reference's tests inject a
  Guava ``FakeTicker`` — RocksDbStateTimeoutSuite.scala:223-251) so every
  semantic is testable without wall-clock sleeps.

:class:`TtlStateStore` is the *semantic model*: the per-group decision logic
the streaming handlers in ``stateful.py`` apply inside
``applyInPandasWithState``, and the spec the deterministic pytest scenarios
drive. At scale the store itself is Spark's native RocksDB state store; only
these deadline rules are engine code.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from dataclasses import dataclass

from spark_state_provider_spark.streaming.state_timeout import (
    NO_TTL,
    STATELESS,
    coerce_expiry,
)

Clock = Callable[[], float]


@dataclass
class _Entry:
    value: object
    last_put: float
    last_access: float


class TtlStateStore:
    """Keyed state with reference-parity TTL semantics and injected clock."""

    def __init__(
        self,
        ttl_secs: int = NO_TTL,
        strict: bool = False,
        clock: Clock = time.monotonic,
    ) -> None:
        self.ttl_secs = coerce_expiry(ttl_secs)
        self.strict = strict
        self._clock = clock
        self._data: dict[object, _Entry] = {}

    # -- deadline rules ----------------------------------------------------

    def _expired(self, e: _Entry, now: float) -> bool:
        if self.ttl_secs == NO_TTL:
            return False
        basis = e.last_access if self.strict else e.last_put
        return now - basis >= self.ttl_secs

    # -- store API (mirrors the provider's get/put/remove/iterator/size) ---

    def put(self, key: object, value: object) -> None:
        if self.ttl_secs == STATELESS:
            return  # stateless mode: puts are instantly invisible
        now = self._clock()
        self._data[key] = _Entry(value=value, last_put=now, last_access=now)

    def get(self, key: object):
        e = self._data.get(key)
        if e is None:
            return None
        now = self._clock()
        if self.strict:
            if self._expired(e, now):
                del self._data[key]
                return None
            e.last_access = now  # read access resets the strict deadline
            return e.value
        # non-strict: lazy — visible until a sweep compacts it away
        return e.value

    def update(self, key: object, fn: Callable[[object], object], zero: object):
        """Read-modify-write (the mapGroupsWithState fold shape)."""
        cur = self.get(key)
        new = fn(zero if cur is None else cur)
        self.put(key, new)
        return new

    def remove(self, key: object) -> None:
        self._data.pop(key, None)

    def sweep(self) -> int:
        """Compaction: drop every entry past its deadline. Returns #removed."""
        now = self._clock()
        dead = [k for k, e in self._data.items() if self._expired(e, now)]
        for k in dead:
            del self._data[k]
        return len(dead)

    def iterator(self):
        """Live (key, value) pairs; strict mode filters expired keys
        (RocksDbStateStoreProvider.scala:256-261)."""
        now = self._clock()
        for k, e in list(self._data.items()):
            if self.strict and self._expired(e, now):
                continue
            yield k, e.value

    @property
    def size(self) -> int:
        """Strict mode counts only live keys (``:189-191``)."""
        return sum(1 for _ in self.iterator())
