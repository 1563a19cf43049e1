"""Plan-hint helpers with hygiene-sweep witnesses.

The test suite statically bans ``F.broadcast()`` hints on frames it cannot
prove bounded from the logical plan alone (round-7 VERDICT item 5): a
forced broadcast of an unbounded frame is an executor/driver OOM at scale
AND blocks Catalyst from choosing the sane shuffle join. Some sites ARE
bounded, but only by evidence a static plan walk cannot see — an actual
``count()`` (co-rating's gate), a storage-statistics estimate (simsearch's
vector sides), a fixed-size construction (a Bloom filter's BITS/64-row word
table, a k-row cluster-representative table), or a caller-level contract (a
query set, an eval benchmark — small by what the operator MEANS, not by
anything the data shows). Those sites must route through
:func:`gated_broadcast`, which
wraps the frame in the ``__gated_bounded__`` subquery alias — a marker that
survives analysis, so the sweep can verify the witness instead of flagging
the hint. The contract is enforced socially + by grep-test: every caller
sits immediately behind a runtime count/estimate gate or a fixed-size
construction, named in the call's ``reason``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Subquery-alias marker the plan-hygiene sweep recognizes as a witnessed
#: (runtime-gated or fixed-size) broadcast. Only gated_broadcast may emit it.
GATED_BROADCAST_MARKER = "__gated_bounded__"


def gated_broadcast(df: DataFrame, reason: str) -> DataFrame:
    """Broadcast ``df`` with the hygiene-sweep witness attached.

    ``reason`` documents WHY the frame is bounded at this call site (it is
    not machine-checked — it keeps the audit greppable). Callers MUST have
    already established boundedness: an actual ``count()`` against a byte
    budget, a storage-stats row estimate, or a construction whose output
    cardinality is a compile-time constant. Never call this to silence the
    sweep on a frame that merely *looks* small at test scale — that is
    exactly the failure mode the sweep exists to catch.
    """
    if not reason:
        raise ValueError("gated_broadcast requires a non-empty reason")
    return F.broadcast(df.alias(GATED_BROADCAST_MARKER))
