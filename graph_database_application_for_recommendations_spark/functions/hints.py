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


def assert_broadcastable(
    df: DataFrame, what: str, max_bytes: int = 256 * 1024 * 1024
) -> DataFrame:
    """Cheap runtime contract check for PURE caller-contract
    ``gated_broadcast`` sites (round-8 ADVICE: the witness alias silences
    the sweep unconditionally, so a caller passing an unbounded frame to a
    contract-gated operator reintroduced the forced-broadcast OOM).

    Uses Catalyst's logical-plan size estimate — catalog/file statistics,
    NO job — so a corpus-backed scan that obviously violates the contract
    fails loudly at plan time instead of OOMing an executor mid-broadcast.
    The hazard unit is BYTES, so the estimate is thresholded against the
    same 256 MB budget every count-gated site enforces (round-9 code
    review: a row-count threshold under-protects narrow-row frames — a
    50M-row short-string table passes 5M estimated rows at the default
    256 B/var-field width while broadcasting ~1 GB). Statless frames
    (LogicalRDD, checkpoints) pass untouched: the estimate can't vouch
    either way and the contract stays with the caller, which is exactly
    what the site's ``reason`` string documents."""
    from ..plans import estimated_size_bytes

    est = estimated_size_bytes(df)
    if est is not None and est > max_bytes:
        raise ValueError(
            f"{what}: this side is broadcast by caller contract but its "
            f"plan statistics estimate ~{est:,} bytes (> {max_bytes:,}) — "
            "the contract is violated; reduce the frame (sample/limit) or "
            "use an operator with a shuffle path"
        )
    return df
