"""Registry invariants — guards for the driver-contract properties
that broke (or nearly broke) in past rounds."""

from __future__ import annotations

from another_map_reduce_spark import queries as Q


def test_every_query_has_an_oracle():
    """100% oracle coverage: a registration without SQL silently
    downgrades that operator to the driver's weaker rows-only check."""
    missing = [n for n in Q.QUERIES if n not in Q.ORACLES]
    assert not missing, f"rows-only queries: {missing}"


def test_front_order_fits_driver_cap():
    """The driver records ~the first 50 queries; every name in the
    explicit front block must actually land inside that window
    (round-3 review caught the block growing to 54 and silently
    pushing verified queries out)."""
    assert len(Q._ORDER_FRONT) <= 50, (
        f"_ORDER_FRONT has {len(Q._ORDER_FRONT)} entries — trims needed"
    )


def test_order_lists_are_consistent():
    """No typos, no duplicates, no overlap between the order lists."""
    all_listed = Q._ORDER_FRONT + Q._ORDER_NEXT_R14
    assert len(all_listed) == len(set(all_listed)), "duplicate order entry"
    unknown = [n for n in all_listed if n not in Q.QUERIES]
    assert not unknown, f"order entries not in registry: {unknown}"


def test_registry_iteration_starts_with_front():
    names = list(Q.QUERIES)
    front = [n for n in Q._ORDER_FRONT if n in Q.QUERIES]
    assert names[: len(front)] == front
    staged = [n for n in Q._ORDER_NEXT_R14 if n in Q.QUERIES]
    assert names[len(front) : len(front) + len(staged)] == staged
