"""Extended TPC-H composites (q4/q6/q8/q12/q13/q15/q17/q21 adapted to
TESTDATA).

r8 (r7 verdict #3): their DuckDB oracles used to live in THIS file as a
private parity runner; they are now registered on the query specs as
deferred oracles, so exact parity runs through the same
tests/test_oracle_parity.py harness as every other deferred entry. What
remains here is the tier guard: all eight must stay oracle-declared.
"""

from __future__ import annotations

from squrve_spark.plans import REGISTRY

EXTRAS = [
    "q4_order_priority",
    "q6_forecast_revenue",
    "q8_market_share",
    "q12_ship_class",
    "q13_order_distribution",
    "q15_top_supplier",
    "q17_small_qty_revenue",
    "q21_waiting_supplier",
]


def test_extended_tpch_are_deferred_oracles():
    for name in EXTRAS:
        spec = REGISTRY[name]
        assert spec.oracle is not None, f"{name} lost its oracle"
        assert spec.defer_oracle, f"{name} must stay out of the driver cap"
        assert "no-oracle" not in spec.tags


def test_all_registry_tags_are_tuples():
    """Regression (r8 review): tags=(\"A11\") is a bare STRING — iterating
    it yields characters and corrupts QUERIES.md / the service API."""
    from squrve_spark.plans import REGISTRY

    for name, spec in REGISTRY.items():
        assert isinstance(spec.tags, tuple), (name, spec.tags)
