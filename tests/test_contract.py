"""Driver-contract invariants: the external driver checks EXACTLY 50
registered queries, each oracle-backed, plus a working entry(). A
rotation or refactor that breaks any of these fails here before it
costs a round (see VERDICT r04: two silently-unregistered entries)."""

import __spark_entry__ as entrymod

from compute_histogram_spark import registry


def test_registry_is_exactly_50_oracle_backed():
    qs = entrymod.queries()
    os_ = entrymod.oracle_sql()
    assert len(qs) == 50, f"driver window must hold exactly 50, got {len(qs)}"
    assert set(os_) == set(qs), (
        "rows-only entries present: " + str(sorted(set(qs) - set(os_)))
    )
    assert all(callable(f) for f in qs.values())
    assert all(isinstance(s, str) and s.strip() for s in os_.values())


def test_registry_module_matches_entry_module():
    assert entrymod.queries().keys() == registry.QUERIES.keys()
    assert entrymod.oracle_sql().keys() == registry.ORACLES.keys()


def test_entry_runs_flagship(spark):
    df = entrymod.entry(spark)
    # stable, non-degenerate output with a stable schema
    assert len(df.columns) >= 2
    assert df.count() > 0
