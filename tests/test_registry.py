"""Registry invariants — the driver-contract guards that keep the
attestation rotation and the oracle pairing honest across rounds."""

from __future__ import annotations


def test_registry_invariants():
    import __spark_entry__ as entry

    q = entry.queries()
    o = entry.oracle_sql()

    # every oracle belongs to a registered query
    assert set(o) <= set(q)
    # every query is callable; every oracle is non-trivial SQL
    assert all(callable(f) for f in q.values())
    assert all(isinstance(s, str) and "SELECT" in s.upper()
               for s in o.values())
    # the rotation contract: the driver's 50-entry snapshot window
    # must contain ONLY never-attested entries, oracled ones ahead of
    # rows-only ones, with the refix slot (merge_upsert) first
    front = list(q)[:50]
    assert front[0] == "merge_upsert"
    assert all(n not in entry._ATTESTED or n == "merge_upsert"
               for n in front)
    assert all(n in o for n in front)  # snapshot window is all-oracled
    # attested names must still exist (a rename would silently un-pin
    # the rotation) — merge_upsert is tracked via the refix slot
    missing = {n for n in entry._ATTESTED if n not in q}
    assert not missing, f"attested names vanished from registry: {missing}"
    # _NEW_R04 names must all exist too (typos here silently change
    # rotation order without failing anything else)
    missing_new = {n for n in entry._NEW_R04 if n not in q}
    assert not missing_new, f"_NEW_R04 names not registered: {missing_new}"
