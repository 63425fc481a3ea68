"""Driver-contract invariants over __ray_entry__ — cheap, no Ray
execution: the registry's ordering promise (every oracle-backed entry
precedes every rows-only one, because the driver's correctness window
is finite) and oracle/queries key consistency."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_oracle_backed_entries_precede_rows_only():
    import __ray_entry__ as e

    keys = list(e.queries())
    oracles = e.oracle_sql()
    idx = {k: i for i, k in enumerate(keys)}
    oracle_pos = [idx[k] for k in keys if k in oracles]
    rows_only_pos = [idx[k] for k in keys if k not in oracles]
    assert oracle_pos and rows_only_pos
    assert max(oracle_pos) < min(rows_only_pos), (
        "ordering contract broken: an oracle-backed query follows a "
        "rows-only one")


def test_every_oracle_key_has_a_query():
    import __ray_entry__ as e

    missing = [k for k in e.oracle_sql() if k not in e.queries()]
    assert missing == []


def test_no_duplicate_query_names():
    import __ray_entry__ as e

    keys = list(e.queries())
    assert len(keys) == len(set(keys))
