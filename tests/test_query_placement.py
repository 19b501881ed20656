"""Structural enforcement of the riskiest-first driver-gate discipline.

The driver's CORRECTNESS gate hashes only the FIRST 50 entries of
``queries()``.  VERDICT r3 flagged that the hand-maintained ``first`` list
could silently demote a new risky query past that window.  These tests make
the discipline structural:

- every registered query must be EXPLICITLY placed — in the ``first``
  ranking or in ``QUERY_DEMOTIONS`` with a reason string;
- the driver's 50-row window must consist entirely of oracle-backed
  queries (a rows-only query there wastes a gate slot);
- demotion reasons must be real sentences, not empty strings.
"""

import __spark_entry__ as e


def _first_list():
    return list(e.QUERY_RISK_ORDER)


def test_every_query_is_explicitly_placed():
    q = e.queries()
    placed = set(_first_list()) | set(e.QUERY_DEMOTIONS)
    unplaced = [k for k in q if k not in placed]
    assert not unplaced, (
        f"queries registered without explicit placement (add to `first` at a "
        f"risk-ranked position, or to QUERY_DEMOTIONS with a reason): {unplaced}"
    )


def test_first_fifty_is_oracle_backed():
    names = list(e.queries())[:50]
    o = e.oracle_sql()
    missing = [n for n in names if n not in o]
    assert not missing, f"driver-window queries without a DuckDB oracle: {missing}"


def test_demotions_have_reasons_and_exist():
    q = e.queries()
    for name, reason in e.QUERY_DEMOTIONS.items():
        assert name in q, f"demoted name not registered: {name}"
        assert isinstance(reason, str) and len(reason) >= 10, (
            f"demotion without a real reason: {name!r}: {reason!r}"
        )


def test_first_list_has_no_duplicates_or_ghosts():
    first = _first_list()
    assert len(first) == len(set(first)), "duplicate names in `first`"
    q = e.queries()
    ghosts = [n for n in first if n not in q]
    assert not ghosts, f"`first` names an unregistered query: {ghosts}"
