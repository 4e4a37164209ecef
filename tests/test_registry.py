"""Driver-contract registry invariants (VERDICT r5 directive 4): the round-5
driver harness sampled 50 of 52 queries() entries and silently dropped the
rest from CORRECTNESS_r05.json, so the registry must stay at or under that
cap, and queries()/oracle_sql() must name exactly the same set — any drift
would make a query run without its correctness gate (or an oracle run against
nothing). No SparkSession needed: these are pure-registry assertions."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as entrymod  # noqa: E402

# the observed driver per-round sampling cap (r5 ran 50 of 52)
DRIVER_QUERY_CAP = 50


def test_registry_within_driver_cap():
    assert len(entrymod.queries()) <= DRIVER_QUERY_CAP


def test_queries_and_oracles_name_the_same_set():
    q = set(entrymod.queries())
    o = set(entrymod.oracle_sql())
    # every oracle must gate a real query; every query must carry an oracle
    # (genuinely non-SQL-expressible ops would be an allowlisted rows-only
    # set — currently empty, every entry is fully oracle-checked)
    rows_only_allowlist: set[str] = set()
    assert o - q == set(), f"orphan oracles: {sorted(o - q)}"
    assert q - o == rows_only_allowlist, f"unchecked queries: {sorted(q - o)}"


def test_registry_names_are_stable_identifiers():
    for name in entrymod.queries():
        assert name.isidentifier() and name == name.lower()


def test_headroom_protocol_queries_exist():
    """r7 (VERDICT r6 directive 7): the documented cap-headroom re-admission
    order must stay actionable — the folded-out query functions exist, are
    callable, and are NOT currently registered (they re-enter only when the
    driver's cap rises, in the order pinned next to the registry)."""
    readmit_order = ["q_ngram_jaccard_pairs", "q_simhash_fingerprints"]
    registered = set(entrymod.queries())
    for fn_name in readmit_order:
        fn = getattr(entrymod, fn_name, None)
        assert callable(fn), f"{fn_name} missing — headroom protocol broken"
        assert fn_name.removeprefix("q_") not in registered
