"""Entry-registry invariants: every query has an oracle, counts can't
drift between the registry, README, and SCALE.md (VERDICT r3 task #8)."""

import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import __spark_entry__ as entry_mod  # noqa: E402


def test_every_query_has_an_oracle():
    qs = entry_mod.queries()
    os_ = entry_mod.oracle_sql()
    missing = sorted(set(qs) - set(os_))
    assert missing == [], f"queries without oracle_sql: {missing}"
    orphans = sorted(set(os_) - set(qs))
    assert orphans == [], f"oracle_sql without queries entry: {orphans}"


def test_readme_query_count_matches_registry():
    n = len(entry_mod.queries())
    readme = (REPO / "README.md").read_text()
    m = re.search(r"`entry`, (\d+) `queries\(\)`, (\d+)\s+DuckDB", readme)
    assert m, "README no longer states the registry counts"
    assert int(m.group(1)) == n and int(m.group(2)) == n, (
        f"README says {m.group(1)}/{m.group(2)} but the registry holds {n}"
    )


def test_scale_md_count_matches_registry():
    n = len(entry_mod.oracle_sql())
    scale = (REPO / "SCALE.md").read_text()
    m = re.search(r"\*\*(\d+) fully-oracle-checked queries\*\*", scale)
    assert m, "SCALE.md no longer states the oracle-checked query count"
    assert int(m.group(1)) == n, (
        f"SCALE.md says {m.group(1)} but oracle_sql() holds {n}"
    )


def test_driver_window_is_spent_on_unverified_queries():
    """The driver's correctness gate covers the first ~50 entries, so the
    dict must list every driver-unverified query BEFORE any verified one
    (VERDICT r3 task #1: rotate until all have a green row on record).
    Since round 6, "verified" means a fully-GREEN row (rows + schema +
    hash all matched): a red row means the query must re-enter the
    window until a green row lands.  With more than 50 unverified
    queries the overflow rotates next round; what is never allowed is a
    verified query occupying a window slot an unverified one needs.
    queries() enforces this automatically via _green_driver_verified();
    this test guards the helper."""
    import json

    verified = set()
    for path in REPO.glob("CORRECTNESS_r*.json"):
        for name, rec in json.loads(path.read_text()).items():
            if (
                isinstance(rec, dict)
                and rec.get("rows_match")
                and rec.get("schema_match")
                and rec.get("hash_match", True)
            ):
                verified.add(name)
    # Mirror production: a green row that predates a semantics change is
    # NOT verified (r6 judge advice — without this subtraction the test
    # breaks on any stale-verified name authored before the tail).
    verified -= entry_mod._STALE_VERIFIED
    assert verified == entry_mod._green_driver_verified(), (
        "test's reconstruction of the verified set diverged from "
        "_green_driver_verified() — update whichever changed"
    )
    order = list(entry_mod.queries())
    seen_verified_at = None
    for i, q in enumerate(order):
        if q in verified and seen_verified_at is None:
            seen_verified_at = i
        if q not in verified and seen_verified_at is not None:
            raise AssertionError(
                f"unverified query {q!r} (pos {i}) is listed after verified "
                f"{order[seen_verified_at]!r} (pos {seen_verified_at}) — "
                "it would lose its window slot to an already-green query"
            )
