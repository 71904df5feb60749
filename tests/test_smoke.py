"""Fast schema-drift smoke for the queries OUTSIDE the driver's fixed
50-entry correctness check (VERDICT r03 item 7): they are value-gated
by tests/test_suite_parity.py, but that runs the whole suite — this
marker materializes just the non-driver queries at sf0.001 so a
harness schema change (e.g. the events.ts encoding drifts again)
fails in seconds:

    python -m pytest -m smoke -q     # < 60 s
"""

from __future__ import annotations

import pytest

from platform_etl_literature_spark.suite import DRIVER_CHECKED, SUITE

# the survivor queries run the identical minhash->CC chain as
# dedup_components plus one join/window — smoke-testing each costs ~8s
# of pure repetition; the parity suite still value-checks them.
_REDUNDANT_IN_SMOKE = {"dedup_survivors", "dedup_survivors_best"}

NON_DRIVER = sorted(set(SUITE) - DRIVER_CHECKED - _REDUNDANT_IN_SMOKE)


@pytest.mark.smoke
@pytest.mark.parametrize("name", NON_DRIVER)
def test_non_driver_query_materializes(spark, sf_dir, name):
    SUITE[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()


def test_driver_prefix_invariants():
    """The driver hashes the FIRST 50 queries() entries: that window
    must stay exactly the pinned prefix and every member must carry a
    full SQL oracle (a no-oracle entry in the window wastes a
    correctness row)."""
    from platform_etl_literature_spark.suite import _DRIVER_PREFIX

    first50 = list(SUITE)[:50]
    assert list(_DRIVER_PREFIX) == first50
    missing = [n for n in first50 if SUITE[n].oracle is None]
    assert missing == [], f"no-oracle queries inside the driver window: {missing}"


def test_no_duplicate_module_level_assignments_in_suite():
    """A second module-level assignment to the same name silently
    shadows the first (later-def wins) — in round 6 a duplicate
    _ORACLE_ASOF constant broke a driver-prefix oracle mid-session.
    Parse suite.py's AST and fail on ANY name assigned twice at module
    level (loop/aug/ann-assign targets included; re-assignment inside
    functions is fine)."""
    import ast
    import collections
    import inspect

    import platform_etl_literature_spark.suite as suite_mod

    src = inspect.getsource(suite_mod)
    tree = ast.parse(src)
    seen = collections.Counter()
    for node in tree.body:  # module level ONLY — no recursion
        targets = []
        if isinstance(node, ast.Assign):
            for t in node.targets:
                targets.append(t)
        elif isinstance(node, (ast.AnnAssign, ast.AugAssign)):
            targets.append(node.target)
        elif isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            seen[node.name] += 1
        for t in targets:
            for n in ast.walk(t):
                if isinstance(n, ast.Name):
                    seen[n.id] += 1
    dupes = sorted(name for name, c in seen.items() if c > 1)
    assert dupes == [], (
        f"module-level names assigned more than once in suite.py: {dupes}"
    )
