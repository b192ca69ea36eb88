"""Collect the public-API doctests (reference collects doctests too —
``reference/pyproject.toml:76``).  Plain doctest can't inject pytest
fixtures, so each module's examples run with a live ``spark`` glob.
"""

import doctest

import pytest

from polars_grouper_spark.operators import (
    asof_join as _aj,
    connected_components as _cc,
    kcore as _kc,
    ktruss as _kt,
    link_prediction as _lp,
    pagerank as _pr,
    range_join as _rj,
    scc as _sc,
    shortest_path as _sp,
    triangles as _tr,
    walks as _wk,
)

MODULES = [_cc, _sp, _pr, _aj, _rj, _tr, _kc, _kt, _lp, _sc, _wk]


@pytest.mark.parametrize("mod", MODULES, ids=lambda m: m.__name__.rsplit(".", 1)[-1])
def test_module_doctests(spark, mod):
    finder = doctest.DocTestFinder()
    runner = doctest.DocTestRunner(optionflags=doctest.NORMALIZE_WHITESPACE)
    tests = [t for t in finder.find(mod) if t.examples]
    assert tests, f"no doctest examples found in {mod.__name__}"
    for t in tests:
        t.globs["spark"] = spark
        runner.run(t)
    results = runner.summarize(verbose=False)
    assert results.failed == 0
