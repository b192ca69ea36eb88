"""Round-9 k-truss follow-up probe (r8 judge task 5): re-measure the
distributed ``k_truss`` at-volume after the triangle-list-peel rewrite
(enumerate triangles once, prune per round by the peeled-edge delta)
plus the packed-bitset wedge prefilter.  Same graphs and session as
``scale_probe_r8.py`` so the numbers are directly comparable to the r8
rows in SCALE.md (162.5 s / 4.65 GB uniform 10M; 73.4 s / 1.66 GB
power-law 4M).

Usage::

    PYTHONPATH=/root/repo python scripts/scale_probe_r9d.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scale_probe import ShuffleMeter, build_session, power_law_edges  # noqa: E402
from scale_probe_r8 import probe_ktruss, uniform_edges  # noqa: E402


def main() -> None:
    spark = build_session()
    spark.sparkContext.setLogLevel("ERROR")
    meter = ShuffleMeter(spark)

    uni = uniform_edges(spark, 10_000_000, 2_000_000).localCheckpoint()
    pl = power_law_edges(spark, 4_000_000, 1_000_000).localCheckpoint()

    for e, tag, n in (
        (uni, "uniform10M", 10_000_000),
        (pl, "powerlaw4M", 4_000_000),
    ):
        print(json.dumps(probe_ktruss(spark, meter, e, tag, n)), flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
