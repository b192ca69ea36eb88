"""Stream-static enrichment join.

The most common production streaming pattern: enrich an event stream
with a slowly-changing dimension table (user → segment, item → catalog
row) as events flow.  Structured Streaming runs the join per
microbatch against the CURRENT static snapshot — no streaming state is
created (unlike stream-stream joins, there is nothing to buffer or
watermark: the static side is always fully available), so the only
scale knobs are the join strategy and column pruning.

At 100 TB of stream the dimension is almost always the small side:
``broadcast=True`` pins a BroadcastHashJoin so every microbatch joins
map-side with zero shuffle of the stream.  For dimensions too large to
broadcast, pass ``broadcast=False`` and pre-bucket the dimension on the
join key so the per-microbatch shuffle hits a co-located layout.

Spark's stream-static support matrix (enforced here): inner joins are
unrestricted; ``left`` outer requires the STREAM on the left (a static
left-outer against a stream is not incrementalizable — Spark would
need to re-emit static rows as stream rows arrive).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ALLOWED = {"inner", "left", "left_outer"}


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    on: "str | list[str]",
    *,
    how: str = "left",
    broadcast: bool = True,
    dim_cols: "list[str] | None" = None,
) -> DataFrame:
    """Join a (streaming or batch) frame against a static dimension ->
    the enriched frame.  ``dim_cols`` prunes the dimension to the join
    key(s) + the named columns BEFORE the join (column pruning at the
    broadcast, not after), which is the difference between shipping a
    3-column map and a 300-column table to every executor.
    """
    if how not in _ALLOWED:
        raise ValueError(
            f"stream-static join supports {sorted(_ALLOWED)} with the stream "
            f"on the left, got {how!r}"
        )
    keys = [on] if isinstance(on, str) else list(on)
    if dim_cols is not None:
        dim = dim.select(*keys, *dim_cols)
    if broadcast:
        dim = F.broadcast(dim)
    return stream.join(dim, keys, how)
