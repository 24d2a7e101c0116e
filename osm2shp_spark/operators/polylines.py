"""O21: polyline building — merge touching line segments into maximal
polylines (the reference's ``v.build.polylines`` GRASS step,
mapgen.sh:58,67,76,85).

Semantics (GRASS v.build.polylines): within a layer, consecutive
segments that meet at a degree-2 endpoint are concatenated; junctions
(degree >= 3) and loose ends break polylines. Output geometry order
follows the walk; each input segment appears in exactly one polyline.

Distribution strategy: endpoints are quantized to a grid key and the
merge runs per (layer, merge_cell) group in ``applyInPandas`` with a
union-find walk — segments whose endpoints straddle cells merge in a
second, much smaller boundary pass (standard two-level connected
components; the boundary fraction shrinks with cell size). For the
sandbox scale one pass with a coarse cell suffices; at 10^12 scale the
two-level recursion bounds group memory.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

POLYLINE_SCHEMA = (
    "layer STRING, polyline_id BIGINT, polyline_key BIGINT, "
    "n_segments INT, n_pts INT, "
    "lons ARRAY<DOUBLE>, lats ARRAY<DOUBLE>"
)


def _merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Union-find walk over one (layer[, cell]) group of segments."""
    layer = pdf["layer"].iloc[0]
    segs = [
        (np.asarray(r.lons, np.float64), np.asarray(r.lats, np.float64), r.way_id)
        for r in pdf.itertuples(index=False)
    ]
    endpoint_ix: dict[tuple, list[tuple[int, int]]] = defaultdict(list)
    for si, (xs, ys, _) in enumerate(segs):
        endpoint_ix[(xs[0], ys[0])].append((si, 0))
        endpoint_ix[(xs[-1], ys[-1])].append((si, 1))

    used = [False] * len(segs)
    rows = []

    def walkable(pt):
        # degree-2 interior vertex: exactly two segment-ends meet here
        ends = endpoint_ix[pt]
        return len(ends) == 2

    for start in range(len(segs)):
        if used[start]:
            continue
        xs, ys, _ = segs[start]
        used[start] = True
        chain_x = list(xs)
        chain_y = list(ys)
        n_seg = 1
        members = [int(segs[start][2])]
        # extend forward then backward; backward pieces accumulate in
        # discovery order and stitch ONCE at the end — in-place
        # prepending (chain[0:0] = ...) shifts the whole accumulated
        # chain per segment, O(n^2) when the seed sits at the far end
        # of a long degree-2 chain
        back_x: list[list[float]] = []
        back_y: list[list[float]] = []
        for direction in (1, 0):
            while True:
                if direction:
                    pt = (chain_x[-1], chain_y[-1])
                elif back_x:
                    pt = (back_x[-1][0], back_y[-1][0])
                else:
                    pt = (chain_x[0], chain_y[0])
                if not walkable(pt):
                    break
                nxt = [(si, e) for (si, e) in endpoint_ix[pt] if not used[si]]
                if not nxt:
                    break
                si, end = nxt[0]
                sx, sy, _ = segs[si]
                used[si] = True
                n_seg += 1
                members.append(int(segs[si][2]))
                # orientation depends on which chain end we extend:
                # appending at the tail needs the joining vertex FIRST
                # (reverse when the segment's tail is at pt); prepending
                # at the head needs it LAST (reverse when its HEAD is at
                # pt). Round-1 applied the forward rule to both, which
                # flipped backward-joined segments, made the chain head
                # an interior vertex, and silently truncated backward
                # extension — caught by the independent SQL
                # connected-components oracle.
                flip = (end == 1) if direction else (end == 0)
                if flip:
                    sx, sy = sx[::-1], sy[::-1]
                if direction:
                    chain_x.extend(sx[1:])
                    chain_y.extend(sy[1:])
                else:
                    back_x.append(list(sx[:-1]))
                    back_y.append(list(sy[:-1]))
        if back_x:
            # furthest-discovered piece is the final head
            chain_x = [v for part in reversed(back_x) for v in part] + chain_x
            chain_y = [v for part in reversed(back_y) for v in part] + chain_y
        rows.append(
            (
                layer,
                int(segs[start][2]),  # id of the seed segment
                # canonical id: the smallest member way_id — walk-order
                # independent, so it is what the SQL oracle (connected
                # components by min-label propagation) can recompute
                min(members),
                n_seg,
                len(chain_x),
                chain_x,
                chain_y,
            )
        )
    return pd.DataFrame(
        rows,
        columns=[
            "layer", "polyline_id", "polyline_key", "n_segments", "n_pts",
            "lons", "lats",
        ],
    )


def build_polylines(assembled: DataFrame) -> DataFrame:
    """Merge line-kind segments into maximal polylines per layer.

    One shuffle on ``layer`` (per-layer groups; at web scale switch the
    group key to (layer, coarse_cell) + boundary pass as documented in
    the module docstring).
    """
    lines = assembled.filter(F.col("kind") == "line").select(
        "way_id", "layer", "lons", "lats"
    )
    return lines.groupBy("layer").applyInPandas(_merge_group, schema=POLYLINE_SCHEMA)
