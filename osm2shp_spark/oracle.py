"""Pure-Python single-threaded oracle mirroring the reference
semantics LITERALLY (SURVEY §5.1) — deliberately naive, used only to
golden-check the distributed engine row-for-row.

Mirrored, line by line (citations into /root/reference):

- node path:  osm/handler.cc:79-105 (id>0 gate BEFORE staging and
  export; stage regardless of name; name-required export; ordered
  first-match over point rules; 64-char name truncation via
  shapefile.cc:23's field width)
- way path:   osm/handler.cc:107-133 (is_area incl. the ``woord``
  typo; kind-before-layer; min-vertex on raw refs; first-match then
  ``break`` even if resolution fails)
- resolution: osm/point_database.cc:48-112 (positional scatter so
  duplicate refs fan out; ALL-or-nothing integrity)
- counters:   osm/handler.cc:59-61,84-85,108-109
"""

from __future__ import annotations

from dataclasses import dataclass, field

from osm2shp_spark.rules import DEFAULT_RULES, NAME_WIDTH


@dataclass
class OracleResult:
    points: list = field(default_factory=list)  # (node_id, layer, name, lon, lat)
    ways: list = field(default_factory=list)  # (way_id, layer, kind, lons, lats)
    counters: dict = field(default_factory=dict)


def is_area(tags: dict) -> bool:
    # handler.cc:127-133 — note 'woord', the upstream typo, verbatim
    return (
        tags.get("area") == "yes"
        or "landuse" in tags
        or tags.get("natural") in ("land", "water", "woord")
    )


def run_oracle(nodes: list[dict], ways: list[dict]) -> OracleResult:
    """nodes: [{id, lon, lat, tags}], ways: [{id, refs, tags}]."""
    res = OracleResult()
    staged: dict[int, tuple[float, float]] = {}
    processed_nodes = exported_nodes = 0
    processed_ways = exported_ways = 0
    dropped_unresolved = 0

    point_rules = [r for r in DEFAULT_RULES if r.kind == "point"]
    for n in nodes:
        processed_nodes += 1
        if n["id"] <= 0:  # handler.cc:87-88 — before staging AND export
            continue
        staged[n["id"]] = (n["lon"], n["lat"])  # handler.cc:90 — unconditional
        name = n["tags"].get("name")
        if name is None:  # handler.cc:92-94
            continue
        for rule in point_rules:  # handler.cc:96-104, first match wins
            if n["tags"].get(rule.tag_key) == rule.tag_value:
                res.points.append(
                    (n["id"], rule.layer, name[:NAME_WIDTH], n["lon"], n["lat"])
                )
                exported_nodes += 1
                break

    shape_rules = [r for r in DEFAULT_RULES if r.kind in ("line", "polygon")]
    for w in ways:
        processed_ways += 1
        kind = "polygon" if is_area(w["tags"]) else "line"  # handler.cc:111
        n_refs = len(w["refs"])
        # handler.cc:112-113 — raw ref count, duplicates included
        if (kind == "polygon" and n_refs < 3) or n_refs < 2:
            continue
        for rule in shape_rules:  # handler.cc:115-123
            if rule.kind == kind and w["tags"].get(rule.tag_key) == rule.tag_value:
                coords = [staged.get(r) for r in w["refs"]]
                if all(c is not None for c in coords):
                    # point_database.cc:77-95 — positional order kept
                    res.ways.append(
                        (
                            w["id"],
                            rule.layer,
                            kind,
                            [c[0] for c in coords],
                            [c[1] for c in coords],
                        )
                    )
                    exported_ways += 1
                else:
                    dropped_unresolved += 1  # point_database.cc:104-109
                break  # handler.cc:122 — break whether or not resolved

    res.counters = {
        "processed_nodes": processed_nodes,
        "processed_ways": processed_ways,
        "exported_nodes": exported_nodes,
        "exported_ways": exported_ways,
        "dropped_unresolved": dropped_unresolved,
    }
    return res
