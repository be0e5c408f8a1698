"""Photo "type" filters: named views over the photos table.

(reference: api/types.py:53-236) Each type maps to a WHERE fragment; counts
power the sidebar badges.
"""

from facet_tpu.api.top_picks import top_picks_order_sql, top_picks_where_sql

PHOTO_TYPES = {
    "all": "1=1",
    # top_picks is built per-request from viewer.photo_types (see below)
    "top_picks": None,
    "portraits": "p.face_count > 0 AND p.face_ratio >= 0.05",
    "landscapes": "p.category IN ('landscape')",
    # low_light is built per-request from viewer.photo_types (see below)
    "low_light": None,
    "monochrome": "p.is_monochrome = 1",
    "silhouettes": "p.is_silhouette = 1",
    "blinks": "p.is_blink = 1",
    "bursts": "p.is_burst_lead = 0",
    "duplicates": "p.duplicate_group_id IS NOT NULL",
    "favorites": "is_favorite = 1",
    "rejected": "is_rejected = 1",
    "rated": "star_rating > 0",
    "untagged": "(p.tags IS NULL OR p.tags = '')",
    "group_portraits": "p.is_group_portrait = 1",
}


def type_filter_sql(photo_type, viewer=None):
    """-> (where_fragment, special_order or None). viewer threads the
    config's photo_types block into the top-picks score/threshold
    (reference api/types.py:53-60)."""
    if photo_type in (None, "", "all"):
        return "1=1", None
    if photo_type == "top_picks":
        return top_picks_where_sql(viewer), top_picks_order_sql(viewer)
    if photo_type == "low_light":
        return _low_light_where(viewer), None
    clause = PHOTO_TYPES.get(photo_type)
    if clause is None:
        return "1=1", None
    return clause, None


def _low_light_where(viewer):
    """viewer.photo_types.low_light_max_luminance drives the cutoff
    (reference config vocabulary, api/config.py:89; default 0.2)."""
    cutoff = (viewer or {}).get("photo_types", {}) \
        .get("low_light_max_luminance", 0.2)
    return ("p.mean_luminance IS NOT NULL"
            f" AND p.mean_luminance < {float(cutoff)}")


def type_counts(conn, base_where="1=1", base_params=(), viewer=None):
    out = {}
    for name, clause in PHOTO_TYPES.items():
        if clause is None:
            clause = top_picks_where_sql(viewer) if name == "top_picks" \
                else _low_light_where(viewer)
        if "is_favorite" in clause or "star_rating" in clause or "is_rejected" in clause:
            clause = clause.replace("is_favorite", "p.is_favorite") \
                .replace("is_rejected", "p.is_rejected") \
                .replace("star_rating", "p.star_rating")
        out[name] = conn.execute(
            f"SELECT COUNT(*) FROM photos p WHERE {base_where} AND {clause}",
            list(base_params)).fetchone()[0]
    return out
