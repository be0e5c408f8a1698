"""Category-fit analysis for the suggest_filters endpoint.

Given a photo's metrics and a target category's filter set, enumerate every
constraint the photo violates and propose the minimal filter edit that would
admit it (reference behavior: api/routers/comparison.py:665-905).
"""

from facet_tpu.config.category_filter import _NUMERIC_SOURCES

_LABELS = {
    "face_ratio": "Face ratio",
    "face_count": "Face count",
    "iso": "ISO",
    "shutter_speed": "Shutter speed",
    "luminance": "Luminance",
    "focal_length": "Focal length",
    "f_stop": "F-stop",
}

_BOOL_READERS = {
    "has_face": lambda p: (p.get("face_count") or 0) > 0,
    "is_monochrome": lambda p: bool(p.get("is_monochrome") or 0),
    "is_silhouette": lambda p: bool(p.get("is_silhouette") or 0),
    "is_group_portrait": lambda p: bool(p.get("is_group_portrait") or 0),
}


def _photo_tags(photo):
    raw = photo.get("tags") or ""
    return [t.strip().lower() for t in raw.split(",") if t.strip()]


def analyze_category_fit(photo, filters):
    """-> (conflicts, suggestions): why `photo` fails `filters` and the
    filter edits (with a 10% margin on numeric bounds) that would fix it."""
    conflicts, suggestions = [], []

    for field, source in _NUMERIC_SOURCES.items():
        lo = filters.get(f"{field}_min")
        hi = filters.get(f"{field}_max")
        if lo is None and hi is None:
            continue
        actual = photo.get(source)
        if isinstance(actual, str):
            try:
                actual = float(actual)
            except ValueError:
                actual = None
        label = _LABELS[field]
        if actual is None:
            bound = f"{field}_min" if lo is not None else f"{field}_max"
            conflicts.append({
                "type": "missing_value", "filter": bound,
                "required": lo if lo is not None else hi, "actual": None,
                "message": f"{label} is required but missing"})
            continue
        if lo is not None and actual < lo:
            suggested = round(actual * 0.9, 4)
            conflicts.append({
                "type": "below_minimum", "filter": f"{field}_min",
                "required": lo, "actual": actual,
                "message": f"{label} ({actual:.3f}) is below minimum ({lo})"})
            suggestions.append({
                "type": "lower_minimum", "filter": f"{field}_min",
                "current": lo, "suggested": suggested,
                "message": f"Lower {field}_min from {lo} to {suggested}"})
        if hi is not None and actual > hi:
            suggested = round(actual * 1.1, 4)
            conflicts.append({
                "type": "above_maximum", "filter": f"{field}_max",
                "required": hi, "actual": actual,
                "message": f"{label} ({actual:.3f}) is above maximum ({hi})"})
            suggestions.append({
                "type": "raise_maximum", "filter": f"{field}_max",
                "current": hi, "suggested": suggested,
                "message": f"Raise {field}_max from {hi} to {suggested}"})

    for flag, reader in _BOOL_READERS.items():
        required = filters.get(flag)
        if required is None:
            continue
        actual = reader(photo)
        if actual != bool(required):
            conflicts.append({
                "type": "boolean_mismatch", "filter": flag,
                "required": required, "actual": actual,
                "message": f"{flag} is {actual}, category requires {required}"})
            suggestions.append({
                "type": "change_boolean", "filter": flag,
                "current": required, "suggested": actual,
                "message": f"Change {flag} from {required} to {actual}"})

    required_tags = filters.get("required_tags") or []
    excluded_tags = filters.get("excluded_tags") or []
    tags = _photo_tags(photo)
    if required_tags:
        wanted = [t.lower() for t in required_tags]
        mode = filters.get("tag_match_mode", "any")
        if mode == "all":
            missing = [t for t in wanted if t not in tags]
            if missing:
                conflicts.append({
                    "type": "missing_tags", "filter": "required_tags",
                    "required": required_tags, "actual": tags,
                    "missing": missing,
                    "message": "Photo is missing required tags: "
                               + ", ".join(missing)})
        elif not any(t in tags for t in wanted):
            conflicts.append({
                "type": "missing_tags", "filter": "required_tags",
                "required": required_tags, "actual": tags,
                "message": "Photo needs at least one of: "
                           + ", ".join(required_tags)})
            suggestions.append({
                "type": "remove_tag_requirement", "filter": "required_tags",
                "message": "Remove or modify the required_tags filter"})
    if excluded_tags:
        found = [t for t in (x.lower() for x in excluded_tags) if t in tags]
        if found:
            conflicts.append({
                "type": "excluded_tags_present", "filter": "excluded_tags",
                "excluded": excluded_tags, "found": found,
                "message": "Photo has excluded tags: " + ", ".join(found)})
            suggestions.append({
                "type": "modify_excluded_tags", "filter": "excluded_tags",
                "current": excluded_tags, "to_remove": found,
                "message": "Remove from excluded_tags: " + ", ".join(found)})

    return conflicts, suggestions
