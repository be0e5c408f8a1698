"""Top-picks ranking score.

(reference: api/top_picks.py:9-41) Photos with a significant face get a
face-aware weighted blend; otherwise half the face weight folds into each
of aesthetic and composition. Weights, the face-ratio threshold and the
inclusion cutoff all come from `viewer.photo_types` in the scoring config,
exactly like the reference's VIEWER_CONFIG.
"""

_DEFAULT_WEIGHTS = {"aggregate_percent": 20, "aesthetic_percent": 32,
                    "composition_percent": 24, "face_quality_percent": 24}


def _photo_types(viewer):
    return (viewer or {}).get("photo_types", {})


def top_picks_score_sql(viewer=None):
    """SQL expression computing the top-picks ranking score per row."""
    pt = _photo_types(viewer)
    weights = pt.get("top_picks_weights", _DEFAULT_WEIGHTS)
    thr = pt.get("top_picks_min_face_ratio", 0.20)
    agg = weights.get("aggregate_percent", 20) / 100.0
    aes = weights.get("aesthetic_percent", 32) / 100.0
    comp = weights.get("composition_percent", 24) / 100.0
    face = weights.get("face_quality_percent", 24) / 100.0
    # without a significant face, the face weight splits evenly onto
    # aesthetic and composition (reference top_picks.py:26-27); the
    # reference derives from UNROUNDED weights and renders every weight
    # with {:.2f} — round only at render time, after derivation
    two = lambda x: float(f"{x:.2f}")
    nae = two(aes + face / 2.0)
    nc = two(comp + face / 2.0)
    agg, aes, comp, face = two(agg), two(aes), two(comp), two(face)
    # branch ONLY on face_ratio, exactly like the reference
    # (top_picks.py:30): a big face with missing face_quality scores a
    # zero face term rather than redistributing the face weight
    return (
        "CASE WHEN IFNULL(p.face_ratio, 0) >= {thr} THEN "
        "  IFNULL(p.aggregate,0)*{wa} + IFNULL(p.aesthetic,0)*{wae} +"
        "  IFNULL(p.comp_score,0)*{wc} + IFNULL(p.face_quality,0)*{wfq} "
        "ELSE "
        "  IFNULL(p.aggregate,0)*{na} + IFNULL(p.aesthetic,0)*{nae} +"
        "  IFNULL(p.comp_score,0)*{nc} "
        "END"
    ).format(thr=thr, wa=agg, wae=aes, wc=comp, wfq=face,
             na=agg, nae=nae, nc=nc)


def top_picks_where_sql(viewer=None):
    """Membership filter: the blended score must clear the configured
    cutoff (reference api/types.py:56-60 builds the top_picks type as
    `score >= top_picks_min_score`)."""
    threshold = _photo_types(viewer).get("top_picks_min_score", 7)
    # NO aggregate-NULL guard: the reference's type and top_picks_filter
    # both admit any photo whose blend clears the threshold
    # (api/types.py:60), including mid-scan partial scores
    return f"({top_picks_score_sql(viewer)}) >= {float(threshold)}"


def top_picks_order_sql(viewer=None):
    return f"{top_picks_score_sql(viewer)} DESC"
