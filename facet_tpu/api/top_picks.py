"""Top-picks ranking score.

(reference: api/top_picks.py:9-41) Photos with a significant face get a
face-aware weighted blend; otherwise the face weight folds into aesthetic
and composition.
"""

FACE_RATIO_THRESHOLD = 0.20

_WITH_FACE = {"aggregate": 0.20, "aesthetic": 0.32, "composition": 0.24, "face": 0.24}
_NO_FACE = {"aggregate": 0.20, "aesthetic": 0.44, "composition": 0.36}


def top_picks_score_sql():
    """SQL expression computing the top-picks ranking score per row."""
    wf = _WITH_FACE
    nf = _NO_FACE
    return (
        "CASE WHEN p.face_ratio >= {thr} AND p.face_quality IS NOT NULL THEN "
        "  IFNULL(p.aggregate,0)*{wa} + IFNULL(p.aesthetic,0)*{wae} +"
        "  IFNULL(p.comp_score,0)*{wc} + IFNULL(p.face_quality,0)*{wfq} "
        "ELSE "
        "  IFNULL(p.aggregate,0)*{na} + IFNULL(p.aesthetic,0)*{nae} +"
        "  IFNULL(p.comp_score,0)*{nc} "
        "END"
    ).format(thr=FACE_RATIO_THRESHOLD,
             wa=wf["aggregate"], wae=wf["aesthetic"], wc=wf["composition"],
             wfq=wf["face"],
             na=nf["aggregate"], nae=nf["aesthetic"], nc=nf["composition"])


def top_picks_order_sql():
    return f"{top_picks_score_sql()} DESC"
