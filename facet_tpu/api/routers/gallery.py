"""Gallery router: photo listing with the full filter vocabulary.

(reference: api/routers/gallery.py — /api/photos with 50+ filter params,
/api/type_counts, /api/similar_photos, /api/config)
"""

from facet_tpu.api.db_helpers import (
    attach_person_data,
    get_cached_count,
    preference_columns,
    preference_join,
    split_tags_field,
    tag_filter_sql,
    visibility_clause,
)
from facet_tpu.api.types import type_counts, type_filter_sql
from facet_tpu.ops.phash import hamming_distance
from facet_tpu.web.framework import HTTPError

PHOTO_FIELDS = (
    "p.path, p.filename, p.date_taken, p.camera_model, p.lens_model, p.iso,"
    " p.f_stop, p.shutter_speed, p.focal_length, p.image_width, p.image_height,"
    " p.aggregate, p.aesthetic, p.quality_score, p.topiq_score, p.tech_sharpness,"
    " p.color_score, p.exposure_score, p.comp_score, p.contrast_score,"
    " p.dynamic_range_stops, p.noise_sigma, p.face_count, p.face_quality,"
    " p.eye_sharpness, p.face_sharpness, p.face_ratio, p.is_blink,"
    " p.is_monochrome, p.is_silhouette, p.is_group_portrait, p.is_burst_lead,"
    " p.duplicate_group_id, p.is_duplicate_lead, p.tags, p.category,"
    " p.composition_pattern, p.scoring_model, p.phash, p.power_point_score,"
    " p.leading_lines_score, p.mean_luminance, p.mean_saturation"
)

SORTABLE = {
    "aggregate", "aesthetic", "quality_score", "topiq_score", "comp_score",
    "face_quality", "eye_sharpness", "face_sharpness", "tech_sharpness",
    "exposure_score", "color_score", "contrast_score", "dynamic_range_stops",
    "noise_sigma", "power_point_score", "leading_lines_score", "date_taken",
    "iso", "f_stop", "focal_length", "face_count", "face_ratio", "filename",
    "category", "star_rating", "mean_luminance",
    # computed: the blended top-picks ranking (reference VALID_SORT_COLS)
    "top_picks_score",
}

_RANGE_FILTERS = [
    # (query param, column, operator)
    ("min_score", "p.aggregate", ">="), ("max_score", "p.aggregate", "<="),
    ("min_aesthetic", "p.aesthetic", ">="), ("max_aesthetic", "p.aesthetic", "<="),
    ("min_quality", "p.quality_score", ">="), ("max_quality", "p.quality_score", "<="),
    ("min_sharpness", "p.tech_sharpness", ">="), ("max_sharpness", "p.tech_sharpness", "<="),
    ("min_faces", "p.face_count", ">="), ("max_faces", "p.face_count", "<="),
    ("min_face_quality", "p.face_quality", ">="),
    ("min_iso", "p.iso", ">="), ("max_iso", "p.iso", "<="),
    ("min_f_stop", "p.f_stop", ">="), ("max_f_stop", "p.f_stop", "<="),
    ("min_focal", "p.focal_length", ">="), ("max_focal", "p.focal_length", "<="),
    ("min_rating", "@star_rating", ">="),
    # the rest of the reference's range vocabulary (gallery.py:160-201)
    ("min_face_ratio", "p.face_ratio", ">="), ("max_face_ratio", "p.face_ratio", "<="),
    ("min_exposure", "p.exposure_score", ">="), ("max_exposure", "p.exposure_score", "<="),
    ("min_face_count", "p.face_count", ">="), ("max_face_count", "p.face_count", "<="),
    ("max_face_quality", "p.face_quality", "<="),
    ("min_eye_sharpness", "p.eye_sharpness", ">="), ("max_eye_sharpness", "p.eye_sharpness", "<="),
    ("min_fstop", "p.f_stop", ">="), ("max_fstop", "p.f_stop", "<="),
    ("min_dynamic_range", "p.dynamic_range_stops", ">="),
    ("max_dynamic_range", "p.dynamic_range_stops", "<="),
    ("min_contrast", "p.contrast_score", ">="), ("max_contrast", "p.contrast_score", "<="),
    ("min_noise", "p.noise_sigma", ">="), ("max_noise", "p.noise_sigma", "<="),
    ("min_color", "p.color_score", ">="), ("max_color", "p.color_score", "<="),
    ("min_composition", "p.comp_score", ">="), ("max_composition", "p.comp_score", "<="),
    ("min_face_sharpness", "p.face_sharpness", ">="),
    ("max_face_sharpness", "p.face_sharpness", "<="),
    ("min_power_point", "p.power_point_score", ">="),
    ("max_power_point", "p.power_point_score", "<="),
    ("min_isolation", "p.isolation_bonus", ">="),
    ("max_isolation", "p.isolation_bonus", "<="),
    ("min_histogram_spread", "p.histogram_spread", ">="),
    ("max_histogram_spread", "p.histogram_spread", "<="),
]


def _pref_expr(request, column):
    """Preference column expression: per-user indirection in multi-user mode.
    NULL-coalesced in both modes so e.g. min_rating=0 matches unrated rows
    (NULL >= 0 is NULL in SQLite, which silently excludes them)."""
    user = request.state.get("user")
    if not user or user in ("anonymous", "viewer", "editor"):
        return f"IFNULL(p.{column}, 0)"
    return f"IFNULL(up.{column}, 0)"


# the reference's alternative spellings for the same filters
# (api/routers/gallery.py:45-218 _build_gallery_where)
_PARAM_ALIASES = {
    "person": "person_id",
    "composition_pattern": "pattern",
    "min_aggregate": "min_score",
    "is_monochrome": "monochrome_only",
}


def build_where(request, conn, ctx):
    """The gallery filter vocabulary -> (where_sql, params)."""
    # accept reference spellings by folding them onto ours
    for ref_name, ours in _PARAM_ALIASES.items():
        if ref_name in request.query and ours not in request.query:
            request.query[ours] = request.query[ref_name]
    clauses, params = ["1=1"], []

    photo_type = request.param("type")
    type_clause, _ = type_filter_sql(photo_type, ctx.config.viewer)
    for col in ("is_favorite", "is_rejected", "star_rating"):
        type_clause = type_clause.replace(col, _pref_expr(request, col))
    clauses.append(type_clause)

    search = request.param("search")
    if search:
        clauses.append("(p.filename LIKE ? OR p.path LIKE ? OR p.tags LIKE ?)")
        like = f"%{search}%"
        params += [like, like, like]

    for key, column in (("camera", "p.camera_model"), ("lens", "p.lens_model"),
                        ("category", "p.category"),
                        ("pattern", "p.composition_pattern")):
        val = request.param(key)
        if val:
            clauses.append(f"{column} = ?")
            params.append(val)

    # exact-value selects driven by the filter-option dropdowns; match
    # through ROUND like the reference (gallery.py:174,182) so the
    # rounded dropdown values hit unrounded stored columns
    aperture = request.param("aperture", type=float)
    if aperture is not None:
        clauses.append("ROUND(p.f_stop, 1) = ?")
        params.append(round(aperture, 1))
    focal = request.param("focal_length", type=float)
    if focal is not None:
        clauses.append("ROUND(p.focal_length) = ?")
        params.append(round(focal))

    # reference boolean/range filters with no spelling of ours;
    # burst_only and no_blink apply the same HIDE_* fragments as the
    # hide flags (reference gallery.py:137-140)
    if request.param("is_silhouette", default=False, type=bool):
        clauses.append("p.is_silhouette = 1")
    if request.param("burst_only", default=False, type=bool):
        clauses.append("(p.is_burst_lead = 1 OR p.is_burst_lead IS NULL)")
    if request.param("no_blink", default=False, type=bool):
        clauses.append("(p.is_blink = 0 OR p.is_blink IS NULL)")
    min_lum = request.param("min_luminance", type=float)
    if min_lum is not None:
        clauses.append("p.mean_luminance >= ?")
        params.append(min_lum)
    max_lum = request.param("max_luminance", type=float)
    if max_lum is not None:
        clauses.append("p.mean_luminance < ?")    # strict, like the reference
        params.append(max_lum)
    if request.param("top_picks_filter", default=False, type=bool):
        from facet_tpu.api.top_picks import top_picks_where_sql

        clauses.append(top_picks_where_sql(ctx.config.viewer))
    # show_rejected=1 means ONLY rejected photos (reference gallery.py:155)
    if request.param("show_rejected", default=False, type=bool):
        clauses.append(f"{_pref_expr(request, 'is_rejected')} = 1")
    # exclude_art drops photos carrying the art category's required_tags
    # (reference gallery.py:90 + db_helpers.get_art_tags_from_config)
    if request.param("exclude_art", default=False, type=bool):
        art = ctx.config.scoring.get_category_config("art") or {}
        for art_tag in art.get("filters", {}).get("required_tags", []):
            sql, tag_params = tag_filter_sql(conn, art_tag)
            clauses.append("NOT (" + sql.replace("path IN", "p.path IN") + ")")
            params += tag_params

    tag = request.param("tag")
    if tag:
        sql, tag_params = tag_filter_sql(conn, tag)
        clauses.append(sql.replace("path IN", "p.path IN"))
        params += tag_params

    # comma lists: require_tags = photo carries ANY of them,
    # exclude_tags = photo carries NONE (reference db_helpers.py:98-117)
    require_tags = request.param("require_tags")
    if require_tags:
        wanted = [t.strip() for t in require_tags.split(",") if t.strip()]
        if wanted:
            parts, any_params = [], []
            for one in wanted:
                sql, tag_params = tag_filter_sql(conn, one)
                parts.append(sql.replace("path IN", "p.path IN"))
                any_params += tag_params
            clauses.append("(" + " OR ".join(parts) + ")")
            params += any_params
    exclude_tags = request.param("exclude_tags")
    if exclude_tags:
        for one in (t.strip() for t in exclude_tags.split(",")):
            if not one:
                continue
            sql, tag_params = tag_filter_sql(conn, one)
            clauses.append("NOT (" + sql.replace("path IN", "p.path IN") + ")")
            params += tag_params

    person_raw = request.param("person_id") or ""
    if person_raw:
        # comma lists AND one clause per person (reference splits
        # params['person'] the same way): photo must contain ALL of them
        try:
            ids = [int(p) for p in str(person_raw).split(",") if p.strip()]
        except ValueError:
            raise HTTPError(400, "invalid person id")
        for pid in ids:
            clauses.append(
                "p.path IN (SELECT photo_path FROM faces WHERE person_id = ?)")
            params.append(pid)

    date_from = request.param("date_from")
    if date_from:
        clauses.append("p.date_taken >= ?")
        params.append(date_from)
    date_to = request.param("date_to")
    if date_to:
        clauses.append("p.date_taken <= ?")
        params.append(date_to + "￿")

    for param, column, op in _RANGE_FILTERS:
        val = request.param(param, type=float)
        if val is not None:
            if column.startswith("@"):
                column = _pref_expr(request, column[1:])
            clauses.append(f"{column} {op} ?")
            params.append(val)

    defaults = ctx.config.viewer_defaults()

    def hide_flag(name, contradicted):
        """A config-DEFAULT hide flag yields to an explicitly selected
        type view (type=blinks with default hide_blinks returned zero
        rows — round-4 review finding); an EXPLICIT query param keeps
        its contradiction, like the reference (which defaults these
        flags off server-side and lets the client send them)."""
        if contradicted and name not in request.query:
            return False
        return request.param(name, default=defaults.get(name, True),
                             type=bool)

    if hide_flag("hide_blinks", photo_type == "blinks"):
        clauses.append("(p.is_blink = 0 OR p.is_blink IS NULL)")
    if hide_flag("hide_bursts", photo_type == "bursts"):
        clauses.append("(p.is_burst_lead = 1 OR p.is_burst_lead IS NULL)")
    if hide_flag("hide_duplicates", photo_type == "duplicates"):
        # exactly the reference's HIDE_DUPLICATES_SQL (db_helpers.py:21):
        # a grouped row with a NULL lead flag stays visible
        clauses.append("(p.is_duplicate_lead = 1 OR p.is_duplicate_lead"
                       " IS NULL OR p.duplicate_group_id IS NULL)")
    wants_rejected = (photo_type == "rejected"
                      or request.param("show_rejected", default=False,
                                       type=bool))
    if hide_flag("hide_rejected", photo_type == "rejected") \
            and not wants_rejected:
        # show_rejected wins over the hide default (reference's elif,
        # gallery.py:155-158)
        clauses.append(f"{_pref_expr(request, 'is_rejected')} = 0")
    if request.param("favorites_only", default=False, type=bool):
        clauses.append(f"{_pref_expr(request, 'is_favorite')} = 1")
    if request.param("monochrome_only", default=False, type=bool):
        clauses.append("p.is_monochrome = 1")

    # the multi-user visibility exclusion must not fight an explicit
    # request FOR rejected photos — it made them permanently unviewable
    vis_sql, vis_params = ("", []) if wants_rejected \
        else visibility_clause(request)
    where = " AND ".join(clauses) + vis_sql
    return where, params + vis_params


def register(app, ctx):
    @app.get("/api/photos")
    def api_photos(request):
        pagination = ctx.config.pagination()
        page = max(1, request.param("page", 1, int))
        page_size = max(1, min(request.param("page_size",
                                             pagination.get("default_page_size", 100), int),
                               pagination.get("max_page_size", 500)))
        sort = request.param("sort", ctx.config.viewer_defaults().get("sort", "aggregate"))
        order = request.param("order", ctx.config.viewer_defaults().get("order", "desc"))
        if sort not in SORTABLE:
            raise HTTPError(400, f"unsupported sort column '{sort}'")
        direction = "ASC" if str(order).lower() == "asc" else "DESC"

        with ctx.connection() as conn:
            where, params = build_where(request, conn, ctx)
            _, special_order = type_filter_sql(request.param("type"),
                                               ctx.config.viewer)
            order_sql = special_order or f"p.{sort} {direction}"
            if sort == "star_rating":
                order_sql = f"{_pref_expr(request, 'star_rating')} {direction}"
            elif sort == "top_picks_score":
                from facet_tpu.api.top_picks import top_picks_score_sql

                order_sql = (f"{top_picks_score_sql(ctx.config.viewer)}"
                             f" {direction}")

            pref_cols, pref_params = preference_columns(request)
            join, join_params = preference_join(request)
            total = get_cached_count(conn, where, join_params + params
                                     if join else params, ctx.config.db_path) \
                if not join else conn.execute(
                    f"SELECT COUNT(*) FROM photos p{join} WHERE {where}",
                    join_params + params).fetchone()[0]

            rows = conn.execute(
                f"SELECT {PHOTO_FIELDS}, {pref_cols} FROM photos p{join}"
                f" WHERE {where} ORDER BY {order_sql}, p.path"
                f" LIMIT ? OFFSET ?",
                join_params + params + [page_size, (page - 1) * page_size]
            ).fetchall()
            photos = [dict(r) for r in rows]
            split_tags_field(photos)
            attach_person_data(conn, photos)

        return {
            "photos": photos,
            "total": total,
            "page": page,
            "page_size": page_size,
            "pages": max(1, -(-total // page_size)),
        }

    @app.get("/api/type_counts")
    def api_type_counts(request):
        with ctx.connection() as conn:
            return type_counts(conn, viewer=ctx.config.viewer)

    @app.get("/api/similar_photos/{path:path}")
    def api_similar(request, path):
        limit = request.param("limit", 24, int)
        max_distance = request.param("max_distance", 14, int)
        with ctx.connection() as conn:
            row = conn.execute("SELECT phash FROM photos WHERE path = ?",
                               ("/" + path if not path.startswith("/") else path,)
                               ).fetchone()
            if row is None or not row[0]:
                raise HTTPError(404, "photo not found or not hashed")
            target = row[0]
            candidates = conn.execute(
                "SELECT path, filename, phash, aggregate FROM photos"
                " WHERE phash IS NOT NULL AND path != ?",
                ("/" + path if not path.startswith("/") else path,)).fetchall()
        scored = []
        for cand in candidates:
            d = hamming_distance(target, cand["phash"])
            if d <= max_distance:
                scored.append({"path": cand["path"], "filename": cand["filename"],
                               "aggregate": cand["aggregate"], "distance": d})
        scored.sort(key=lambda r: r["distance"])
        return {"similar": scored[:limit]}

    @app.get("/api/config")
    def api_config(request):
        viewer = ctx.config.viewer
        return {
            "quality_thresholds": ctx.config.quality_thresholds(),
            "pagination": ctx.config.pagination(),
            "defaults": ctx.config.viewer_defaults(),
            "sort_options": viewer.get("sort_options", {}),
            "display": viewer.get("display", {}),
            "notification_duration_ms":
                viewer.get("notification_duration_ms", 2000),
            "photo_types": viewer.get("photo_types", {}),
            "features": ctx.config.features(),
            "comparison_mode": viewer.get("comparison_mode", {}),
            "multi_user": ctx.config.multi_user,
            "auth_required": ctx.auth.auth_required(),
            "role": request.state.get("role"),
        }
