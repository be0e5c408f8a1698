"""Filter-options router: lazy-loaded dropdown option lists with counts.

(reference: api/routers/filter_options.py:43-214 — eight per-filter
endpoints; each serves from the stats cache when fresh and single-user,
otherwise queries with per-user visibility filtering.)
"""

from facet_tpu.api.db_helpers import is_photo_tags_populated, visibility_clause

# dropdown limits, overridable via viewer config {"dropdowns": {...}}
_DEFAULTS = {
    "max_cameras": 50,
    "max_lenses": 50,
    "max_tags": 100,
    "max_persons": 100,
    "min_photos_for_person": 1,
}


def register(app, ctx):
    def dropdown(key):
        return ctx.config.viewer.get("dropdowns", {}).get(key, _DEFAULTS[key])

    def cached_or_query(request, cache_key, result_key, query, gate=None):
        """Serve the stats-cache value when fresh and no per-user
        visibility applies; otherwise run the live query. `gate` applies
        the dropdown caps to cached rows so the cache path and the live
        query agree (the cache stores ungated lists)."""
        vis, vp = visibility_clause(request)
        if not vis and not ctx.config.multi_user:
            from facet_tpu.db.stats_cache import get_cached_stat

            data, fresh = get_cached_stat(ctx.config.db_path, cache_key)
            if data and fresh:
                return {result_key: gate(data) if gate else data,
                        "cached": True}
        with ctx.connection() as conn:
            return {result_key: query(conn, vis, vp), "cached": False}

    @app.get("/api/filter_options/cameras")
    def cameras(request):
        def query(conn, vis, vp):
            return [tuple(r) for r in conn.execute(
                "SELECT camera_model, COUNT(*) AS cnt FROM photos"
                f" WHERE camera_model IS NOT NULL{vis}"
                " GROUP BY camera_model ORDER BY cnt DESC LIMIT ?",
                vp + [dropdown("max_cameras")])]
        return cached_or_query(request, "cameras", "cameras", query,
                               gate=lambda rows: rows[:dropdown("max_cameras")])

    @app.get("/api/filter_options/lenses")
    def lenses(request):
        def query(conn, vis, vp):
            return [tuple(r) for r in conn.execute(
                "SELECT lens_model, COUNT(*) AS cnt FROM photos"
                f" WHERE lens_model IS NOT NULL{vis}"
                " GROUP BY lens_model ORDER BY cnt DESC LIMIT ?",
                vp + [dropdown("max_lenses")])]
        return cached_or_query(request, "lenses", "lenses", query,
                               gate=lambda rows: rows[:dropdown("max_lenses")])

    @app.get("/api/filter_options/categories")
    def categories(request):
        def query(conn, vis, vp):
            return [tuple(r) for r in conn.execute(
                "SELECT category, COUNT(*) AS cnt FROM photos"
                f" WHERE category IS NOT NULL{vis}"
                " GROUP BY category ORDER BY cnt DESC", vp)]
        return cached_or_query(request, "categories", "categories", query)

    @app.get("/api/filter_options/patterns")
    def patterns(request):
        def query(conn, vis, vp):
            return [tuple(r) for r in conn.execute(
                "SELECT composition_pattern, COUNT(*) AS cnt FROM photos"
                " WHERE composition_pattern IS NOT NULL"
                f" AND composition_pattern != ''{vis}"
                " GROUP BY composition_pattern ORDER BY cnt DESC", vp)]
        return cached_or_query(request, "composition_patterns", "patterns",
                               query)

    @app.get("/api/filter_options/apertures")
    def apertures(request):
        def query(conn, vis, vp):
            return [tuple(r) for r in conn.execute(
                "SELECT ROUND(f_stop, 1) AS ap, COUNT(*) AS cnt FROM photos"
                " WHERE f_stop IS NOT NULL AND f_stop > 0"
                f" AND f_stop < 1000{vis}"
                " GROUP BY ap ORDER BY ap ASC", vp)]
        return cached_or_query(request, "apertures", "apertures", query)

    @app.get("/api/filter_options/focal_lengths")
    def focal_lengths(request):
        def query(conn, vis, vp):
            return [tuple(r) for r in conn.execute(
                "SELECT CAST(ROUND(focal_length) AS INTEGER) AS fl,"
                " COUNT(*) AS cnt FROM photos"
                f" WHERE focal_length IS NOT NULL AND focal_length > 0{vis}"
                " GROUP BY fl ORDER BY fl ASC", vp)]
        return cached_or_query(request, "focal_lengths", "focal_lengths",
                               query)

    @app.get("/api/filter_options/tags")
    def tags(request):
        def query(conn, vis, vp):
            limit = dropdown("max_tags")
            vis_sub = (f" AND photo_path IN (SELECT path FROM photos"
                       f" WHERE 1=1{vis})") if vis else ""
            if is_photo_tags_populated(conn):
                return [tuple(r) for r in conn.execute(
                    "SELECT tag, COUNT(*) AS cnt FROM photo_tags"
                    f" WHERE 1=1{vis_sub}"
                    " GROUP BY tag ORDER BY cnt DESC, tag ASC LIMIT ?",
                    vp + [limit])]
            # CSV-column fallback when photo_tags was never synced
            counts = {}
            for (raw,) in conn.execute(
                    "SELECT tags FROM photos WHERE tags IS NOT NULL"
                    f" AND tags != ''{vis}", vp):
                for tag in raw.split(","):
                    tag = tag.strip()
                    if tag:
                        counts[tag] = counts.get(tag, 0) + 1
            ordered = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
            return ordered[:limit]
        return cached_or_query(request, "tags", "tags", query,
                               gate=lambda rows: rows[:dropdown("max_tags")])

    @app.get("/api/filter_options/persons")
    def persons(request):
        def query(conn, vis, vp):
            vis_sub = (f" AND f.photo_path IN (SELECT path FROM photos"
                       f" WHERE 1=1{vis})") if vis else ""
            return [tuple(r) for r in conn.execute(
                "SELECT p.id, p.name, COUNT(DISTINCT f.photo_path)"
                " AS photo_count FROM persons p"
                f" JOIN faces f ON f.person_id = p.id WHERE 1=1{vis_sub}"
                " GROUP BY p.id HAVING photo_count >= ?"
                " ORDER BY photo_count DESC LIMIT ?",
                vp + [dropdown("min_photos_for_person"),
                      dropdown("max_persons")])]
        return cached_or_query(
            request, "persons", "persons", query,
            gate=lambda rows: [
                r for r in rows
                if r[2] >= dropdown("min_photos_for_person")
            ][:dropdown("max_persons")])
