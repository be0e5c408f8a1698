"""Stats router: dashboard aggregations.

(reference: api/routers/stats.py — 15 endpoints) Overview, score
distributions, gear, shooting-settings distributions, timeline heatmap,
category breakdown/weights/metrics, correlations, and weight updates.
"""

import math

from facet_tpu.web.framework import HTTPError
from facet_tpu.api.auth import require_role

SCORE_COLUMNS = ["aggregate", "aesthetic", "tech_sharpness", "exposure_score",
                 "color_score", "comp_score", "contrast_score", "face_quality",
                 "eye_sharpness", "quality_score", "topiq_score"]


def _histogram(conn, column, bins=20, lo=0.0, hi=10.0, flt="", params=()):
    width = (hi - lo) / bins
    rows = conn.execute(
        f"SELECT CAST((({column}) - ?) / ? AS INTEGER) AS bucket, COUNT(*)"
        f" FROM photos WHERE {column} IS NOT NULL{flt} GROUP BY bucket",
        [lo, width] + list(params)).fetchall()
    counts = [0] * bins
    for bucket, count in rows:
        counts[min(max(int(bucket), 0), bins - 1)] += count
    return {"bins": [round(lo + i * width, 3) for i in range(bins)],
            "counts": counts}


def _pearson(xs, ys):
    n = len(xs)
    if n < 3:
        return None
    mx = sum(xs) / n
    my = sum(ys) / n
    cov = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    vx = sum((x - mx) ** 2 for x in xs)
    vy = sum((y - my) ** 2 for y in ys)
    if vx <= 0 or vy <= 0:
        return None
    return cov / math.sqrt(vx * vy)


def _stats_filter(request):
    """date_from/date_to/category drill-down filter shared by the stats
    endpoints (reference: stats.py _stats_filter_where — 15 endpoints all
    accept the same three params)."""
    where, params = "", []
    date_from = request.param("date_from")
    date_to = request.param("date_to")
    category = request.param("category")
    if date_from:
        where += " AND date_taken >= ?"
        params.append(date_from.replace("-", ":"))
    if date_to:
        where += " AND date_taken <= ?"
        params.append(date_to.replace("-", ":") + "~")   # inclusive day end
    if category:
        where += " AND category = ?"
        params.append(category)
    return where, params


def register(app, ctx):
    @app.get("/api/stats/overview")
    def overview(request):
        flt, fp = _stats_filter(request)
        with ctx.connection() as conn:
            total = conn.execute(
                f"SELECT COUNT(*) FROM photos WHERE 1=1{flt}",
                fp).fetchone()[0]
            scored = conn.execute(
                "SELECT COUNT(*) FROM photos WHERE aggregate IS NOT NULL"
                f"{flt}", fp).fetchone()[0]
            row = conn.execute(
                "SELECT AVG(aggregate), MIN(aggregate), MAX(aggregate)"
                f" FROM photos WHERE aggregate IS NOT NULL{flt}",
                fp).fetchone()
            if flt:
                # the faces/persons cards respect the drill-down too:
                # count faces on matching photos, persons seen in them
                faces = conn.execute(
                    "SELECT COUNT(*) FROM faces f WHERE f.photo_path IN"
                    f" (SELECT path FROM photos WHERE 1=1{flt})",
                    fp).fetchone()[0]
                persons = conn.execute(
                    "SELECT COUNT(DISTINCT f.person_id) FROM faces f"
                    " WHERE f.person_id IS NOT NULL AND f.photo_path IN"
                    f" (SELECT path FROM photos WHERE 1=1{flt})",
                    fp).fetchone()[0]
            else:
                faces = conn.execute(
                    "SELECT COUNT(*) FROM faces").fetchone()[0]
                persons = conn.execute(
                    "SELECT COUNT(*) FROM persons"
                    " WHERE face_count > 0").fetchone()[0]
            blinks = conn.execute(
                f"SELECT COUNT(*) FROM photos WHERE is_blink = 1{flt}",
                fp).fetchone()[0]
            thresholds = ctx.config.quality_thresholds()
            quality_counts = {}
            for name, threshold in thresholds.items():
                quality_counts[name] = conn.execute(
                    f"SELECT COUNT(*) FROM photos WHERE aggregate >= ?{flt}",
                    [threshold] + fp).fetchone()[0]
        return {
            "total_photos": total, "scored_photos": scored,
            "avg_score": round(row[0], 3) if row[0] is not None else None,
            "min_score": row[1], "max_score": row[2],
            "faces": faces, "persons": persons, "blinks": blinks,
            "quality_counts": quality_counts,
        }

    @app.get("/api/stats/score_distribution")
    def score_distribution(request):
        column = request.param("metric", "aggregate")
        if column not in SCORE_COLUMNS:
            raise HTTPError(400, f"unknown metric '{column}'")
        flt, fp = _stats_filter(request)
        with ctx.connection() as conn:
            return _histogram(conn, column, bins=20, flt=flt, params=fp)

    @app.get("/api/stats/gear")
    def gear(request):
        flt, fp = _stats_filter(request)
        with ctx.connection() as conn:
            cameras = conn.execute(
                "SELECT camera_model, COUNT(*) AS cnt, AVG(aggregate) AS avg_score"
                f" FROM photos WHERE camera_model IS NOT NULL{flt}"
                " GROUP BY camera_model ORDER BY cnt DESC", fp).fetchall()
            lenses = conn.execute(
                "SELECT lens_model, COUNT(*) AS cnt, AVG(aggregate) AS avg_score"
                f" FROM photos WHERE lens_model IS NOT NULL{flt}"
                " GROUP BY lens_model ORDER BY cnt DESC", fp).fetchall()
        fmt = lambda rows, key: [
            {key: r[0], "count": r[1],
             "avg_score": round(r[2], 3) if r[2] is not None else None}
            for r in rows]
        return {"cameras": fmt(cameras, "camera"), "lenses": fmt(lenses, "lens")}

    @app.get("/api/stats/settings")
    def settings(request):
        flt, fp = _stats_filter(request)
        out = {}
        with ctx.connection() as conn:
            for name, col, order in (
                ("iso", "iso", " ORDER BY iso"),
                ("aperture", "f_stop", " ORDER BY f_stop"),
                ("focal_length", "CAST(focal_length AS INTEGER)", " ORDER BY 1"),
                ("shutter_speed", "shutter_speed", ""),
            ):
                guard = col if "(" not in col else "focal_length"
                out[name] = [{"value": r[0], "count": r[1]}
                             for r in conn.execute(
                                 f"SELECT {col}, COUNT(*) FROM photos"
                                 f" WHERE {guard} IS NOT NULL{flt}"
                                 f" GROUP BY 1{order}", fp)]
        return out

    @app.get("/api/stats/timeline")
    def timeline(request):
        flt, fp = _stats_filter(request)
        with ctx.connection() as conn:
            rows = conn.execute(
                "SELECT substr(date_taken, 1, 7) AS month, COUNT(*),"
                f" AVG(aggregate) FROM photos WHERE date_taken IS NOT NULL{flt}"
                " GROUP BY month ORDER BY month", fp).fetchall()
            yearly = conn.execute(
                "SELECT substr(date_taken, 1, 4) AS year, COUNT(*)"
                f" FROM photos WHERE date_taken IS NOT NULL AND"
                f" date_taken != ''{flt} GROUP BY year ORDER BY year",
                fp).fetchall()
            # day-of-week x hour heatmap, reference shape: day 0 = Sunday
            # (strftime %w) — reference stats.py:460-467
            heat = conn.execute(
                "SELECT CAST(STRFTIME('%w',"
                " REPLACE(SUBSTR(date_taken, 1, 10), ':', '-')) AS INTEGER),"
                " CAST(SUBSTR(date_taken, 12, 2) AS INTEGER), COUNT(*)"
                " FROM photos WHERE date_taken IS NOT NULL"
                f" AND LENGTH(date_taken) >= 13{flt}"
                " GROUP BY 1, 2", fp).fetchall()
            top_days = conn.execute(
                "SELECT REPLACE(SUBSTR(date_taken, 1, 10), ':', '-') AS day,"
                " COUNT(*) AS cnt FROM photos WHERE date_taken IS NOT NULL"
                f" AND date_taken != ''{flt}"
                " GROUP BY day ORDER BY cnt DESC LIMIT 10", fp).fetchall()
        return {
            "months": [
                {"month": r[0].replace(":", "-"), "count": r[1],
                 "avg_score": round(r[2], 3) if r[2] is not None else None}
                for r in rows if r[0]],
            "yearly": [{"year": r[0], "count": r[1]} for r in yearly if r[0]],
            "heatmap": [{"day": r[0], "hour": r[1], "count": r[2]}
                        for r in heat if r[0] is not None and r[1] is not None
                        and 0 <= r[1] < 24],
            "top_days": [{"date": r[0], "count": r[1]} for r in top_days],
        }

    @app.get("/api/stats/scatter")
    def scatter(request):
        """Raw sampled (x, y) metric points + Pearson r for the
        correlation scatter chart. Columns whitelisted against
        SCORE_COLUMNS (+ shooting params); sampling is a deterministic
        Knuth-hash shuffle so pagination-free charts stay stable."""
        axes = set(SCORE_COLUMNS) | {"iso", "f_stop", "focal_length",
                                     "mean_luminance", "face_count",
                                     "dynamic_range_stops", "noise_sigma"}
        x = request.param("x", "aesthetic")
        y = request.param("y", "aggregate")
        if x not in axes or y not in axes:
            raise HTTPError(400, "invalid scatter axis")
        limit = max(10, min(request.param("limit", 500, int), 2000))
        flt, fp = _stats_filter(request)
        with ctx.connection() as conn:
            rows = conn.execute(
                f"SELECT {x}, {y} FROM photos"
                f" WHERE {x} IS NOT NULL AND {y} IS NOT NULL{flt}"
                " ORDER BY (rowid * 2654435761) % 4294967296 LIMIT ?",
                fp + [limit]).fetchall()
        xs = [r[0] for r in rows]
        ys = [r[1] for r in rows]
        corr = _pearson(xs, ys)
        return {"x": x, "y": y,
                "points": [[round(a, 4), round(b, 4)] for a, b in rows],
                "r": round(corr, 4) if corr is not None else None,
                "samples": len(rows)}

    @app.get("/api/stats/categories")
    def categories(request):
        flt, fp = _stats_filter(request)
        with ctx.connection() as conn:
            rows = conn.execute(
                "SELECT category, COUNT(*), AVG(aggregate), MAX(aggregate)"
                f" FROM photos WHERE category IS NOT NULL{flt}"
                " GROUP BY category ORDER BY 2 DESC", fp).fetchall()
        return {"categories": [
            {"category": r[0], "count": r[1],
             "avg_score": round(r[2], 3) if r[2] is not None else None,
             "max_score": r[3]} for r in rows]}

    @app.get("/api/stats/category_weights")
    def category_weights(request):
        names = ctx.config.scoring.get_all_category_names()
        return {"weights": {name: ctx.config.scoring.get_weights(name)
                            for name in names}}

    @app.get("/api/stats/correlations")
    def correlations(request):
        metrics = [m for m in SCORE_COLUMNS if m != "aggregate"]
        cols = ", ".join(["aggregate"] + metrics)
        flt, fp = _stats_filter(request)
        with ctx.connection() as conn:
            rows = conn.execute(
                f"SELECT {cols} FROM photos WHERE aggregate IS NOT NULL{flt}",
                fp).fetchall()
        out = {}
        for i, metric in enumerate(metrics, start=1):
            pairs = [(r[0], r[i]) for r in rows if r[i] is not None]
            if len(pairs) >= 3:
                corr = _pearson([p[0] for p in pairs], [p[1] for p in pairs])
                out[metric] = round(corr, 4) if corr is not None else None
            else:
                out[metric] = None
        return {"correlation_with_aggregate": out, "samples": len(rows)}

    # weight-key -> photos column carrying that metric (for per-category
    # correlation/metric endpoints; reference: stats.py:701-920)
    WEIGHT_METRIC_COLUMNS = {
        "aesthetic": "aesthetic",
        "face_quality": "face_quality",
        "eye_sharpness": "eye_sharpness",
        "tech_sharpness": "tech_sharpness",
        "exposure": "exposure_score",
        "composition": "comp_score",
        "color": "color_score",
        "quality": "quality_score",
        "contrast": "contrast_score",
        "dynamic_range": "dynamic_range_stops",
        "isolation": "isolation_bonus",
        "leading_lines": "leading_lines_score",
    }

    @app.get("/api/stats/category_correlations")
    def category_correlations(request):
        """Per-category Pearson r between each weight dimension and the
        aggregate, next to the configured weight percentages."""
        results = {}
        with ctx.connection() as conn:
            for key, col in WEIGHT_METRIC_COLUMNS.items():
                rows = conn.execute(
                    f"SELECT category, COUNT(*), SUM({col}), SUM(aggregate),"
                    f" SUM({col} * aggregate), SUM({col} * {col}),"
                    f" SUM(aggregate * aggregate) FROM photos"
                    f" WHERE {col} IS NOT NULL AND aggregate IS NOT NULL"
                    f" AND category IS NOT NULL AND category != ''"
                    f" GROUP BY category HAVING COUNT(*) >= 10").fetchall()
                for cat, n, sx, sy, sxy, sx2, sy2 in rows:
                    denom = math.sqrt(max((n * sx2 - sx * sx), 0.0)
                                      * max((n * sy2 - sy * sy), 0.0))
                    r = (n * sxy - sx * sy) / denom if denom > 0 else 0.0
                    results.setdefault(cat, {})[key] = round(r, 3)
        configured = {}
        for name in ctx.config.scoring.get_all_category_names():
            cat = ctx.config.scoring.get_category_config(name) or {}
            weights = cat.get("weights", {})
            configured[name] = {k: weights.get(f"{k}_percent", 0)
                                for k in WEIGHT_METRIC_COLUMNS}
        return {"correlations": results, "configured_weights": configured,
                "dimensions": list(WEIGHT_METRIC_COLUMNS)}

    @app.get("/api/stats/category_metrics")
    def category_metrics(request):
        """Raw metric vectors for one category (client-side what-if preview)."""
        category = request.param("category")
        if not category:
            raise HTTPError(400, "category required")
        cols = list(WEIGHT_METRIC_COLUMNS.values())
        col_sql = ", ".join(cols)
        with ctx.connection() as conn:
            rows = conn.execute(
                f"SELECT {col_sql}, aggregate FROM photos"
                f" WHERE category = ? LIMIT 5000", (category,)).fetchall()
        metrics = {k: [] for k in WEIGHT_METRIC_COLUMNS}
        aggregate = []
        for row in rows:
            for i, key in enumerate(WEIGHT_METRIC_COLUMNS):
                metrics[key].append(row[i] if row[i] is not None else 0)
            aggregate.append(row[len(cols)] if row[len(cols)] is not None else 0)
        return {"category": category, "count": len(aggregate),
                "metrics": metrics, "current_aggregate": aggregate}

    @app.get("/api/stats/category_overlap")
    def category_overlap(request):
        """Which category filters each photo *could* match: overlap pairs,
        per-category matched-vs-assigned counts, uncategorized tally."""
        from collections import defaultdict

        from facet_tpu.config.category_filter import CategoryFilter
        from facet_tpu.scoring.brain import parse_shutter_speed

        cats = []
        for cat_cfg in ctx.config.scoring.get_categories():
            cats.append((cat_cfg["name"], cat_cfg.get("priority", 100),
                         CategoryFilter(cat_cfg.get("filters", {}))))
        with ctx.connection() as conn:
            rows = conn.execute(
                "SELECT tags, face_count, face_ratio, is_silhouette,"
                " is_group_portrait, is_monochrome, mean_luminance, iso,"
                " shutter_speed, focal_length, f_stop, category"
                " FROM photos").fetchall()
        keys = ("tags", "face_count", "face_ratio", "is_silhouette",
                "is_group_portrait", "is_monochrome", "mean_luminance", "iso",
                "shutter_speed", "focal_length", "f_stop", "category")
        overlap_pairs = defaultdict(int)
        match_counts = defaultdict(int)
        assigned_counts = defaultdict(int)
        uncategorized = 0
        for row in rows:
            photo = dict(zip(keys, row))
            photo["shutter_speed"] = parse_shutter_speed(photo["shutter_speed"])
            assigned = photo.get("category") or ""
            if assigned:
                assigned_counts[assigned] += 1
            else:
                uncategorized += 1
            matched = [name for name, _, filt in cats if filt.matches(photo)]
            for name in matched:
                match_counts[name] += 1
            for i in range(len(matched)):
                for j in range(i + 1, len(matched)):
                    overlap_pairs[tuple(sorted((matched[i], matched[j])))] += 1
        overlaps = [{"pair": list(pair), "count": count}
                    for pair, count in sorted(overlap_pairs.items(),
                                              key=lambda kv: -kv[1])][:50]
        per_category = [{
            "name": name, "priority": priority,
            "assigned": assigned_counts.get(name, 0),
            "matched": match_counts.get(name, 0),
            "captured_by_higher": max(
                0, match_counts.get(name, 0) - assigned_counts.get(name, 0)),
        } for name, priority, _ in cats]
        return {"overlaps": overlaps, "per_category": per_category,
                "uncategorized": uncategorized, "total": len(rows)}

    @app.post("/api/stats/update_weights")
    def update_weights(request):
        require_role(request, "admin")
        body = request.json()
        category = body.get("category")
        weights = body.get("weights")
        if not category or not isinstance(weights, dict):
            raise HTTPError(400, "category and weights required")
        cat = ctx.config.scoring.get_category_config(category)
        if not cat:
            raise HTTPError(404, f"unknown category '{category}'")
        for key, val in weights.items():
            if not key.endswith("_percent"):
                continue
            # a persisted non-numeric value (e.g. a JSON string from a
            # form) slips past validate_weights' isinstance filter and
            # then TypeErrors every get_weights() call — reject here
            try:
                val = float(val)
            except (TypeError, ValueError):
                raise HTTPError(400, f"weight '{key}' must be a number")
            cat.setdefault("weights", {})[key] = val
        ctx.config.scoring.validate_weights(verbose=False)
        ctx.config.scoring.save_config()
        return {"status": "ok", "category": category,
                "weights": cat.get("weights", {})}

    @app.post("/api/stats/recompute")
    def recompute(request):
        require_role(request, "admin")
        from facet_tpu.processing.scorer import Facet

        scorer = Facet(ctx.config.db_path, ctx.config.scoring, lightweight=True)
        n = scorer.update_all_aggregates(rescore_embeddings=False)
        from facet_tpu.db.stats_cache import refresh_stats_cache

        refresh_stats_cache(ctx.config.db_path)
        return {"status": "ok", "recomputed": n}
