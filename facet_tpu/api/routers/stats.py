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


def _histogram(conn, column, bins=20, lo=0.0, hi=10.0):
    width = (hi - lo) / bins
    rows = conn.execute(
        f"SELECT CAST((({column}) - ?) / ? AS INTEGER) AS bucket, COUNT(*)"
        f" FROM photos WHERE {column} IS NOT NULL GROUP BY bucket",
        (lo, width)).fetchall()
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


def register(app, ctx):
    @app.get("/api/stats/overview")
    def overview(request):
        with ctx.connection() as conn:
            total = conn.execute("SELECT COUNT(*) FROM photos").fetchone()[0]
            scored = conn.execute(
                "SELECT COUNT(*) FROM photos WHERE aggregate IS NOT NULL").fetchone()[0]
            row = conn.execute(
                "SELECT AVG(aggregate), MIN(aggregate), MAX(aggregate)"
                " FROM photos WHERE aggregate IS NOT NULL").fetchone()
            faces = conn.execute("SELECT COUNT(*) FROM faces").fetchone()[0]
            persons = conn.execute(
                "SELECT COUNT(*) FROM persons WHERE face_count > 0").fetchone()[0]
            blinks = conn.execute(
                "SELECT COUNT(*) FROM photos WHERE is_blink = 1").fetchone()[0]
            thresholds = ctx.config.quality_thresholds()
            quality_counts = {}
            for name, threshold in thresholds.items():
                quality_counts[name] = conn.execute(
                    "SELECT COUNT(*) FROM photos WHERE aggregate >= ?",
                    (threshold,)).fetchone()[0]
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
        with ctx.connection() as conn:
            return _histogram(conn, f"p.{column}".replace("p.", ""), bins=20)

    @app.get("/api/stats/gear")
    def gear(request):
        with ctx.connection() as conn:
            cameras = conn.execute(
                "SELECT camera_model, COUNT(*) AS cnt, AVG(aggregate) AS avg_score"
                " FROM photos WHERE camera_model IS NOT NULL"
                " GROUP BY camera_model ORDER BY cnt DESC").fetchall()
            lenses = conn.execute(
                "SELECT lens_model, COUNT(*) AS cnt, AVG(aggregate) AS avg_score"
                " FROM photos WHERE lens_model IS NOT NULL"
                " GROUP BY lens_model ORDER BY cnt DESC").fetchall()
        fmt = lambda rows, key: [
            {key: r[0], "count": r[1],
             "avg_score": round(r[2], 3) if r[2] is not None else None}
            for r in rows]
        return {"cameras": fmt(cameras, "camera"), "lenses": fmt(lenses, "lens")}

    @app.get("/api/stats/settings")
    def settings(request):
        out = {}
        with ctx.connection() as conn:
            for name, sql in (
                ("iso", "SELECT iso, COUNT(*) FROM photos WHERE iso IS NOT NULL"
                        " GROUP BY iso ORDER BY iso"),
                ("aperture", "SELECT f_stop, COUNT(*) FROM photos"
                             " WHERE f_stop IS NOT NULL GROUP BY f_stop ORDER BY f_stop"),
                ("focal_length", "SELECT CAST(focal_length AS INTEGER), COUNT(*)"
                                 " FROM photos WHERE focal_length IS NOT NULL"
                                 " GROUP BY 1 ORDER BY 1"),
                ("shutter_speed", "SELECT shutter_speed, COUNT(*) FROM photos"
                                  " WHERE shutter_speed IS NOT NULL"
                                  " GROUP BY shutter_speed"),
            ):
                out[name] = [{"value": r[0], "count": r[1]}
                             for r in conn.execute(sql)]
        return out

    @app.get("/api/stats/timeline")
    def timeline(request):
        with ctx.connection() as conn:
            rows = conn.execute(
                "SELECT substr(date_taken, 1, 7) AS month, COUNT(*),"
                " AVG(aggregate) FROM photos WHERE date_taken IS NOT NULL"
                " GROUP BY month ORDER BY month").fetchall()
        return {"months": [
            {"month": r[0].replace(":", "-"), "count": r[1],
             "avg_score": round(r[2], 3) if r[2] is not None else None}
            for r in rows if r[0]]}

    @app.get("/api/stats/categories")
    def categories(request):
        with ctx.connection() as conn:
            rows = conn.execute(
                "SELECT category, COUNT(*), AVG(aggregate), MAX(aggregate)"
                " FROM photos WHERE category IS NOT NULL"
                " GROUP BY category ORDER BY 2 DESC").fetchall()
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
        with ctx.connection() as conn:
            rows = conn.execute(
                f"SELECT {cols} FROM photos WHERE aggregate IS NOT NULL").fetchall()
        out = {}
        for i, metric in enumerate(metrics, start=1):
            pairs = [(r[0], r[i]) for r in rows if r[i] is not None]
            if len(pairs) >= 3:
                corr = _pearson([p[0] for p in pairs], [p[1] for p in pairs])
                out[metric] = round(corr, 4) if corr is not None else None
            else:
                out[metric] = None
        return {"correlation_with_aggregate": out, "samples": len(rows)}

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
            if key.endswith("_percent"):
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
