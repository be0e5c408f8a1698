"""Comparison router: pairwise voting + weight learning endpoints.

(reference: api/routers/comparison.py — next_pair, submit, history/edit/
delete, coverage, statistics, optimize/learned weights, preview, snapshots)
"""

import json

from facet_tpu.api.auth import require_role
from facet_tpu.comparison.manager import ComparisonManager
from facet_tpu.comparison.pair_selector import PairSelector
from facet_tpu.web.framework import HTTPError


def register(app, ctx):
    manager = ComparisonManager(ctx.config.db_path)

    def _photo(conn, path):
        row = conn.execute(
            "SELECT path, filename, aggregate, aesthetic, comp_score, category"
            " FROM photos WHERE path = ?", (path,)).fetchone()
        return dict(row) if row else {"path": path}

    @app.get("/api/comparison/next_pair")
    def next_pair(request):
        strategy = request.param(
            "strategy",
            ctx.config.scoring.get_comparison_mode_settings()
            .get("pair_selection_strategy", "uncertainty"))
        category = request.param("category")
        selector = PairSelector(ctx.config.db_path, strategy, category)
        pair = selector.next_pair()
        if pair is None:
            return {"pair": None, "message": "no more comparable pairs"}
        with ctx.connection() as conn:
            return {"pair": [_photo(conn, pair[0]), _photo(conn, pair[1])],
                    "strategy": strategy}

    @app.post("/api/comparison/submit")
    def submit(request):
        body = request.json()
        for field in ("photo_a", "photo_b", "winner"):
            if not body.get(field):
                raise HTTPError(400, f"{field} required")
        try:
            cid = manager.submit(body["photo_a"], body["photo_b"], body["winner"],
                                 category=body.get("category"),
                                 session_id=body.get("session_id"),
                                 user_id=request.state.get("user"))
        except ValueError as exc:
            raise HTTPError(400, str(exc))
        return {"status": "ok", "id": cid, "count": manager.count()}

    @app.get("/api/comparison/history")
    def history(request):
        return {"history": manager.history(
            limit=request.param("limit", 50, int),
            offset=request.param("offset", 0, int))}

    @app.put("/api/comparison/{comparison_id:int}")
    def edit(request, comparison_id):
        winner = request.json().get("winner")
        try:
            ok = manager.edit(comparison_id, winner)
        except ValueError as exc:
            raise HTTPError(400, str(exc))
        if not ok:
            raise HTTPError(404, "comparison not found")
        return {"status": "ok"}

    @app.delete("/api/comparison/{comparison_id:int}")
    def delete(request, comparison_id):
        if not manager.delete(comparison_id):
            raise HTTPError(404, "comparison not found")
        return {"status": "ok"}

    @app.get("/api/comparison/coverage")
    def coverage(request):
        return manager.coverage()

    @app.post("/api/comparison/reset")
    def reset(request):
        """Wipe all comparison-derived data (votes, learned scores, runs)."""
        require_role(request, "admin")
        with ctx.connection() as conn:
            conn.execute("DELETE FROM comparisons")
            conn.execute("DELETE FROM learned_scores")
            conn.execute("DELETE FROM weight_optimization_runs")
            conn.commit()
        return {"status": "ok", "message": "all comparison data reset"}

    @app.get("/api/comparison/photo_metrics")
    def photo_metrics(request):
        """Raw metric columns for up to 2 photos (client-side score preview)."""
        paths = [p.strip() for p in (request.param("paths") or "").split(",")
                 if p.strip()]
        if not paths:
            raise HTTPError(400, "paths parameter required")
        if len(paths) > 2:
            raise HTTPError(400, "maximum 2 paths allowed")
        cols = ("path, category, aggregate, aesthetic, face_quality,"
                " eye_sharpness, tech_sharpness, color_score, exposure_score,"
                " comp_score, isolation_bonus, quality_score, contrast_score,"
                " dynamic_range_stops, noise_sigma, histogram_bimodality,"
                " mean_saturation, is_blink, is_silhouette, face_ratio,"
                " face_count, scoring_model, tags, is_monochrome,"
                " leading_lines_score, power_point_score, histogram_spread,"
                " mean_luminance")
        marks = ",".join("?" for _ in paths)
        with ctx.connection() as conn:
            rows = conn.execute(
                f"SELECT {cols} FROM photos WHERE path IN ({marks})",
                paths).fetchall()
        return {r["path"]: dict(r) for r in rows}

    @app.post("/api/comparison/override_category")
    def override_category(request):
        """Manually pin a photo's category."""
        require_role(request, "admin")
        body = request.json()
        path, category = body.get("path"), body.get("category")
        if not path or not category:
            raise HTTPError(400, "path and category required")
        if category not in ctx.config.scoring.get_all_category_names():
            raise HTTPError(400, f"unknown category '{category}'")
        with ctx.connection() as conn:
            row = conn.execute("SELECT category FROM photos WHERE path = ?",
                               (path,)).fetchone()
            if row is None:
                raise HTTPError(404, "photo not found")
            conn.execute("UPDATE photos SET category = ? WHERE path = ?",
                         (category, path))
            conn.commit()
        return {"status": "ok", "path": path,
                "old_category": row["category"], "new_category": category}

    @app.post("/api/comparison/suggest_filters")
    def suggest_filters(request):
        """Explain why a photo doesn't route to a target category and what
        filter changes would admit it."""
        body = request.json()
        path, target = body.get("path"), body.get("target_category")
        if not path or not target:
            raise HTTPError(400, "path and target_category required")
        with ctx.connection() as conn:
            row = conn.execute("SELECT * FROM photos WHERE path = ?",
                               (path,)).fetchone()
        if row is None:
            raise HTTPError(404, "photo not found")
        cat = ctx.config.scoring.get_category_config(target)
        if not cat:
            raise HTTPError(404, f"unknown category '{target}'")
        photo = dict(row)
        if photo.get("category") == target:
            return {"current_category": target, "target_category": target,
                    "conflicts": [], "suggestions": [], "no_conflicts": True,
                    "message": "photo is already in the target category"}
        from facet_tpu.api.filter_analysis import analyze_category_fit

        conflicts, suggestions = analyze_category_fit(
            photo, cat.get("filters", {}))
        return {
            "current_category": photo.get("category"),
            "target_category": target,
            "target_filters": cat.get("filters", {}),
            "conflicts": conflicts,
            "suggestions": suggestions,
            "no_conflicts": not conflicts,
            "photo_values": {k: photo.get(k) for k in (
                "face_ratio", "face_count", "is_monochrome", "is_silhouette",
                "is_group_portrait", "mean_luminance", "iso", "shutter_speed",
                "focal_length", "f_stop", "tags")},
        }

    @app.get("/api/comparison/statistics")
    def statistics(request):
        stats = manager.statistics()
        stats["agreement_accuracy"] = manager.agreement_accuracy()
        return stats

    # --------------------------------------------------- weight learning

    @app.post("/api/comparison/optimize")
    def optimize(request):
        require_role(request, "admin")
        from facet_tpu.optimization.weight_optimizer import WeightOptimizer

        category = request.json().get("category")
        optimizer = WeightOptimizer(ctx.config.db_path, ctx.config.scoring)
        result = optimizer.optimize(category=category)
        if result is None:
            raise HTTPError(400, "not enough comparisons to optimize")
        return result

    @app.post("/api/comparison/apply_weights")
    def apply_weights(request):
        require_role(request, "admin")
        from facet_tpu.optimization.weight_optimizer import WeightOptimizer

        body = request.json()
        optimizer = WeightOptimizer(ctx.config.db_path, ctx.config.scoring)
        result = body.get("result")
        if not result:
            result = optimizer.optimize(category=body.get("category"))
            if result is None:
                raise HTTPError(400, "not enough comparisons to optimize")
        optimizer.apply_optimized_weights(result)
        return {"status": "applied", "category": result["category"],
                "new_weights": result["new_weights"]}

    @app.get("/api/comparison/learned_weights")
    def learned_weights(request):
        """Suggested weights from the preference optimizer (optionally
        cross-validated), in the viewer's *_percent vocabulary."""
        require_role(request, "admin")
        from facet_tpu.optimization.weight_optimizer import WeightOptimizer

        category = request.param("category")
        include_ties = (request.param("include_ties", "true") or
                        "true").lower() == "true"
        use_cv = (request.param("use_cv", "false") or
                  "false").lower() == "true"
        settings = ctx.config.scoring.get_comparison_mode_settings()
        min_required = settings.get("min_comparisons_for_optimization", 30)

        optimizer = WeightOptimizer(ctx.config.db_path, ctx.config.scoring)
        kwargs = dict(category=category, min_comparisons=min_required,
                      include_ties=include_ties)
        result = (optimizer.optimize_cv(**kwargs) if use_cv
                  else optimizer.optimize(**kwargs))
        if result is None:
            have = manager.count(category)
            return {"available": False, "comparisons": have,
                    "min_required": min_required,
                    "message": f"need at least {min_required} comparisons"
                               f" (have {have})"}

        def to_percent(weights):
            return {f"{k}_percent": round(v * 100)
                    for k, v in weights.items()}

        response = {
            "available": True,
            "category": category,
            "current_weights": to_percent(result["old_weights"]),
            "suggested_weights": to_percent(result["new_weights"]),
            "accuracy_before": result["accuracy_before"],
            "accuracy_after": result["accuracy_after"],
            "improvement": round(result["accuracy_after"]
                                 - result["accuracy_before"], 4),
            "suggest_changes": result["suggest"],
            "comparisons_used": result["comparisons_used"],
            "method": result.get("method", "direct_preference_optimization"),
        }
        for key in ("cv_accuracy", "cv_std", "fold_results"):
            if key in result:
                response[key] = result[key]
        return response

    @app.get("/api/comparison/confidence")
    def confidence(request):
        """Bootstrap confidence intervals for the learned weights."""
        require_role(request, "admin")
        from facet_tpu.optimization.weight_optimizer import WeightOptimizer

        optimizer = WeightOptimizer(ctx.config.db_path, ctx.config.scoring)
        result = optimizer.weight_confidence(
            category=request.param("category"),
            n_bootstrap=min(500, request.param("n_bootstrap", 100, int)))
        if "error" in result:
            return {"available": False, "message": result["error"]}
        pct = lambda d: {f"{k}_percent": round(v * 100) for k, v in d.items()}
        return {
            "available": True,
            "weights": pct(result["weights"]),
            "lower_bounds": pct(result["lower_bounds"]),
            "upper_bounds": pct(result["upper_bounds"]),
            "confidence_intervals": pct(result["confidence_intervals"]),
            "stable_components": result["stable_components"],
            "n_bootstrap": result["n_bootstrap"],
            "comparisons_used": result["comparisons_used"],
        }

    @app.post("/api/recalculate")
    def recalculate(request):
        """Recompute every category + aggregate from stored raw metrics
        (same logic as `photos.py --recompute-average`), in-process."""
        require_role(request, "admin")
        from facet_tpu.processing.scorer import Facet

        engine = Facet(ctx.config.db_path, ctx.config.scoring,
                       lightweight=True)
        n = engine.update_all_aggregates(rescore_embeddings=False)
        return {"status": "ok", "photos_recomputed": n,
                "message": "recalculation complete"}

    @app.get("/api/comparison/snapshots")
    def snapshots(request):
        category = request.param("category")
        limit = max(1, min(request.param("limit", 50, int), 200))
        where, params = ("", [])
        if category:
            where, params = (" WHERE category = ?", [category])
        with ctx.connection() as conn:
            rows = conn.execute(
                "SELECT id, timestamp, category, description, accuracy_before,"
                " accuracy_after, comparisons_used, created_by"
                f" FROM weight_config_snapshots{where}"
                " ORDER BY timestamp DESC LIMIT ?",
                params + [limit]).fetchall()
        return {"snapshots": [dict(r) for r in rows]}

    @app.post("/api/comparison/snapshots")
    def save_snapshot(request):
        """Save the current weights of a category as a named snapshot
        (reference: api/routers/comparison.py:1141 save_snapshot)."""
        require_role(request, "admin")
        body = request.json()
        category = body.get("category")
        cat = ctx.config.scoring.get_category_config(category) \
            if category else None
        if not cat:
            raise HTTPError(400, "unknown or missing category")
        # snapshot the RAW '*_percent' weight block — restore_snapshot
        # writes it back verbatim into cat['weights'], so the normalized
        # get_weights() vocabulary would corrupt the config on restore
        # (same shape apply_optimized_weights snapshots,
        # optimization/weight_optimizer.py:363)
        weights = dict(cat.get("weights", {}))
        with ctx.connection() as conn:
            cur = conn.execute(
                "INSERT INTO weight_config_snapshots (category, weights,"
                " description, accuracy_before, accuracy_after,"
                " comparisons_used, created_by) VALUES (?, ?, ?, ?, ?, ?, ?)",
                (category, json.dumps(weights), body.get("description"),
                 body.get("accuracy_before"), body.get("accuracy_after"),
                 body.get("comparisons_used"),
                 body.get("created_by") or request.state.get("user")))
            conn.commit()
            snapshot_id = cur.lastrowid
        return {"status": "saved", "snapshot_id": snapshot_id}

    @app.post("/api/comparison/snapshots/{snapshot_id:int}/restore")
    def restore(request, snapshot_id):
        require_role(request, "admin")
        from facet_tpu.optimization.weight_optimizer import WeightOptimizer

        optimizer = WeightOptimizer(ctx.config.db_path, ctx.config.scoring)
        if not optimizer.restore_snapshot(snapshot_id):
            raise HTTPError(404, "snapshot not found")
        return {"status": "restored", "id": snapshot_id}

    @app.post("/api/comparison/preview_score")
    def preview(request):
        """Score preview under hypothetical weights (no persistence).

        Accepts one `path` or a `paths` list — the weight editor's live
        preview re-scores its whole photo strip in a single vectorized
        call (reference: comparison.component.ts refreshes preview photos
        on every debounced weight change)."""
        body = request.json()
        paths = body.get("paths") or ([body["path"]] if body.get("path")
                                      else [])
        weights = body.get("weights") or {}
        if not isinstance(weights, dict) or not isinstance(paths, list):
            raise HTTPError(400, "weights must be an object, paths a list")
        if not paths:
            raise HTTPError(400, "path or paths required")
        if len(paths) > 100:
            raise HTTPError(400, "at most 100 paths per preview")
        from facet_tpu.scoring.brain import METRIC_KEYS
        from facet_tpu.scoring.vectorized import AggregateScorer

        with ctx.connection() as conn:
            marks = ",".join("?" * len(paths))
            rows = {r["path"]: dict(r) for r in conn.execute(
                f"SELECT * FROM photos WHERE path IN ({marks})", paths)}
        missing = [p for p in paths if p not in rows]
        if missing:
            raise HTTPError(404, f"photo not found: {missing[0]}")
        scorer = AggregateScorer(ctx.config.scoring)
        values = scorer.metric_values([rows[p] for p in paths])
        import numpy as np

        try:
            vec = np.array([float(weights.get(k, 0.0) or 0.0)
                            for k in METRIC_KEYS], np.float32)
        except (TypeError, ValueError):
            raise HTTPError(400, "weights must be numeric")
        total = vec.sum()
        if not np.isfinite(total) or total <= 0:
            raise HTTPError(400, "weights must sum to a positive value")
        vec /= total
        scores = values @ vec
        if "paths" in body:
            return {"previews": [
                {"path": p, "preview_score": round(float(s), 3),
                 "current_score": rows[p].get("aggregate")}
                for p, s in zip(paths, scores)]}
        path = paths[0]
        return {"path": path,
                "preview_score": round(float(scores[0]), 3),
                "current_aggregate": rows[path].get("aggregate")}
