"""Comparison router: pairwise voting + weight learning endpoints.

(reference: api/routers/comparison.py — next_pair, submit, history/edit/
delete, coverage, statistics, optimize/learned weights, preview, snapshots)
"""

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

    @app.get("/api/comparison/snapshots")
    def snapshots(request):
        with ctx.connection() as conn:
            rows = conn.execute(
                "SELECT id, timestamp, category, description, accuracy_before,"
                " accuracy_after, comparisons_used, created_by"
                " FROM weight_config_snapshots ORDER BY timestamp DESC LIMIT 50"
            ).fetchall()
        return {"snapshots": [dict(r) for r in rows]}

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
        """Score preview under hypothetical weights (no persistence)."""
        body = request.json()
        path = body.get("path")
        weights = body.get("weights") or {}
        if not path:
            raise HTTPError(400, "path required")
        from facet_tpu.scoring.brain import METRIC_KEYS
        from facet_tpu.scoring.vectorized import AggregateScorer

        with ctx.connection() as conn:
            row = conn.execute("SELECT * FROM photos WHERE path = ?",
                               (path,)).fetchone()
        if row is None:
            raise HTTPError(404, "photo not found")
        scorer = AggregateScorer(ctx.config.scoring)
        values = scorer.metric_values([dict(row)])[0]
        import numpy as np

        vec = np.array([weights.get(k, 0.0) for k in METRIC_KEYS], np.float32)
        total = vec.sum()
        if total <= 0:
            raise HTTPError(400, "weights must sum to a positive value")
        vec /= total
        return {"path": path,
                "preview_score": round(float(values @ vec), 3),
                "current_aggregate": row["aggregate"]}
