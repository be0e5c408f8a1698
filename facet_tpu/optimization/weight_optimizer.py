"""Direct preference optimization of category weights.

Learns the 16 metric weights from pairwise votes (reference:
optimization/weight_optimizer.py:343-648):

- model: Bradley-Terry with a Davidson tie term —
  P(A>B) ∝ exp(sA), P(B>A) ∝ exp(sB), P(tie) ∝ ν·exp((sA+sB)/2),
  where s = w · metric_values / temperature;
- regularizer: L2 pull toward the current category weights (changes stay
  conservative);
- constraints: simplex (weights sum to 1) with a 0.60 per-weight cap,
  enforced by Euclidean projection after each gradient step;
- 5 restarts (current / uniform / 3 seeded Dirichlet), best final loss wins;
- a suggestion is surfaced only when vote agreement improves by >= 2%.

This IS the framework's training loop, and it runs on device: the loss,
gradients and projection are one jitted optax program.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import optax

from facet_tpu.config.category_filter import VALID_WEIGHT_COLUMNS
from facet_tpu.db.connection import get_connection
from facet_tpu.scoring.brain import METRIC_KEYS
from facet_tpu.scoring.vectorized import AggregateScorer

SCORE_COMPONENTS = list(METRIC_KEYS)
# The config's weight vocabulary is the 12 VALID_WEIGHT_COLUMNS; training is
# RESTRICTED to that simplex so the reported accuracy describes exactly the
# weight vector apply_optimized_weights can persist. The reference trains
# over all 16 SCORE_COMPONENTS and then its own config validation strips the
# extra four on the next load (weight_optimizer.py:1309-1332 +
# scoring_config.py:212-229), so its advertised accuracy gain is
# unreproducible by the saved config — a deliberate fix, not a parity break.
APPLICABLE_MASK = np.array(
    [1.0 if k in VALID_WEIGHT_COLUMNS else 0.0 for k in SCORE_COMPONENTS],
    np.float32)
WEIGHT_CAP = 0.60
TEMPERATURE = 1.0      # score scale -> logit scale
TIE_NU = 0.3
L2_PULL = 0.05
STEPS = 400
LEARNING_RATE = 0.05
MIN_IMPROVEMENT = 0.02


def project_capped_simplex(w, cap=WEIGHT_CAP, iters=50, mask=None):
    """Euclidean projection onto {w : sum w = 1, 0 <= w <= cap} via
    bisection on the shift parameter (jit-safe). With a mask, the simplex
    lives on the masked support (other coordinates project to 0)."""
    if mask is not None:
        w = jnp.where(mask > 0, w, -jnp.inf)
    lo = jnp.min(jnp.where(jnp.isfinite(w), w, jnp.inf)) - 1.0
    hi = jnp.max(jnp.where(jnp.isfinite(w), w, -jnp.inf))

    def body(_, bounds):
        lo, hi = bounds
        mid = (lo + hi) / 2.0
        total = jnp.sum(jnp.clip(w - mid, 0.0, cap))
        return jnp.where(total > 1.0, mid, lo), jnp.where(total > 1.0, hi, mid)

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    return jnp.clip(w - (lo + hi) / 2.0, 0.0, cap)


class WeightOptimizer:
    def __init__(self, db_path, config):
        self.db_path = db_path
        self.config = config
        self.scorer = AggregateScorer(config)

    # ---------------------------------------------------------------- data

    def load_training_data(self, category=None, user_id=None,
                           include_ties=True):
        """-> (values_a (N,16), values_b (N,16), outcomes (N,)) where outcome
        is 0 = a wins, 1 = b wins, 2 = tie."""
        where = ("c.winner IN ('a', 'b', 'tie')" if include_ties
                 else "c.winner IN ('a', 'b')")
        params = []
        if category:
            where += " AND c.category = ?"
            params.append(category)
        if user_id:
            where += " AND c.user_id = ?"
            params.append(user_id)
        with get_connection(self.db_path) as conn:
            pairs = conn.execute(
                f"SELECT photo_a_path, photo_b_path, winner FROM comparisons c"
                f" WHERE {where}", params).fetchall()
            paths = sorted({p for row in pairs for p in (row[0], row[1])})
            if not paths:
                return None
            marks = ",".join("?" for _ in paths)
            rows = {r["path"]: dict(r) for r in conn.execute(
                f"SELECT * FROM photos WHERE path IN ({marks})", paths)}
        usable = [(a, b, w) for a, b, w in pairs if a in rows and b in rows]
        if not usable:
            return None
        # orphaned votes (photo deleted / DB migrated with FKs off) are
        # filtered by `usable` — restrict the metric batch the same way or
        # rows[p] raises KeyError on the missing photo
        paths = [p for p in paths if p in rows]
        ordered = [rows[p] for p in paths]
        values = self.scorer.metric_values(ordered)
        index = {p: i for i, p in enumerate(paths)}
        va = np.stack([values[index[a]] for a, _, _ in usable])
        vb = np.stack([values[index[b]] for _, b, _ in usable])
        outcome = np.array([{"a": 0, "b": 1, "tie": 2}[w] for _, _, w in usable],
                           np.int32)
        return va, vb, outcome

    # ----------------------------------------------------- learned scores

    def compute_learned_scores(self, max_iterations=100, tolerance=1e-6):
        """Bradley-Terry per-photo strengths from the pairwise votes,
        persisted to the learned_scores table.

        Reference semantics (optimization/weight_optimizer.py:122-223):
        MM iterations s_i <- wins_i / sum_j 1/(s_i + s_j), renormalized to
        sum to n each round, converged at max |delta| < tolerance, then
        min-max scaled to 0-10. Vectorized (Jacobi) update — same fixed
        point as the reference's in-place sweep; parity is tested in
        tests/test_reference_parity.py.
        """
        with get_connection(self.db_path) as conn:
            pairs = conn.execute(
                "SELECT photo_a_path, photo_b_path, winner FROM comparisons"
                " WHERE winner IN ('a', 'b')").fetchall()
            if not pairs:
                return {"photos_updated": 0, "iterations": 0}
            paths = sorted({p for a, b, _ in pairs for p in (a, b)})
            index = {p: i for i, p in enumerate(paths)}
            n = len(paths)
            ia = np.array([index[a] for a, _, _ in pairs])
            ib = np.array([index[b] for _, b, _ in pairs])
            win_a = np.array([w == "a" for _, _, w in pairs])

            wins = np.zeros(n)
            np.add.at(wins, ia[win_a], 1)
            np.add.at(wins, ib[~win_a], 1)
            scores = np.ones(n)
            iterations = 0
            for iteration in range(max_iterations):
                old = scores.copy()
                inv = 1.0 / (scores[ia] + scores[ib])
                denom = np.zeros(n)
                np.add.at(denom, ia, inv)
                np.add.at(denom, ib, inv)
                nonzero = denom > 0
                scores = np.where(nonzero, np.divide(
                    wins, denom, out=np.ones(n), where=nonzero), scores)
                total = scores.sum()
                if total > 0:
                    scores = scores * n / total
                iterations = iteration + 1
                if np.abs(scores - old).max() < tolerance:
                    break

            lo, hi = scores.min(), scores.max()
            span = hi - lo if hi > lo else 1.0
            scaled = (scores - lo) / span * 10.0
            counts = np.zeros(n, np.int64)
            np.add.at(counts, ia, 1)
            np.add.at(counts, ib, 1)
            conn.executemany(
                "INSERT OR REPLACE INTO learned_scores (photo_path,"
                " learned_score, comparison_count, updated_at)"
                " VALUES (?, ?, ?, datetime('now'))",
                [(p, float(scaled[i]), int(counts[i]))
                 for p, i in index.items()])
            conn.commit()
        return {"photos_updated": n, "iterations": iterations}

    # ------------------------------------------------------------- training

    @staticmethod
    def _loss_fn(w, va, vb, outcome, w0, sample_weight=None):
        sa = va @ w / TEMPERATURE
        sb = vb @ w / TEMPERATURE
        # Davidson: logits for (a wins, b wins, tie)
        tie_logit = jnp.log(TIE_NU) + (sa + sb) / 2.0
        logits = jnp.stack([sa, sb, tie_logit], axis=1)
        log_probs = jax.nn.log_softmax(logits, axis=1)
        ll = jnp.take_along_axis(log_probs, outcome[:, None], 1)[:, 0]
        if sample_weight is None:
            nll = -jnp.mean(ll)
        else:
            # weighted NLL: CV fold masks (0/1) and bootstrap multinomial
            # counts are both just per-sample weights
            nll = -jnp.sum(sample_weight * ll) / jnp.maximum(
                jnp.sum(sample_weight), 1.0)
        return nll + L2_PULL * jnp.sum((w - w0) ** 2)

    def _train_many(self, starts, va, vb, outcome, w0, sample_weights):
        """Train every (start, sample_weight) replica in ONE vmapped device
        program: restarts, CV folds and bootstrap resamples all map to this
        (a bootstrap resample-with-replacement IS a multinomial count
        vector used as per-sample weights)."""
        optimizer = optax.adam(LEARNING_RATE)
        va = jnp.asarray(va)
        vb = jnp.asarray(vb)
        outcome = jnp.asarray(outcome)
        w0 = jnp.asarray(w0)

        def train_one(w_start, sw):
            state = optimizer.init(w_start)

            mask = jnp.asarray(APPLICABLE_MASK)

            def step(carry, _):
                w, state = carry
                loss, grads = jax.value_and_grad(self._loss_fn)(
                    w, va, vb, outcome, w0, sw)
                updates, state = optimizer.update(grads, state)
                w = project_capped_simplex(w + updates, mask=mask)
                return (w, state), loss

            (w, _), _ = jax.lax.scan(step, (w_start, state),
                                     jnp.arange(STEPS))
            return w, self._loss_fn(w, va, vb, outcome, w0, sw)

        return jax.jit(jax.vmap(train_one))(
            jnp.asarray(starts, jnp.float32),
            jnp.asarray(sample_weights, jnp.float32))

    def _train_once(self, w_init, va, vb, outcome, w0):
        ones = np.ones((1, len(outcome)), np.float32)
        ws, losses = self._train_many(np.asarray(w_init, np.float32)[None],
                                      va, vb, outcome, w0, ones)
        return ws[0], losses[0]

    @staticmethod
    def accuracy(w, va, vb, outcome):
        """Agreement on decisive votes under weights w."""
        sa = va @ w
        sb = vb @ w
        decisive = outcome != 2
        if not np.any(decisive):
            return 0.0
        predicted_b = (sb > sa)[decisive]
        actual_b = (outcome == 1)[decisive]
        return float(np.mean(predicted_b == actual_b))

    def current_weights(self, category):
        w = self.config.get_weights(category or "default")
        vec = np.array([w.get(k, 0.0) for k in SCORE_COMPONENTS],
                       np.float32) * APPLICABLE_MASK
        total = vec.sum()
        return (vec / total if total > 0
                else APPLICABLE_MASK / APPLICABLE_MASK.sum())

    def optimize(self, category=None, min_comparisons=20, seed=42,
                 include_ties=True, _data=None):
        """-> result dict or None when there is not enough data.

        _data: pre-loaded (va, vb, outcome) so optimize_cv does not pay
        the DB queries + device metric pass twice."""
        data = (_data if _data is not None
                else self.load_training_data(category,
                                             include_ties=include_ties))
        if data is None or len(data[2]) < min_comparisons:
            return None
        va, vb, outcome = data
        w0 = self.current_weights(category)

        rng = np.random.default_rng(seed)
        n_applicable = int(APPLICABLE_MASK.sum())
        starts = [w0, APPLICABLE_MASK / n_applicable]
        for _ in range(3):
            start = np.zeros_like(w0)
            start[APPLICABLE_MASK > 0] = rng.dirichlet(
                np.ones(n_applicable)).astype(np.float32)
            starts.append(start)

        # all 5 restarts train concurrently in one vmapped program
        ones = np.ones((len(starts), len(outcome)), np.float32)
        ws, losses = self._train_many(np.stack(starts), va, vb, outcome,
                                      w0, ones)
        best = int(np.argmin(np.asarray(losses)))
        best_w = np.asarray(ws[best])
        best_loss = float(losses[best])

        acc_before = self.accuracy(w0, va, vb, outcome)
        acc_after = self.accuracy(best_w, va, vb, outcome)
        improved = acc_after - acc_before >= MIN_IMPROVEMENT
        return {
            "category": category or "default",
            "comparisons_used": int(len(outcome)),
            "old_weights": {k: round(float(v), 4)
                            for k, v in zip(SCORE_COMPONENTS, w0)},
            "new_weights": {k: round(float(v), 4)
                            for k, v in zip(SCORE_COMPONENTS, best_w)},
            "accuracy_before": round(acc_before, 4),
            "accuracy_after": round(acc_after, 4),
            "loss": round(best_loss, 6),
            "suggest": bool(improved),
        }

    def optimize_cv(self, category=None, k_folds=5, min_comparisons=30,
                    seed=42, include_ties=True):
        """K-fold cross-validated optimization (reference:
        weight_optimizer.py:650+ optimize_weights_with_cv). Folds train
        concurrently in one vmapped program; held-out accuracy measures how
        well the learned weights generalize."""
        data = self.load_training_data(category, include_ties=include_ties)
        if data is None or len(data[2]) < max(min_comparisons, k_folds * 4):
            return None
        va, vb, outcome = data
        n = len(outcome)
        w0 = self.current_weights(category)

        rng = np.random.default_rng(seed)
        fold_id = np.zeros(n, np.int32)
        fold_id[rng.permutation(n)] = np.arange(n) % k_folds
        train_masks = np.stack([(fold_id != f).astype(np.float32)
                                for f in range(k_folds)])
        starts = np.tile(w0, (k_folds, 1))
        ws, _ = self._train_many(starts, va, vb, outcome, w0, train_masks)
        ws = np.asarray(ws)

        accs, fold_results = [], []
        for f in range(k_folds):
            hold = fold_id == f
            acc = self.accuracy(ws[f], va[hold], vb[hold], outcome[hold])
            accs.append(acc)
            fold_results.append({"fold": f, "holdout_accuracy": round(acc, 4),
                                 "holdout_size": int(hold.sum())})
        result = self.optimize(category, min_comparisons=min_comparisons,
                               seed=seed, include_ties=include_ties,
                               _data=data)
        if result is None:
            return None
        result.update({
            "method": "cross_validated",
            "cv_accuracy": round(float(np.mean(accs)), 4),
            "cv_std": round(float(np.std(accs)), 4),
            "fold_results": fold_results,
        })
        return result

    def weight_confidence(self, category=None, n_bootstrap=100,
                          min_comparisons=30, seed=42):
        """Bootstrap confidence intervals for the learned weights
        (reference: weight_optimizer.py:856+). All replicas train in one
        vmapped program: a resample-with-replacement is exactly a
        multinomial count vector used as per-sample weights."""
        data = self.load_training_data(category)
        if data is None or len(data[2]) < min_comparisons:
            have = 0 if data is None else len(data[2])
            return {"error": f"need at least {min_comparisons} comparisons"
                             f" (have {have})"}
        va, vb, outcome = data
        n = len(outcome)
        w0 = self.current_weights(category)
        rng = np.random.default_rng(seed)
        counts = rng.multinomial(n, np.full(n, 1.0 / n),
                                 size=n_bootstrap).astype(np.float32)
        starts = np.tile(w0, (n_bootstrap, 1))
        ws, _ = self._train_many(starts, va, vb, outcome, w0, counts)
        ws = np.asarray(ws)

        mean_w = ws.mean(axis=0)
        lower = np.percentile(ws, 2.5, axis=0)
        upper = np.percentile(ws, 97.5, axis=0)
        ci = upper - lower
        stable = [k for k, m, c in zip(SCORE_COMPONENTS, mean_w, ci)
                  if m > 0.02 and c < 0.15]
        rounded = lambda arr: {k: round(float(v), 4)
                               for k, v in zip(SCORE_COMPONENTS, arr)}
        return {
            "weights": rounded(mean_w),
            "lower_bounds": rounded(lower),
            "upper_bounds": rounded(upper),
            "confidence_intervals": rounded(ci),
            "stable_components": stable,
            "n_bootstrap": int(n_bootstrap),
            "comparisons_used": int(n),
        }

    # ---------------------------------------------------------------- apply

    def apply_optimized_weights(self, result, created_by="auto_optimization"):
        """Write learned weights into the config (snapshotting the old ones)."""
        category = result["category"]
        cat = self.config.get_category_config(category)
        if not cat:
            raise ValueError(f"unknown category '{category}'")
        old = dict(cat.get("weights", {}))
        with get_connection(self.db_path) as conn:
            conn.execute(
                "INSERT INTO weight_config_snapshots (category, weights,"
                " description, accuracy_before, accuracy_after,"
                " comparisons_used, created_by) VALUES (?, ?, ?, ?, ?, ?, ?)",
                (category, json.dumps(old), "before preference optimization",
                 result["accuracy_before"], result["accuracy_after"],
                 result["comparisons_used"], created_by))
            conn.execute(
                "INSERT INTO weight_optimization_runs (category,"
                " comparisons_used, old_weights, new_weights, mse_before,"
                " mse_after) VALUES (?, ?, ?, ?, ?, ?)",
                (category, result["comparisons_used"], json.dumps(old),
                 json.dumps(result["new_weights"]),
                 1 - result["accuracy_before"], 1 - result["accuracy_after"]))
        from facet_tpu.config.category_filter import VALID_WEIGHT_COLUMNS

        weights = cat.setdefault("weights", {})
        for key in VALID_WEIGHT_COLUMNS:
            weights[f"{key}_percent"] = round(
                result["new_weights"].get(key, 0.0) * 100)
        self.config.validate_weights(verbose=False)
        self.config.save_config()
        return True

    def restore_snapshot(self, snapshot_id):
        with get_connection(self.db_path) as conn:
            row = conn.execute(
                "SELECT category, weights FROM weight_config_snapshots"
                " WHERE id = ?", (snapshot_id,)).fetchone()
        if row is None:
            return False
        cat = self.config.get_category_config(row["category"])
        if not cat:
            return False
        cat["weights"] = json.loads(row["weights"])
        self.config.validate_weights(verbose=False)
        self.config.save_config()
        return True
