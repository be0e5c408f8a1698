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

from facet_tpu.db.connection import get_connection
from facet_tpu.scoring.brain import METRIC_KEYS
from facet_tpu.scoring.vectorized import AggregateScorer

SCORE_COMPONENTS = list(METRIC_KEYS)
WEIGHT_CAP = 0.60
TEMPERATURE = 1.0      # score scale -> logit scale
TIE_NU = 0.3
L2_PULL = 0.05
STEPS = 400
LEARNING_RATE = 0.05
MIN_IMPROVEMENT = 0.02


def project_capped_simplex(w, cap=WEIGHT_CAP, iters=50):
    """Euclidean projection onto {w : sum w = 1, 0 <= w <= cap} via
    bisection on the shift parameter (jit-safe)."""
    lo = jnp.min(w) - 1.0
    hi = jnp.max(w)

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

    def load_training_data(self, category=None, user_id=None):
        """-> (values_a (N,16), values_b (N,16), outcomes (N,)) where outcome
        is 0 = a wins, 1 = b wins, 2 = tie."""
        where = "c.winner IN ('a', 'b', 'tie')"
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
        ordered = [rows[p] for p in paths]
        values = self.scorer.metric_values(ordered)
        index = {p: i for i, p in enumerate(paths)}
        va = np.stack([values[index[a]] for a, _, _ in usable])
        vb = np.stack([values[index[b]] for _, b, _ in usable])
        outcome = np.array([{"a": 0, "b": 1, "tie": 2}[w] for _, _, w in usable],
                           np.int32)
        return va, vb, outcome

    # ------------------------------------------------------------- training

    @staticmethod
    def _loss_fn(w, va, vb, outcome, w0):
        sa = va @ w / TEMPERATURE
        sb = vb @ w / TEMPERATURE
        # Davidson: logits for (a wins, b wins, tie)
        tie_logit = jnp.log(TIE_NU) + (sa + sb) / 2.0
        logits = jnp.stack([sa, sb, tie_logit], axis=1)
        log_probs = jax.nn.log_softmax(logits, axis=1)
        nll = -jnp.mean(jnp.take_along_axis(log_probs, outcome[:, None], 1))
        return nll + L2_PULL * jnp.sum((w - w0) ** 2)

    def _train_once(self, w_init, va, vb, outcome, w0):
        optimizer = optax.adam(LEARNING_RATE)

        @jax.jit
        def run(w_start):
            state = optimizer.init(w_start)

            def step(carry, _):
                w, state = carry
                loss, grads = jax.value_and_grad(self._loss_fn)(
                    w, va, vb, outcome, w0)
                updates, state = optimizer.update(grads, state)
                w = project_capped_simplex(w + updates)
                return (w, state), loss

            (w, _), losses = jax.lax.scan(step, (w_start, state),
                                          jnp.arange(STEPS))
            final_loss = self._loss_fn(w, va, vb, outcome, w0)
            return w, final_loss

        return run(jnp.asarray(w_init, jnp.float32))

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
        vec = np.array([w.get(k, 0.0) for k in SCORE_COMPONENTS], np.float32)
        total = vec.sum()
        return vec / total if total > 0 else np.full(len(SCORE_COMPONENTS),
                                                     1 / len(SCORE_COMPONENTS),
                                                     np.float32)

    def optimize(self, category=None, min_comparisons=20, seed=42):
        """-> result dict or None when there is not enough data."""
        data = self.load_training_data(category)
        if data is None or len(data[2]) < min_comparisons:
            return None
        va, vb, outcome = data
        w0 = self.current_weights(category)

        rng = np.random.default_rng(seed)
        starts = [w0, np.full_like(w0, 1 / len(w0))]
        for _ in range(3):
            starts.append(rng.dirichlet(np.ones(len(w0))).astype(np.float32))

        va_j, vb_j = jnp.asarray(va), jnp.asarray(vb)
        out_j = jnp.asarray(outcome)
        w0_j = jnp.asarray(w0)
        best_w, best_loss = None, np.inf
        for start in starts:
            w, loss = self._train_once(start, va_j, vb_j, out_j, w0_j)
            if float(loss) < best_loss:
                best_loss = float(loss)
                best_w = np.asarray(w)

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
