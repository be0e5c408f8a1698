"""Pair selection strategies for comparison voting.

(reference: comparison/pair_selector.py:17-213) Four strategies, all
deduplicated against already-compared pairs:
- uncertainty: adjacent aggregate scores (hardest calls, most informative);
- boundary: random pairs inside the 5.5-8.5 quality band;
- active: photos appearing in the fewest comparisons so far;
- random.
"""

import random

from facet_tpu.db.connection import get_connection

STRATEGIES = ("uncertainty", "boundary", "active", "random")


class PairSelector:
    def __init__(self, db_path, strategy="uncertainty", category=None, seed=None):
        self.db_path = db_path
        self.strategy = strategy if strategy in STRATEGIES else "uncertainty"
        self.category = category
        self.rng = random.Random(seed)

    def _candidates(self, conn, limit=2000):
        # no thumbnail requirement: the reference selects on aggregate only
        # (comparison/pair_selector.py:70) — rows without thumbnails still
        # get compared (the viewer shows a placeholder)
        where = "aggregate IS NOT NULL"
        params = []
        if self.category:
            where += " AND category = ?"
            params.append(self.category)
        return conn.execute(
            f"SELECT path, aggregate FROM photos WHERE {where}"
            f" ORDER BY RANDOM() LIMIT ?", params + [limit]).fetchall()

    @staticmethod
    def _compared_set(conn):
        return {(r[0], r[1]) for r in conn.execute(
            "SELECT photo_a_path, photo_b_path FROM comparisons")}

    @staticmethod
    def _is_new(pair, compared):
        a, b = pair
        return (a, b) not in compared and (b, a) not in compared

    def next_pair(self):
        """-> (path_a, path_b) or None when nothing comparable remains."""
        with get_connection(self.db_path) as conn:
            rows = self._candidates(conn)
            if len(rows) < 2:
                return None
            compared = self._compared_set(conn)

            if self.strategy == "uncertainty":
                ordered = sorted(rows, key=lambda r: r[1])
                adjacent = list(zip(ordered, ordered[1:]))
                self.rng.shuffle(adjacent)
                adjacent.sort(key=lambda ab: abs(ab[0][1] - ab[1][1]))
                for a, b in adjacent:
                    if self._is_new((a[0], b[0]), compared):
                        return a[0], b[0]

            elif self.strategy == "boundary":
                band = [r for r in rows if 5.5 <= r[1] <= 8.5]
                self.rng.shuffle(band)
                for i in range(0, len(band) - 1, 2):
                    pair = (band[i][0], band[i + 1][0])
                    if self._is_new(pair, compared):
                        return pair

            elif self.strategy == "active":
                counts = {}
                for a, b in compared:
                    counts[a] = counts.get(a, 0) + 1
                    counts[b] = counts.get(b, 0) + 1
                ordered = sorted(rows, key=lambda r: counts.get(r[0], 0))
                for i in range(len(ordered) - 1):
                    pair = (ordered[i][0], ordered[i + 1][0])
                    if self._is_new(pair, compared):
                        return pair

            # random fallback for every strategy
            self.rng.shuffle(rows)
            for i in range(len(rows) - 1):
                pair = (rows[i][0], rows[i + 1][0])
                if self._is_new(pair, compared):
                    return pair
        return None
