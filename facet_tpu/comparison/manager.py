"""Comparison vote management: submit/edit/delete/history/coverage/stats.

(reference: comparison/comparison_manager.py:19-279)
"""

from facet_tpu.db.connection import get_connection

WINNERS = ("a", "b", "tie", "skip")


class ComparisonManager:
    def __init__(self, db_path):
        self.db_path = db_path

    def submit(self, photo_a, photo_b, winner, category=None, session_id=None,
               user_id=None):
        if winner not in WINNERS:
            raise ValueError(f"winner must be one of {WINNERS}")
        import sqlite3

        with get_connection(self.db_path) as conn:
            try:
                # a re-vote replaces the WHOLE row like the reference's
                # INSERT OR REPLACE — keeping the first vote's category and
                # timestamp misattributed the vote to the wrong category's
                # optimizer and buried the re-vote in history
                conn.execute(
                    "INSERT INTO comparisons (photo_a_path, photo_b_path,"
                    " winner, category, session_id, user_id)"
                    " VALUES (?, ?, ?, ?, ?, ?)"
                    " ON CONFLICT(photo_a_path, photo_b_path) DO UPDATE SET"
                    " winner = excluded.winner,"
                    " category = excluded.category,"
                    " session_id = excluded.session_id,"
                    " user_id = excluded.user_id,"
                    " timestamp = datetime('now')",
                    (photo_a, photo_b, winner, category, session_id, user_id))
            except sqlite3.IntegrityError:
                # FK violation: the photo was deleted between pair
                # selection and the vote — a client error, not a 500
                raise ValueError("unknown photo in comparison pair")
            return conn.execute(
                "SELECT id FROM comparisons WHERE photo_a_path = ?"
                " AND photo_b_path = ?", (photo_a, photo_b)).fetchone()[0]

    def edit(self, comparison_id, winner):
        if winner not in WINNERS:
            raise ValueError(f"winner must be one of {WINNERS}")
        with get_connection(self.db_path) as conn:
            cur = conn.execute("UPDATE comparisons SET winner = ? WHERE id = ?",
                               (winner, comparison_id))
            return cur.rowcount > 0

    def delete(self, comparison_id):
        with get_connection(self.db_path) as conn:
            cur = conn.execute("DELETE FROM comparisons WHERE id = ?",
                               (comparison_id,))
            return cur.rowcount > 0

    def history(self, limit=50, offset=0, user_id=None):
        where, params = "1=1", []
        if user_id:
            where = "user_id = ?"
            params = [user_id]
        with get_connection(self.db_path) as conn:
            rows = conn.execute(
                f"SELECT id, photo_a_path, photo_b_path, winner, category,"
                f" timestamp FROM comparisons WHERE {where}"
                f" ORDER BY timestamp DESC LIMIT ? OFFSET ?",
                params + [limit, offset]).fetchall()
            return [dict(r) for r in rows]

    def count(self, category=None):
        with get_connection(self.db_path) as conn:
            if category:
                return conn.execute(
                    "SELECT COUNT(*) FROM comparisons WHERE category = ?"
                    " AND winner IN ('a','b','tie')", (category,)).fetchone()[0]
            return conn.execute(
                "SELECT COUNT(*) FROM comparisons"
                " WHERE winner IN ('a','b','tie')").fetchone()[0]

    def coverage(self):
        """Fraction of scored photos touched by at least one comparison."""
        with get_connection(self.db_path) as conn:
            total = conn.execute(
                "SELECT COUNT(*) FROM photos WHERE aggregate IS NOT NULL"
            ).fetchone()[0]
            touched = conn.execute(
                "SELECT COUNT(DISTINCT path) FROM ("
                " SELECT photo_a_path AS path FROM comparisons"
                " UNION SELECT photo_b_path FROM comparisons)").fetchone()[0]
        return {
            "photos": total,
            "compared_photos": touched,
            "coverage": touched / total if total else 0.0,
            "comparisons": self.count(),
        }

    def statistics(self):
        with get_connection(self.db_path) as conn:
            by_winner = dict(conn.execute(
                "SELECT winner, COUNT(*) FROM comparisons GROUP BY winner"))
            by_category = dict(conn.execute(
                "SELECT IFNULL(category, 'all'), COUNT(*) FROM comparisons"
                " GROUP BY category"))
            sessions = conn.execute(
                "SELECT COUNT(DISTINCT session_id) FROM comparisons"
                " WHERE session_id IS NOT NULL").fetchone()[0]
        return {"by_winner": by_winner, "by_category": by_category,
                "sessions": sessions, **self.coverage()}

    def agreement_accuracy(self):
        """How often the current aggregate ordering agrees with the votes."""
        with get_connection(self.db_path) as conn:
            rows = conn.execute(
                "SELECT c.winner, pa.aggregate, pb.aggregate FROM comparisons c"
                " JOIN photos pa ON pa.path = c.photo_a_path"
                " JOIN photos pb ON pb.path = c.photo_b_path"
                " WHERE c.winner IN ('a', 'b')"
                " AND pa.aggregate IS NOT NULL AND pb.aggregate IS NOT NULL"
            ).fetchall()
        if not rows:
            return None
        correct = sum(1 for winner, sa, sb in rows
                      if (sa > sb) == (winner == "a"))
        return correct / len(rows)
