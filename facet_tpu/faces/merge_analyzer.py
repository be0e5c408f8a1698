"""Person-merge suggestions via centroid similarity + Union-Find.

(reference: faces/merge_analyzer.py:29-120) Pairwise person-centroid cosine
similarities come from one device matmul; pairs above the threshold group
transitively, each group reported with min/max/avg similarity.
"""

import numpy as np

from facet_tpu.db.connection import get_connection
from facet_tpu.faces.distance import normalize_embeddings, pairwise_cosine
from facet_tpu.utils.duplicate import UnionFind


def find_merge_suggestions(db_path, threshold=0.55):
    """-> list of {person_ids, names, min/max/avg_similarity} groups."""
    with get_connection(db_path) as conn:
        persons = conn.execute(
            "SELECT id, name, centroid FROM persons WHERE centroid IS NOT NULL"
        ).fetchall()
    ids, names, cents = [], [], []
    for pid, name, blob in persons:
        vec = np.frombuffer(blob, np.float32)
        if vec.shape[0] == 512:
            ids.append(pid)
            names.append(name)
            cents.append(vec)
    if len(ids) < 2:
        return []

    sims = pairwise_cosine(normalize_embeddings(np.stack(cents)))
    n = len(ids)
    uf = UnionFind(n)
    pair_sims = {}
    for i in range(n):
        for j in range(i + 1, n):
            if sims[i, j] >= threshold:
                uf.union(i, j)
                pair_sims[(i, j)] = float(sims[i, j])

    groups = {}
    for i in range(n):
        groups.setdefault(uf.find(i), []).append(i)

    suggestions = []
    for members in groups.values():
        if len(members) < 2:
            continue
        member_sims = [pair_sims[(a, b)] for a in members for b in members
                       if (a, b) in pair_sims]
        suggestions.append({
            "person_ids": [ids[m] for m in members],
            "names": [names[m] for m in members],
            "min_similarity": min(member_sims),
            "max_similarity": max(member_sims),
            "avg_similarity": sum(member_sims) / len(member_sims),
        })
    suggestions.sort(key=lambda s: -s["avg_similarity"])
    return suggestions


def merge_persons(db_path, keep_id, merge_ids):
    """Reassign faces from merge_ids to keep_id, delete merged persons.

    Raises ValueError when keep_id does not exist — reassigning faces to
    a nonexistent person would orphan them permanently."""
    from facet_tpu.faces.clusterer import FaceClusterer

    with get_connection(db_path) as conn:
        if conn.execute("SELECT 1 FROM persons WHERE id = ?",
                        (keep_id,)).fetchone() is None:
            raise ValueError(f"person {keep_id} not found")
        for mid in merge_ids:
            if mid == keep_id:
                continue
            conn.execute("UPDATE faces SET person_id = ? WHERE person_id = ?",
                         (keep_id, mid))
            conn.execute("DELETE FROM persons WHERE id = ?", (mid,))
        FaceClusterer.refresh_person_stats(conn)
