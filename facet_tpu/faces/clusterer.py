"""Face clustering: embeddings -> persons.

Behavior contract (reference faces/clusterer.py:39-628):
- load 512-d embeddings, L2-normalize;
- HDBSCAN (min_cluster_size from config) over the device-computed pairwise
  distance matrix (metric='precomputed');
- three modes: incremental (keep all persons), incremental-named (drop
  auto-clustered unnamed persons first), force (wipe everything);
- each new cluster matches an existing person when its centroid cosine
  similarity >= merge_threshold (default 0.6), else creates a person whose
  representative face is the member nearest the centroid (thumbnail reused);
- centroids and face counts refresh at the end;
- match_face_to_person: single-embedding assignment for the API.
"""

import numpy as np

from facet_tpu.db.connection import get_connection
from facet_tpu.faces.distance import normalize_embeddings, pairwise_euclidean


class FaceClusterer:
    def __init__(self, db_path, config):
        self.db_path = db_path
        self.config = config
        settings = config.get_face_clustering_settings()
        self.min_cluster_size = settings.get("min_faces_per_person", 2)
        self.min_samples = settings.get("min_samples", 2)
        self.merge_threshold = settings.get("merge_threshold", 0.6)

    # ------------------------------------------------------------------ data

    def load_faces(self, conn, only_unassigned=False):
        """-> (face_ids, photo_paths, embeddings (N, 512) normalized)."""
        where = "embedding IS NOT NULL"
        if only_unassigned:
            where += " AND person_id IS NULL"
        rows = conn.execute(
            f"SELECT id, photo_path, embedding FROM faces WHERE {where}").fetchall()
        ids, paths, embs = [], [], []
        for fid, path, blob in rows:
            vec = np.frombuffer(blob, np.float32)
            if vec.shape[0] != 512:
                continue
            ids.append(fid)
            paths.append(path)
            embs.append(vec)
        if not embs:
            return [], [], np.zeros((0, 512), np.float32)
        return ids, paths, normalize_embeddings(np.stack(embs))

    # ------------------------------------------------------------ clustering

    def cluster_embeddings(self, embeddings):
        """-> labels (N,), -1 = noise. HDBSCAN over device distances."""
        n = embeddings.shape[0]
        if n < self.min_cluster_size:
            return np.full(n, -1, np.int64)
        distances = pairwise_euclidean(embeddings).astype(np.float64)
        from sklearn.cluster import HDBSCAN

        def fit(single):
            return HDBSCAN(
                min_cluster_size=self.min_cluster_size,
                min_samples=self.min_samples,
                metric="precomputed",
                allow_single_cluster=single,
                copy=True,
            ).fit_predict(distances)

        labels = fit(False)
        if (labels == -1).all():
            # a library can legitimately contain one identity: the default
            # HDBSCAN tree labels a lone cluster as all-noise, so retry
            # permitting the root cluster
            labels = fit(True)
        return self._reject_loose_clusters(labels, distances)

    def _reject_loose_clusters(self, labels, distances):
        """Demote clusters that are not plausibly one identity to noise.

        Density-based clustering on the near-uniform distance matrix many
        distinct one-off identities produce can group unrelated people
        (most visibly via the allow_single_cluster retry, whose root
        cluster would merge the whole library into one person). Guard with
        the system's own identity bar: merge_threshold is the
        member-to-CENTROID cosine bar, and for a noise-sigma^2*d spread s,
        member-centroid cos ~ 1/sqrt(1+s) while member-member cos ~
        1/(1+s) — so the member-member equivalent of the bar is
        merge_threshold^2. Distances are over normalized embeddings:
        sim = 1 - d^2/2.
        """
        floor = self.merge_threshold ** 2
        for cluster in np.unique(labels):
            if cluster == -1:
                continue
            members = np.flatnonzero(labels == cluster)
            if len(members) < 2:
                continue
            d = distances[np.ix_(members, members)]
            iu = np.triu_indices(len(members), 1)
            mean_sim = float(np.mean(1.0 - d[iu] ** 2 / 2.0))
            if mean_sim < floor:
                labels[members] = -1
        return labels

    # --------------------------------------------------------------- persons

    def _existing_person_centroids(self, conn):
        persons = conn.execute(
            "SELECT id, centroid FROM persons WHERE centroid IS NOT NULL").fetchall()
        ids, cents = [], []
        for pid, blob in persons:
            vec = np.frombuffer(blob, np.float32)
            if vec.shape[0] == 512:
                ids.append(pid)
                cents.append(vec)
        if not ids:
            return [], np.zeros((0, 512), np.float32)
        return ids, normalize_embeddings(np.stack(cents))

    def cluster_faces(self, mode="incremental", verbose=True):
        """Run clustering. mode: incremental | incremental-named | force.

        Returns stats dict.
        """
        with get_connection(self.db_path) as conn:
            if mode == "force":
                conn.execute("UPDATE faces SET person_id = NULL")
                conn.execute("DELETE FROM persons")
            elif mode == "incremental-named":
                unnamed = [r[0] for r in conn.execute(
                    "SELECT id FROM persons WHERE (name IS NULL OR name = '')"
                    " AND auto_clustered = 1")]
                if unnamed:
                    marks = ",".join("?" for _ in unnamed)
                    conn.execute(
                        f"UPDATE faces SET person_id = NULL WHERE person_id IN ({marks})",
                        unnamed)
                    conn.execute(f"DELETE FROM persons WHERE id IN ({marks})", unnamed)

            face_ids, paths, embeddings = self.load_faces(conn, only_unassigned=True)
            if len(face_ids) == 0:
                self.refresh_person_stats(conn)
                return {"faces": 0, "clusters": 0, "new_persons": 0, "matched": 0}

            labels = self.cluster_embeddings(embeddings)
            cluster_ids = sorted(set(labels) - {-1})

            person_ids, person_centroids = self._existing_person_centroids(conn)
            new_persons = matched = 0

            for cluster in cluster_ids:
                members = np.nonzero(labels == cluster)[0]
                centroid = embeddings[members].mean(axis=0)
                centroid /= max(np.linalg.norm(centroid), 1e-12)

                target_person = None
                if len(person_ids):
                    sims = person_centroids @ centroid
                    best = int(np.argmax(sims))
                    if sims[best] >= self.merge_threshold:
                        target_person = person_ids[best]
                        matched += 1

                if target_person is None:
                    # representative face = member nearest the centroid
                    best_member = members[int(np.argmax(embeddings[members] @ centroid))]
                    rep_face_id = face_ids[best_member]
                    thumb = conn.execute(
                        "SELECT face_thumbnail FROM faces WHERE id = ?",
                        (rep_face_id,)).fetchone()[0]
                    cur = conn.execute(
                        "INSERT INTO persons (name, representative_face_id,"
                        " centroid, auto_clustered, face_thumbnail)"
                        " VALUES (NULL, ?, ?, 1, ?)",
                        (rep_face_id, centroid.astype(np.float32).tobytes(), thumb))
                    target_person = cur.lastrowid
                    new_persons += 1

                conn.executemany(
                    "UPDATE faces SET person_id = ? WHERE id = ?",
                    [(target_person, face_ids[m]) for m in members])

            self.refresh_person_stats(conn)
            stats = {"faces": len(face_ids), "clusters": len(cluster_ids),
                     "new_persons": new_persons, "matched": matched}
            if verbose:
                print(f"clustered {stats['faces']} faces into "
                      f"{stats['clusters']} clusters "
                      f"({stats['new_persons']} new persons, "
                      f"{stats['matched']} matched existing)")
            return stats

    @staticmethod
    def refresh_person_stats(conn):
        """Recompute centroid + face_count per person; drop empty persons."""
        persons = [r[0] for r in conn.execute("SELECT id FROM persons")]
        for pid in persons:
            rows = conn.execute(
                "SELECT embedding FROM faces WHERE person_id = ?", (pid,)).fetchall()
            embs = [np.frombuffer(r[0], np.float32) for r in rows
                    if r[0] and len(r[0]) == 512 * 4]
            if not embs:
                conn.execute("DELETE FROM persons WHERE id = ?", (pid,))
                continue
            centroid = normalize_embeddings(np.stack(embs)).mean(axis=0)
            centroid /= max(np.linalg.norm(centroid), 1e-12)
            conn.execute(
                "UPDATE persons SET centroid = ?, face_count = ? WHERE id = ?",
                (centroid.astype(np.float32).tobytes(), len(embs), pid))

    def match_face_to_person(self, embedding):
        """Single embedding -> (person_id, similarity) or (None, best_sim)."""
        vec = normalize_embeddings(embedding.reshape(1, -1))[0]
        with get_connection(self.db_path) as conn:
            ids, centroids = self._existing_person_centroids(conn)
        if not ids:
            return None, 0.0
        sims = centroids @ vec
        best = int(np.argmax(sims))
        if sims[best] >= self.merge_threshold:
            return ids[best], float(sims[best])
        return None, float(sims[best])


def run_face_clustering(db_path, config, force=False, named_only=False, verbose=True):
    mode = "force" if force else ("incremental-named" if named_only else "incremental")
    return FaceClusterer(db_path, config).cluster_faces(mode, verbose=verbose)


def extract_faces_from_existing(db_path, config, force=False, batch_size=16):
    """Detect + embed faces for photos that have no face rows yet, reading
    stored thumbnails (no original-file access needed)."""
    from facet_tpu.faces.processor import FaceProcessor

    return FaceProcessor(db_path, config).run_extract(force=force,
                                                      batch_size=batch_size)


def refill_face_thumbnails(db_path, config):
    from facet_tpu.faces.processor import FaceProcessor

    return FaceProcessor(db_path, config).run_refill()
