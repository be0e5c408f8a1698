"""Persons + faces router: person management, ratings, user flags.

(reference: api/routers/persons.py + faces.py — rename/merge/delete/assign,
ratings/favorite/rejected, shared person pages)
"""

from facet_tpu.api.auth import check_share_token, make_share_token, require_role
from facet_tpu.web.framework import HTTPError


def register(app, ctx):
    @app.get("/api/persons")
    def list_persons(request):
        with ctx.connection() as conn:
            rows = conn.execute(
                "SELECT p.id, p.name, p.face_count, p.auto_clustered,"
                " p.representative_face_id,"
                " (SELECT COUNT(DISTINCT photo_path) FROM faces f"
                "   WHERE f.person_id = p.id) AS photo_count"
                " FROM persons p WHERE p.face_count > 0"
                " ORDER BY p.face_count DESC").fetchall()
        return {"persons": [dict(r) for r in rows]}

    @app.get("/api/persons/{person_id:int}")
    def person_detail(request, person_id):
        with ctx.connection() as conn:
            person = conn.execute("SELECT id, name, face_count FROM persons"
                                  " WHERE id = ?", (person_id,)).fetchone()
            if person is None:
                raise HTTPError(404, "person not found")
            photos = conn.execute(
                "SELECT DISTINCT f.photo_path, p.aggregate, p.filename"
                " FROM faces f JOIN photos p ON p.path = f.photo_path"
                " WHERE f.person_id = ? ORDER BY p.aggregate DESC",
                (person_id,)).fetchall()
        out = {"person": dict(person),
               "photos": [dict(r) for r in photos]}
        # the token mints a public URL — only edition/admin gets it (the
        # dedicated share-token endpoint enforces the same; handing it to
        # read-only viewers made that gate dead code)
        role = request.state.get("role")
        if role in ("admin", "superadmin") or not _auth_gated():
            out["share_token"] = make_share_token(person_id,
                                                  ctx.config.share_secret)
        return out

    @app.post("/api/persons/{person_id:int}/rename")
    def rename_person(request, person_id):
        require_role(request, "admin")
        name = (request.json().get("name") or "").strip()
        with ctx.connection() as conn:
            cur = conn.execute(
                "UPDATE persons SET name = ?, auto_clustered = 0 WHERE id = ?",
                (name or None, person_id))
            if cur.rowcount == 0:
                raise HTTPError(404, "person not found")
            conn.commit()
        return {"status": "ok", "id": person_id, "name": name}

    @app.post("/api/persons/merge")
    def merge(request):
        require_role(request, "admin")
        body = request.json()
        keep = body.get("keep_id")
        merge_ids = body.get("merge_ids") or []
        if not keep or not merge_ids:
            raise HTTPError(400, "keep_id and merge_ids required")
        from facet_tpu.faces.merge_analyzer import merge_persons

        try:
            merge_persons(ctx.config.db_path, keep, merge_ids)
        except ValueError as exc:
            raise HTTPError(404, str(exc))
        return {"status": "ok", "kept": keep, "merged": merge_ids}

    @app.post("/api/persons/merge/{source_id:int}/{target_id:int}")
    def merge_pair(request, source_id, target_id):
        """Path-pair form (reference api/routers/persons.py merge/{src}/{dst}):
        source merges INTO target."""
        require_role(request, "admin")
        with ctx.connection() as conn:
            if conn.execute("SELECT 1 FROM persons WHERE id = ?",
                            (source_id,)).fetchone() is None:
                raise HTTPError(404, "person not found")
        from facet_tpu.faces.merge_analyzer import merge_persons

        try:
            merge_persons(ctx.config.db_path, target_id, [source_id])
        except ValueError as exc:
            raise HTTPError(404, str(exc))
        return {"status": "ok", "kept": target_id, "merged": [source_id]}

    @app.post("/api/persons/merge_batch")
    def merge_batch(request):
        """Merge several persons into one target in a single transaction."""
        require_role(request, "admin")
        body = request.json()
        target = body.get("target_id")
        sources = body.get("source_ids") or []
        if not target or not sources:
            raise HTTPError(400, "target_id and source_ids required")
        if target in sources:
            raise HTTPError(400, "target cannot be in source list")
        marks = ",".join("?" for _ in sources)
        with ctx.connection() as conn:
            if conn.execute("SELECT 1 FROM persons WHERE id = ?",
                            (target,)).fetchone() is None:
                raise HTTPError(404, "target person not found")
            conn.execute(
                f"UPDATE faces SET person_id = ? WHERE person_id IN ({marks})",
                [target] + sources)
            conn.execute(f"DELETE FROM persons WHERE id IN ({marks})", sources)
            from facet_tpu.faces.clusterer import FaceClusterer

            FaceClusterer.refresh_person_stats(conn)
            # refresh_person_stats deletes persons left without valid
            # embeddings — a vanished target must not 500 + roll back
            row = conn.execute(
                "SELECT face_count FROM persons WHERE id = ?",
                (target,)).fetchone()
            new_count = row[0] if row else 0
            conn.commit()
        return {"status": "ok", "target_id": target,
                "merged_count": len(sources), "new_count": new_count}

    @app.post("/api/persons/delete_batch")
    def delete_batch(request):
        """Delete several persons, unassigning their faces."""
        require_role(request, "admin")
        ids = request.json().get("person_ids") or []
        if not ids:
            raise HTTPError(400, "person_ids required")
        marks = ",".join("?" for _ in ids)
        with ctx.connection() as conn:
            conn.execute(
                f"UPDATE faces SET person_id = NULL WHERE person_id IN ({marks})",
                ids)
            cur = conn.execute(f"DELETE FROM persons WHERE id IN ({marks})", ids)
            conn.commit()
        return {"status": "ok", "deleted_count": cur.rowcount}

    @app.get("/api/persons/{person_id:int}/faces")
    def person_faces(request, person_id):
        with ctx.connection() as conn:
            rows = conn.execute(
                "SELECT f.id, f.photo_path, f.face_index, f.confidence,"
                " f.bbox_x1, f.bbox_y1, f.bbox_x2, f.bbox_y2"
                " FROM faces f WHERE f.person_id = ?"
                " ORDER BY f.confidence DESC", (person_id,)).fetchall()
        return {"faces": [dict(r) for r in rows]}

    @app.post("/api/persons/{person_id:int}/avatar")
    def set_avatar(request, person_id):
        """Pin a face as the person's representative thumbnail."""
        require_role(request, "admin")
        face_id = request.json().get("face_id")
        if not face_id:
            raise HTTPError(400, "face_id required")
        with ctx.connection() as conn:
            face = conn.execute(
                "SELECT id, face_thumbnail FROM faces"
                " WHERE id = ? AND person_id = ?",
                (face_id, person_id)).fetchone()
            if face is None:
                raise HTTPError(404, "face not found for this person")
            conn.execute(
                "UPDATE persons SET representative_face_id = ?,"
                " face_thumbnail = ? WHERE id = ?",
                (face_id, face["face_thumbnail"], person_id))
            conn.commit()
        return {"status": "ok", "person_id": person_id, "face_id": face_id}

    @app.get("/api/persons/{person_id:int}/share-token")
    def share_token(request, person_id):
        require_role(request, "admin")
        with ctx.connection() as conn:
            if conn.execute("SELECT 1 FROM persons WHERE id = ?",
                            (person_id,)).fetchone() is None:
                raise HTTPError(404, "person not found")
        token = make_share_token(person_id, ctx.config.share_secret)
        return {"person_id": person_id, "token": token,
                "url": f"/api/shared/person/{person_id}?token={token}"}

    @app.post("/api/photos/assign_all_faces")
    def assign_all_faces(request):
        """Assign every unassigned face in a photo to one person."""
        require_role(request, "admin")
        body = request.json()
        path, person_id = body.get("path"), body.get("person_id")
        if not path or not person_id:
            raise HTTPError(400, "path and person_id required")
        with ctx.connection() as conn:
            if conn.execute("SELECT 1 FROM persons WHERE id = ?",
                            (person_id,)).fetchone() is None:
                raise HTTPError(404, "person not found")
            cur = conn.execute(
                "UPDATE faces SET person_id = ?"
                " WHERE photo_path = ? AND person_id IS NULL",
                (person_id, path))
            if cur.rowcount == 0:
                raise HTTPError(404, "no unassigned faces in photo")
            from facet_tpu.faces.clusterer import FaceClusterer

            FaceClusterer.refresh_person_stats(conn)
            conn.commit()
        return {"status": "ok", "assigned_count": cur.rowcount}

    @app.post("/api/photos/unassign_person")
    def unassign_person(request):
        """Detach all of one person's faces from a photo; drop the person
        entirely when that leaves them with zero faces."""
        require_role(request, "admin")
        body = request.json()
        path, person_id = body.get("path"), body.get("person_id")
        if not path or not person_id:
            raise HTTPError(400, "path and person_id required")
        with ctx.connection() as conn:
            cur = conn.execute(
                "UPDATE faces SET person_id = NULL"
                " WHERE photo_path = ? AND person_id = ?", (path, person_id))
            if cur.rowcount == 0:
                raise HTTPError(404, "no faces of this person in photo")
            remaining = conn.execute(
                "SELECT COUNT(*) FROM faces WHERE person_id = ?",
                (person_id,)).fetchone()[0]
            person_deleted = remaining == 0
            if person_deleted:
                conn.execute("DELETE FROM persons WHERE id = ?", (person_id,))
            else:
                from facet_tpu.faces.clusterer import FaceClusterer

                FaceClusterer.refresh_person_stats(conn)
            conn.commit()
        return {"status": "ok", "unassigned_count": cur.rowcount,
                "person_deleted": person_deleted}

    @app.delete("/api/persons/{person_id:int}")
    def delete_person(request, person_id):
        require_role(request, "admin")
        with ctx.connection() as conn:
            conn.execute("UPDATE faces SET person_id = NULL WHERE person_id = ?",
                         (person_id,))
            cur = conn.execute("DELETE FROM persons WHERE id = ?", (person_id,))
            conn.commit()
        if cur.rowcount == 0:
            raise HTTPError(404, "person not found")
        return {"status": "ok"}

    @app.post("/api/faces/{face_id:int}/assign")
    def assign_face(request, face_id):
        require_role(request, "admin")
        person_id = request.json().get("person_id")
        if person_id is None:
            # explicit unassign goes through /api/photos/unassign_person;
            # a missing id must not silently NULL the assignment
            raise HTTPError(400, "person_id required")
        with ctx.connection() as conn:
            if conn.execute("SELECT 1 FROM persons WHERE id = ?",
                            (person_id,)).fetchone() is None:
                raise HTTPError(404, "person not found")
            cur = conn.execute("UPDATE faces SET person_id = ? WHERE id = ?",
                               (person_id, face_id))
            if cur.rowcount == 0:
                raise HTTPError(404, "face not found")
            from facet_tpu.faces.clusterer import FaceClusterer

            FaceClusterer.refresh_person_stats(conn)
            conn.commit()
        return {"status": "ok"}

    @app.get("/api/photo/faces")
    def faces_for_photo_query(request):
        """Query-param form (reference api/routers/faces.py
        GET /api/photo/faces?path=) for migrating clients."""
        path = request.param("path")
        if not path:
            raise HTTPError(400, "path required")
        return faces_for_photo(request, path)

    @app.get("/api/faces/{path:path}")
    def faces_for_photo(request, path):
        full = path if path.startswith("/") else "/" + path
        with ctx.connection() as conn:
            rows = conn.execute(
                "SELECT f.id, f.face_index, f.bbox_x1, f.bbox_y1, f.bbox_x2,"
                " f.bbox_y2, f.confidence, f.person_id, p.name AS person_name"
                " FROM faces f LEFT JOIN persons p ON p.id = f.person_id"
                " WHERE f.photo_path = ? ORDER BY f.face_index", (full,)).fetchall()
        return {"faces": [dict(r) for r in rows]}

    @app.get("/api/merge_suggestions")
    def merge_suggestions(request):
        threshold = request.param("threshold", 0.55, float)
        from facet_tpu.faces.merge_analyzer import find_merge_suggestions

        return {"suggestions": find_merge_suggestions(ctx.config.db_path, threshold)}

    @app.get("/api/shared/person/{person_id:int}")
    def shared_person(request, person_id):
        token = request.param("token")
        if not check_share_token(person_id, token, ctx.config.share_secret):
            raise HTTPError(403, "invalid share token")
        return person_detail(request, person_id)

    # ------------------------------------------------------- user ratings

    def _auth_gated():
        cfg = ctx.config
        return bool(cfg.multi_user or cfg.viewer_password
                    or cfg.edition_password)

    def _require_edit_rights(request):
        """Reference require_auth semantics (api/auth.py:141-155):
        multi-user -> any logged-in user may write their own preferences;
        single-user -> edition (admin) required — a read-only viewer was
        mutating the GLOBAL photos columns (round-4 review finding);
        open instance (no gate configured) -> allowed."""
        if ctx.config.multi_user:
            if not request.state.get("user"):
                raise HTTPError(401, "authentication required")
        elif _auth_gated():
            require_role(request, "admin")

    def _set_preference(request, column, value):
        _require_edit_rights(request)
        path = request.json().get("path")
        if not path:
            raise HTTPError(400, "path required")
        user = request.state.get("user")
        with ctx.connection() as conn:
            if ctx.config.multi_user and user not in (None, "anonymous",
                                                      "viewer", "editor"):
                conn.execute(
                    "INSERT INTO user_preferences (user_id, photo_path)"
                    " VALUES (?, ?) ON CONFLICT(user_id, photo_path) DO NOTHING",
                    (user, path))
                conn.execute(
                    f"UPDATE user_preferences SET {column} = ?"
                    " WHERE user_id = ? AND photo_path = ?", (value, user, path))
            else:
                cur = conn.execute(
                    f"UPDATE photos SET {column} = ? WHERE path = ?", (value, path))
                if cur.rowcount == 0:
                    raise HTTPError(404, "photo not found")
            conn.commit()
        return {"status": "ok", "path": path, column: value}

    @app.post("/api/photos/rating")
    def set_rating(request):
        rating = request.json().get("rating", 0)
        if not isinstance(rating, int) or not 0 <= rating <= 5:
            raise HTTPError(400, "rating must be 0-5")
        return _set_preference(request, "star_rating", rating)

    @app.post("/api/photos/favorite")
    def set_favorite(request):
        return _set_preference(request, "is_favorite",
                               1 if request.json().get("favorite") else 0)

    @app.post("/api/photos/rejected")
    def set_rejected(request):
        return _set_preference(request, "is_rejected",
                               1 if request.json().get("rejected") else 0)
