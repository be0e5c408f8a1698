"""The 10 database consistency checks (reference: validation/
database_validator.py:14-67 + validation_result.py):

 1. score ranges: every 0-10 score column within bounds;
 2. face-metric consistency: face metrics present iff face_count > 0;
 3. BLOB corruption: numeric columns holding bytes;
 4. histogram integrity: histogram_data exactly 256 float32 (1024 bytes);
 5. embedding dims: clip 768-f32, face 512-f32, landmarks 106x2-f32;
 6. boolean domains: flag columns in {0, 1, NULL};
 7. referential integrity: faces -> photos, faces.person_id -> persons;
 8. statistical outliers: aggregates beyond 4 sigma of the library mean;
 9. monochrome consistency: is_monochrome agrees with mean_saturation;
10. composition pattern vocabulary.

Fixable issues carry SQL fixes; run with auto_fix=True to apply them.
"""

from dataclasses import dataclass, field

from facet_tpu.db.connection import get_connection

SCORE_COLUMNS = ["aggregate", "aesthetic", "face_quality", "eye_sharpness",
                 "face_sharpness", "tech_sharpness", "color_score",
                 "exposure_score", "comp_score", "contrast_score",
                 "quality_score", "topiq_score"]

BOOLEAN_COLUMNS = ["is_blink", "is_burst_lead", "is_monochrome",
                   "is_silhouette", "is_group_portrait", "is_duplicate_lead",
                   "is_favorite", "is_rejected"]

NUMERIC_BLOB_CHECK = ["aggregate", "aesthetic", "tech_sharpness", "iso",
                      "f_stop", "face_count", "mean_luminance", "noise_sigma"]

PATTERN_VOCABULARY = {
    # network pooling patterns + config display vocabulary
    "global", "horizontal", "vertical", "triangular", "surround", "quarter",
    "cross", "rule_of_thirds", "none", "center", "golden_ratio", "triangle",
    "diagonal", "symmetric", "curved", "radial", "vanishing_point", "pattern",
    "fill_frame",
}


@dataclass
class CheckResult:
    name: str
    passed: bool
    issues: int = 0
    detail: str = ""
    fix_sql: list = field(default_factory=list)

    def to_dict(self):
        return {"name": self.name, "passed": self.passed,
                "issues": self.issues, "detail": self.detail,
                "fixable": bool(self.fix_sql)}


class DatabaseValidator:
    def __init__(self, db_path):
        self.db_path = db_path

    # ------------------------------------------------------------- checks

    def check_score_ranges(self, conn):
        issues, fixes = 0, []
        for col in SCORE_COLUMNS:
            n = conn.execute(
                f"SELECT COUNT(*) FROM photos WHERE {col} IS NOT NULL"
                f" AND ({col} < 0 OR {col} > 10)").fetchone()[0]
            if n:
                issues += n
                fixes.append(
                    f"UPDATE photos SET {col} = MAX(0, MIN(10, {col}))"
                    f" WHERE {col} < 0 OR {col} > 10")
        return CheckResult("score_ranges", issues == 0, issues,
                           f"{issues} out-of-range score values", fixes)

    def check_face_consistency(self, conn):
        orphan_metrics = conn.execute(
            "SELECT COUNT(*) FROM photos WHERE (face_count = 0 OR face_count"
            " IS NULL) AND (face_quality IS NOT NULL AND face_quality > 0)"
        ).fetchone()[0]
        # reference semantics: flag face photos only when EVERY face metric
        # is zero (NULL metrics are not flagged)
        missing_metrics = conn.execute(
            "SELECT COUNT(*) FROM photos WHERE face_count > 0"
            " AND face_quality = 0 AND eye_sharpness = 0"
            " AND face_sharpness = 0").fetchone()[0]
        # reference check set also flags blinks on faceless photos and
        # stored face_count disagreeing with the faces table
        # (validation/database_validator.py:45-67)
        blink_no_face = conn.execute(
            "SELECT COUNT(*) FROM photos WHERE is_blink = 1"
            " AND (face_count = 0 OR face_count IS NULL)").fetchone()[0]
        count_mismatch = conn.execute(
            "SELECT COUNT(*) FROM photos p WHERE p.face_count !="
            " (SELECT COUNT(*) FROM faces f WHERE f.photo_path = p.path)"
        ).fetchone()[0]
        issues = orphan_metrics + missing_metrics + blink_no_face \
            + count_mismatch
        fixes = []
        if orphan_metrics:
            fixes.append("UPDATE photos SET face_quality = NULL,"
                         " eye_sharpness = NULL, face_sharpness = NULL"
                         " WHERE (face_count = 0 OR face_count IS NULL)"
                         " AND face_quality IS NOT NULL")
        if blink_no_face:
            fixes.append("UPDATE photos SET is_blink = 0 WHERE is_blink = 1"
                         " AND (face_count = 0 OR face_count IS NULL)")
        return CheckResult(
            "face_consistency", issues == 0, issues,
            f"{orphan_metrics} faceless photos with face metrics,"
            f" {missing_metrics} face photos without metrics,"
            f" {blink_no_face} blinks without faces,"
            f" {count_mismatch} face_count/faces-table mismatches", fixes)

    def check_blob_corruption(self, conn):
        issues = 0
        for col in NUMERIC_BLOB_CHECK:
            issues += conn.execute(
                f"SELECT COUNT(*) FROM photos WHERE typeof({col}) = 'blob'"
            ).fetchone()[0]
        return CheckResult("blob_corruption", issues == 0, issues,
                           f"{issues} numeric cells holding BLOBs",
                           [f"UPDATE photos SET {col} = NULL"
                            f" WHERE typeof({col}) = 'blob'"
                            for col in NUMERIC_BLOB_CHECK] if issues else [])

    def check_histogram_integrity(self, conn):
        bad = conn.execute(
            "SELECT COUNT(*) FROM photos WHERE histogram_data IS NOT NULL"
            " AND LENGTH(histogram_data) != 1024").fetchone()[0]
        return CheckResult("histogram_integrity", bad == 0, bad,
                           f"{bad} histogram blobs with wrong byte length",
                           ["UPDATE photos SET histogram_data = NULL WHERE"
                            " histogram_data IS NOT NULL AND"
                            " LENGTH(histogram_data) != 1024"] if bad else [])

    def check_embedding_dims(self, conn):
        bad_clip = conn.execute(
            "SELECT COUNT(*) FROM photos WHERE clip_embedding IS NOT NULL"
            " AND LENGTH(clip_embedding) != 3072").fetchone()[0]
        bad_face = conn.execute(
            "SELECT COUNT(*) FROM faces WHERE embedding IS NOT NULL"
            " AND LENGTH(embedding) != 2048").fetchone()[0]
        bad_lmk = conn.execute(
            "SELECT COUNT(*) FROM faces WHERE landmark_2d_106 IS NOT NULL"
            " AND LENGTH(landmark_2d_106) != 848").fetchone()[0]
        issues = bad_clip + bad_face + bad_lmk
        return CheckResult(
            "embedding_dims", issues == 0, issues,
            f"{bad_clip} clip / {bad_face} face / {bad_lmk} landmark blobs"
            " with wrong sizes", [])

    def check_boolean_domains(self, conn):
        issues, fixes = 0, []
        for col in BOOLEAN_COLUMNS:
            n = conn.execute(
                f"SELECT COUNT(*) FROM photos WHERE {col} IS NOT NULL"
                f" AND {col} NOT IN (0, 1)").fetchone()[0]
            if n:
                issues += n
                fixes.append(f"UPDATE photos SET {col} = CASE WHEN {col} THEN 1"
                             f" ELSE 0 END WHERE {col} NOT IN (0, 1)")
        return CheckResult("boolean_domains", issues == 0, issues,
                           f"{issues} non-boolean flag values", fixes)

    def check_referential_integrity(self, conn):
        orphan_faces = conn.execute(
            "SELECT COUNT(*) FROM faces f LEFT JOIN photos p"
            " ON p.path = f.photo_path WHERE p.path IS NULL").fetchone()[0]
        orphan_person_refs = conn.execute(
            "SELECT COUNT(*) FROM faces f WHERE f.person_id IS NOT NULL"
            " AND f.person_id NOT IN (SELECT id FROM persons)").fetchone()[0]
        issues = orphan_faces + orphan_person_refs
        fixes = []
        if orphan_faces:
            fixes.append("DELETE FROM faces WHERE photo_path NOT IN"
                         " (SELECT path FROM photos)")
        if orphan_person_refs:
            fixes.append("UPDATE faces SET person_id = NULL WHERE person_id"
                         " IS NOT NULL AND person_id NOT IN"
                         " (SELECT id FROM persons)")
        return CheckResult("referential_integrity", issues == 0, issues,
                           f"{orphan_faces} orphan faces,"
                           f" {orphan_person_refs} dangling person refs", fixes)

    def check_outliers(self, conn):
        row = conn.execute(
            "SELECT AVG(aggregate), COUNT(*) FROM photos"
            " WHERE aggregate IS NOT NULL").fetchone()
        if not row[1] or row[1] < 10:
            return CheckResult("statistical_outliers", True, 0,
                               "not enough data")
        mean = row[0]
        var = conn.execute(
            "SELECT AVG((aggregate - ?) * (aggregate - ?)) FROM photos"
            " WHERE aggregate IS NOT NULL", (mean, mean)).fetchone()[0]
        std = var ** 0.5 if var else 0.0
        if std == 0:
            return CheckResult("statistical_outliers", True, 0, "zero variance")
        n = conn.execute(
            "SELECT COUNT(*) FROM photos WHERE aggregate IS NOT NULL"
            " AND ABS(aggregate - ?) > 4 * ?", (mean, std)).fetchone()[0]
        return CheckResult("statistical_outliers", n == 0, n,
                           f"{n} aggregates beyond 4 sigma"
                           f" (mean {mean:.2f}, std {std:.2f})")

    def check_monochrome_consistency(self, conn):
        # reference threshold: saturation >= 0.1 contradicts the flag
        # (monochrome detection threshold, technical.py:219-242)
        n = conn.execute(
            "SELECT COUNT(*) FROM photos WHERE is_monochrome = 1"
            " AND mean_saturation IS NOT NULL AND mean_saturation >= 0.1"
        ).fetchone()[0]
        return CheckResult("monochrome_consistency", n == 0, n,
                           f"{n} monochrome-flagged photos with high saturation",
                           ["UPDATE photos SET is_monochrome = 0 WHERE"
                            " is_monochrome = 1 AND mean_saturation >= 0.1"]
                           if n else [])

    def check_pattern_vocabulary(self, conn):
        rows = conn.execute(
            "SELECT DISTINCT composition_pattern FROM photos"
            " WHERE composition_pattern IS NOT NULL").fetchall()
        unknown = [r[0] for r in rows if r[0] not in PATTERN_VOCABULARY]
        return CheckResult("pattern_vocabulary", not unknown, len(unknown),
                           f"unknown patterns: {unknown}" if unknown else "",
                           [])

    # ---------------------------------------------------------------- runner

    CHECKS = [
        "check_score_ranges", "check_face_consistency", "check_blob_corruption",
        "check_histogram_integrity", "check_embedding_dims",
        "check_boolean_domains", "check_referential_integrity",
        "check_outliers", "check_monochrome_consistency",
        "check_pattern_vocabulary",
    ]

    def run_all_checks(self, auto_fix=False, verbose=False):
        results = []
        with get_connection(self.db_path) as conn:
            for name in self.CHECKS:
                result = getattr(self, name)(conn)
                if auto_fix and not result.passed and result.fix_sql:
                    for sql in result.fix_sql:
                        conn.execute(sql)
                    result = getattr(self, name)(conn)  # re-check after fix
                    result.detail += " (auto-fixed)"
                results.append(result)
                if verbose:
                    flag = "OK " if result.passed else "FAIL"
                    print(f"  [{flag}] {result.name}: {result.detail or 'clean'}")
        return results
