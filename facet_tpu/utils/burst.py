"""Burst detection: group visually-similar time-adjacent photos, flag the best.

Semantics per the reference (processing/scorer.py:1880-1986):
- photos sorted by date_taken; a photo joins the current burst if it is
  within the rapid window of any member (relaxed 2x phash threshold, and the
  two photos must share an identified person when both have any), or within
  the slow time window at the strict phash threshold;
- the highest-aggregate member of each burst gets is_burst_lead=1;
- photos without a phash are standalone (is_burst_lead=1).
"""

from datetime import datetime

from facet_tpu.db.connection import get_connection
from facet_tpu.ops.phash import hamming_distance


def _parse_date(date_str):
    if not date_str:
        return None
    for fmt in ("%Y:%m:%d %H:%M:%S", "%Y-%m-%d %H:%M:%S", "%Y-%m-%dT%H:%M:%S"):
        try:
            return datetime.strptime(str(date_str)[:19], fmt)
        except (ValueError, TypeError):
            continue
    return None


class IncrementalBurstProcessor:
    """Streaming burst grouping for scan-time use (reference: utils/burst.py:8).

    Photos arrive in capture order; each either joins the open burst (same
    similarity/time rules as process_bursts) or closes it, yielding the
    finished group so the scan can flag its lead without a full post-pass.
    """

    def __init__(self, config):
        settings = config.get_burst_detection_settings()
        self.max_distance = int(64 * (1 - settings.get(
            "similarity_threshold_percent", 88) / 100))
        self.window_seconds = settings.get("time_window_minutes", 60) * 60
        self.rapid_seconds = settings.get("rapid_burst_seconds", 5)
        self.open_burst = []

    def _joins(self, item):
        date, phash = item["date"], item["phash"]
        if date is None or not phash:
            return False
        for member in self.open_burst:
            if member["date"] is None or not member["phash"]:
                continue
            dt = abs((date - member["date"]).total_seconds())
            if dt <= self.rapid_seconds and hamming_distance(
                    phash, member["phash"]) <= self.max_distance * 2:
                return True
            if dt <= self.window_seconds and hamming_distance(
                    phash, member["phash"]) <= self.max_distance:
                return True
        return False

    def add(self, path, date_taken, phash, aggregate):
        """Feed one photo; returns a finished burst group or None."""
        item = {"path": path, "date": _parse_date(date_taken),
                "phash": phash, "aggregate": aggregate or 0.0}
        if not self.open_burst or self._joins(item):
            self.open_burst.append(item)
            return None
        finished = self.flush()
        self.open_burst = [item]
        return finished

    def flush(self):
        """Close the open burst -> {'members': [paths], 'lead': path} or None."""
        if not self.open_burst:
            return None
        lead = max(self.open_burst, key=lambda m: m["aggregate"])
        group = {"members": [m["path"] for m in self.open_burst],
                 "lead": lead["path"]}
        self.open_burst = []
        return group


def process_bursts(db_path, config):
    """Run burst grouping over the whole database. Returns burst-lead count."""
    settings = config.get_burst_detection_settings()
    similarity = settings.get("similarity_threshold_percent", 88)
    window_minutes = settings.get("time_window_minutes", 60)
    rapid_seconds = settings.get("rapid_burst_seconds", 5)
    max_distance = int(64 * (1 - similarity / 100))

    with get_connection(db_path) as conn:
        photos = [dict(r) for r in conn.execute(
            "SELECT path, date_taken, aggregate, phash FROM photos"
            " WHERE phash IS NOT NULL ORDER BY date_taken")]
        # parse each date ONCE (joins_burst compares every member pair —
        # per-comparison strptime dominated large-burst runtime) and sort
        # chronologically by the PARSED date: the reference's lexicographic
        # ORDER BY (scorer.py:1898) mis-orders mixed EXIF/ISO date formats
        # ('-' < ':'), splitting bursts; identical order for single-format
        # libraries, which the parity suite pins.
        for p in photos:
            p["_date"] = _parse_date(p["date_taken"])
        epoch = datetime(1970, 1, 1)
        photos.sort(key=lambda p: (p["_date"] or epoch,
                                   p["date_taken"] or "", p["path"]))

        # photo -> set of identified persons (for rapid-burst consistency)
        persons = {}
        if conn.execute("SELECT 1 FROM faces LIMIT 1").fetchone():
            for path, pid in conn.execute(
                "SELECT photo_path, person_id FROM faces WHERE person_id IS NOT NULL"
            ):
                persons.setdefault(path, set()).add(pid)

        conn.execute("UPDATE photos SET is_burst_lead = 0 WHERE phash IS NOT NULL")
        conn.execute("UPDATE photos SET is_burst_lead = 1 WHERE phash IS NULL")
        if not photos:
            return 0

        def shares_person(a, b):
            pa, pb = persons.get(a, set()), persons.get(b, set())
            if not pa or not pb:
                return True
            return bool(pa & pb)

        def joins_burst(photo, burst):
            pdate = photo["_date"]
            if pdate is None:
                return False
            for member in burst:
                mdate = member["_date"]
                if mdate is None:
                    continue
                dt = abs((pdate - mdate).total_seconds())
                if dt <= rapid_seconds and shares_person(photo["path"], member["path"]):
                    if hamming_distance(photo["phash"], member["phash"]) <= max_distance * 2:
                        return True
                if dt <= window_minutes * 60:
                    if hamming_distance(photo["phash"], member["phash"]) <= max_distance:
                        return True
            return False

        leads = 0

        def finalize(burst):
            nonlocal leads
            winner = max(burst, key=lambda r: r["aggregate"] or 0)
            conn.execute("UPDATE photos SET is_burst_lead = 1 WHERE path = ?",
                         (winner["path"],))
            leads += 1

        burst = [photos[0]]
        for photo in photos[1:]:
            if joins_burst(photo, burst):
                burst.append(photo)
            else:
                finalize(burst)
                burst = [photo]
        finalize(burst)
        return leads
