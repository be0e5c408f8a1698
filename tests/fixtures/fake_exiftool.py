#!/usr/bin/env python3
"""A stand-in `exiftool` speaking the real tool's two protocols.

Implements exactly what facet_tpu.utils.exif drives (reference:
exiftool/exiftool_batch.py:16-163):

- one-shot:   exiftool -json -n <tags...> <paths...>   -> JSON array
- stay-open:  exiftool -stay_open True -@ -            -> reads args one
  per line from stdin until `-execute<N>`, answers with the JSON output
  followed by `{ready<N>}\n`; `-stay_open` + `False` exits.

Per-file metadata comes from a `<path>.meta.json` sidecar when present,
else deterministic defaults. Fault injection via environment:

- FAKE_EXIFTOOL_STATE=<file>: a counter file shared across invocations
  (and across requests inside one stay-open process).
- FAKE_EXIFTOOL_HANG_UNTIL=<n>: requests/invocations whose counter value
  is < n sleep for 3600 s instead of answering (the counter still
  increments first, so a later attempt succeeds).
"""

import json
import os
import sys
import time

DEFAULTS = {
    "Model": "FakeCam X1",
    "LensModel": "FakeLens 35mm",
    "ISO": 200,
    "Aperture": 2.8,
    "ExposureTime": 0.004,
    "FocalLength": 35.0,
    "FocalLengthIn35mmFormat": 52,
    "DateTimeOriginal": "2024:06:01 12:00:00",
    "ImageWidth": 640,
    "ImageHeight": 480,
}


def _bump_counter():
    state = os.environ.get("FAKE_EXIFTOOL_STATE")
    if not state:
        return 0
    try:
        n = int(open(state).read().strip() or "0")
    except (OSError, ValueError):
        n = 0
    with open(state, "w") as fh:
        fh.write(str(n + 1))
    return n


def _maybe_hang():
    n = _bump_counter()
    hang_until = int(os.environ.get("FAKE_EXIFTOOL_HANG_UNTIL", "0"))
    if n < hang_until:
        time.sleep(3600)


def _records(paths):
    out = []
    for path in paths:
        rec = {"SourceFile": path}
        rec.update(DEFAULTS)
        sidecar = path + ".meta.json"
        if os.path.exists(sidecar):
            with open(sidecar) as fh:
                rec.update(json.load(fh))
        out.append(rec)
    return out


def _run_once(args):
    _maybe_hang()
    paths = [a for a in args if not a.startswith("-")]
    sys.stdout.write(json.dumps(_records(paths)) + "\n")
    sys.stdout.flush()


def _run_stay_open():
    pending = []
    for line in sys.stdin:
        arg = line.rstrip("\n")
        if arg.startswith("-execute"):
            seq = arg[len("-execute"):]
            if pending[:1] == ["-stay_open"] and "False" in pending:
                return
            _maybe_hang()
            paths = [a for a in pending if not a.startswith("-")]
            sys.stdout.write(json.dumps(_records(paths)) + "\n")
            sys.stdout.write("{ready%s}\n" % seq)
            sys.stdout.flush()
            pending = []
        elif arg == "-stay_open":
            pending.append(arg)
        elif arg == "False" and pending[:1] == ["-stay_open"]:
            return
        else:
            pending.append(arg)


def main():
    args = sys.argv[1:]
    if args[:2] == ["-stay_open", "True"]:
        _run_stay_open()
    else:
        _run_once(args)
    return 0


if __name__ == "__main__":
    sys.exit(main())
