"""Viewer SPA sanity tests (node-free: structure + API contract checks)."""

import json
import os
import re

CLIENT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "client")


def read(name):
    with open(os.path.join(CLIENT, name), encoding="utf-8") as fh:
        return fh.read()


def test_files_present():
    for name in ("index.html", "app.js", "style.css"):
        assert os.path.getsize(os.path.join(CLIENT, name)) > 500


def test_html_references_assets():
    html = read("index.html")
    assert 'src="/app.js"' in html
    assert 'href="/style.css"' in html


def strip_js_literals(js):
    """Remove strings/templates/comments with a small state machine
    (template `${}` interpolations keep their code)."""
    out = []
    i, n = 0, len(js)
    mode = None  # None | '"' | "'" | '`' | '//' | '/*'
    while i < n:
        ch = js[i]
        nxt = js[i + 1] if i + 1 < n else ""
        if mode is None:
            if ch in "\"'`":
                mode = ch
            elif ch == "/" and nxt == "/":
                mode = "//"
                i += 1
            elif ch == "/" and nxt == "*":
                mode = "/*"
                i += 1
            else:
                out.append(ch)
        elif mode in "\"'`":
            if ch == "\\":
                i += 1
            elif mode == "`" and ch == "$" and nxt == "{":
                # re-enter code inside the interpolation up to its '}'
                depth = 1
                i += 2
                while i < n and depth:
                    if js[i] == "{":
                        depth += 1
                    elif js[i] == "}":
                        depth -= 1
                    elif js[i] == "\\":
                        i += 1
                    if depth:
                        out.append(js[i])
                    i += 1
                continue
            elif ch == mode:
                mode = None
        elif mode == "//" and ch == "\n":
            mode = None
            out.append(ch)
        elif mode == "/*" and ch == "*" and nxt == "/":
            mode = None
            i += 1
        i += 1
    return "".join(out)


def test_js_braces_balance():
    stripped = strip_js_literals(read("app.js"))
    for open_c, close_c in (("{", "}"), ("(", ")"), ("[", "]")):
        assert stripped.count(open_c) == stripped.count(close_c), (
            open_c, stripped.count(open_c), stripped.count(close_c))


def test_js_uses_live_endpoints():
    """Every /api path the client calls must exist in the server's routes."""
    from facet_tpu.api import create_app

    js = read("app.js")
    called = set(re.findall(r'"(/api/[a-z_/]+)"', js))
    called |= {p.split("?")[0] for p in re.findall(r'"(/api/[a-z_/]+)\?', js)}

    app = create_app(db_path=":memory:",
                     config_path=os.path.join(CLIENT, "..", "scoring_config.json")
                     if os.path.exists(os.path.join(CLIENT, "..",
                                                    "scoring_config.json"))
                     else None)
    registered = {regex.pattern for _, regex, _, _ in app.routes}

    def route_exists(path):
        for _, regex, _, _ in app.routes:
            if regex.match(path) or regex.match(path + "/x"):
                return True
        return False

    for path in sorted(called):
        assert route_exists(path), f"client calls unknown endpoint {path}"


def test_i18n_keys_exist():
    html = read("index.html")
    js = read("app.js")
    with open(os.path.join(CLIENT, "..", "facet_tpu", "i18n", "en.json"),
              encoding="utf-8") as fh:
        catalog = json.load(fh)
    keys = set(re.findall(r'data-i18n(?:-ph)?="([\w.]+)"', html))
    keys |= set(re.findall(r'(?<![\w.])t\("([\w.]+)"\)', js))
    keys = {k for k in keys if not k.startswith("type.")}  # built dynamically
    missing = [k for k in keys if k not in catalog]
    assert not missing, f"missing i18n keys: {missing}"
