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
        # string-prefix calls concatenate an id/path tail at runtime, so
        # probe with plausible tails for int and path params too
        candidates = (path, path.rstrip("/"), path + "/x",
                      path.rstrip("/") + "/1", path + "1", path + "x",
                      path + "cameras")
        for _, regex, _, _ in app.routes:
            if any(regex.match(c) for c in candidates):
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


def test_store_js_structure():
    store = read("store.js")
    assert os.path.getsize(os.path.join(CLIENT, "store.js")) > 500
    stripped = strip_js_literals(store)
    for open_c, close_c in (("{", "}"), ("(", ")"), ("[", "]")):
        assert stripped.count(open_c) == stripped.count(close_c)
    html = read("index.html")
    assert 'src="/store.js"' in html
    # store.js loads before app.js (app.js reads window.FacetStore at parse)
    assert html.index("store.js") < html.index("app.js")


def test_store_filter_params_match_server_vocabulary():
    """Every query param the store can emit must be consumed by the
    gallery router (and the core server params must be emittable)."""
    store = read("store.js")
    block = re.search(r"const FILTER_PARAMS = \{(.*?)\n  \};", store,
                      re.DOTALL).group(1)
    emitted = set(re.findall(r'\["([a-z_]+)",', block))

    gallery_src = open(os.path.join(
        CLIENT, "..", "facet_tpu", "api", "routers", "gallery.py"),
        encoding="utf-8").read()
    consumed = set(re.findall(r'request\.param\("([a-z_]+)"', gallery_src))
    consumed |= set(re.findall(r'\("([a-z_]+)", "[@p]', gallery_src))
    # hide-flags flow through the hide_flag(name, ...) helper, which
    # reads request.param(name) with the name as a variable
    consumed |= set(re.findall(r'hide_flag\("([a-z_]+)"', gallery_src))

    unknown = emitted - consumed
    assert not unknown, f"store emits params the server ignores: {unknown}"
    # the headline families must all be expressible from the store
    for must in ("type", "search", "camera", "lens", "category", "tag",
                 "person_id", "min_score", "min_aesthetic", "min_sharpness",
                 "min_iso", "min_rating", "hide_blinks", "favorites_only"):
        assert must in emitted, f"store cannot emit {must}"


def test_dom_ids_referenced_exist():
    """Every getElementById target in app.js exists in index.html."""
    js = read("app.js")
    html = read("index.html")
    ids = set(re.findall(r'getElementById\("([\w-]+)"\)', js))
    # created inside the photo modal / person detail panel at open time
    dynamic = {"fav-btn", "reject-btn", "override-category",
               "share-link-btn", "detail-close-btn"}
    missing = [i for i in ids - dynamic if f'id="{i}"' not in html]
    assert not missing, f"app.js references unknown ids: {missing}"


def test_i18n_catalogs_complete_across_languages():
    """All five catalogs share one key set — no untranslated keys."""
    base = None
    for lang in ("en", "fr", "de", "it", "es"):
        with open(os.path.join(CLIENT, "..", "facet_tpu", "i18n",
                               f"{lang}.json"), encoding="utf-8") as fh:
            keys = set(json.load(fh))
        if base is None:
            base = keys
        else:
            assert keys == base, (
                f"{lang} differs: missing {sorted(base - keys)[:5]},"
                f" extra {sorted(keys - base)[:5]}")
    assert len(base) >= 250    # round-3 catalog depth


def test_i18n_superset_of_reference():
    """Every key the reference's catalogs define exists here too, so a
    client written against the reference finds all its keys."""
    ref_path = "/root/reference/i18n/translations/en.json"
    if not os.path.exists(ref_path):
        import pytest
        pytest.skip("reference checkout not present")

    def flatten(d, prefix=""):
        out = {}
        for k, v in d.items():
            key = f"{prefix}.{k}" if prefix else k
            if isinstance(v, dict):
                out.update(flatten(v, key))
            else:
                out[key] = v
        return out

    with open(ref_path, encoding="utf-8") as fh:
        ref_keys = set(flatten(json.load(fh)))
    with open(os.path.join(CLIENT, "..", "facet_tpu", "i18n", "en.json"),
              encoding="utf-8") as fh:
        ours = set(json.load(fh))
    missing = sorted(ref_keys - ours)
    assert not missing, f"reference keys absent: {missing[:10]}"


def test_i18n_vars_usage():
    """Keys used with variables have the placeholders in every language."""
    js = read("app.js")
    var_keys = re.findall(r't\("([\w.]+)",\s*\{\s*(\w+)', js)
    for lang in ("en", "fr", "de", "it", "es"):
        with open(os.path.join(CLIENT, "..", "facet_tpu", "i18n",
                               f"{lang}.json"), encoding="utf-8") as fh:
            catalog = json.load(fh)
        for key, first_var in var_keys:
            assert "{" + first_var + "}" in catalog.get(key, ""), (
                lang, key, first_var)


def test_store_url_sync_symmetry():
    """filtersToUrl and filtersFromUrl must both iterate FILTER_PARAMS
    (the same vocabulary in both directions), be exported, and be driven
    from app.js (replaceState on reload, popstate + boot restore)."""
    store = read("store.js")
    assert "function filtersToUrl" in store
    assert "function filtersFromUrl" in store
    to_block = store.split("function filtersToUrl")[1].split("function")[0]
    from_block = store.split("function filtersFromUrl")[1].split("function")[0]
    for block in (to_block, from_block):
        assert "FILTER_PARAMS" in block
    assert "filtersToUrl: filtersToUrl" in store
    assert "filtersFromUrl: filtersFromUrl" in store
    js = read("app.js")
    # distinct filter states push history entries so back/forward works
    assert "history.pushState" in js
    assert 'addEventListener("popstate"' in js
    assert "applyFiltersFromUrl()" in js.split("async function boot")[1]
    # event listeners must not leak the Event object into skipUrl
    assert 'addEventListener("change", reloadGallery)' not in js


def test_spa_served_by_default(tmp_path):
    """run_api defaults to the bundled client; the SPA mount serves the
    new index.html with token-protected assets and the API unaffected."""
    import sys
    sys.path.insert(0, os.path.join(CLIENT, ".."))
    import run_api
    from facet_tpu.api import create_app
    from facet_tpu.web import TestClient

    assert run_api.resolve_static(None) == CLIENT
    assert run_api.resolve_static("/elsewhere") == "/elsewhere"

    app = create_app(db_path=":memory:", static_dir=CLIENT)
    tc = TestClient(app)
    home = tc.get("/")
    assert home.status_code == 200
    assert b'id="selection-bar"' in home.content
    assert b'id="modal-faces"' in home.content
    assert b"createSelectionStore" in tc.get("/store.js").content
    # traversal is refused, unknown SPA routes fall back to index.html
    assert tc.get("/../run_api.py").status_code in (403, 200) \
        and b"argparse" not in tc.get("/../run_api.py").content
    assert b"<title>Facet</title>" in tc.get("/persons-route").content


def test_category_and_pattern_names_translated():
    """The 30 scoring categories and 8 composition patterns all have
    display names in the catalog (used by the gallery and stats views)."""
    import sys
    sys.path.insert(0, os.path.join(CLIENT, ".."))
    from facet_tpu.config.default_config import build_default_config
    from facet_tpu.models.samp_net import COMPOSITION_PATTERNS

    with open(os.path.join(CLIENT, "..", "facet_tpu", "i18n", "en.json"),
              encoding="utf-8") as fh:
        catalog = json.load(fh)
    for cat in build_default_config()["categories"]:
        assert "category_names." + cat["name"] in catalog, cat["name"]
    for pattern in COMPOSITION_PATTERNS:
        assert "composition_patterns." + pattern in catalog, pattern
