"""Translations for the viewer UI (en/fr/de/it/es).

(reference: i18n/__init__.py:23-80) Language resolves from an explicit param,
a cookie, then Accept-Language; catalogs load lazily and cache.
"""

import functools
import json
import os

SUPPORTED_LANGUAGES = ["en", "fr", "de", "it", "es"]
DEFAULT_LANGUAGE = "en"

_HERE = os.path.dirname(os.path.abspath(__file__))


@functools.lru_cache(maxsize=None)
def load_catalog(lang):
    if lang not in SUPPORTED_LANGUAGES:
        lang = DEFAULT_LANGUAGE
    path = os.path.join(_HERE, f"{lang}.json")
    try:
        with open(path, encoding="utf-8") as fh:
            catalog = json.load(fh)
    except OSError:
        catalog = {}
    if lang != DEFAULT_LANGUAGE:
        base = dict(load_catalog(DEFAULT_LANGUAGE))
        base.update(catalog)
        return base
    return catalog


def negotiate_language(param=None, cookie=None, accept_header=None):
    for candidate in (param, cookie):
        if candidate and candidate.split("-")[0].lower() in SUPPORTED_LANGUAGES:
            return candidate.split("-")[0].lower()
    if accept_header:
        for part in accept_header.split(","):
            code = part.split(";")[0].strip().split("-")[0].lower()
            if code in SUPPORTED_LANGUAGES:
                return code
    return DEFAULT_LANGUAGE


def translate(key, lang=DEFAULT_LANGUAGE):
    return load_catalog(lang).get(key, key)
