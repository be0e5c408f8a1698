"""Config layer tests: defaults, weight auto-correction, category routing."""

import json

import pytest

from facet_tpu.config import CategoryFilter, ScoringConfig, VALID_WEIGHT_COLUMNS
from facet_tpu.config.default_config import build_default_config

REFERENCE_CATEGORY_ORDER = [
    "art", "astro", "concert", "street", "group_portrait", "silhouette",
    "portrait", "portrait_bw", "human_others", "macro", "aerial", "wildlife",
    "food", "sports", "vehicle", "travel", "fashion", "architecture", "urban",
    "long_exposure", "cinematic", "vintage", "abstract", "night", "minimalist",
    "dramatic", "monochrome", "weather", "landscape", "default",
]


def test_default_config_has_30_categories_in_priority_order(scoring_config):
    assert scoring_config.get_all_category_names() == REFERENCE_CATEGORY_ORDER


def test_default_weights_sum_to_100():
    cfg = build_default_config()
    for cat in cfg["categories"]:
        percents = {k: v for k, v in cat["weights"].items() if k.endswith("_percent")}
        assert sum(percents.values()) == 100, cat["name"]
        assert set(percents) == {f"{k}_percent" for k in VALID_WEIGHT_COLUMNS}


def test_validation_passes_on_defaults(scoring_config):
    ok, issues = scoring_config.validate_categories()
    assert ok, issues


def test_version_hash_stable(tmp_config):
    a = ScoringConfig(tmp_config)
    b = ScoringConfig(tmp_config)
    assert a.version_hash == b.version_hash
    assert len(a.version_hash) == 12


def test_weight_autocorrection_writes_back(tmp_config):
    with open(tmp_config) as fh:
        raw = json.load(fh)
    # wreck the portrait weights: invalid key, negative, float, sum != 100
    for cat in raw["categories"]:
        if cat["name"] == "portrait":
            cat["weights"]["bogus_percent"] = 5
            cat["weights"]["aesthetic_percent"] = 40.7
            cat["weights"]["color_percent"] = -3
    with open(tmp_config, "w") as fh:
        json.dump(raw, fh)

    cfg = ScoringConfig(tmp_config)  # validation runs in ctor
    with open(tmp_config) as fh:
        saved = json.load(fh)
    portrait = next(c for c in saved["categories"] if c["name"] == "portrait")
    weights = portrait["weights"]
    assert "bogus_percent" not in weights
    assert weights["color_percent"] >= 0
    total = sum(v for k, v in weights.items() if k.endswith("_percent"))
    assert total == 100
    assert all(isinstance(v, int) for k, v in weights.items() if k.endswith("_percent"))
    # corrected config gets a new hash
    assert cfg.version_hash == ScoringConfig(tmp_config).version_hash


def test_decimal_weights_converted(tmp_config):
    with open(tmp_config) as fh:
        raw = json.load(fh)
    for cat in raw["categories"]:
        if cat["name"] == "default":
            cat["weights"] = {
                "aesthetic_percent": 0.5,
                "composition_percent": 0.3,
                "exposure_percent": 0.2,
            }
    with open(tmp_config, "w") as fh:
        json.dump(raw, fh)
    ScoringConfig(tmp_config)
    with open(tmp_config) as fh:
        saved = json.load(fh)
    default = next(c for c in saved["categories"] if c["name"] == "default")
    assert default["weights"]["aesthetic_percent"] == 50


def test_get_weights_decimals_and_modifiers(scoring_config):
    w = scoring_config.get_weights("portrait")
    weight_sum = sum(w[k] for k in VALID_WEIGHT_COLUMNS if k in w)
    assert abs(weight_sum - 1.0) < 1e-9
    assert w["_apply_blink_penalty"] is True
    assert w["bonus"] == 0.5


def test_normalize_weights_within_tolerance_untouched():
    # 103% is within the ±5 tolerance: preserved
    assert ScoringConfig.normalize_weights_to_100({"a_percent": 60, "b_percent": 43}) is None
    # 120% is normalized exactly
    out = ScoringConfig.normalize_weights_to_100({"a_percent": 80, "b_percent": 40})
    assert sum(out.values()) == 100


class TestCategoryFilter:
    def test_empty_matches_all(self):
        assert CategoryFilter({}).matches({})

    def test_numeric_range(self):
        f = CategoryFilter({"face_ratio_min": 0.05})
        assert f.matches({"face_ratio": 0.2})
        assert not f.matches({"face_ratio": 0.01})
        assert not f.matches({"face_ratio": None})  # constraint unverifiable

    def test_boolean_and_has_face(self):
        f = CategoryFilter({"has_face": True, "is_monochrome": False})
        assert f.matches({"face_count": 2, "is_monochrome": 0})
        assert not f.matches({"face_count": 0, "is_monochrome": 0})
        assert not f.matches({"face_count": 1, "is_monochrome": 1})

    def test_tags_any_all_excluded(self):
        f = CategoryFilter({"required_tags": ["a", "b"], "tag_match_mode": "any"})
        assert f.matches({"tags": "x, B"})
        f_all = CategoryFilter({"required_tags": ["a", "b"], "tag_match_mode": "all"})
        assert not f_all.matches({"tags": "a"})
        assert f_all.matches({"tags": "a,b"})
        f_ex = CategoryFilter({"excluded_tags": ["cat"]})
        assert not f_ex.matches({"tags": "cat, dog"})


class TestDetermineCategory:
    def test_portrait(self, scoring_config):
        cat = scoring_config.determine_category({
            "tags": "", "face_count": 1, "face_ratio": 0.3, "is_silhouette": 0,
            "is_group_portrait": 0, "is_monochrome": 0, "mean_luminance": 0.5,
        })
        assert cat == "portrait"

    def test_bw_portrait(self, scoring_config):
        cat = scoring_config.determine_category({
            "tags": "", "face_count": 1, "face_ratio": 0.3, "is_silhouette": 0,
            "is_group_portrait": 0, "is_monochrome": 1, "mean_luminance": 0.5,
        })
        assert cat == "portrait_bw"

    def test_astro_beats_night(self, scoring_config):
        photo = {"tags": "", "face_count": 0, "mean_luminance": 0.05,
                 "shutter_speed": 20.0}
        assert scoring_config.determine_category(photo) == "astro"
        photo["shutter_speed"] = 0.01
        assert scoring_config.determine_category(photo) == "night"

    def test_tag_routing(self, scoring_config):
        photo = {"tags": "animal, forest", "face_count": 0, "mean_luminance": 0.5}
        assert scoring_config.determine_category(photo) == "wildlife"

    def test_fallthrough_default(self, scoring_config):
        photo = {"tags": "", "face_count": 0, "mean_luminance": 0.5}
        assert scoring_config.determine_category(photo) == "default"

    def test_landscape_tags(self, scoring_config):
        photo = {"tags": "mountain, sky", "face_count": 0, "mean_luminance": 0.5}
        assert scoring_config.determine_category(photo) == "landscape"


def test_profile_suggestion_tiers():
    assert ScoringConfig.suggest_hardware_profile(32)[0] == "24gb"
    assert ScoringConfig.suggest_hardware_profile(16)[0] == "16gb"
    assert ScoringConfig.suggest_hardware_profile(8)[0] == "8gb"
    assert ScoringConfig.suggest_hardware_profile(4)[0] == "legacy"


def test_tag_vocabulary_covers_trigger_tags(scoring_config):
    vocab = scoring_config.get_tag_vocabulary()
    # every required_tags entry must be producible by the tagger
    for cat in scoring_config.get_categories():
        for tag in cat.get("filters", {}).get("required_tags", []):
            assert tag in vocab, f"{cat['name']} trigger tag '{tag}' missing from vocabulary"
