/* Facet viewer — pure store/logic layer (no DOM access).
 *
 * Mirrors the reference client's gallery.store (client/src/app/features/
 * gallery/gallery.store.ts): a filter-state record covering the server's
 * full /api/photos vocabulary, a query builder, and the infinite-scroll
 * page accounting. Kept DOM-free so the contract tests
 * (tests/test_client.py) can check the query vocabulary and the server
 * routes against each other, and so every view shares one source of truth.
 */

"use strict";

(function (global) {
  // ---- filter state ------------------------------------------------------

  // field -> [query param, default]; "" / null / false mean "unset"
  const FILTER_PARAMS = {
    type: ["type", ""],
    search: ["search", ""],
    camera: ["camera", ""],
    lens: ["lens", ""],
    category: ["category", ""],
    pattern: ["pattern", ""],
    tag: ["tag", ""],
    require_tags: ["require_tags", ""],
    exclude_tags: ["exclude_tags", ""],
    person_id: ["person_id", ""],
    date_from: ["date_from", ""],
    date_to: ["date_to", ""],
    min_score: ["min_score", ""],
    max_score: ["max_score", ""],
    min_aesthetic: ["min_aesthetic", ""],
    max_aesthetic: ["max_aesthetic", ""],
    min_quality: ["min_quality", ""],
    max_quality: ["max_quality", ""],
    min_sharpness: ["min_sharpness", ""],
    max_sharpness: ["max_sharpness", ""],
    min_face_quality: ["min_face_quality", ""],
    min_faces: ["min_faces", ""],
    max_faces: ["max_faces", ""],
    min_iso: ["min_iso", ""],
    max_iso: ["max_iso", ""],
    min_f_stop: ["min_f_stop", ""],
    max_f_stop: ["max_f_stop", ""],
    min_focal: ["min_focal", ""],
    max_focal: ["max_focal", ""],
    min_rating: ["min_rating", ""],
    favorites_only: ["favorites_only", false],
    monochrome_only: ["monochrome_only", false],
    hide_blinks: ["hide_blinks", true],
    hide_bursts: ["hide_bursts", true],
    hide_duplicates: ["hide_duplicates", true],
    hide_rejected: ["hide_rejected", true],
  };

  function defaultFilters() {
    const out = {};
    for (const [field, [, dflt]] of Object.entries(FILTER_PARAMS)) {
      out[field] = dflt;
    }
    return out;
  }

  /** Filter record + paging -> URLSearchParams for /api/photos. */
  function buildQuery(filters, page, pageSize, sort, order) {
    const params = new URLSearchParams({
      page: String(page),
      page_size: String(pageSize),
      sort: sort,
      order: order,
    });
    for (const [field, [param, dflt]] of Object.entries(FILTER_PARAMS)) {
      const val = filters[field];
      if (typeof dflt === "boolean") {
        if (val !== dflt) params.set(param, String(val));
      } else if (val !== "" && val != null) {
        params.set(param, String(val));
      }
    }
    return params;
  }

  /** Filters -> URL-shareable params (no paging), for deep links.
   *  Mirrors the reference store's queryParams sync
   *  (gallery.store.ts:317-322, 547). */
  function filtersToUrl(filters, sort, order) {
    const params = new URLSearchParams();
    for (const [field, [param, dflt]] of Object.entries(FILTER_PARAMS)) {
      const val = filters[field];
      if (typeof dflt === "boolean") {
        if (val !== dflt) params.set(param, String(val));
      } else if (val !== "" && val != null) {
        params.set(param, String(val));
      }
    }
    if (sort && sort !== "aggregate") params.set("sort", sort);
    if (order && order !== "desc") params.set("order", order);
    return params;
  }

  /** URL search string -> {filters, sort, order}; unknown params ignored. */
  function filtersFromUrl(search) {
    const params = new URLSearchParams(search);
    const filters = defaultFilters();
    for (const [field, [param, dflt]] of Object.entries(FILTER_PARAMS)) {
      if (!params.has(param)) continue;
      const raw = params.get(param);
      filters[field] = typeof dflt === "boolean" ? raw === "true" : raw;
    }
    return {
      filters: filters,
      sort: params.get("sort") || "aggregate",
      order: params.get("order") || "desc",
    };
  }

  /** Count of filters that differ from their defaults (drawer badge). */
  function activeFilterCount(filters) {
    let n = 0;
    for (const [field, [, dflt]] of Object.entries(FILTER_PARAMS)) {
      if (typeof dflt === "boolean") {
        if (filters[field] !== dflt) n++;
      } else if (filters[field] !== "" && filters[field] != null) {
        n++;
      }
    }
    return n;
  }

  // ---- gallery store (infinite scroll accounting) ------------------------

  function createGalleryStore(pageSize) {
    return {
      filters: defaultFilters(),
      sort: "aggregate",
      order: "desc",
      pageSize: pageSize || 60,
      photos: [],
      page: 0,          // last LOADED page; 0 = nothing loaded
      pages: 1,
      total: 0,
      loading: false,

      get hasMore() {
        return this.page < this.pages;
      },

      reset() {
        this.photos = [];
        this.page = 0;
        this.pages = 1;
        this.total = 0;
      },

      nextQuery() {
        return buildQuery(this.filters, this.page + 1, this.pageSize,
                          this.sort, this.order);
      },

      /** Fold one /api/photos response into the store. */
      appendPage(data) {
        this.photos = this.photos.concat(data.photos || []);
        this.page = data.page;
        this.pages = data.pages;
        this.total = data.total;
        return data.photos || [];
      },

      /** Patch one photo in place (ratings update without a reload). */
      patchPhoto(path, patch) {
        for (const photo of this.photos) {
          if (photo.path === path) Object.assign(photo, patch);
        }
      },
    };
  }

  // ---- selection store (multi-select batch actions) -----------------------

  /** Mirrors the reference gallery's selection set (gallery.component.ts
   *  toggleSelection/clearSelection/copyPaths): a pure Set of photo paths
   *  with the accounting the selection bar binds to. */
  function createSelectionStore() {
    return {
      paths: new Set(),

      get size() {
        return this.paths.size;
      },

      has(path) {
        return this.paths.has(path);
      },

      toggle(path) {
        if (this.paths.has(path)) this.paths.delete(path);
        else this.paths.add(path);
        return this.paths.has(path);
      },

      clear() {
        this.paths.clear();
      },

      /** newline-joined paths in insertion order (clipboard payload) */
      asText() {
        return Array.from(this.paths).join("\n");
      },

      /** newline-joined basenames — what "Copy filenames" promises
       *  (reference gallery.component.ts:827 copyPaths) */
      asFilenames() {
        return Array.from(this.paths)
          .map((p) => p.split("/").pop() || p).join("\n");
      },
    };
  }

  // ---- score breakdown ---------------------------------------------------

  // photo column -> [i18n label key, category-weight key]
  const METRICS = [
    ["aggregate", "gallery.score", null],
    ["aesthetic", "gallery.aesthetic", "aesthetic"],
    ["quality_score", "gallery.quality", "quality"],
    ["tech_sharpness", "gallery.sharpness", "tech_sharpness"],
    ["exposure_score", "gallery.exposure", "exposure"],
    ["comp_score", "gallery.composition", "composition"],
    ["color_score", "gallery.color", "color"],
    ["contrast_score", "gallery.contrast", "contrast"],
    ["face_quality", "gallery.faces", "face_quality"],
  ];

  /** -> [{col, label, value, weight, contribution}] for the breakdown. */
  function scoreBreakdown(photo, categoryWeights) {
    const weights = categoryWeights || {};
    const rows = [];
    for (const [col, label, wkey] of METRICS) {
      const val = photo[col];
      if (val == null) continue;
      const weight = wkey ? weights[wkey] || 0 : null;
      rows.push({
        col: col,
        label: label,
        value: Number(val),
        weight: weight,
        contribution: weight != null ? Number(val) * weight : null,
      });
    }
    return rows;
  }

  // ---- chart helpers -----------------------------------------------------

  /** Fold (value, count) rows into <=bucket histogram counts. */
  function bucketize(rows, buckets) {
    const counts = new Array(buckets.length).fill(0);
    for (const row of rows || []) {
      const v = Number(row.value != null ? row.value : row[0]);
      const c = Number(row.count != null ? row.count : row[1]) || 0;
      let i = buckets.findIndex((b) => v <= b);
      if (i < 0) i = buckets.length - 1;
      counts[i] += c;
    }
    return counts;
  }

  /** Per-metric avg/min/max over {metric: [values]} vectors. */
  function summarizeMetrics(vectors) {
    const rows = [];
    for (const [metric, values] of Object.entries(vectors || {})) {
      if (!values.length) continue;
      let sum = 0, min = Infinity, max = -Infinity;
      for (const v of values) {
        sum += v;
        if (v < min) min = v;
        if (v > max) max = v;
      }
      rows.push({ metric: metric, avg: sum / values.length, min: min, max: max,
                  count: values.length });
    }
    return rows;
  }

  // ---- i18n --------------------------------------------------------------

  function makeT(catalog) {
    return function t(key, vars) {
      let text = catalog[key] || key;
      if (vars) {
        for (const [name, val] of Object.entries(vars)) {
          text = text.replace("{" + name + "}", String(val));
        }
      }
      return text;
    };
  }

  global.FacetStore = {
    FILTER_PARAMS: FILTER_PARAMS,
    METRICS: METRICS,
    defaultFilters: defaultFilters,
    buildQuery: buildQuery,
    filtersToUrl: filtersToUrl,
    filtersFromUrl: filtersFromUrl,
    activeFilterCount: activeFilterCount,
    createGalleryStore: createGalleryStore,
    createSelectionStore: createSelectionStore,
    scoreBreakdown: scoreBreakdown,
    bucketize: bucketize,
    summarizeMetrics: summarizeMetrics,
    makeT: makeT,
  };
})(typeof window !== "undefined" ? window : globalThis);
