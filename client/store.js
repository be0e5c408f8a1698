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

  // ---- SVG charts (pure string builders, DOM-free) ------------------------

  /** /api/stats/timeline heatmap rows [{day (0=Sun), hour, count}] ->
   *  7x24 count matrix ordered Mon..Sun (display order). */
  function heatmapCells(rows) {
    const cells = [];
    for (let d = 0; d < 7; d++) cells.push(new Array(24).fill(0));
    for (const row of rows || []) {
      const dow = Number(row.day);      // 0 = Sunday (strftime %w)
      const hour = Number(row.hour);
      if (dow >= 0 && dow < 7 && hour >= 0 && hour < 24) {
        cells[(dow + 6) % 7][hour] += Number(row.count) || 0;
      }
    }
    return cells;
  }

  /** 7x24 matrix (rows Mon..Sun) -> inline SVG heatmap string. Mirrors
   *  the reference stats timeline day-of-week x hour heatmap
   *  (reference api/routers/stats.py:460-467 + stats.component.ts). */
  function svgHeatmap(cells, opts) {
    const o = opts || {};
    const cw = o.cellWidth || 24;
    const ch = o.cellHeight || 18;
    const pad = o.pad || 40;
    const days = o.dayLabels ||
      ["Mon", "Tue", "Wed", "Thu", "Fri", "Sat", "Sun"];
    let max = 1;
    for (const row of cells) {
      for (const v of row) if (v > max) max = v;
    }
    const width = pad + 24 * cw + 4;
    const height = pad + 7 * ch + 4;
    const parts = [];
    parts.push('<svg class="heatmap" viewBox="0 0 ' + width + " " + height +
               '" xmlns="http://www.w3.org/2000/svg">');
    for (let h = 0; h < 24; h += 3) {
      parts.push('<text class="axis" x="' + (pad + h * cw + cw / 2) +
                 '" y="' + (pad - 8) + '" text-anchor="middle">' + h +
                 "</text>");
    }
    for (let d = 0; d < 7; d++) {
      parts.push('<text class="axis" x="' + (pad - 6) + '" y="' +
                 (pad + d * ch + ch - 5) + '" text-anchor="end">' +
                 days[d] + "</text>");
      for (let h = 0; h < 24; h++) {
        const v = (cells[d] && cells[d][h]) || 0;
        const alpha = v ? (0.15 + 0.85 * (v / max)).toFixed(3) : "0";
        parts.push('<rect class="cell" x="' + (pad + h * cw) + '" y="' +
                   (pad + d * ch) + '" width="' + (cw - 2) + '" height="' +
                   (ch - 2) + '" rx="2" data-count="' + v +
                   '" fill="rgba(79,156,240,' + alpha + ')">' +
                   "<title>" + days[d] + " " + h + ":00 — " + v +
                   "</title></rect>");
      }
    }
    parts.push("</svg>");
    return parts.join("");
  }

  /** [[x, y], ...] points -> inline SVG scatter with axes + ticks
   *  (the correlation scatter; point values from /api/stats/scatter). */
  function svgScatter(points, opts) {
    const o = opts || {};
    const w = o.width || 460;
    const h = o.height || 320;
    const pad = o.pad || 42;
    const pts = (points || []).map((p) =>
      p.length != null ? { x: Number(p[0]), y: Number(p[1]) }
                       : { x: Number(p.x), y: Number(p.y) });
    let xmin = Infinity, xmax = -Infinity, ymin = Infinity, ymax = -Infinity;
    for (const p of pts) {
      if (p.x < xmin) xmin = p.x;
      if (p.x > xmax) xmax = p.x;
      if (p.y < ymin) ymin = p.y;
      if (p.y > ymax) ymax = p.y;
    }
    if (!pts.length || xmin === xmax) { xmin = 0; xmax = xmax > 0 ? xmax : 10; }
    if (!pts.length || ymin === ymax) { ymin = 0; ymax = ymax > 0 ? ymax : 10; }
    const sx = (v) => pad + ((v - xmin) / (xmax - xmin)) * (w - pad - 12);
    const sy = (v) => h - pad - ((v - ymin) / (ymax - ymin)) * (h - pad - 14);
    const parts = [];
    parts.push('<svg class="scatter" viewBox="0 0 ' + w + " " + h +
               '" xmlns="http://www.w3.org/2000/svg">');
    parts.push('<line class="axis-line" x1="' + pad + '" y1="' + (h - pad) +
               '" x2="' + (w - 8) + '" y2="' + (h - pad) + '"/>');
    parts.push('<line class="axis-line" x1="' + pad + '" y1="' + (h - pad) +
               '" x2="' + pad + '" y2="10"/>');
    for (let i = 0; i <= 4; i++) {
      const xv = xmin + ((xmax - xmin) * i) / 4;
      const yv = ymin + ((ymax - ymin) * i) / 4;
      parts.push('<text class="axis" x="' + sx(xv).toFixed(1) + '" y="' +
                 (h - pad + 14) + '" text-anchor="middle">' +
                 xv.toFixed(1) + "</text>");
      parts.push('<text class="axis" x="' + (pad - 6) + '" y="' +
                 (sy(yv) + 4).toFixed(1) + '" text-anchor="end">' +
                 yv.toFixed(1) + "</text>");
    }
    if (o.xlabel) {
      parts.push('<text class="axis-label" x="' + (pad + (w - pad) / 2) +
                 '" y="' + (h - 6) + '" text-anchor="middle">' + o.xlabel +
                 "</text>");
    }
    if (o.ylabel) {
      parts.push('<text class="axis-label" x="12" y="' + (h / 2) +
                 '" text-anchor="middle" transform="rotate(-90 12 ' +
                 (h / 2) + ')">' + o.ylabel + "</text>");
    }
    for (const p of pts) {
      parts.push('<circle class="pt" cx="' + sx(p.x).toFixed(1) + '" cy="' +
                 sy(p.y).toFixed(1) + '" r="2.5"/>');
    }
    parts.push("</svg>");
    return parts.join("");
  }

  // ---- tooltip (pure render-decision layer) ------------------------------

  function escapeHtml(text) {
    return String(text == null ? "" : text)
      .split("&").join("&amp;").split("<").join("&lt;")
      .split(">").join("&gt;").split('"').join("&quot;");
  }

  /** photographic shutter display: numeric seconds -> "1/250s" / "2.5s"
   *  (the DB stores the reference's numeric form; mirrors the reference
   *  client's ShutterSpeedPipe). Non-numeric input comes back escaped —
   *  it lands in innerHTML. */
  function fmtShutter(value) {
    const s = Number(value);
    if (!value || !isFinite(s) || s <= 0) {
      return value ? escapeHtml(value) : "?";
    }
    if (s >= 1) return String(Math.round(s * 10) / 10) + "s";
    return "1/" + Math.round(1 / s) + "s";
  }

  /** rich hover tooltip HTML, mirroring the reference's photo-tooltip
   *  component (client/src/app/features/gallery/
   *  photo-tooltip.component.ts): sectioned metric rows + capture
   *  metadata. Pure: photo row + t() + i18n catalog in, HTML string out
   *  — executed under test by tests/test_store_js.py. */
  function tooltipHtml(photo, t, catalog) {
    const cat = catalog || {};
    const row = function (label, value) {
      return value == null ? "" :
        '<div class="tip-row"><span>' + label + "</span><b>" + value +
        "</b></div>";
    };
    const num = function (v) {
      return v == null ? null : Number(v).toFixed(1);
    };
    const catName = cat["category_names." + photo.category] || photo.category;
    const agg = num(photo.aggregate);
    let html = '<div class="tip-title">' +
      escapeHtml(photo.filename || photo.path) + "</div>";
    if (photo.date_taken) {
      html += '<div class="tip-date">' + escapeHtml(photo.date_taken) +
        "</div>";
    }
    html += '<div class="tip-score">[' +
      (photo.category ? catName : "—") + "] " + t("gallery.score") +
      ": " + (agg == null ? "—" : agg) + "</div>";
    let rows = row(t("gallery.aesthetic"), num(photo.aesthetic)) +
      row(t("gallery.quality"), num(photo.quality_score)) +
      (photo.face_count > 0
        ? row(t("gallery.faces"), num(photo.face_quality)) +
          row(t("tooltip.face_sharp"), num(photo.face_sharpness)) +
          row(t("tooltip.eye_sharpness"), num(photo.eye_sharpness))
        : "") +
      row(t("gallery.sharpness"), num(photo.tech_sharpness));
    if (rows) {
      html += '<div class="tip-section">' + t("tooltip.quality_section") +
        "</div>" + rows;
    }
    rows = row(t("gallery.composition"), num(photo.comp_score)) +
      row(t("gallery.pattern"), photo.composition_pattern
        ? (cat["composition_patterns." + photo.composition_pattern] ||
           photo.composition_pattern)
        : null) +
      row(t("gallery.exposure"), num(photo.exposure_score)) +
      row(t("gallery.color"), num(photo.color_score)) +
      row(t("gallery.contrast"), num(photo.contrast_score));
    if (rows) {
      html += '<div class="tip-section">' + t("tooltip.technical_section") +
        "</div>" + rows;
    }
    rows = row(t("gallery.camera"), photo.camera_model
      ? escapeHtml(photo.camera_model) +
        (photo.lens_model ? " · " + escapeHtml(photo.lens_model) : "")
      : null) +
      row("ISO / f / s", photo.iso
        ? photo.iso + " / f" + (photo.f_stop || "?") + " / " +
          fmtShutter(photo.shutter_speed)
        : null) +
      row(t("gallery.focal"),
          photo.focal_length ? photo.focal_length + " mm" : null);
    if (rows) {
      html += '<div class="tip-section">' + t("tooltip.exif_section") +
        "</div>" + rows;
    }
    return html;
  }

  /** fixed-position placement near the cursor, flipping to the other
   *  side of the pointer when the tip would overflow the viewport.
   *  cursor {x, y}, tip {width, height}, viewport {width, height}. */
  function tooltipPosition(cursor, tip, viewport, pad) {
    const p = pad == null ? 14 : pad;
    let x = cursor.x + p;
    let y = cursor.y + p;
    if (x + tip.width > viewport.width - 8) {
      x = Math.max(8, cursor.x - tip.width - p);
    }
    if (y + tip.height > viewport.height - 8) {
      y = Math.max(8, viewport.height - tip.height - 8);
    }
    return { left: x, top: y };
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
    heatmapCells: heatmapCells,
    svgHeatmap: svgHeatmap,
    svgScatter: svgScatter,
    escapeHtml: escapeHtml,
    fmtShutter: fmtShutter,
    tooltipHtml: tooltipHtml,
    tooltipPosition: tooltipPosition,
    makeT: makeT,
  };
})(typeof window !== "undefined" ? window : globalThis);
