/* Facet viewer — build-free SPA over the JSON API.
 *
 * Covers the reference client's feature set (gallery with the full filter
 * vocabulary, per-photo score breakdown with weighted contributions,
 * similar photos, stats dashboards, person management with merge-suggestion
 * review, keyboard-driven pairwise comparison voting, JWT auth, i18n) in
 * plain JavaScript served by run_api.py --static.
 */

"use strict";

const state = {
  token: localStorage.getItem("facet_token") || null,
  page: 1,
  pageSize: 60,
  sort: "aggregate",
  view: "gallery",
  lang: localStorage.getItem("facet_lang") || "en",
  catalog: {},
  config: null,
  weights: null, // {category: {metric: fraction}} for breakdown bars
};

// ----------------------------------------------------------------- api

async function api(path, options = {}) {
  const headers = Object.assign({}, options.headers);
  if (state.token) headers["Authorization"] = "Bearer " + state.token;
  if (options.json) {
    headers["Content-Type"] = "application/json";
    options.body = JSON.stringify(options.json);
  }
  const res = await fetch(path, Object.assign({}, options, { headers }));
  if (res.status === 401) { showLogin(); throw new Error("unauthorized"); }
  if (!res.ok) {
    const detail = (await res.json().catch(() => ({}))).detail || res.status;
    throw new Error(detail);
  }
  return res.json();
}

function thumbUrl(path, size) {
  const token = state.token ? "&token=" + encodeURIComponent(state.token) : "";
  return "/api/thumbnail" + path + "?size=" + (size || 320) + token;
}

// ----------------------------------------------------------------- i18n

async function loadLanguage(lang) {
  const data = await api("/api/i18n/" + lang);
  state.lang = data.language;
  state.catalog = data.catalog;
  localStorage.setItem("facet_lang", state.lang);
  document.querySelectorAll("[data-i18n]").forEach((el) => {
    const key = el.dataset.i18n;
    if (state.catalog[key]) el.textContent = state.catalog[key];
  });
  document.querySelectorAll("[data-i18n-ph]").forEach((el) => {
    const key = el.dataset.i18nPh;
    if (state.catalog[key]) el.placeholder = state.catalog[key];
  });
}

const t = (key) => state.catalog[key] || key;

// ----------------------------------------------------------------- auth

function showLogin() {
  document.getElementById("login-view").hidden = false;
  document.getElementById("app").hidden = true;
}

function hideLogin() {
  document.getElementById("login-view").hidden = true;
  document.getElementById("app").hidden = false;
}

document.getElementById("login-form").addEventListener("submit", async (e) => {
  e.preventDefault();
  try {
    const data = await api("/api/auth/login", {
      method: "POST",
      json: {
        username: document.getElementById("login-username").value || null,
        password: document.getElementById("login-password").value,
      },
    });
    state.token = data.token;
    localStorage.setItem("facet_token", data.token);
    document.getElementById("logout-btn").hidden = false;
    hideLogin();
    boot();
  } catch (err) {
    const box = document.getElementById("login-error");
    box.textContent = t("auth.invalid");
    box.hidden = false;
  }
});

document.getElementById("logout-btn").addEventListener("click", () => {
  state.token = null;
  localStorage.removeItem("facet_token");
  location.reload();
});

// ----------------------------------------------------------------- views

function switchView(name) {
  state.view = name;
  document.querySelectorAll("nav button").forEach((b) =>
    b.classList.toggle("active", b.dataset.view === name));
  for (const view of ["gallery", "stats", "persons", "comparison"]) {
    document.getElementById(view + "-view").hidden = view !== name;
  }
  if (name === "gallery") loadGallery();
  if (name === "stats") loadStats();
  if (name === "persons") loadPersons();
  if (name === "comparison") loadPair();
}

document.querySelectorAll("nav button").forEach((b) =>
  b.addEventListener("click", () => switchView(b.dataset.view)));

// ----------------------------------------------------------------- gallery

const RANGE_INPUTS = [
  ["min-score", "min_score"], ["max-score", "max_score"],
  ["min-quality", "min_quality"], ["max-quality", "max_quality"],
  ["min-iso", "min_iso"], ["max-iso", "max_iso"],
  ["min-f-stop", "min_f_stop"], ["max-f-stop", "max_f_stop"],
  ["min-focal", "min_focal"], ["max-focal", "max_focal"],
  ["min-faces", "min_faces"], ["max-faces", "max_faces"],
  ["min-rating", "min_rating"],
];

function galleryParams() {
  const params = new URLSearchParams({
    page: state.page, page_size: state.pageSize, sort: state.sort,
    order: document.getElementById("order-asc").checked ? "asc" : "desc",
    hide_blinks: document.getElementById("hide-blinks").checked,
    hide_bursts: document.getElementById("hide-bursts").checked,
    hide_duplicates: document.getElementById("hide-duplicates").checked,
    hide_rejected: document.getElementById("hide-rejected").checked,
  });
  const type = document.getElementById("type-filter").value;
  if (type) params.set("type", type);
  const search = document.getElementById("search").value.trim();
  if (search) params.set("search", search);
  for (const [id, key] of [["camera-filter", "camera"],
                           ["lens-filter", "lens"],
                           ["category-filter", "category"],
                           ["tag-filter", "tag"],
                           ["person-filter", "person_id"],
                           ["pattern-filter", "pattern"]]) {
    const val = document.getElementById(id).value;
    if (val) params.set(key, val);
  }
  for (const [id, key] of RANGE_INPUTS) {
    const val = document.getElementById(id).value;
    if (val !== "") params.set(key, val);
  }
  const dateFrom = document.getElementById("date-from").value;
  if (dateFrom) params.set("date_from", dateFrom.replace(/-/g, ":"));
  const dateTo = document.getElementById("date-to").value;
  if (dateTo) params.set("date_to", dateTo.replace(/-/g, ":"));
  if (document.getElementById("favorites-only").checked)
    params.set("favorites_only", "true");
  if (document.getElementById("monochrome-only").checked)
    params.set("monochrome_only", "true");
  return params;
}

function hoverSummary(photo) {
  const parts = [];
  for (const [col, label] of METRICS) {
    if (photo[col] != null) parts.push(`${t(label)}: ${Number(photo[col]).toFixed(1)}`);
  }
  if (photo.category) parts.push(`${t("gallery.category")}: ${photo.category}`);
  return parts.join("\n");
}

async function loadGallery() {
  const data = await api("/api/photos?" + galleryParams());
  const grid = document.getElementById("grid");
  grid.innerHTML = "";
  if (!data.photos.length) {
    grid.innerHTML = `<p class="hint">${t("gallery.no_results")}</p>`;
  }
  for (const photo of data.photos) {
    const card = document.createElement("div");
    card.className = "card";
    const score = photo.aggregate == null ? "—" : photo.aggregate.toFixed(1);
    card.title = hoverSummary(photo); // score-breakdown tooltip
    card.innerHTML =
      `<img loading="lazy" src="${thumbUrl(photo.path, 320)}">` +
      `<span class="score ${photo.aggregate >= 7 ? "good" : ""}">${score}</span>` +
      `<div class="caption">${photo.filename || photo.path}</div>`;
    card.addEventListener("click", () => openModal(photo));
    grid.appendChild(card);
  }
  document.getElementById("page-label").textContent =
    `${data.page} / ${data.pages} (${data.total})`;
  state.pages = data.pages;
}

async function loadFilterOptions() {
  const [opts, counts, config, persons, weights] = await Promise.all([
    api("/api/filter_options"), api("/api/type_counts"), api("/api/config"),
    api("/api/persons").catch(() => ({ persons: [] })),
    api("/api/stats/category_weights").catch(() => ({ weights: {} }))]);
  state.config = config;
  state.weights = weights.weights || {};
  const fill = (id, values, labels) => {
    const select = document.getElementById(id);
    select.querySelectorAll("option:not(:first-child)").forEach((o) => o.remove());
    values.forEach((v, i) => {
      const opt = document.createElement("option");
      opt.value = v; opt.textContent = labels ? labels[i] : v;
      select.appendChild(opt);
    });
  };
  fill("camera-filter", opts.cameras);
  fill("lens-filter", opts.lenses || []);
  fill("category-filter", opts.categories);
  fill("tag-filter", opts.tags.slice(0, 60));
  fill("pattern-filter", opts.patterns || []);
  fill("person-filter", persons.persons.map((p) => p.id),
       persons.persons.map((p) => p.name || `#${p.id}`));

  const typeSelect = document.getElementById("type-filter");
  typeSelect.innerHTML = "";
  for (const [name, count] of Object.entries(counts)) {
    const opt = document.createElement("option");
    opt.value = name === "all" ? "" : name;
    opt.textContent = `${t("type." + name)} (${count})`;
    typeSelect.appendChild(opt);
  }
  const sortSelect = document.getElementById("sort-select");
  sortSelect.innerHTML = "";
  const groups = config.sort_options || {};
  for (const cols of Object.values(groups)) {
    for (const col of cols) {
      const opt = document.createElement("option");
      opt.value = col; opt.textContent = col;
      if (col === state.sort) opt.selected = true;
      sortSelect.appendChild(opt);
    }
  }
  const badge = document.getElementById("type-counts");
  badge.innerHTML = Object.entries(counts)
    .map(([k, v]) => `<div><span>${t("type." + k)}</span><span>${v}</span></div>`)
    .join("");
}

for (const id of ["type-filter", "camera-filter", "lens-filter",
                  "category-filter", "tag-filter", "person-filter",
                  "pattern-filter", "hide-blinks", "hide-bursts",
                  "hide-duplicates", "hide-rejected", "favorites-only",
                  "monochrome-only", "order-asc", "min-rating",
                  "date-from", "date-to"]) {
  document.getElementById(id).addEventListener("change", () => {
    state.page = 1; loadGallery();
  });
}
for (const [id] of RANGE_INPUTS) {
  if (id === "min-rating") continue; // select handled above
  document.getElementById(id).addEventListener("change", () => {
    state.page = 1; loadGallery();
  });
}
document.getElementById("sort-select").addEventListener("change", (e) => {
  state.sort = e.target.value; state.page = 1; loadGallery();
});
let searchTimer;
document.getElementById("search").addEventListener("input", () => {
  clearTimeout(searchTimer);
  searchTimer = setTimeout(() => { state.page = 1; loadGallery(); }, 350);
});
document.getElementById("prev-page").addEventListener("click", () => {
  if (state.page > 1) { state.page--; loadGallery(); }
});
document.getElementById("next-page").addEventListener("click", () => {
  if (state.page < (state.pages || 1)) { state.page++; loadGallery(); }
});

// ------------------------------------------------------------ photo modal

const METRICS = [
  ["aggregate", "gallery.score"], ["aesthetic", "gallery.aesthetic"],
  ["quality_score", "gallery.quality"], ["tech_sharpness", "gallery.sharpness"],
  ["exposure_score", "gallery.exposure"], ["comp_score", "gallery.composition"],
  ["color_score", "gallery.color"], ["contrast_score", "gallery.contrast"],
  ["face_quality", "gallery.faces"],
];

// metric column -> category weight key (for the contribution breakdown)
const WEIGHT_KEYS = {
  aesthetic: "aesthetic", quality_score: "quality",
  tech_sharpness: "tech_sharpness", exposure_score: "exposure",
  comp_score: "composition", color_score: "color",
  contrast_score: "contrast", face_quality: "face_quality",
};

function contributionHtml(photo) {
  const weights = (state.weights || {})[photo.category] || {};
  let html = "";
  for (const [col, label] of METRICS) {
    const val = photo[col];
    if (val == null) continue;
    const wkey = WEIGHT_KEYS[col];
    const weight = wkey ? weights[wkey] || 0 : null;
    const contribution = weight != null && col !== "aggregate"
      ? ` <i>(${Math.round(weight * 100)}% → ${(val * weight).toFixed(2)})</i>`
      : "";
    html += `<div class="metric"><span>${t(label)}${contribution}</span>` +
      `<b>${Number(val).toFixed(2)}</b></div>` +
      `<div class="bar"><div style="width:${Math.min(100, val * 10)}%"></div></div>`;
  }
  return html;
}

async function loadSimilar(photo) {
  const box = document.getElementById("modal-similar");
  box.innerHTML = "";
  try {
    const data = await api("/api/similar_photos" + photo.path + "?max_distance=10");
    if (!data.similar || !data.similar.length) return;
    box.innerHTML = `<h4>${t("gallery.similar")}</h4>`;
    for (const sim of data.similar.slice(0, 8)) {
      const img = document.createElement("img");
      img.src = thumbUrl(sim.path, 128);
      img.title = `${sim.path} (d=${sim.distance})`;
      box.appendChild(img);
    }
  } catch (err) { /* similar photos are optional */ }
}

function openModal(photo) {
  const modal = document.getElementById("photo-modal");
  modal.hidden = false;
  document.getElementById("modal-img").src = thumbUrl(photo.path, 1280);
  const meta = document.getElementById("modal-meta");
  let html = `<h3>${photo.filename}</h3>`;
  html += contributionHtml(photo);
  html += `<div class="metric"><span>${t("gallery.category")}</span>` +
    `<b>${photo.category || "—"}</b></div>`;
  if (photo.composition_pattern)
    html += `<div class="metric"><span>Pattern</span><b>${photo.composition_pattern}</b></div>`;
  if (photo.tags && photo.tags.length)
    html += `<div class="metric"><span>${t("gallery.tags")}</span>` +
      `<b>${photo.tags.join(", ")}</b></div>`;
  if (photo.camera_model)
    html += `<div class="metric"><span>Camera</span><b>${photo.camera_model}` +
      (photo.lens_model ? " · " + photo.lens_model : "") + `</b></div>`;
  if (photo.iso)
    html += `<div class="metric"><span>ISO / f / s</span>` +
      `<b>${photo.iso} / f${photo.f_stop || "?"} / ${photo.shutter_speed || "?"}</b></div>`;
  // star rating control
  let stars = '<div class="stars">';
  for (let i = 1; i <= 5; i++) {
    stars += `<span data-star="${i}">${i <= (photo.star_rating || 0) ? "★" : "☆"}</span>`;
  }
  stars += "</div>";
  html += stars;
  html += `<div class="modal-actions">` +
    `<button id="fav-btn">${photo.is_favorite ? "♥" : "♡"} ${t("gallery.favorites")}</button>` +
    `<button id="reject-btn">${photo.is_rejected ? "✓ rejected" : "✗ reject"}</button>` +
    `</div>`;
  meta.innerHTML = html;
  meta.querySelectorAll("[data-star]").forEach((el) =>
    el.addEventListener("click", async () => {
      await api("/api/photos/rating", {
        method: "POST",
        json: { path: photo.path, rating: Number(el.dataset.star) },
      });
      photo.star_rating = Number(el.dataset.star);
      openModal(photo);
    }));
  document.getElementById("fav-btn").addEventListener("click", async () => {
    photo.is_favorite = photo.is_favorite ? 0 : 1;
    await api("/api/photos/favorite", {
      method: "POST", json: { path: photo.path, favorite: !!photo.is_favorite } });
    openModal(photo);
  });
  document.getElementById("reject-btn").addEventListener("click", async () => {
    photo.is_rejected = photo.is_rejected ? 0 : 1;
    await api("/api/photos/rejected", {
      method: "POST", json: { path: photo.path, rejected: !!photo.is_rejected } });
    openModal(photo);
  });
  loadSimilar(photo);
}

document.getElementById("modal-close").addEventListener("click", () => {
  document.getElementById("photo-modal").hidden = true;
});
document.getElementById("photo-modal").addEventListener("click", (e) => {
  if (e.target.id === "photo-modal")
    document.getElementById("photo-modal").hidden = true;
});

// ----------------------------------------------------------------- stats

function barChart(canvasId, labels, values, color) {
  const canvas = document.getElementById(canvasId);
  const ctx = canvas.getContext("2d");
  ctx.clearRect(0, 0, canvas.width, canvas.height);
  const max = Math.max(...values, 1);
  const bw = canvas.width / values.length;
  ctx.fillStyle = color || "#4f9cf0";
  values.forEach((v, i) => {
    const h = (v / max) * (canvas.height - 24);
    ctx.fillRect(i * bw + 1, canvas.height - 18 - h, bw - 2, h);
  });
  ctx.fillStyle = "#8b95a3";
  ctx.font = "10px sans-serif";
  const step = Math.ceil(labels.length / 12);
  labels.forEach((label, i) => {
    if (i % step === 0)
      ctx.fillText(String(label), i * bw + 2, canvas.height - 5);
  });
}

async function loadStats() {
  const [overview, dist, gear, timeline, cats, corr, settings] =
    await Promise.all([
      api("/api/stats/overview"), api("/api/stats/score_distribution"),
      api("/api/stats/gear"), api("/api/stats/timeline"),
      api("/api/stats/categories"),
      api("/api/stats/correlations").catch(() => null),
      api("/api/stats/settings").catch(() => null)]);
  const cards = [
    ["Photos", overview.total_photos], ["Avg", overview.avg_score],
    ["Faces", overview.faces], ["People", overview.persons],
    ["Blinks", overview.blinks],
    [t("quality.excellent"), overview.quality_counts.excellent],
  ];
  document.getElementById("stats-cards").innerHTML = cards.map(
    ([label, value]) =>
      `<div class="stat-card"><div class="value">${value ?? "—"}</div>` +
      `<div class="label">${label}</div></div>`).join("");
  barChart("dist-chart", dist.bins.map((b) => b.toFixed(1)), dist.counts);
  barChart("timeline-chart", timeline.months.map((m) => m.month),
           timeline.months.map((m) => m.count), "#43b581");
  const table = (rows, cols) =>
    "<table><tr>" + cols.map((c) => `<th>${c}</th>`).join("") + "</tr>" +
    rows.map((r) => "<tr>" + cols.map((c) =>
      `<td>${r[c.toLowerCase().replace(" ", "_")] ?? "—"}</td>`).join("") +
      "</tr>").join("") + "</table>";
  document.getElementById("gear-tables").innerHTML =
    table(gear.cameras.slice(0, 10), ["Camera", "Count", "Avg_score"]) +
    table(gear.lenses.slice(0, 10), ["Lens", "Count", "Avg_score"]);
  document.getElementById("category-table").innerHTML =
    table(cats.categories, ["Category", "Count", "Avg_score", "Max_score"]);
  if (corr) {
    const rows = Object.entries(corr.correlation_with_aggregate)
      .filter(([, v]) => v != null)
      .sort((a, b) => Math.abs(b[1]) - Math.abs(a[1]))
      .map(([metric, r]) => ({ metric, r: r.toFixed(3) }));
    document.getElementById("correlation-table").innerHTML =
      table(rows, ["Metric", "R"]);
  }
  if (settings) {
    // bucket the long tails so the histograms stay readable
    const bucketed = (rows, buckets) => {
      const counts = new Array(buckets.length).fill(0);
      for (const row of rows) {
        const v = Number(row.value);
        let i = buckets.findIndex((b) => v <= b);
        if (i < 0) i = buckets.length - 1;
        counts[i] += row.count;
      }
      return counts;
    };
    const isoB = [100, 200, 400, 800, 1600, 3200, 6400, 12800, 102400];
    barChart("iso-chart", isoB.map((b) => "≤" + b),
             bucketed(settings.iso || [], isoB), "#c98a3d");
    const apB = [1.4, 2, 2.8, 4, 5.6, 8, 11, 16, 32];
    barChart("aperture-chart", apB.map((b) => "f" + b),
             bucketed(settings.aperture || [], apB), "#7a5cc9");
    const flB = [24, 35, 50, 85, 135, 200, 400, 800];
    barChart("focal-chart", flB.map((b) => b + "mm"),
             bucketed(settings.focal_length || [], flB), "#3da3a0");
  }
  loadCategoryMetrics(cats.categories.map((c) => c.category));
}

async function loadCategoryMetrics(categories) {
  const select = document.getElementById("metrics-category");
  if (!select.options.length) {
    select.innerHTML = categories.map(
      (c) => `<option value="${c}">${c}</option>`).join("");
    select.addEventListener("change", () => loadCategoryMetrics(categories));
  }
  const cat = select.value || categories[0];
  if (!cat) return;
  try {
    const data = await api("/api/stats/category_metrics?category=" +
                           encodeURIComponent(cat));
    // endpoint returns raw per-photo vectors; summarize client-side
    const rows = Object.entries(data.metrics || {})
      .filter(([, v]) => v.length)
      .map(([metric, v]) => ({
        metric,
        avg: (v.reduce((a, b) => a + b, 0) / v.length).toFixed(2),
        min: Math.min(...v).toFixed(2),
        max: Math.max(...v).toFixed(2),
      }));
    const cols = ["Metric", "Avg", "Min", "Max"];
    document.getElementById("category-metrics-table").innerHTML =
      "<table><tr>" + cols.map((c) => `<th>${c}</th>`).join("") + "</tr>" +
      rows.map((r) => "<tr>" + cols.map((c) =>
        `<td>${r[c.toLowerCase()]}</td>`).join("") + "</tr>").join("") +
      "</table>";
  } catch (err) {
    document.getElementById("category-metrics-table").textContent = "";
  }
}

// ----------------------------------------------------------------- persons

async function loadPersons() {
  const [data, suggestions] = await Promise.all([
    api("/api/persons"),
    api("/api/merge_suggestions").catch(() => ({ suggestions: [] }))]);

  const box = document.getElementById("merge-suggestions");
  const list = document.getElementById("merge-list");
  list.innerHTML = "";
  box.hidden = !suggestions.suggestions.length;
  for (const group of suggestions.suggestions) {
    const row = document.createElement("div");
    row.className = "merge-row";
    const names = group.person_ids.map((id, i) =>
      `${group.names[i] || "(unnamed)"} #${id}`).join(" · ");
    row.innerHTML =
      `<span>${names} <i>(${(group.avg_similarity * 100).toFixed(0)}%)</i></span>` +
      `<button>${t("persons.merge")}</button>`;
    row.querySelector("button").addEventListener("click", async () => {
      const [target, ...sources] = group.person_ids;
      await api("/api/persons/merge_batch", {
        method: "POST", json: { target_id: target, source_ids: sources } });
      loadPersons();
    });
    list.appendChild(row);
  }

  const grid = document.getElementById("persons-grid");
  grid.innerHTML = "";
  for (const person of data.persons) {
    const card = document.createElement("div");
    card.className = "person-card";
    card.innerHTML =
      `<img src="/api/person_thumbnail/${person.id}` +
      (state.token ? "?token=" + encodeURIComponent(state.token) : "") + `"
         onerror="this.style.visibility='hidden'">` +
      `<input value="${person.name || ""}" placeholder="${t("persons.unnamed")}">` +
      `<div class="caption">${person.photo_count} photos</div>` +
      `<div class="person-actions">` +
      `<button class="view-btn">${t("nav.gallery")}</button>` +
      `<button class="del-btn">${t("persons.delete")}</button></div>`;
    const input = card.querySelector("input");
    input.addEventListener("change", async () => {
      await api(`/api/persons/${person.id}/rename`, {
        method: "POST", json: { name: input.value } });
    });
    card.querySelector(".view-btn").addEventListener("click", () => {
      switchView("gallery");
      document.getElementById("person-filter").value = person.id;
      state.page = 1;
      loadGallery();
    });
    card.querySelector(".del-btn").addEventListener("click", async () => {
      await api(`/api/persons/${person.id}`, { method: "DELETE" });
      loadPersons();
    });
    grid.appendChild(card);
  }
}

// --------------------------------------------------------------- comparison

let currentPair = null;

const PAIR_METRICS = [
  ["aesthetic", "gallery.aesthetic"], ["tech_sharpness", "gallery.sharpness"],
  ["exposure_score", "gallery.exposure"], ["comp_score", "gallery.composition"],
];

async function loadPair() {
  const data = await api("/api/comparison/next_pair");
  const status = document.getElementById("comparison-status");
  if (!data.pair) {
    currentPair = null;
    status.textContent = data.message || "no pairs";
    return;
  }
  currentPair = data.pair;
  document.getElementById("pair-a").src = thumbUrl(data.pair[0].path, 640);
  document.getElementById("pair-b").src = thumbUrl(data.pair[1].path, 640);
  status.textContent = "";
  try {
    const paths = data.pair.map((p) => p.path).join(",");
    const metrics = await api("/api/comparison/photo_metrics?paths=" +
                              encodeURIComponent(paths));
    for (const [el, photo] of [["metrics-a", data.pair[0]],
                               ["metrics-b", data.pair[1]]]) {
      const m = metrics[photo.path] || {};
      document.getElementById(el).innerHTML = PAIR_METRICS.map(
        ([col, label]) => m[col] == null ? "" :
          `<span>${t(label)} <b>${Number(m[col]).toFixed(1)}</b></span>`
      ).join(" ");
    }
  } catch (err) { /* metric strip is optional */ }
}

async function vote(winner) {
  if (!currentPair) return;
  const res = await api("/api/comparison/submit", {
    method: "POST",
    json: { photo_a: currentPair[0].path, photo_b: currentPair[1].path,
            winner },
  });
  document.getElementById("comparison-status").textContent =
    `${t("comparison.submitted")} (${res.count})`;
  loadPair();
}

document.querySelectorAll("[data-vote]").forEach((b) =>
  b.addEventListener("click", () => vote(b.dataset.vote)));

// keyboard voting: arrows pick a side, t = tie, s = skip
document.addEventListener("keydown", (e) => {
  if (state.view !== "comparison" || !currentPair) return;
  if (e.target.tagName === "INPUT" || e.target.tagName === "SELECT") return;
  const key = { ArrowLeft: "a", ArrowRight: "b", t: "tie", s: "skip" }[e.key];
  if (key) { e.preventDefault(); vote(key); }
});

// ----------------------------------------------------------------- boot

document.getElementById("lang-select").addEventListener("change", async (e) => {
  await loadLanguage(e.target.value);
  loadFilterOptions();
});

async function boot() {
  document.getElementById("lang-select").value = state.lang;
  await loadLanguage(state.lang);
  try {
    const me = await api("/api/auth/me");
    if (me.auth_required && !state.token) { showLogin(); return; }
    document.getElementById("logout-btn").hidden = !me.auth_required;
  } catch (err) { return; }
  hideLogin();
  await loadFilterOptions();
  switchView("gallery");
}

boot();
