/* Facet viewer — build-free SPA over the JSON API.
 *
 * Covers the reference client's feature set (gallery with filters/sorting/
 * infinite detail, stats dashboards, person management, pairwise comparison
 * voting, JWT auth, i18n) in plain JavaScript served by run_api.py --static.
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

function galleryParams() {
  const params = new URLSearchParams({
    page: state.page, page_size: state.pageSize, sort: state.sort,
    order: document.getElementById("order-asc").checked ? "asc" : "desc",
    hide_blinks: document.getElementById("hide-blinks").checked,
    hide_bursts: document.getElementById("hide-bursts").checked,
    hide_duplicates: document.getElementById("hide-duplicates").checked,
  });
  const type = document.getElementById("type-filter").value;
  if (type) params.set("type", type);
  const search = document.getElementById("search").value.trim();
  if (search) params.set("search", search);
  for (const [id, key] of [["camera-filter", "camera"],
                           ["category-filter", "category"],
                           ["tag-filter", "tag"]]) {
    const val = document.getElementById(id).value;
    if (val) params.set(key, val);
  }
  if (document.getElementById("favorites-only").checked)
    params.set("favorites_only", "true");
  return params;
}

async function loadGallery() {
  const data = await api("/api/photos?" + galleryParams());
  const grid = document.getElementById("grid");
  grid.innerHTML = "";
  for (const photo of data.photos) {
    const card = document.createElement("div");
    card.className = "card";
    const score = photo.aggregate == null ? "—" : photo.aggregate.toFixed(1);
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
  const [opts, counts, config] = await Promise.all([
    api("/api/filter_options"), api("/api/type_counts"), api("/api/config")]);
  state.config = config;
  const fill = (id, values) => {
    const select = document.getElementById(id);
    for (const v of values) {
      const opt = document.createElement("option");
      opt.value = v; opt.textContent = v;
      select.appendChild(opt);
    }
  };
  fill("camera-filter", opts.cameras);
  fill("category-filter", opts.categories);
  fill("tag-filter", opts.tags.slice(0, 60));

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

for (const id of ["type-filter", "camera-filter", "category-filter",
                  "tag-filter", "hide-blinks", "hide-bursts",
                  "hide-duplicates", "favorites-only", "order-asc"]) {
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

function openModal(photo) {
  const modal = document.getElementById("photo-modal");
  modal.hidden = false;
  document.getElementById("modal-img").src = thumbUrl(photo.path, 1280);
  const meta = document.getElementById("modal-meta");
  let html = `<h3>${photo.filename}</h3>`;
  for (const [col, label] of METRICS) {
    const val = photo[col];
    if (val == null) continue;
    html += `<div class="metric"><span>${t(label)}</span>` +
      `<b>${Number(val).toFixed(2)}</b></div>` +
      `<div class="bar"><div style="width:${Math.min(100, val * 10)}%"></div></div>`;
  }
  html += `<div class="metric"><span>${t("gallery.category")}</span>` +
    `<b>${photo.category || "—"}</b></div>`;
  if (photo.tags && photo.tags.length)
    html += `<div class="metric"><span>${t("gallery.tags")}</span>` +
      `<b>${photo.tags.join(", ")}</b></div>`;
  if (photo.camera_model)
    html += `<div class="metric"><span>Camera</span><b>${photo.camera_model}</b></div>`;
  if (photo.iso)
    html += `<div class="metric"><span>ISO / f</span>` +
      `<b>${photo.iso} / f${photo.f_stop || "?"}</b></div>`;
  // star rating control
  let stars = '<div class="stars">';
  for (let i = 1; i <= 5; i++) {
    stars += `<span data-star="${i}">${i <= (photo.star_rating || 0) ? "★" : "☆"}</span>`;
  }
  stars += "</div>";
  html += stars;
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
  const [overview, dist, gear, timeline, cats] = await Promise.all([
    api("/api/stats/overview"), api("/api/stats/score_distribution"),
    api("/api/stats/gear"), api("/api/stats/timeline"),
    api("/api/stats/categories")]);
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
}

// ----------------------------------------------------------------- persons

async function loadPersons() {
  const data = await api("/api/persons");
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
      `<div class="caption">${person.photo_count} photos</div>`;
    const input = card.querySelector("input");
    input.addEventListener("change", async () => {
      await api(`/api/persons/${person.id}/rename`, {
        method: "POST", json: { name: input.value } });
    });
    grid.appendChild(card);
  }
}

// --------------------------------------------------------------- comparison

let currentPair = null;

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
}

document.querySelectorAll("[data-vote]").forEach((b) =>
  b.addEventListener("click", async () => {
    if (!currentPair) return;
    const res = await api("/api/comparison/submit", {
      method: "POST",
      json: { photo_a: currentPair[0].path, photo_b: currentPair[1].path,
              winner: b.dataset.vote },
    });
    document.getElementById("comparison-status").textContent =
      `${t("comparison.submitted")} (${res.count})`;
    loadPair();
  }));

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
