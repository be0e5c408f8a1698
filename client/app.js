/* Facet viewer — DOM layer over store.js and the JSON API.
 *
 * Covers the reference client's feature surface (client/src/app/features/*)
 * in build-free JavaScript: infinite-scroll gallery with the full filter
 * vocabulary and lazy per-filter dropdowns, per-photo score breakdown with
 * weighted contributions and per-user ratings, five-tab statistics
 * (gear / categories / distribution / timeline / correlations) with
 * per-category drill-down and a weight editor, person management with
 * avatar selection and merge-suggestion review, keyboard-driven pairwise
 * voting with learned-weight review, JWT auth with edition login, i18n.
 */

"use strict";

const S = window.FacetStore;

const state = {
  token: localStorage.getItem("facet_token") || null,
  view: "gallery",
  lang: localStorage.getItem("facet_lang") || "en",
  catalog: {},
  config: null,
  weights: null,      // {category: {metric: fraction}} for breakdown bars
  statsTab: "gear",
  role: null,
};

const gallery = S.createGalleryStore(60);
let t = S.makeT({});

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

// photographic shutter display: numeric seconds -> "1/250s" / "2.5s"
// (pure logic lives in store.js so it executes under test)
const fmtShutter = S.fmtShutter;

function toast(message) {
  const el = document.getElementById("toast");
  el.textContent = message;
  el.hidden = false;
  clearTimeout(toast._timer);
  toast._timer = setTimeout(() => { el.hidden = true; }, 2500);
}

// (no regex literals in this file: the contract tests' literal stripper
// only understands strings and comments)
const esc = S.escapeHtml;

// ----------------------------------------------------------------- i18n

async function loadLanguage(lang) {
  const data = await api("/api/i18n/" + lang);
  state.lang = data.language;
  state.catalog = data.catalog;
  t = S.makeT(state.catalog);
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

// translated name for a scoring category / pattern / sort column, falling
// back to the raw identifier when no catalog entry exists
const catName = (cat) => state.catalog["category_names." + cat] || cat;
const patName = (p) => state.catalog["composition_patterns." + p] || p;
const sortName = (col) => state.catalog["sort_options." + col] || col;

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
  document.querySelectorAll("nav button[data-view]").forEach((b) =>
    b.classList.toggle("active", b.dataset.view === name));
  for (const view of ["gallery", "stats", "persons", "comparison"]) {
    document.getElementById(view + "-view").hidden = view !== name;
  }
  if (name === "gallery" && !gallery.photos.length) reloadGallery();
  if (name === "stats") loadStats();
  if (name === "persons") loadPersons();
  if (name === "comparison") { loadPair(); loadComparisonStats(); loadVoteHistory(); }
}

document.querySelectorAll("nav button[data-view]").forEach((b) =>
  b.addEventListener("click", () => switchView(b.dataset.view)));

// ----------------------------------------------------------------- gallery

// DOM id -> store filter field (numeric/text inputs)
const FILTER_INPUTS = [
  ["min-score", "min_score"], ["max-score", "max_score"],
  ["min-aesthetic", "min_aesthetic"], ["max-aesthetic", "max_aesthetic"],
  ["min-quality", "min_quality"], ["max-quality", "max_quality"],
  ["min-sharpness", "min_sharpness"], ["max-sharpness", "max_sharpness"],
  ["min-face-quality", "min_face_quality"],
  ["min-iso", "min_iso"], ["max-iso", "max_iso"],
  ["min-f-stop", "min_f_stop"], ["max-f-stop", "max_f_stop"],
  ["min-focal", "min_focal"], ["max-focal", "max_focal"],
  ["min-faces", "min_faces"], ["max-faces", "max_faces"],
  ["min-rating", "min_rating"],
  ["require-tags", "require_tags"], ["exclude-tags", "exclude_tags"],
];
const FILTER_SELECTS = [
  ["type-filter", "type"], ["camera-filter", "camera"],
  ["lens-filter", "lens"], ["category-filter", "category"],
  ["tag-filter", "tag"], ["person-filter", "person_id"],
  ["pattern-filter", "pattern"],
];
const FILTER_CHECKS = [
  ["hide-blinks", "hide_blinks"], ["hide-bursts", "hide_bursts"],
  ["hide-duplicates", "hide_duplicates"], ["hide-rejected", "hide_rejected"],
  ["favorites-only", "favorites_only"], ["monochrome-only", "monochrome_only"],
];

function readFiltersFromDom() {
  const f = gallery.filters;
  for (const [id, field] of FILTER_INPUTS) {
    f[field] = document.getElementById(id).value;
  }
  for (const [id, field] of FILTER_SELECTS) {
    f[field] = document.getElementById(id).value;
  }
  for (const [id, field] of FILTER_CHECKS) {
    f[field] = document.getElementById(id).checked;
  }
  f.search = document.getElementById("search").value.trim();
  f.date_from = document.getElementById("date-from").value.split("-").join(":");
  f.date_to = document.getElementById("date-to").value.split("-").join(":");
  gallery.order = document.getElementById("order-asc").checked ? "asc" : "desc";
  const badge = document.getElementById("filter-badge");
  const n = S.activeFilterCount(f);
  badge.hidden = n === 0;
  badge.textContent = String(n);
}

// rich hover tooltip, mirroring the reference's photo-tooltip component
// (client/src/app/features/gallery/photo-tooltip.component.ts). The
// HTML assembly and the placement math are pure store.js functions
// (S.tooltipHtml / S.tooltipPosition) so they execute under test; this
// file only touches the DOM.
function showTooltip(event, photo) {
  const tip = document.getElementById("photo-tooltip");
  tip.innerHTML = S.tooltipHtml(photo, t, state.catalog);
  tip.hidden = false;
  moveTooltip(event);
}

function moveTooltip(event) {
  const tip = document.getElementById("photo-tooltip");
  if (tip.hidden) return;
  const rect = tip.getBoundingClientRect();
  const pos = S.tooltipPosition(
    { x: event.clientX, y: event.clientY },
    { width: rect.width, height: rect.height },
    { width: window.innerWidth, height: window.innerHeight });
  tip.style.left = pos.left + "px";
  tip.style.top = pos.top + "px";
}

function hideTooltip() {
  document.getElementById("photo-tooltip").hidden = true;
}

const selection = S.createSelectionStore();

function updateSelectionBar() {
  const bar = document.getElementById("selection-bar");
  bar.hidden = selection.size === 0;
  document.getElementById("selection-count").textContent =
    t("gallery.selection.count", { n: selection.size });
}

function photoCard(photo) {
  const card = document.createElement("div");
  card.className = "card" + (selection.has(photo.path) ? " selected" : "");
  const score = photo.aggregate == null ? "—" : photo.aggregate.toFixed(1);
  card.addEventListener("mouseenter", (e) => showTooltip(e, photo));
  card.addEventListener("mousemove", moveTooltip);
  card.addEventListener("mouseleave", hideTooltip);
  card.innerHTML =
    `<img loading="lazy" src="${thumbUrl(photo.path, 320)}">` +
    `<span class="score ${photo.aggregate >= 7 ? "good" : ""}">${score}</span>` +
    (photo.is_favorite ? '<span class="fav-flag">♥</span>' : "") +
    `<span class="sel" title="${t("gallery.select")}">✓</span>` +
    `<div class="caption">${esc(photo.filename || photo.path)}</div>`;
  const toggleSel = () => {
    selection.toggle(photo.path);
    card.classList.toggle("selected", selection.has(photo.path));
    updateSelectionBar();
  };
  card.querySelector(".sel").addEventListener("click", (e) => {
    e.stopPropagation();
    toggleSel();
  });
  card.addEventListener("click", (e) => {
    if (e.ctrlKey || e.metaKey || e.shiftKey) toggleSel();
    else openModal(photo);
  });
  return card;
}

const _hideDetails = document.getElementById("hide-details");
_hideDetails.addEventListener("change", () => {
  document.getElementById("grid").classList.toggle("hide-details",
                                                   _hideDetails.checked);
});
// browsers restore form state across reload — sync the grid class once
document.getElementById("grid").classList.toggle("hide-details",
                                                 _hideDetails.checked);

document.getElementById("clear-selection-btn").addEventListener("click", () => {
  selection.clear();
  document.querySelectorAll("#grid .card.selected").forEach((el) =>
    el.classList.remove("selected"));
  updateSelectionBar();
});

document.getElementById("copy-paths-btn").addEventListener("click", async () => {
  const text = selection.asFilenames();
  try {
    await navigator.clipboard.writeText(text);
  } catch (err) {
    const ta = document.createElement("textarea");
    ta.value = text;
    document.body.appendChild(ta);
    ta.select();
    document.execCommand("copy");
    ta.remove();
  }
  toast(t("notifications.copied_count_plural", { n: selection.size }));
});

document.getElementById("download-selected-btn").addEventListener("click",
  async () => {
    // one original per selected photo via /api/image, spaced out like the
    // reference's downloadSelected to dodge browser download throttling
    const paths = Array.from(selection.paths);
    for (const path of paths) {
      const a = document.createElement("a");
      a.href = "/api/image" + path +
        (state.token ? "?token=" + encodeURIComponent(state.token) : "");
      a.download = path.split("/").pop();
      document.body.appendChild(a);
      a.click();
      a.remove();
      if (path !== paths[paths.length - 1]) {
        await new Promise((resolve) => setTimeout(resolve, 300));
      }
    }
    toast(t("notifications.downloaded_count_plural", { n: paths.length }));
  });

document.getElementById("favorite-selected-btn").addEventListener("click",
  async () => {
    await Promise.all(Array.from(selection.paths).map((path) =>
      api("/api/photos/favorite", {
        method: "POST", json: { path, favorite: true } })));
    toast(t("gallery.selection.favorited", { n: selection.size }));
    reloadGallery();    // refetch shows the favorite flags
  });

async function loadNextPage() {
  if (gallery.loading || !gallery.hasMore) return;
  gallery.loading = true;
  document.getElementById("load-status").textContent = t("gallery.loading");
  try {
    const data = await api("/api/photos?" + gallery.nextQuery());
    const added = gallery.appendPage(data);
    const grid = document.getElementById("grid");
    for (const photo of added) grid.appendChild(photoCard(photo));
    document.getElementById("gallery-count").textContent =
      t("gallery.count", { shown: gallery.photos.length,
                           total: gallery.total });
    document.getElementById("load-status").textContent = gallery.hasMore
      ? "" : (gallery.photos.length ? t("gallery.end") : t("gallery.no_results"));
  } finally {
    gallery.loading = false;
  }
}

function reloadGallery(urlMode) {
  readFiltersFromDom();
  gallery.reset();
  document.getElementById("grid").innerHTML = "";
  // deep-linkable filter state, like the reference store's queryParams
  // sync (gallery.store.ts:547): the URL always reflects the active view;
  // each distinct filter state is a history entry so back/forward walk
  // through filter states, EXCEPT debounced search typing which replaces
  // in place (one entry per keystroke pause would pollute history)
  if (urlMode !== "skip") {
    const params = S.filtersToUrl(gallery.filters, gallery.sort,
                                  gallery.order).toString();
    const current = location.search.startsWith("?")
      ? location.search.slice(1) : location.search;
    if (params !== current) {
      const url = params ? "?" + params : location.pathname;
      if (urlMode === "replace") history.replaceState(null, "", url);
      else history.pushState(null, "", url);
    }
  }
  loadNextPage();
}

/** location.search -> DOM controls + store (boot and back/forward).
 *  An empty search resets every control to its default, so navigating
 *  back to the unfiltered state actually clears the drawer. */
function applyFiltersFromUrl() {
  const { filters, sort, order } = S.filtersFromUrl(location.search);
  for (const [id, field] of FILTER_INPUTS) {
    document.getElementById(id).value = filters[field] || "";
  }
  for (const [id, field] of FILTER_SELECTS) {
    document.getElementById(id).value = filters[field] || "";
  }
  for (const [id, field] of FILTER_CHECKS) {
    document.getElementById(id).checked = !!filters[field];
  }
  document.getElementById("search").value = filters.search || "";
  document.getElementById("date-from").value =
    (filters.date_from || "").split(":").join("-");
  document.getElementById("date-to").value =
    (filters.date_to || "").split(":").join("-");
  document.getElementById("order-asc").checked = order === "asc";
  gallery.sort = sort;
  const sortSel = document.getElementById("sort-select");
  if (sortSel.options.length) sortSel.value = sort;
  return true;
}

window.addEventListener("popstate", () => {
  if (state.view !== "gallery") return;
  applyFiltersFromUrl();
  reloadGallery("skip");
});

// infinite scroll: load the next page when the sentinel becomes visible
new IntersectionObserver((entries) => {
  if (entries.some((e) => e.isIntersecting) && state.view === "gallery") {
    loadNextPage();
  }
}, { rootMargin: "600px" }).observe(document.getElementById("scroll-sentinel"));

// ---- filter dropdowns (lazy per-filter endpoints with counts)

function fillOptions(id, rows, valueOf, labelOf) {
  const select = document.getElementById(id);
  const current = select.value;
  select.querySelectorAll("option:not(:first-child)").forEach((o) => o.remove());
  for (const row of rows || []) {
    const opt = document.createElement("option");
    opt.value = valueOf(row);
    opt.textContent = labelOf(row);
    select.appendChild(opt);
  }
  select.value = current;   // keep the active selection across refreshes
}

async function loadFilterOptions() {
  const [config, counts, weights] = await Promise.all([
    api("/api/config"), api("/api/type_counts"),
    api("/api/stats/category_weights").catch(() => ({ weights: {} }))]);
  state.config = config;
  state.weights = weights.weights || {};
  state.categories = Object.keys(state.weights).sort();

  // apply the server's display knobs (viewer.display, served through
  // /api/config like the reference's VIEWER_CONFIG)
  const display = config.display || {};
  if (display.card_width_px) {
    document.getElementById("grid").style.setProperty(
      "--card-w", display.card_width_px + "px");
  }

  // each dropdown family loads from its own lazy endpoint, with counts
  const lazy = [
    ["cameras", "camera-filter", (r) => r[0], (r) => `${r[0]} (${r[1]})`],
    ["lenses", "lens-filter", (r) => r[0], (r) => `${r[0]} (${r[1]})`],
    ["categories", "category-filter",
     (r) => r[0], (r) => `${catName(r[0])} (${r[1]})`],
    ["tags", "tag-filter", (r) => r[0], (r) => `${r[0]} (${r[1]})`],
    ["patterns", "pattern-filter",
     (r) => r[0], (r) => `${patName(r[0])} (${r[1]})`],
    ["persons", "person-filter",
     (r) => r[0], (r) => `${r[1] || "#" + r[0]} (${r[2]})`],
  ];
  await Promise.all(lazy.map(async ([family, id, valueOf, labelOf]) => {
    const data = await api("/api/filter_options/" + family)
      .catch(() => ({ [family]: [] }));
    fillOptions(id, data[family], valueOf, labelOf);
  }));

  const typeSelect = document.getElementById("type-filter");
  const currentType = typeSelect.value;
  typeSelect.innerHTML = "";
  for (const [name, count] of Object.entries(counts)) {
    const opt = document.createElement("option");
    opt.value = name === "all" ? "" : name;
    opt.textContent = `${t("type." + name)} (${count})`;
    typeSelect.appendChild(opt);
  }
  typeSelect.value = currentType;

  const sortSelect = document.getElementById("sort-select");
  sortSelect.innerHTML = "";
  const groups = config.sort_options || {};
  for (const [group, cols] of Object.entries(groups)) {
    const optgroup = document.createElement("optgroup");
    optgroup.label = state.catalog["sort_groups." + group] || group;
    for (const col of cols) {
      const opt = document.createElement("option");
      opt.value = col;
      opt.textContent = sortName(col);
      if (col === gallery.sort) opt.selected = true;
      optgroup.appendChild(opt);
    }
    sortSelect.appendChild(optgroup);
  }

  document.getElementById("type-counts").innerHTML =
    Object.entries(counts).map(([k, v]) =>
      `<div><span>${t("type." + k)}</span><span>${v}</span></div>`).join("");
}

for (const [id] of [...FILTER_SELECTS, ...FILTER_CHECKS]) {
  document.getElementById(id).addEventListener("change", () => reloadGallery());
}
for (const [id] of FILTER_INPUTS) {
  document.getElementById(id).addEventListener("change", () => reloadGallery());
}
for (const id of ["date-from", "date-to", "order-asc"]) {
  document.getElementById(id).addEventListener("change", () => reloadGallery());
}
document.getElementById("sort-select").addEventListener("change", (e) => {
  gallery.sort = e.target.value;
  reloadGallery();
});
let searchTimer;
document.getElementById("search").addEventListener("input", () => {
  clearTimeout(searchTimer);
  searchTimer = setTimeout(() => {
    // first search keystroke pushes a new history entry (so Back undoes
    // the search); subsequent refinements replace in place
    const hadSearch = new URLSearchParams(location.search).has("search");
    reloadGallery(hadSearch ? "replace" : undefined);
  }, 350);
});
document.getElementById("reset-filters").addEventListener("click", () => {
  for (const [id] of FILTER_INPUTS) document.getElementById(id).value = "";
  for (const [id] of FILTER_SELECTS) document.getElementById(id).value = "";
  for (const [id, field] of FILTER_CHECKS) {
    document.getElementById(id).checked = S.FILTER_PARAMS[field][1];
  }
  document.getElementById("search").value = "";
  document.getElementById("date-from").value = "";
  document.getElementById("date-to").value = "";
  reloadGallery();
});

// ------------------------------------------------------------ photo modal

function contributionHtml(photo) {
  const rows = S.scoreBreakdown(photo, (state.weights || {})[photo.category]);
  let html = "";
  for (const row of rows) {
    const note = row.contribution != null && row.col !== "aggregate"
      ? ` <i>(${Math.round(row.weight * 100)}% → ${row.contribution.toFixed(2)})</i>`
      : "";
    html += `<div class="metric"><span>${t(row.label)}${note}</span>` +
      `<b>${row.value.toFixed(2)}</b></div>` +
      `<div class="bar"><div style="width:${Math.min(100, row.value * 10)}%"></div></div>`;
  }
  return html;
}

// faces panel: person chips + face-level assignment, mirroring the
// reference's face/person selector dialogs (client/src/app/features/
// gallery/{face,person}-selector-dialog.component.ts)
async function loadModalFaces(photo) {
  const box = document.getElementById("modal-faces");
  box.innerHTML = "";
  let faces;
  try {
    faces = (await api("/api/faces" + photo.path)).faces;
  } catch (err) { return; }
  if (!faces || !faces.length) return;

  box.innerHTML = `<h4>${t("gallery.faces_in_photo", { n: faces.length })}</h4>`;
  // reuse the cached persons list; only fetch when nothing is cached yet
  if (!state.persons) {
    state.persons = (await api("/api/persons")
      .catch(() => ({ persons: [] }))).persons;
  }
  const persons = state.persons;
  const personOptions = `<option value="">${t("manage_persons.select_person")}</option>` +
    persons.map((p) =>
      `<option value="${p.id}">${esc(p.name) || t("persons.unnamed") + " #" + p.id}</option>`)
      .join("");

  // one chip per already-identified person: click filters the gallery,
  // x detaches the person from this photo
  const seen = new Set();
  const chips = document.createElement("div");
  chips.className = "person-chips";
  for (const face of faces) {
    if (!face.person_id || seen.has(face.person_id)) continue;
    seen.add(face.person_id);
    const chip = document.createElement("span");
    chip.className = "person-chip";
    chip.innerHTML =
      `<span class="chip-name">${esc(face.person_name) || t("persons.unnamed") + " #" + face.person_id}</span>` +
      `<span class="chip-x" title="${t("manage_persons.remove_person_title")}">×</span>`;
    chip.querySelector(".chip-name").addEventListener("click", () => {
      document.getElementById("photo-modal").hidden = true;
      document.getElementById("person-filter").value = face.person_id;
      reloadGallery();
    });
    chip.querySelector(".chip-x").addEventListener("click", async () => {
      await api("/api/photos/unassign_person", {
        method: "POST",
        json: { path: photo.path, person_id: face.person_id } });
      toast(t("notifications.person_removed"));
      loadModalFaces(photo);
    });
    chips.appendChild(chip);
  }
  if (seen.size) box.appendChild(chips);

  // unidentified faces get an assignment dropdown each
  const unassigned = faces.filter((f) => !f.person_id);
  for (const face of unassigned) {
    const row = document.createElement("div");
    row.className = "face-row";
    row.innerHTML =
      `<img src="/api/face_thumbnail/${face.id}` +
      (state.token ? "?token=" + encodeURIComponent(state.token) : "") +
      `" onerror="this.style.visibility='hidden'">` +
      `<span class="hint">${t("gallery.face_n", { n: face.face_index + 1 })}` +
      ` (${Math.round((face.confidence || 0) * 100)}%)</span>` +
      `<select>${personOptions}</select>`;
    row.querySelector("select").addEventListener("change", async (e) => {
      if (!e.target.value) return;
      await api(`/api/faces/${face.id}/assign`, {
        method: "POST", json: { person_id: Number(e.target.value) } });
      toast(t("notifications.faces_assigned"));
      loadModalFaces(photo);
    });
    box.appendChild(row);
  }

  // assign every unidentified face at once
  if (unassigned.length > 1) {
    const all = document.createElement("div");
    all.className = "face-row";
    all.innerHTML =
      `<span>${t("gallery.assign_all_faces", { n: unassigned.length })}</span>` +
      `<select>${personOptions}</select>`;
    all.querySelector("select").addEventListener("change", async (e) => {
      if (!e.target.value) return;
      await api("/api/photos/assign_all_faces", {
        method: "POST",
        json: { path: photo.path, person_id: Number(e.target.value) } });
      toast(t("notifications.faces_assigned"));
      loadModalFaces(photo);
    });
    box.appendChild(all);
  }
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
  hideTooltip();
  modalPhoto = photo;
  const modal = document.getElementById("photo-modal");
  modal.hidden = false;
  document.getElementById("modal-img").src = thumbUrl(photo.path, 1280);
  const meta = document.getElementById("modal-meta");
  let html = `<h3>${esc(photo.filename)}</h3>`;
  html += contributionHtml(photo);
  // admins can pin the category (reference: comparison override dialog,
  // POST /api/comparison/override_category)
  const canOverride = state.role === "admin" || state.role === "superadmin";
  html += `<div class="metric"><span>${t("gallery.category")}</span>` +
    (canOverride && state.categories
      ? `<select id="override-category"><option value="">—</option>` +
        state.categories.map((c) =>
          `<option value="${esc(c)}"${c === photo.category ? " selected" : ""}>` +
          `${catName(c)}</option>`).join("") + `</select>`
      : `<b>${photo.category ? catName(photo.category) : "—"}</b>`) +
    `</div>`;
  if (photo.composition_pattern)
    html += `<div class="metric"><span>${t("gallery.pattern")}</span>` +
      `<b>${patName(photo.composition_pattern)}</b></div>`;
  const tagCap = ((state.config || {}).display || {}).tags_per_photo ?? 4;
  if (photo.tags && photo.tags.length && tagCap > 0) {
    // cap at viewer.display.tags_per_photo like the reference's cards
    const cap = tagCap;
    const shown = photo.tags.slice(0, cap).join(", ") +
      (photo.tags.length > cap ? ` +${photo.tags.length - cap}` : "");
    html += `<div class="metric"><span>${t("gallery.tags")}</span>` +
      `<b>${esc(shown)}</b></div>`;
  }
  if (photo.camera_model)
    html += `<div class="metric"><span>${t("gallery.camera")}</span>` +
      `<b>${esc(photo.camera_model)}` +
      (photo.lens_model ? " · " + esc(photo.lens_model) : "") + `</b></div>`;
  if (photo.iso)
    html += `<div class="metric"><span>ISO / f / s</span>` +
      `<b>${photo.iso} / f${photo.f_stop || "?"} / ${fmtShutter(photo.shutter_speed)}</b></div>`;
  let stars = '<div class="stars">';
  for (let i = 1; i <= 5; i++) {
    stars += `<span data-star="${i}">${i <= (photo.star_rating || 0) ? "★" : "☆"}</span>`;
  }
  stars += "</div>";
  html += stars;
  html += `<div class="modal-actions">` +
    `<button id="fav-btn">${photo.is_favorite ? "♥" : "♡"} ${t("gallery.favorites")}</button>` +
    `<button id="reject-btn">${photo.is_rejected ? "✓ " + t("gallery.rejected") : "✗ " + t("gallery.reject")}</button>` +
    `</div>`;
  meta.innerHTML = html;
  const overrideSel = document.getElementById("override-category");
  if (overrideSel) {
    overrideSel.addEventListener("change", async () => {
      if (!overrideSel.value) return;
      try {
        const res = await api("/api/comparison/override_category", {
          method: "POST",
          json: { path: photo.path, category: overrideSel.value } });
        photo.category = res.new_category;
        gallery.patchPhoto(photo.path, { category: res.new_category });
        toast(t("gallery.category_changed", {
          old: catName(res.old_category), new: catName(res.new_category) }));
      } catch (err) {
        toast(t("compare.error.override_failed"));
      }
    });
  }
  meta.querySelectorAll("[data-star]").forEach((el) =>
    el.addEventListener("click", async () => {
      const rating = Number(el.dataset.star);
      await api("/api/photos/rating", {
        method: "POST", json: { path: photo.path, rating } });
      gallery.patchPhoto(photo.path, { star_rating: rating });
      photo.star_rating = rating;
      openModal(photo);
    }));
  document.getElementById("fav-btn").addEventListener("click", async () => {
    photo.is_favorite = photo.is_favorite ? 0 : 1;
    await api("/api/photos/favorite", {
      method: "POST", json: { path: photo.path, favorite: !!photo.is_favorite } });
    gallery.patchPhoto(photo.path, { is_favorite: photo.is_favorite });
    openModal(photo);
  });
  document.getElementById("reject-btn").addEventListener("click", async () => {
    photo.is_rejected = photo.is_rejected ? 0 : 1;
    await api("/api/photos/rejected", {
      method: "POST", json: { path: photo.path, rejected: !!photo.is_rejected } });
    gallery.patchPhoto(photo.path, { is_rejected: photo.is_rejected });
    openModal(photo);
  });
  loadModalFaces(photo);
  loadSimilar(photo);
}

document.getElementById("modal-close").addEventListener("click", () => {
  document.getElementById("photo-modal").hidden = true;
});
document.getElementById("photo-modal").addEventListener("click", (e) => {
  if (e.target.id === "photo-modal")
    document.getElementById("photo-modal").hidden = true;
});

// keyboard navigation inside the photo modal: Escape closes, arrows step
// through the loaded gallery in its current sort order
let modalPhoto = null;

function stepModal(delta) {
  if (!modalPhoto) return;
  const idx = gallery.photos.findIndex((p) => p.path === modalPhoto.path);
  if (idx < 0) return;     // photo no longer in the loaded gallery
  const next = gallery.photos[idx + delta];
  if (next) openModal(next);
}

document.addEventListener("keydown", (e) => {
  const modal = document.getElementById("photo-modal");
  if (modal.hidden) return;
  if (e.key === "Escape") { modal.hidden = true; return; }
  if (e.target.tagName === "INPUT" || e.target.tagName === "SELECT") return;
  if (e.key === "ArrowLeft") { e.preventDefault(); stepModal(-1); }
  if (e.key === "ArrowRight") { e.preventDefault(); stepModal(1); }
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

function htmlTable(rows, cols, headers) {
  return "<table><tr>" +
    cols.map((c, i) => `<th>${headers ? headers[i] : c}</th>`).join("") +
    "</tr>" + rows.map((r) => "<tr>" + cols.map((c) =>
      `<td>${r[c] ?? "—"}</td>`).join("") + "</tr>").join("") + "</table>";
}

document.querySelectorAll("#stats-tabs button").forEach((b) =>
  b.addEventListener("click", () => {
    state.statsTab = b.dataset.tab;
    document.querySelectorAll("#stats-tabs button").forEach((x) =>
      x.classList.toggle("active", x === b));
    document.querySelectorAll(".stats-tab").forEach((pane) => {
      pane.hidden = pane.id !== "stats-tab-" + state.statsTab;
    });
    loadStatsTab(state.statsTab);
  }));

// stats-wide drill-down (date range + category) applied to every tab,
// mirroring the reference stats page's shared filter params
function statsQuery() {
  const params = new URLSearchParams();
  const cat = document.getElementById("stats-filter-category").value;
  const from = document.getElementById("stats-date-from").value;
  const to = document.getElementById("stats-date-to").value;
  if (cat) params.set("category", cat);
  if (from) params.set("date_from", from);
  if (to) params.set("date_to", to);
  const qs = params.toString();
  return qs ? "?" + qs : "";
}

function reloadStats() {
  for (const key of Object.keys(_statsLoaded)) delete _statsLoaded[key];
  loadStats();
}

["stats-filter-category", "stats-date-from", "stats-date-to"].forEach((id) =>
  document.getElementById(id).addEventListener("change", reloadStats));

async function loadStats() {
  const fc = document.getElementById("stats-filter-category");
  if (!fc.options.length && state.categories) {
    fc.innerHTML = `<option value="">${t("filter.all_categories")}</option>` +
      state.categories.map((c) =>
        `<option value="${esc(c)}">${catName(c)}</option>`).join("");
  }
  const overview = await api("/api/stats/overview" + statsQuery());
  const cards = [
    [t("stats.total_photos"), overview.total_photos],
    [t("stats.avg_score"), overview.avg_score],
    [t("stats.faces"), overview.faces],
    [t("stats.persons"), overview.persons],
    [t("stats.blinks"), overview.blinks],
    [t("quality.excellent"), overview.quality_counts.excellent],
  ];
  document.getElementById("stats-cards").innerHTML = cards.map(
    ([label, value]) =>
      `<div class="stat-card"><div class="value">${value ?? "—"}</div>` +
      `<div class="label">${label}</div></div>`).join("");
  state._overview = overview;
  loadStatsTab(state.statsTab);
}

const _statsLoaded = {};

async function loadStatsTab(tab) {
  // overview cards refresh every visit; tab bodies load lazily once
  if (tab === "gear" && !_statsLoaded.gear) {
    _statsLoaded.gear = true;
    const [gear, settings] = await Promise.all([
      api("/api/stats/gear" + statsQuery()), api("/api/stats/settings" + statsQuery()).catch(() => null)]);
    document.getElementById("gear-tables").innerHTML =
      htmlTable(gear.cameras.slice(0, 12),
                ["camera", "count", "avg_score"],
                [t("stats.camera"), t("stats.count"), t("stats.avg_score")]) +
      htmlTable(gear.lenses.slice(0, 12),
                ["lens", "count", "avg_score"],
                [t("stats.lens"), t("stats.count"), t("stats.avg_score")]);
    if (settings) {
      const isoB = [100, 200, 400, 800, 1600, 3200, 6400, 12800, 102400];
      barChart("iso-chart", isoB.map((b) => "≤" + b),
               S.bucketize(settings.iso, isoB), "#c98a3d");
      const apB = [1.4, 2, 2.8, 4, 5.6, 8, 11, 16, 32];
      barChart("aperture-chart", apB.map((b) => "f" + b),
               S.bucketize(settings.aperture, apB), "#7a5cc9");
      const flB = [24, 35, 50, 85, 135, 200, 400, 800];
      barChart("focal-chart", flB.map((b) => b + "mm"),
               S.bucketize(settings.focal_length, flB), "#3da3a0");
    }
  }
  if (tab === "categories" && !_statsLoaded.categories) {
    _statsLoaded.categories = true;
    const cats = await api("/api/stats/categories" + statsQuery());
    const rows = cats.categories.map((c) => Object.assign({}, c, {
      category: catName(c.category),
    }));
    document.getElementById("category-table").innerHTML = htmlTable(
      rows, ["category", "count", "avg_score", "max_score"],
      [t("stats.category"), t("stats.count"), t("stats.avg_score"),
       t("stats.max_score")]);
    const names = cats.categories.map((c) => c.category);
    fillSelectOnce("metrics-category", names, () => loadCategoryMetrics());
    fillSelectOnce("weights-category", names, () => loadWeightsEditor());
    loadCategoryMetrics();
    loadWeightsEditor();
  }
  if (tab === "distribution" && !_statsLoaded.distribution) {
    _statsLoaded.distribution = true;
    const dist = await api("/api/stats/score_distribution" + statsQuery());
    barChart("dist-chart", dist.bins.map((b) => b.toFixed(1)), dist.counts);
    const q = (state._overview || {}).quality_counts || {};
    document.getElementById("quality-tiers").innerHTML = htmlTable(
      ["best", "excellent", "great", "good"].map((tier) => ({
        tier: t("quality." + tier), count: q[tier] ?? "—" })),
      ["tier", "count"], [t("stats.tier"), t("stats.count")]);
  }
  if (tab === "timeline" && !_statsLoaded.timeline) {
    _statsLoaded.timeline = true;
    const timeline = await api("/api/stats/timeline" + statsQuery());
    barChart("timeline-chart", timeline.months.map((m) => m.month),
             timeline.months.map((m) => m.count), "#43b581");
    document.getElementById("timeline-table").innerHTML = htmlTable(
      timeline.months.slice(-24).reverse(),
      ["month", "count", "avg_score"],
      [t("stats.month"), t("stats.count"), t("stats.avg_score")]);
    document.getElementById("timeline-heatmap").innerHTML =
      S.svgHeatmap(S.heatmapCells(timeline.heatmap || []));
    document.getElementById("top-days-table").innerHTML = htmlTable(
      timeline.top_days || [], ["date", "count"],
      [t("stats.date"), t("stats.count")]);
  }
  if (tab === "correlations" && !_statsLoaded.correlations) {
    _statsLoaded.correlations = true;
    const catCorr = await api("/api/stats/category_correlations")
      .catch(() => null);
    state._catCorr = catCorr;
    const cats = catCorr ? Object.keys(catCorr.correlations) : [];
    fillSelectOnce("correlations-category", ["__global__", ...cats],
                   () => renderCorrelations(),
                   (c) => c === "__global__" ? t("stats.global") : catName(c));
    renderCorrelations();
    fillSelectOnce("scatter-x", SCATTER_AXES, () => renderScatter(), sortName);
    fillSelectOnce("scatter-y", SCATTER_AXES, () => renderScatter(), sortName);
    document.getElementById("scatter-x").value = "aesthetic";
    document.getElementById("scatter-y").value = "aggregate";
    renderScatter();
    const overlap = await api("/api/stats/category_overlap").catch(() => null);
    if (overlap) {
      const rows = overlap.per_category.map((r) => Object.assign({}, r, {
        name: catName(r.name),
      }));
      document.getElementById("overlap-table").innerHTML =
        `<p class="hint">${t("stats.uncategorized", { n: overlap.uncategorized })}</p>` +
        htmlTable(rows, ["name", "priority", "assigned", "matched",
                         "captured_by_higher"],
                  [t("stats.category"), t("stats.priority"),
                   t("stats.assigned"), t("stats.matched"),
                   t("stats.captured")]) +
        htmlTable(overlap.overlaps.slice(0, 15).map((o) => ({
          pair: o.pair.map(catName).join(" ↔ "), count: o.count })),
                  ["pair", "count"],
                  [t("stats.overlap_pair"), t("stats.count")]);
    }
  }
}

function fillSelectOnce(id, values, onchange, labelOf) {
  const select = document.getElementById(id);
  if (select.options.length) return;
  select.innerHTML = values.map((v) =>
    `<option value="${esc(v)}">${esc(labelOf ? labelOf(v) : catName(v))}</option>`).join("");
  select.addEventListener("change", onchange);
}

async function renderCorrelations() {
  const choice = document.getElementById("correlations-category").value
    || "__global__";
  if (choice === "__global__") {
    const corr = await api("/api/stats/correlations").catch(() => null);
    if (!corr) return;
    const rows = Object.entries(corr.correlation_with_aggregate)
      .filter(([, v]) => v != null)
      .sort((a, b) => Math.abs(b[1]) - Math.abs(a[1]))
      .map(([metric, r]) => ({ metric: sortName(metric), r: r.toFixed(3) }));
    document.getElementById("correlation-table").innerHTML =
      htmlTable(rows, ["metric", "r"], [t("stats.metric"), "r"]);
    return;
  }
  const data = state._catCorr;
  if (!data) return;
  const corr = data.correlations[choice] || {};
  const configured = (data.configured_weights || {})[choice] || {};
  const rows = data.dimensions
    .filter((d) => corr[d] != null || configured[d])
    .map((d) => ({
      metric: sortName(d),
      r: corr[d] != null ? corr[d].toFixed(3) : "—",
      weight: (configured[d] || 0) + "%",
    }))
    .sort((a, b) => Math.abs(Number(b.r) || 0) - Math.abs(Number(a.r) || 0));
  document.getElementById("correlation-table").innerHTML =
    htmlTable(rows, ["metric", "r", "weight"],
              [t("stats.metric"), "r", t("stats.weight")]);
}

// axes offered for the correlation scatter (whitelisted server-side in
// /api/stats/scatter)
const SCATTER_AXES = ["aesthetic", "quality_score", "tech_sharpness",
                      "exposure_score", "color_score", "comp_score",
                      "contrast_score", "face_quality", "aggregate",
                      "iso", "f_stop", "focal_length", "mean_luminance"];

async function renderScatter() {
  const x = document.getElementById("scatter-x").value || "aesthetic";
  const y = document.getElementById("scatter-y").value || "aggregate";
  const q = statsQuery();
  const data = await api("/api/stats/scatter" + (q ? q + "&" : "?") +
                         "x=" + x + "&y=" + y).catch(() => null);
  if (!data) return;
  document.getElementById("scatter-r").textContent = data.r != null
    ? "r = " + data.r.toFixed(3) + " (n = " + data.samples + ")" : "";
  document.getElementById("scatter-chart").innerHTML =
    S.svgScatter(data.points, { xlabel: sortName(x), ylabel: sortName(y) });
}

async function loadCategoryMetrics() {
  const cat = document.getElementById("metrics-category").value;
  if (!cat) return;
  try {
    const data = await api("/api/stats/category_metrics?category=" +
                           encodeURIComponent(cat));
    const rows = S.summarizeMetrics(data.metrics).map((r) => ({
      metric: sortName(r.metric), avg: r.avg.toFixed(2),
      min: r.min.toFixed(2), max: r.max.toFixed(2) }));
    document.getElementById("category-metrics-table").innerHTML = htmlTable(
      rows, ["metric", "avg", "min", "max"],
      [t("stats.metric"), t("stats.avg"), t("stats.min"), t("stats.max")]);
  } catch (err) {
    document.getElementById("category-metrics-table").textContent = "";
  }
}

async function loadWeightsEditor() {
  const cat = document.getElementById("weights-category").value;
  if (!cat) return;
  const data = await api("/api/stats/category_weights");
  state.weights = data.weights || {};
  const weights = state.weights[cat] || {};
  const editor = document.getElementById("weights-editor");
  editor.innerHTML = Object.entries(weights).map(([key, frac]) =>
    `<div class="range-row"><span>${sortName(key)}</span>` +
    `<input type="number" min="0" max="100" step="1" data-wkey="${key}"` +
    ` value="${Math.round(frac * 100)}"> %</div>`).join("");
  editor.querySelectorAll("[data-wkey]").forEach((el) =>
    el.addEventListener("input", scheduleWeightsPreview));
  refreshWeightsPreview();
}

// live preview: re-score the category's current top photos under the
// DRAFT weights, debounced like the reference's comparison weight panel
// (comparison.component.ts "auto-refresh preview on weight change")
function draftWeights() {
  const weights = {};
  document.querySelectorAll("#weights-editor [data-wkey]").forEach((el) => {
    weights[el.dataset.wkey] = Number(el.value);
  });
  return weights;
}

function scheduleWeightsPreview() {
  clearTimeout(scheduleWeightsPreview._timer);
  scheduleWeightsPreview._timer = setTimeout(refreshWeightsPreview, 400);
}

async function refreshWeightsPreview() {
  const cat = document.getElementById("weights-category").value;
  const box = document.getElementById("weights-preview");
  if (!cat) { box.innerHTML = ""; return; }
  try {
    const top = await api("/api/photos?category=" +
      encodeURIComponent(cat) + "&page_size=8&sort=aggregate&order=desc");
    if (!top.photos.length) { box.innerHTML = ""; return; }
    const res = await api("/api/comparison/preview_score", {
      method: "POST",
      json: { paths: top.photos.map((p) => p.path), weights: draftWeights() },
    });
    const byPath = {};
    for (const row of res.previews) byPath[row.path] = row;
    // order by the previewed score so rank changes are visible
    const ordered = top.photos.slice().sort((a, b) =>
      byPath[b.path].preview_score - byPath[a.path].preview_score);
    box.innerHTML = `<h4>${t("compare.weights.score_preview")}</h4>` +
      `<div class="preview-strip">` + ordered.map((p) => {
        const row = byPath[p.path];
        const delta = row.preview_score - (row.current_score ?? 0);
        const cls = delta > 0.05 ? "up" : delta < -0.05 ? "down" : "";
        return `<figure><img src="${thumbUrl(p.path, 128)}">` +
          `<figcaption class="${cls}">` +
          `${(row.current_score ?? 0).toFixed(1)} → ` +
          `${row.preview_score.toFixed(1)}</figcaption></figure>`;
      }).join("") + `</div>`;
  } catch (err) {
    box.innerHTML = `<p class="hint">${t("comparison.no_preview")}</p>`;
  }
}

document.getElementById("snapshot-weights").addEventListener("click",
  async () => {
    const cat = document.getElementById("weights-category").value;
    if (!cat) return;
    try {
      const res = await api("/api/comparison/snapshots", {
        method: "POST",
        json: { category: cat,
                description: "manual snapshot from the weights editor" } });
      toast(t("comparison.snapshot_saved", { id: res.snapshot_id }));
    } catch (err) {
      toast(t("comparison.error_saving_snapshot"));
    }
  });

document.getElementById("save-weights").addEventListener("click", async () => {
  const cat = document.getElementById("weights-category").value;
  const weights = {};
  document.querySelectorAll("#weights-editor [data-wkey]").forEach((el) => {
    weights[el.dataset.wkey + "_percent"] = Number(el.value);
  });
  try {
    await api("/api/stats/update_weights", {
      method: "POST", json: { category: cat, weights } });
    document.getElementById("weights-status").textContent = t("stats.saved");
    toast(t("stats.saved"));
    loadWeightsEditor();    // server may auto-correct to sum 100
  } catch (err) {
    document.getElementById("weights-status").textContent = String(err.message);
  }
});

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
      `${esc(group.names[i]) || t("persons.unnamed")} #${id}`).join(" · ");
    row.innerHTML =
      `<span>${names} <i>(${(group.avg_similarity * 100).toFixed(0)}%)</i></span>` +
      `<button class="merge-btn">${t("persons.merge")}</button>` +
      `<button class="dismiss-btn">${t("persons.dismiss")}</button>`;
    row.querySelector(".merge-btn").addEventListener("click", async () => {
      const [target, ...sources] = group.person_ids;
      await api("/api/persons/merge_batch", {
        method: "POST", json: { target_id: target, source_ids: sources } });
      toast(t("persons.merged"));
      loadPersons();
    });
    row.querySelector(".dismiss-btn").addEventListener("click", () =>
      row.remove());
    list.appendChild(row);
  }

  state.persons = data.persons;
  renderPersonsGrid();
}

// search / sort / multi-select over the cached persons list, mirroring
// the reference's manage-persons page (manage-persons.component.ts)
const personSelection = S.createSelectionStore();

function visiblePersons() {
  const query = document.getElementById("persons-search").value
    .trim().toLowerCase();
  const sort = document.getElementById("persons-sort").value;
  let rows = (state.persons || []).filter((p) =>
    !query || (p.name || "").toLowerCase().includes(query) ||
    String(p.id) === query);
  const by = {
    count_desc: (a, b) => b.photo_count - a.photo_count,
    count_asc: (a, b) => a.photo_count - b.photo_count,
    name_asc: (a, b) => (a.name || "~").localeCompare(b.name || "~"),
  }[sort];
  return rows.slice().sort(by);
}

function updatePersonsSelectionBar() {
  const bar = document.getElementById("persons-selection-bar");
  bar.hidden = personSelection.size === 0;
  document.getElementById("persons-selection-count").textContent =
    t("gallery.selection.count", { n: personSelection.size });
  document.getElementById("merge-selected-btn").disabled =
    personSelection.size < 2;
}

function renderPersonsGrid() {
  const grid = document.getElementById("persons-grid");
  grid.innerHTML = "";
  for (const person of visiblePersons()) {
    const card = document.createElement("div");
    card.className = "person-card" +
      (personSelection.has(person.id) ? " selected" : "");
    card.innerHTML =
      `<span class="sel" title="${t("gallery.select")}">✓</span>` +
      `<img src="/api/person_thumbnail/${person.id}` +
      (state.token ? "?token=" + encodeURIComponent(state.token) : "") + `"
         onerror="this.style.visibility='hidden'">` +
      `<input value="${esc(person.name || "")}" placeholder="${t("persons.unnamed")}">` +
      `<div class="caption">${t("persons.photo_count", { n: person.photo_count })}</div>` +
      `<div class="person-actions">` +
      `<button class="open-btn">${t("persons.view")}</button>` +
      `<button class="view-btn">${t("nav.gallery")}</button>` +
      `<button class="avatar-btn">${t("persons.avatar")}</button>` +
      `<button class="del-btn">${t("persons.delete")}</button></div>` +
      `<div class="face-picker" hidden></div>`;
    card.querySelector(".sel").addEventListener("click", () => {
      personSelection.toggle(person.id);
      card.classList.toggle("selected", personSelection.has(person.id));
      updatePersonsSelectionBar();
    });
    card.querySelector("img").addEventListener("click", () =>
      openPersonDetail(person.id));
    const input = card.querySelector("input");
    input.addEventListener("change", async () => {
      await api(`/api/persons/${person.id}/rename`, {
        method: "POST", json: { name: input.value } });
      toast(t("persons.renamed"));
    });
    card.querySelector(".open-btn").addEventListener("click", () =>
      openPersonDetail(person.id));
    card.querySelector(".view-btn").addEventListener("click", () => {
      switchView("gallery");
      document.getElementById("person-filter").value = person.id;
      reloadGallery();
    });
    card.querySelector(".avatar-btn").addEventListener("click", async () => {
      const picker = card.querySelector(".face-picker");
      if (!picker.hidden) { picker.hidden = true; return; }
      const faces = await api(`/api/persons/${person.id}/faces`);
      picker.innerHTML = "";
      for (const face of faces.faces.slice(0, 12)) {
        const img = document.createElement("img");
        img.src = "/api/face_thumbnail/" + face.id +
          (state.token ? "?token=" + encodeURIComponent(state.token) : "");
        img.title = face.photo_path;
        img.addEventListener("click", async () => {
          await api(`/api/persons/${person.id}/avatar`, {
            method: "POST", json: { face_id: face.id } });
          toast(t("persons.avatar_set"));
          loadPersons();
        });
        picker.appendChild(img);
      }
      picker.hidden = false;
    });
    card.querySelector(".del-btn").addEventListener("click", async () => {
      await api(`/api/persons/${person.id}`, { method: "DELETE" });
      loadPersons();
    });
    grid.appendChild(card);
  }
}

document.getElementById("persons-search").addEventListener("input",
  renderPersonsGrid);
document.getElementById("persons-sort").addEventListener("change",
  renderPersonsGrid);

document.getElementById("persons-clear-btn").addEventListener("click", () => {
  personSelection.clear();
  document.getElementById("merge-target-chooser").hidden = true;
  renderPersonsGrid();
  updatePersonsSelectionBar();
});

document.getElementById("delete-selected-btn").addEventListener("click",
  async () => {
    await api("/api/persons/delete_batch", {
      method: "POST",
      json: { person_ids: Array.from(personSelection.paths) } });
    toast(t("notifications.deleted"));
    personSelection.clear();
    updatePersonsSelectionBar();
    loadPersons();
  });

// merge: pick the surviving person among the selected ones
document.getElementById("merge-selected-btn").addEventListener("click", () => {
  const chooser = document.getElementById("merge-target-chooser");
  const list = document.getElementById("merge-target-list");
  list.innerHTML = "";
  const byId = {};
  for (const p of state.persons || []) byId[p.id] = p;
  for (const id of personSelection.paths) {
    const person = byId[id] || { id, name: "" };
    const chip = document.createElement("span");
    chip.className = "person-chip";
    chip.textContent =
      (person.name || t("persons.unnamed") + " #" + person.id);
    chip.addEventListener("click", async () => {
      const sources = Array.from(personSelection.paths)
        .filter((x) => x !== id);
      await api("/api/persons/merge_batch", {
        method: "POST", json: { target_id: id, source_ids: sources } });
      toast(t("persons.merged"));
      chooser.hidden = true;
      personSelection.clear();
      updatePersonsSelectionBar();
      loadPersons();
    });
    list.appendChild(chip);
  }
  chooser.hidden = false;
});

// person page: photos strip + share link (reference person-page.component.ts)
async function openPersonDetail(personId) {
  const box = document.getElementById("person-detail");
  const data = await api(`/api/persons/${personId}`);
  const person = data.person || data;
  const photos = data.photos || [];
  box.innerHTML =
    `<h3>${esc(person.name) || t("persons.unnamed") + " #" + personId}</h3>` +
    `<p class="hint">${t("persons.photo_count", { n: photos.length })}</p>` +
    `<div class="modal-actions">` +
    `<button id="share-link-btn">${t("persons.share_link")}</button>` +
    `<button id="detail-close-btn">${t("compare.modal.cancel")}</button></div>` +
    `<div class="preview-strip">` + photos.slice(0, 24).map((p) =>
      `<figure><img src="${thumbUrl(p.photo_path, 128)}" title="${esc(p.photo_path)}">` +
      `<figcaption>${p.aggregate == null ? "—" : p.aggregate.toFixed(1)}` +
      `</figcaption></figure>`).join("") + `</div>`;
  document.getElementById("share-link-btn").addEventListener("click",
    async () => {
      const url = location.origin +
        `/api/shared/person/${personId}?token=` +
        encodeURIComponent(data.share_token);
      try {
        await navigator.clipboard.writeText(url);
        toast(t("notifications.link_copied"));
      } catch (err) {
        toast(t("persons.link_copy_error"));
      }
    });
  document.getElementById("detail-close-btn").addEventListener("click", () => {
    box.hidden = true;
  });
  box.hidden = false;
  box.scrollIntoView({ behavior: "smooth", block: "nearest" });
}

// --------------------------------------------------------------- comparison

let currentPair = null;

const PAIR_METRICS = [
  ["aesthetic", "gallery.aesthetic"], ["tech_sharpness", "gallery.sharpness"],
  ["exposure_score", "gallery.exposure"], ["comp_score", "gallery.composition"],
];

// category context for voting (reference comparison.component.ts
// selectCategory): next_pair draws from the category, votes record it
function comparisonCategory() {
  return document.getElementById("comparison-category").value || null;
}

function fillComparisonCategories() {
  const sel = document.getElementById("comparison-category");
  if (sel.options.length || !state.categories) return;
  sel.innerHTML = `<option value="">${t("filter.all_categories")}</option>` +
    state.categories.map((c) =>
      `<option value="${esc(c)}">${catName(c)}</option>`).join("");
  sel.addEventListener("change", () => { loadPair(); loadComparisonStats(); });
}

async function loadPair() {
  fillComparisonCategories();
  const cat = comparisonCategory();
  const data = await api("/api/comparison/next_pair" +
                         (cat ? "?category=" + encodeURIComponent(cat) : ""));
  const status = document.getElementById("comparison-status");
  if (!data.pair) {
    currentPair = null;
    status.textContent = data.message || t("comparison.no_pairs");
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
            winner, category: comparisonCategory() },
  });
  document.getElementById("comparison-status").textContent =
    `${t("comparison.submitted")} (${res.count})`;
  loadPair();
  loadComparisonStats();
  loadVoteHistory();
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

async function loadComparisonStats() {
  const box = document.getElementById("comparison-stats");
  try {
    const stats = await api("/api/comparison/statistics");
    const byWinner = stats.by_winner || {};
    const rows = [
      [t("comparison.total_votes"), stats.comparisons ?? 0],
      [t("comparison.ties"), byWinner.tie ?? 0],
      [t("comparison.skips"), byWinner.skip ?? 0],
      [t("comparison.coverage"),
       stats.coverage != null ? (stats.coverage * 100).toFixed(0) + "%" : "—"],
      [t("comparison.agreement"),
       stats.agreement_accuracy != null
         ? (stats.agreement_accuracy * 100).toFixed(0) + "%" : "—"],
    ];
    box.innerHTML = rows.map(([label, value]) =>
      `<div class="metric"><span>${label}</span><b>${value}</b></div>`).join("");
  } catch (err) {
    box.textContent = "";
  }
  try {
    const learned = await api("/api/comparison/learned_weights");
    const lw = document.getElementById("learned-weights");
    const applyBtn = document.getElementById("apply-weights-btn");
    if (!learned.available) {
      lw.innerHTML = `<p class="hint">${esc(learned.message)}</p>`;
      applyBtn.hidden = true;
    } else {
      const rows = Object.keys(learned.suggested_weights).map((key) => ({
        metric: sortName(key.endsWith("_percent")
          ? key.slice(0, -"_percent".length) : key),
        current: learned.current_weights[key] + "%",
        suggested: learned.suggested_weights[key] + "%",
      }));
      lw.innerHTML =
        `<p class="hint">${t("comparison.accuracy_gain", {
          before: (learned.accuracy_before * 100).toFixed(0),
          after: (learned.accuracy_after * 100).toFixed(0) })}</p>` +
        htmlTable(rows, ["metric", "current", "suggested"],
                  [t("stats.metric"), t("comparison.current"),
                   t("comparison.suggested")]);
      applyBtn.hidden = !learned.suggest_changes;
    }
  } catch (err) {
    document.getElementById("learned-weights").textContent = "";
  }
  try {
    const snaps = await api("/api/comparison/snapshots");
    const box2 = document.getElementById("snapshots");
    if (!snaps.snapshots.length) { box2.innerHTML = ""; return; }
    box2.innerHTML = `<h4>${t("comparison.snapshots")}</h4>` +
      snaps.snapshots.slice(0, 5).map((s) =>
        `<div class="merge-row"><span>#${s.id} ${esc(s.category || "")} ` +
        `${esc(s.timestamp || "")}</span>` +
        `<button data-restore="${s.id}">${t("comparison.restore")}</button></div>`)
        .join("");
    box2.querySelectorAll("[data-restore]").forEach((b) =>
      b.addEventListener("click", async () => {
        await api(`/api/comparison/snapshots/${b.dataset.restore}/restore`, {
          method: "POST" });
        toast(t("comparison.restored"));
        loadComparisonStats();
      }));
  } catch (err) { /* snapshots panel is optional */ }
}

// vote history: recent votes with re-judge + delete, mirroring the
// reference's history tab (comparison.component.ts edit/delete votes)
async function loadVoteHistory() {
  const box = document.getElementById("vote-history");
  let rows;
  try {
    rows = (await api("/api/comparison/history?limit=15")).history;
  } catch (err) { box.textContent = ""; return; }
  if (!rows.length) {
    box.innerHTML = `<p class="hint">${t("comparison.no_votes")}</p>`;
    return;
  }
  box.innerHTML = "";
  for (const row of rows) {
    const el = document.createElement("div");
    el.className = "history-row";
    const side = (path, won) =>
      `<img src="${thumbUrl(path, 96)}" class="${won ? "won" : ""}"` +
      ` title="${esc(path)}">`;
    el.innerHTML =
      side(row.photo_a_path, row.winner === "a") +
      side(row.photo_b_path, row.winner === "b") +
      `<span class="hint">${esc(row.timestamp || "")}` +
      (row.winner === "tie" ? " · " + t("comparison.tie") : "") +
      (row.winner === "skip" ? " · " + t("comparison.skip") : "") + `</span>` +
      `<span class="history-actions">` +
      `<button data-rewinner="a" title="${t("comparison.change_winner")}">←</button>` +
      `<button data-rewinner="tie">=</button>` +
      `<button data-rewinner="b">→</button>` +
      `<button data-delvote title="${t("comparison.delete_vote")}">×</button>` +
      `</span>`;
    el.querySelectorAll("[data-rewinner]").forEach((b) =>
      b.addEventListener("click", async () => {
        await api(`/api/comparison/${row.id}`, {
          method: "PUT", json: { winner: b.dataset.rewinner } });
        toast(t("comparison.vote_updated"));
        loadVoteHistory();
        loadComparisonStats();
      }));
    el.querySelector("[data-delvote]").addEventListener("click", async () => {
      await api(`/api/comparison/${row.id}`, { method: "DELETE" });
      toast(t("comparison.vote_deleted"));
      loadVoteHistory();
      loadComparisonStats();
    });
    box.appendChild(el);
  }
}

document.getElementById("optimize-btn").addEventListener("click", async () => {
  try {
    await api("/api/comparison/optimize", {
      method: "POST", json: { category: comparisonCategory() } });
    toast(t("comparison.optimized"));
    loadComparisonStats();
  } catch (err) {
    toast(String(err.message));
  }
});

document.getElementById("apply-weights-btn").addEventListener("click",
  async () => {
    try {
      await api("/api/comparison/apply_weights", { method: "POST", json: {} });
      toast(t("comparison.applied"));
      loadComparisonStats();
    } catch (err) {
      toast(String(err.message));
    }
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
    const status = await api("/api/auth/status");
    state.role = status.user_role;
    if (!status.authenticated && !state.token) { showLogin(); return; }
    document.getElementById("logout-btn").hidden = status.user_id === "anonymous";
  } catch (err) { return; }
  hideLogin();
  await loadFilterOptions();
  applyFiltersFromUrl();      // restore a shared/deep-linked filter state
  switchView("gallery");
}

boot();
