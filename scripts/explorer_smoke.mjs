// Headless smoke test for the explorer SPA (scripts/explorer_smoke.mjs).
// No browser ships in this environment, so this harness gives the page's
// inline script a minimal DOM + EventSource and drives it against a REAL
// running server:
//   1. load /explorer/index.html, execute its <script>
//   2. deep-link #/stores/<name>/live (the reference's
//      stores.$storeName.stream.tsx route shape)
//   3. assert the router selects the store, shows the live tab, and
//      auto-attaches the SSE stream
//   4. append a fact over REST and assert a row renders with its data
//
// Usage: node scripts/explorer_smoke.mjs http://127.0.0.1:18099 orders

const base = process.argv[2] ?? "http://127.0.0.1:18099";
const storeName = process.argv[3] ?? "orders";

// --- minimal DOM ------------------------------------------------------------
class ClassList {
  constructor() { this.set = new Set(); }
  add(c) { this.set.add(c); }
  remove(c) { this.set.delete(c); }
  toggle(c, force) { (force === undefined ? !this.set.has(c) : force) ? this.set.add(c) : this.set.delete(c); }
  contains(c) { return this.set.has(c); }
}
class El {
  constructor(tag) {
    this.tagName = tag; this.children = []; this.classList = new ClassList();
    this.dataset = {}; this.style = {}; this.hidden = false; this._text = "";
    this.id = ""; this.parent = null;
  }
  appendChild(c) { c.parent = this; this.children.push(c); return c; }
  get textContent() { return this._text + this.children.map(c => c.textContent).join(""); }
  set textContent(t) { this._text = String(t); this.children = []; }
  get innerHTML() { return this._html ?? ""; }
  set innerHTML(h) { this._html = String(h); this.children = []; this._text = ""; }
  set className(c) { this.classList = new ClassList(); String(c).split(/\s+/).filter(Boolean).forEach(x => this.classList.add(x)); }
  get className() { return [...this.classList.set].join(" "); }
  matches(simple) { // "tag", "tag.class", ".class"
    const m = simple.match(/^([a-z]*)((?:\.[\w-]+)*)$/);
    if (!m) return false;
    if (m[1] && this.tagName !== m[1]) return false;
    for (const cls of (m[2] || "").split(".").filter(Boolean))
      if (!this.classList.contains(cls)) return false;
    return true;
  }
  descendants() { return this.children.flatMap(c => [c, ...c.descendants()]); }
}
const byId = new Map();
const register = el => { if (el.id) byId.set(el.id, el); };

// the page only ever queries "#id child", "nav li", "#tabs button[.sel]"
function queryAll(sel) {
  const parts = sel.trim().split(/\s+/);
  let roots;
  if (parts[0].startsWith("#")) { const r = byId.get(parts[0].slice(1)); roots = r ? [r] : []; parts.shift(); }
  else if (parts.length > 1) { roots = all.filter(e => e.matches(parts[0])); parts.shift(); }
  else roots = [docRoot];
  let out = roots;
  for (const p of parts) out = out.flatMap(r => r.descendants().filter(e => e.matches(p)));
  return out;
}

const docRoot = new El("html");
const all = [];
function makeEl(tag, id) {
  const el = new El(tag); el.id = id ?? ""; register(el); all.push(el); return el;
}

// build just the skeleton the script touches (ids + tabs + nav)
const nav = docRoot.appendChild(makeEl("nav"));
nav.appendChild(makeEl("ul", "stores"));
nav.appendChild(makeEl("div", "storestatus"));
makeEl("span", "srvinfo");
const tabs = docRoot.appendChild(makeEl("div", "tabs"));
for (const t of ["query", "tagquery", "replay", "live"]) {
  const b = tabs.appendChild(makeEl("button"));
  b.dataset.tab = t;
  if (t === "query") b.classList.add("sel");
  makeEl("div", "tab-" + t);
}
makeEl("div", "status"); makeEl("table", "facts"); makeEl("tbody", "rows");
makeEl("div", "empty");
for (const id of ["q-tag", "q-subject", "q-from", "q-to", "q-limit", "q-dir",
  "tq-body", "r-after", "r-keep", "r-page", "r-first", "r-next", "l-from", "l-btn"])
  makeEl("input", id);
byId.get("l-from").value = "beginning"; // stream view catches up from the start
byId.get("q-limit").value = "100";

const listeners = {};
const document = {
  getElementById: id => byId.get(id),
  createElement: tag => { const el = new El(tag); all.push(el); return el; },
  querySelector: sel => queryAll(sel)[0],
  querySelectorAll: sel => queryAll(sel),
};
const location = { hash: "" };
const window = {
  addEventListener: (ev, fn) => { (listeners[ev] ??= []).push(fn); },
};

// --- EventSource over fetch (the page's live tail) --------------------------
class EventSource {
  constructor(url) {
    this.closed = false;
    (async () => {
      const resp = await fetch(base + url, { headers: { Accept: "text/event-stream" } });
      const reader = resp.body.getReader();
      const dec = new TextDecoder();
      let buf = "";
      while (!this.closed) {
        const { done, value } = await reader.read();
        if (value) buf += dec.decode(value, { stream: true });
        let i;
        while ((i = buf.indexOf("\n\n")) >= 0) {
          const frame = buf.slice(0, i); buf = buf.slice(i + 2);
          const data = frame.split("\n").filter(l => l.startsWith("data: "))
            .map(l => l.slice(6)).join("\n");
          if (data && this.onmessage && !this.closed) this.onmessage({ data });
        }
        if (done) break;
      }
    })().catch(e => { if (this.onerror && !this.closed) this.onerror(e); });
  }
  close() { this.closed = true; }
}

// --- run the page script ----------------------------------------------------
const html = await (await fetch(base + "/explorer/index.html")).text();
const script = html.match(/<script>([\s\S]*?)<\/script>/)[1];

const pageFetch = (url, opts) => fetch(url.startsWith("http") ? url : base + url, opts);
const fn = new Function("document", "window", "location", "fetch", "EventSource",
  "setInterval", "URLSearchParams", "TextDecoder", "atob", script);

location.hash = "#/stores/" + encodeURIComponent(storeName) + "/live";
fn(document, window, location, pageFetch, EventSource,
  () => 0 /* no periodic refresh in the smoke */, URLSearchParams, TextDecoder,
  s => Buffer.from(s, "base64").toString("binary"));

const sleep = ms => new Promise(r => setTimeout(r, ms));
await sleep(1500); // loadStores + route + SSE catch-up

const fail = msg => { console.error("SMOKE FAIL: " + msg); process.exit(1); };

// header health badge populated from /q/health
const health = byId.get("health");
if (!health || !health.textContent.includes("healthy"))
  fail("health badge not healthy: " + (health && health.textContent));

const selStore = document.querySelector("nav li.sel");
if (!selStore || selStore.textContent !== storeName)
  fail("store not selected by route: " + (selStore && selStore.textContent));
const selTab = document.querySelector("#tabs button.sel");
if (!selTab || selTab.dataset.tab !== "live") fail("live tab not active");
if (byId.get("l-btn").textContent !== "Stop") fail("stream not auto-attached");
if (byId.get("tab-live").hidden) fail("live panel hidden");

// live append must render a new row with the fact's fields
const before = byId.get("rows").children.length;
const marker = "smoke-" + Date.now();
const resp = await fetch(base + "/api/v1/stores/" + storeName + "/facts", {
  method: "POST",
  body: JSON.stringify({ facts: [{ type: "SMOKE_EVENT", subject: marker,
    data: Buffer.from("{\"ok\":true}").toString("base64"), tags: { smoke: "yes" } }] }),
});
if (!resp.ok) fail("append failed: " + resp.status);
await sleep(1500);
const rows = byId.get("rows").children;
if (rows.length <= before) fail("no new row rendered after live append");
const lastText = rows[rows.length - 1].textContent;
if (!lastText.includes("SMOKE_EVENT") || !lastText.includes(marker))
  fail("rendered row missing fact fields: " + lastText);
// textContent-only rule: the row builder must never have set innerHTML
if (rows.some(r => r._html !== undefined)) fail("fact row used innerHTML");

// --- Browse pager: position-order pages via replay?after&limit -------------
// switch to the replay tab first: its handler stops the live stream, so
// later appends can't race the pager's rendered rows
document.querySelectorAll("#tabs button").find(b => b.dataset.tab === "replay").onclick();
await sleep(200);
// three more facts -> 4 total in the store; page size 3 must give a full
// first page, then a 1-fact final page with the Next button disabled.
for (let i = 0; i < 3; i++) {
  const r = await fetch(base + "/api/v1/stores/" + storeName + "/facts", {
    method: "POST",
    body: JSON.stringify({ facts: [{ type: "PAGE_EVENT", subject: "page/" + i,
      data: Buffer.from("p" + i).toString("base64") }] }),
  });
  if (!r.ok) fail("pager append failed: " + r.status);
}
byId.get("r-page").value = "3";
byId.get("r-after").value = "";
await byId.get("r-first").onclick();
let pageRows = byId.get("rows").children;
if (pageRows.length !== 3) fail("browse page 1: expected 3 rows, got " + pageRows.length);
const statusText = byId.get("status").textContent;
if (!statusText.includes("page 1")) fail("browse status missing page 1: " + statusText);
// detail pane renders the full envelope + payload through textContent only
const detail = pageRows[0].textContent;
if (!detail.includes("position") || !detail.includes("payload"))
  fail("detail pane missing envelope fields: " + detail);
if (pageRows.some(r => r._html !== undefined)) fail("detail pane used innerHTML");
await byId.get("r-next").onclick();
pageRows = byId.get("rows").children;
if (pageRows.length !== 1) fail("browse page 2: expected 1 row, got " + pageRows.length);
if (!byId.get("r-next").disabled) fail("Next not disabled on the final short page");
if (!pageRows[0].textContent.includes("PAGE_EVENT"))
  fail("page 2 row missing fact fields: " + pageRows[0].textContent);

console.log("EXPLORER SMOKE OK: route -> store '" + storeName +
  "' live view, stream attached, " + rows.length + " rows, last row has " +
  "SMOKE_EVENT/" + marker + "; pager 3+1 rows with detail panes");
process.exit(0);
