"""Single-file demo UI for the HTTP service — the analog of the reference's
gradio app (/root/reference/demo/gradio_demo.py: upload -> query flow at
:484-505), rendered as one dependency-free static HTML page against the
existing JSON API (/api/upload, /api/run).

Served by service.py at GET /. No framework, no build step: the service
stays stdlib-only and the page is fully inspectable.
"""

from __future__ import annotations

DEMO_HTML = """<!doctype html>
<html lang="en">
<head>
<meta charset="utf-8">
<title>squrve_spark demo</title>
<style>
  :root { color-scheme: light dark; }
  body { font-family: system-ui, sans-serif; max-width: 60rem; margin: 2rem auto; padding: 0 1rem; }
  h1 { font-size: 1.3rem; }
  section { margin: 1.5rem 0; padding: 1rem; border: 1px solid #8884; border-radius: 8px; }
  textarea, input[type=text] { width: 100%; box-sizing: border-box; font-family: ui-monospace, monospace; }
  textarea { min-height: 7rem; }
  button { margin-top: .5rem; padding: .4rem 1rem; }
  pre { background: #8881; padding: .75rem; border-radius: 6px; overflow-x: auto; }
  table { border-collapse: collapse; margin-top: .5rem; }
  td, th { border: 1px solid #8886; padding: .25rem .6rem; font-size: .9rem; }
  .muted { color: #888; font-size: .85rem; }
</style>
</head>
<body>
<h1>squrve_spark — upload &amp; query demo</h1>
<p class="muted">1. Upload a small CSV (name + content). 2. Ask a question or run SQL over the uploaded tables.</p>

<section>
  <h2>Upload CSV</h2>
  <input type="text" id="fname" placeholder="table.csv" value="people.csv">
  <textarea id="fbody">name,age,city
ada,36,london
grace,45,ny
alan,41,cambridge</textarea>
  <button onclick="upload()">Upload</button>
  <pre id="upout" class="muted">no tables uploaded yet</pre>
</section>

<section>
  <h2>Run</h2>
  <input type="text" id="question" placeholder="SELECT name, age FROM people ORDER BY age DESC">
  <p class="muted">A SQL statement runs as-is (generator:gold); the result executes on Spark.</p>
  <button onclick="run()">Run</button>
  <pre id="sqlout" class="muted"></pre>
  <div id="result"></div>
</section>

<script>
async function post(path, body) {
  const r = await fetch(path, {method: "POST", headers: {"Content-Type": "application/json"},
                               body: JSON.stringify(body)});
  return r.json();
}
async function upload() {
  const out = await post("/api/upload", {
    files: [{name: document.getElementById("fname").value,
             content: document.getElementById("fbody").value}]});
  document.getElementById("upout").textContent =
    out.error ? ("error: " + out.error) : ("tables: " + out.tables.join(", "));
}
async function run() {
  const q = document.getElementById("question").value;
  const out = await post("/api/run", {
    instance_id: "demo-" + Date.now(), query: q,
    task_lis: ["generator:gold"], execute: true});
  document.getElementById("sqlout").textContent =
    out.error ? ("error: " + out.error)
              : (out.pred_sql || "") + (out.exec_error ? "\\nexec error: " + out.exec_error : "");
  const rows = out.result || [];
  const div = document.getElementById("result");
  div.textContent = "";
  if (!rows.length) {
    const p = document.createElement("p");
    p.className = "muted"; p.textContent = "no rows";
    div.appendChild(p); return;
  }
  // build via DOM + textContent: uploaded data is untrusted, innerHTML
  // concatenation would execute markup embedded in cells/column names
  const cols = Object.keys(rows[0]);
  const table = document.createElement("table");
  const head = table.insertRow();
  for (const c of cols) {
    const th = document.createElement("th");
    th.textContent = c; head.appendChild(th);
  }
  for (const r of rows) {
    const tr = table.insertRow();
    for (const c of cols) tr.insertCell().textContent = String(r[c]);
  }
  div.appendChild(table);
}
</script>
</body>
</html>
"""
