"""Live assembly monitoring — the headless re-design of the reference's
interactive views.

The reference welds a GL particle view + wx live plot into the sampler
process (gl_update_pos kernels3.cu:3824-3973; main_gl.py:811-954;
main_window.py:645-801). A TPU batch job cannot own a display, so the
live surface is a self-refreshing HTML page in the output directory:
open ``<out>/live.html`` in any browser (or over any static file server)
while the run is going and it re-renders every few seconds with

- the current genome-layout painting (contigs as tracks, colored by
  source chromosome, orientation as arrowheads),
- an inline SVG sparkline of the likelihood trajectory,
- the live metric row (cycle, log-likelihood, n_contigs, distance to
  the reference genome, temperature, model parameters).

Writers call :func:`update` once per cycle; the page itself never
changes after the first write — only ``live_status.json`` and the
painting do, so updates are two small atomic file writes.
"""

from __future__ import annotations

import json
import os

_PAGE = """<!doctype html>
<html><head><meta charset="utf-8"><title>graal_tpu live</title>
<style>
 body {{ font-family: system-ui, sans-serif; margin: 24px; color: #222; }}
 .row {{ display: flex; gap: 24px; flex-wrap: wrap; align-items: center; }}
 .stat {{ background: #f4f4f4; border-radius: 8px; padding: 10px 16px; }}
 .stat b {{ display: block; font-size: 22px; }}
 img {{ max-width: 100%; border: 1px solid #ddd; border-radius: 6px; }}
 svg polyline {{ fill: none; stroke: #2563eb; stroke-width: 2; }}
</style></head>
<body>
<h2>graal_tpu — live assembly</h2>
<div class="row" id="stats"></div>
<div id="spark"></div>
<p><img id="layout" src="{painting}" alt="genome layout"></p>
<script>
async function tick() {{
  try {{
    const r = await fetch('live_status.json', {{cache: 'no-store'}});
    const s = await r.json();
    const rows = [];
    for (const [k, v] of Object.entries(s.stats))
      rows.push(`<div class="stat">${{k}}<b>${{v}}</b></div>`);
    document.getElementById('stats').innerHTML = rows.join('');
    const ll = s.likelihood || [];
    if (ll.length > 1) {{
      const w = 640, h = 120;
      const mn = Math.min(...ll), mx = Math.max(...ll);
      const pts = ll.map((v, i) =>
        `${{(i / (ll.length - 1) * w).toFixed(1)}},` +
        `${{(h - (v - mn) / (mx - mn + 1e-9) * h).toFixed(1)}}`).join(' ');
      document.getElementById('spark').innerHTML =
        `<svg width="${{w}}" height="${{h}}"><polyline points="${{pts}}"/></svg>`;
    }}
    const img = document.getElementById('layout');
    img.src = '{painting}?t=' + Date.now();
  }} catch (e) {{}}
  setTimeout(tick, 3000);
}}
tick();
</script>
</body></html>
"""


def _atomic_write(path: str, text: str):
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(text)
    os.replace(tmp, path)


def update(out_dir: str, stats: dict, likelihood_series,
           painting: str = "layout_latest.png"):
    """Refresh the live surface: ``stats`` is the metric row (cycle,
    loglik, ...), ``likelihood_series`` feeds the sparkline, ``painting``
    is the relative path of the layout image the page shows (the caller
    re-renders it). Creates ``live.html`` on first call."""
    os.makedirs(out_dir, exist_ok=True)
    page = os.path.join(out_dir, "live.html")
    if not os.path.exists(page):
        _atomic_write(page, _PAGE.format(painting=painting))
    _atomic_write(
        os.path.join(out_dir, "live_status.json"),
        json.dumps({"stats": {k: (round(v, 3) if isinstance(v, float) else v)
                              for k, v in stats.items()},
                    "likelihood": [float(x) for x in likelihood_series]}))
