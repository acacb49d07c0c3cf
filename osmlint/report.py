# -*- coding: utf-8 -*-
"""Report rendering: the sink of the reference's report mode
(generate_report, src/main.py:44-123 + src/templates/report_template.html).

Consumes the small aggregate frames (A1 per-map summary, A2 per-check
summary) plus the merged flags (A3) and renders the HTML report with the
reference's ordering rules (A4, src/main.py:70,92,114-118):

* overall maps sorted by name;
* check types sorted by fully-qualified name, with the class docstring as
  the explanation;
* per map, entities sorted by display name;
* the error section lists only CHECKED_ERROR rows (A6 — the template's
  ``result.value == 3`` filter).

Rendering is driver-side string assembly over ALREADY-AGGREGATED small
frames — the heavy work happened in the distributed pipeline."""

from __future__ import annotations

import html as _html

import pandas as pd

from . import pipeline


def render_report(flags_ds, *, title: str = "Serbian OSM lint") -> str:
    """flags Dataset -> self-contained HTML string."""
    summary = pipeline.summary_per_map(flags_ds)
    per_check = pipeline.per_check_type(flags_ds)
    merged = pipeline.merge_overall(flags_ds).to_pandas()

    out = [f"<html><head><meta charset='utf-8'><title>{_html.escape(title)}"
           "</title></head><body>",
           f"<h1>{_html.escape(title)}</h1>"]

    # A1 — per-map summary (maps sorted by name) + global totals
    out.append("<h2>Maps</h2><table border='1'><tr><th>map</th>"
               "<th>entities checked</th><th>errors</th><th>fixable</th></tr>")
    for r in summary.itertuples():
        out.append(f"<tr><td>{_html.escape(r.map_name)}</td>"
                   f"<td>{r.count_map_checks}</td><td>{r.count_map_errors}"
                   f"</td><td>{r.count_map_fixable_errors}</td></tr>")
    out.append(f"<tr><th>TOTAL</th><th>{summary.count_map_checks.sum()}</th>"
               f"<th>{summary.count_map_errors.sum()}</th>"
               f"<th>{summary.count_map_fixable_errors.sum()}</th></tr>"
               "</table>")

    # A2 — per-check-type summary (sorted by FQN, docstring as explanation)
    out.append("<h2>Checks</h2><table border='1'><tr><th>check</th>"
               "<th>explanation</th><th>total</th><th>errors</th></tr>")
    for r in per_check.itertuples():
        out.append(f"<tr><td>{_html.escape(r.check_name)}</td>"
                   f"<td>{_html.escape(r.explanation)}</td>"
                   f"<td>{r.count_total_checks}</td>"
                   f"<td>{r.count_total_errors}</td></tr>")
    out.append("</table>")

    # A3+A4+A6 — per overall map, error rows only, entities sorted by
    # display name
    errors = merged[merged["result"] == "CHECKED_ERROR"]
    for overall in sorted(errors["map_overall"].unique()):
        sub = errors[errors["map_overall"] == overall]
        sub = sub.sort_values(["display_name", "check_name"], kind="stable")
        out.append(f"<h2>Errors — {_html.escape(str(overall))}</h2>"
                   "<table border='1'><tr><th>entity</th><th>type</th>"
                   "<th>check</th><th>message</th><th>fixable</th></tr>")
        for r in sub.itertuples():
            out.append(
                f"<tr><td>{_html.escape(str(r.display_name))}</td>"
                f"<td>{_html.escape(str(r.entity_type))}</td>"
                f"<td>{_html.escape(r.check_name)}</td>"
                f"<td>{_html.escape(str(r.message))}</td>"
                f"<td>{'yes' if r.fixable else 'no'}</td></tr>")
        out.append("</table>")
    out.append("</body></html>")
    return "\n".join(out)


def write_report(data_dir: str, out_path: str) -> str:
    # materialize once: the three aggregations below would otherwise each
    # re-execute the whole lint pipeline through lineage
    html = render_report(pipeline.flags_dataset(data_dir).materialize())
    with open(out_path, "w") as f:
        f.write(html)
    return out_path
